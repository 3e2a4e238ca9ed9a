"""Dataset-size ablation: run training over decreasing dataset sizes and
collect the final metrics into eval_results.json (reference evaluate.py:6-25).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from joligen_tpu.options import TrainOptions  # noqa: E402
from train import launch_training  # noqa: E402

if __name__ == "__main__":
    opt = TrainOptions().parse_cli()
    base_name = opt.name
    max_size = getattr(opt, "data_max_dataset_size", 1000000000)
    if max_size is None or max_size >= 10 ** 9:
        max_size = 1000
    results = {}
    size = int(max_size)
    while size >= 10:
        opt.data_max_dataset_size = size
        opt.name = f"{base_name}_n{size}"
        opt.train_compute_metrics_test = True
        launch_training(opt)
        path = os.path.join(opt.checkpoints_dir, opt.name,
                            "eval_results.json")
        if os.path.exists(path):
            with open(path) as f:
                results[str(size)] = json.load(f)
        size //= 2
    out = os.path.join(opt.checkpoints_dir, base_name + "_eval_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)
