"""Offline metric evaluation of a checkpoint directory (reference test.py).

Rebuilds the model from ``<dir>/train_config.json``, loads the requested
epoch, runs inference over every ``test*`` set under the dataroot, and
writes ``<dir>/metrics/<timestamp>.json``.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import random
import sys

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from joligen_tpu.options import TrainOptions  # noqa: E402

MAX_INT = 1000000000


def launch_testing(opt, main_opt):
    from joligen_tpu.data import (create_dataloader, create_dataset,
                                  list_test_sets)
    from joligen_tpu.models import create_model

    opt.steps_per_epoch = 1
    model = create_model(opt, phase="test")
    model.save_dir = main_opt.test_model_dir
    model.load_networks(main_opt.test_epoch, load_optim=False)

    infer_kwargs = {}
    if opt.model_type == "palette":  # sampling overrides (test.py:57-69)
        if main_opt.sampling_method:
            infer_kwargs["sampling_method"] = main_opt.sampling_method
        if main_opt.sampling_steps or main_opt.ddim_num_steps:
            infer_kwargs["num_steps"] = (main_opt.ddim_num_steps
                                         or main_opt.sampling_steps)
        if main_opt.ddim_eta is not None:
            infer_kwargs["eta"] = main_opt.ddim_eta
    elif opt.model_type in ("sc", "b2b") and main_opt.sampling_steps:
        infer_kwargs["denoise_timesteps"] = main_opt.sampling_steps

    # per-stepcount evaluation grids (reference SC/B2B evaluate metrics at
    # every alg_sc_denoise_timesteps / requested step count)
    step_grid = []
    if opt.model_type == "sc":
        step_grid = list(getattr(opt, "alg_sc_denoise_timesteps", []) or [])
    elif opt.model_type == "b2b":
        steps = getattr(opt, "alg_b2b_denoise_timesteps", []) or []
        if isinstance(steps, (int, float)):
            steps = [int(steps)]
        if len(steps) > 1:  # reference evaluates every requested stepcount
            step_grid = [int(s) for s in steps]
    if main_opt.sampling_steps:
        step_grid = [main_opt.sampling_steps]

    results = {}
    names = list_test_sets(opt.dataroot) or [""]
    for name in names:
        try:
            ds = create_dataset(opt, "test", name=name)
        except (AssertionError, FileNotFoundError) as e:
            print(f"skipping test set '{name}': {e}")
            continue
        dl = create_dataloader(opt, ds, shuffle=False,
                               batch_size=opt.test_batch_size)
        model.init_metrics(dl)
        key = f"test{name}" if name else "test"
        if len(step_grid) > 1 and opt.model_type in ("sc", "b2b"):
            results[key] = {}
            for n_steps in step_grid:
                kw = dict(infer_kwargs)
                kw["denoise_timesteps"] = int(n_steps)
                m = model.compute_metrics_test(dl, **kw)
                results[key][f"steps{n_steps}"] = m
                print(f"{key}[steps={n_steps}]", json.dumps(m))
        else:
            metrics = model.compute_metrics_test(dl, **infer_kwargs)
            results[key] = metrics
            print(key, json.dumps(metrics))

    out_dir = os.path.join(main_opt.test_model_dir, "metrics")
    os.makedirs(out_dir, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_path = os.path.join(out_dir, f"{stamp}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"metrics written to {out_path}")
    return results


if __name__ == "__main__":
    main_parser = argparse.ArgumentParser()
    main_parser.add_argument("--test_model_dir", type=str, required=True)
    main_parser.add_argument("--test_epoch", type=str, default="latest")
    main_parser.add_argument(
        "--test_metrics_list", type=str, nargs="*",
        choices=["FID", "KID", "MSID", "PSNR", "LPIPS", "SSIM", "DINOv2",
                 "FVD"],
        default=["FID", "KID", "MSID", "PSNR", "LPIPS"])
    main_parser.add_argument("--test_nb_img", type=int, default=MAX_INT)
    main_parser.add_argument("--test_batch_size", type=int, default=1)
    main_parser.add_argument("--test_seed", type=int, default=42)
    main_parser.add_argument("--sampling_steps", type=int)
    main_parser.add_argument("--sampling_method", type=str,
                             choices=["ddpm", "ddim"])
    main_parser.add_argument("--ddim_num_steps", type=int)
    main_parser.add_argument("--ddim_eta", type=float)
    main_opt, remaining = main_parser.parse_known_args()

    cfg_path = os.path.join(main_opt.test_model_dir, "train_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    opt = TrainOptions().parse_json(cfg, verbose=False)
    # CLI flag overrides on top of the saved config (reference util/parser.py)
    if remaining:
        override = TrainOptions().parse_cli(remaining)
        given = TrainOptions._explicit_flags(remaining)
        for flag in given:
            if hasattr(override, flag):
                setattr(opt, flag, getattr(override, flag))

    opt.train_compute_metrics_test = True
    opt.train_epoch = main_opt.test_epoch
    opt.train_metrics_list = main_opt.test_metrics_list
    opt.train_nb_img_max_fid = main_opt.test_nb_img
    opt.test_batch_size = main_opt.test_batch_size

    random.seed(main_opt.test_seed)
    np.random.seed(main_opt.test_seed)
    opt.seed = main_opt.test_seed

    launch_testing(opt, main_opt)
