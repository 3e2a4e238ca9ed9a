"""Generate a multi-dataset B2B training config from a set of dataset roots
(reference scripts/gen_multi_dataset_b2b_config.py — same core CLI and
formulas, compact rebuild):

- per-root bbox statistics drive the online crop size:
  ``floor16(min(0.696 * HDI75_hi + 124.5, max_long_side))``
- each root becomes a multi_dataset child entry with per-child overrides
- a per-root holdout test set is carved from trainA/paths.txt (written as
  ``testA<suffix>/paths.txt`` with absolutized lines; train is left intact)
- writes ``<output-dir>/multi_dataset.json`` + ``<output-dir>/train_config.json``
- optional dataset preview PNGs per child
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def hdi(values, coverage=0.75):
    """Smallest window covering `coverage` of the values (reference :90)."""
    values = sorted(values)
    if not values:
        return None, None
    win = max(1, math.ceil(coverage * len(values)))
    best_i, best_w = 0, float("inf")
    for i in range(len(values) - win + 1):
        w = values[i + win - 1] - values[i]
        if w < best_w:
            best_w, best_i = w, i
    return values[best_i], values[best_i + win - 1]


def floor_to_multiple(value, step=16):
    return int(math.floor(value / step) * step)


def collect_bbox_files(dataroot):
    paths_file = os.path.join(dataroot, "trainA", "paths.txt")
    bbox_files = []
    with open(paths_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                p = parts[-1]
                if not os.path.isabs(p):
                    p = os.path.join(dataroot, p)
                if p.endswith(".txt"):
                    bbox_files.append(p)
    return bbox_files


def compute_bbox_stats(bbox_files, coverage, step, ignore_categories):
    """Derived crop size from bbox long sides (reference :141-201)."""
    ignored = {str(c) for c in ignore_categories}
    long_sides = []
    for bf in bbox_files:
        with open(bf) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 5 or parts[0] in ignored:
                    continue
                x1, y1, x2, y2 = map(float, parts[1:5])
                long_sides.append(max(x2 - x1, y2 - y1))
    if not long_sides:
        raise ValueError("no usable bboxes found")
    _, hdi_hi = hdi(long_sides, coverage)
    raw = 0.696 * hdi_hi + 124.5
    final = floor_to_multiple(min(raw, max(long_sides) - 1e-6), step)
    if final <= 0:
        raise ValueError("bbox-derived crop size is not positive")
    return {"count": len(long_sides), "hdi_hi": hdi_hi,
            "max_long": max(long_sides), "final_target": final}


def generate_holdout(dataroot, suffix, n, seed=0):
    """Write the last n paths rows as testA<suffix>/paths.txt with
    absolutized lines; train paths are left untouched (reference carves
    windows out of train; we keep train intact to stay non-destructive)."""
    import random as _random
    src = os.path.join(dataroot, "trainA", "paths.txt")
    with open(src) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    rng = _random.Random(seed)
    take = sorted(rng.sample(range(len(lines)), min(n, len(lines))))
    out_dir = os.path.join(dataroot, "testA" + suffix)
    os.makedirs(out_dir, exist_ok=True)

    def absolutize(line):
        return " ".join(p if os.path.isabs(p)
                        else os.path.join(dataroot, p)
                        for p in line.split())

    with open(os.path.join(out_dir, "paths.txt"), "w") as f:
        f.write("\n".join(absolutize(lines[i]) for i in take) + "\n")
    return "testA" + suffix


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datasets-root", default="",
                   help="directory with one subdirectory per dataset root")
    p.add_argument("--dataset-dirs", nargs="+", default=None)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--name", default="b2b_multi_dataset")
    p.add_argument("--checkpoints-dir", default="./checkpoints")
    p.add_argument("--base-train-config", default="")
    p.add_argument("--coverage", type=float, default=0.75)
    p.add_argument("--step", type=int, default=16)
    p.add_argument("--size", type=int, default=None,
                   help="manual crop size override (skips bbox stats)")
    p.add_argument("--weight", type=float, default=1.0)
    p.add_argument("--crop-delta-ratio", type=float, default=0.1)
    p.add_argument("--ignore-categories", nargs="*", default=["2"])
    p.add_argument("--data-load-size", type=int, default=256)
    p.add_argument("--data-crop-size", type=int, default=256)
    p.add_argument("--child-dataset-mode",
                   default="self_supervised_vid_mask_online",
                   choices=["self_supervised_vid_mask_online",
                            "self_supervised_labeled_mask_online",
                            "self_supervised_labeled_mask_cls_online"])
    p.add_argument("--G-netG", default=None, choices=["vit_vid", "vit"])
    p.add_argument("--data-temporal-number-frames", type=int, default=2)
    p.add_argument("--data-temporal-frame-step", type=int, default=1)
    p.add_argument("--train-batch-size", type=int, default=8)
    p.add_argument("--train-iter-size", type=int, default=4)
    p.add_argument("--train-n-epochs", type=int, default=6000)
    p.add_argument("--train-G-lr", type=float, default=1e-4)
    p.add_argument("--holdout-samples", type=int, default=0,
                   help="rows per dataset carved into an auto test set")
    p.add_argument("--preview-samples", type=int, default=0,
                   help="per-child preview PNGs rendered from the dataset")
    p.add_argument(
        "--alg-b2b-multi-dataset-class-conditioning", action="store_true")
    a = p.parse_args()

    if a.dataset_dirs:
        roots = [os.path.abspath(d) for d in a.dataset_dirs]
    elif a.datasets_root:
        roots = sorted(
            os.path.join(os.path.abspath(a.datasets_root), d)
            for d in os.listdir(a.datasets_root)
            if os.path.isdir(os.path.join(a.datasets_root, d)))
    else:
        p.error("pass --datasets-root or --dataset-dirs")
    roots = [r for r in roots
             if os.path.exists(os.path.join(r, "trainA", "paths.txt"))]
    if not roots:
        p.error("no dataset root contains trainA/paths.txt")

    os.makedirs(a.output_dir, exist_ok=True)
    video = a.child_dataset_mode == "self_supervised_vid_mask_online"
    entries, test_sets = [], []
    for root in roots:
        name = os.path.basename(root.rstrip("/"))
        if a.size is None:
            stats = compute_bbox_stats(collect_bbox_files(root), a.coverage,
                                       a.step, a.ignore_categories)
            crop = stats["final_target"]
            print(f"{name}: derived crop={crop} "
                  f"(n={stats['count']}, hdi_hi={stats['hdi_hi']:.1f}, "
                  f"max={stats['max_long']:.1f})")
        else:
            crop = a.size
        entry = {
            "name": name,
            "dataset_mode": a.child_dataset_mode,
            "dataroot": root,
            "weight": a.weight,
            "overrides": {
                "data_online_creation_crop_size_A": crop,
                "data_online_creation_crop_delta_A": int(
                    round(crop * a.crop_delta_ratio)),
            },
        }
        entries.append(entry)
        if a.holdout_samples > 0:
            suffix = generate_holdout(root, "_auto", a.holdout_samples)
            test_sets.append({"id": f"{name}_auto", "dataset": name,
                              "test_name": "_auto"})
            print(f"{name}: holdout test set at {suffix}")

    multi = {"datasets": entries}
    if test_sets:
        multi["test_sets"] = test_sets
    multi_path = os.path.join(a.output_dir, "multi_dataset.json")
    with open(multi_path, "w") as f:
        json.dump(multi, f, indent=2)
    print("wrote", multi_path)

    base = {}
    if a.base_train_config:
        with open(a.base_train_config) as f:
            base = json.load(f)
    netG = a.G_netG or ("vit_vid" if video else "vit")
    train_cfg = {
        "name": a.name,
        "checkpoints_dir": a.checkpoints_dir,
        "model_type": "b2b",
        "G_netG": netG,
        "dataroot": roots[0],
        "data_dataset_mode": "multi_dataset",
        "data_multi_dataset_config": os.path.abspath(multi_path),
        "data_load_size": a.data_load_size,
        "data_crop_size": a.data_crop_size,
        "data_relative_paths": False,
        "train_batch_size": a.train_batch_size,
        "train_iter_size": a.train_iter_size,
        "train_n_epochs": a.train_n_epochs,
        "train_G_lr": a.train_G_lr,
    }
    if video:
        train_cfg.update({
            "data_temporal_number_frames": a.data_temporal_number_frames,
            "data_temporal_frame_step": a.data_temporal_frame_step,
        })
    if a.alg_b2b_multi_dataset_class_conditioning:
        train_cfg["alg_b2b_multi_dataset_class_conditioning"] = True
        train_cfg["G_vit_num_classes"] = max(
            len(entries), base.get("G_vit_num_classes", 0))
    merged = dict(base)
    merged.update(train_cfg)
    cfg_path = os.path.join(a.output_dir, "train_config.json")
    with open(cfg_path, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", cfg_path)

    if a.preview_samples > 0:
        from PIL import Image
        import numpy as np
        from joligen_tpu.data import create_dataset
        from joligen_tpu.options import TrainOptions
        from joligen_tpu.utils.visualizer import tensor2im
        prev_dir = os.path.join(a.output_dir, "previews")
        os.makedirs(prev_dir, exist_ok=True)
        flat = [x for kv in merged.items() if kv[0] != "name"
                for x in (f"--{kv[0]}", str(kv[1]))
                if not isinstance(kv[1], bool)]
        opt = TrainOptions().parse_cli(flat + ["--name", a.name])
        ds = create_dataset(opt, "train")
        n = 0
        for i in range(len(ds)):
            s = ds[i]
            if s is None:
                continue
            img = s["A"] if s["A"].ndim == 3 else s["A"][0]
            Image.fromarray(tensor2im(img)).save(
                os.path.join(prev_dir, f"preview_{n:03d}.png"))
            n += 1
            if n >= a.preview_samples:
                break
        print(f"wrote {n} previews to {prev_dir}")


if __name__ == "__main__":
    main()
