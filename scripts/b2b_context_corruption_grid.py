"""B2B context-robustness study
(TPU-native analog of reference scripts/b2b_pth_context_corruption_grid.py).

Takes a trained video B2B checkpoint and two consecutive frames; corrupts
the CONTEXT frame (color fill / gaussian noise / blur / brightness) and/or
perturbs the mask (scale / shift / jitter), regenerates the second frame
for every variant, and writes a labeled grid PNG + per-variant PSNR JSON.

TPU-native twist: all variants are stacked into ONE batched inference call
— the whole grid is a single jitted dispatch instead of the reference's
one-model-call-per-variant loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import (load_image_rgb, load_model_from_file,  # noqa: E402
                    save_image_rgb, to_uint8)


def default_corruption_variants():
    """Reference variant set (b2b_pth_context_corruption_grid.py:22-54)."""
    variants = [{"name": "clean", "kind": "clean"}]
    for name, rgb in [("black", (0, 0, 0)), ("white", (255, 255, 255)),
                      ("gray", (128, 128, 128)), ("red", (255, 0, 0)),
                      ("green", (0, 255, 0)), ("blue", (0, 0, 255))]:
        variants.append({"name": f"color_{name}", "kind": "color",
                         "rgb": rgb})
    for std in (0.1, 0.25, 0.5):
        variants.append({"name": f"noise_{std:g}", "kind": "noise",
                         "std": std})
    for kernel in (5, 15, 31):
        variants.append({"name": f"blur_k{kernel}", "kind": "blur",
                         "kernel": kernel})
    for delta in (-0.4, -0.2, 0.2, 0.4):
        variants.append({"name": f"brightness_{delta:+g}",
                         "kind": "brightness", "delta": delta})
    return variants


def default_mask_variants():
    variants = [{"name": "mask_clean", "kind": "clean"}]
    for s in (0.7, 1.4):
        variants.append({"name": f"mask_scale_{s:g}", "kind": "scale",
                         "factor": s})
    for dx, dy in ((6, 0), (0, 6), (-6, -6)):
        variants.append({"name": f"mask_shift_{dx:+d}{dy:+d}",
                         "kind": "shift", "dx": dx, "dy": dy})
    variants.append({"name": "mask_jitter", "kind": "jitter", "amp": 3})
    return variants


def corrupt_context(img, variant, rng):
    """img in [-1,1] HWC float32."""
    kind = variant["kind"]
    if kind == "clean":
        return img
    if kind == "color":
        rgb = np.asarray(variant["rgb"], np.float32) / 127.5 - 1.0
        return np.broadcast_to(rgb, img.shape).astype(np.float32).copy()
    if kind == "noise":
        return np.clip(img + rng.normal(0.0, variant["std"] * 2.0,
                                        img.shape).astype(np.float32),
                       -1.0, 1.0)
    if kind == "blur":
        import cv2
        k = int(variant["kernel"]) | 1
        return cv2.GaussianBlur(img, (k, k), 0)
    if kind == "brightness":
        return np.clip(img + 2.0 * variant["delta"], -1.0, 1.0)
    raise ValueError(f"unknown corruption kind: {kind}")


def perturb_mask(mask, variant, rng):
    """mask HW1 float {0,1}."""
    import cv2
    kind = variant["kind"]
    m = mask[:, :, 0].astype(np.uint8)
    h, w = m.shape
    if kind == "clean":
        out = m
    elif kind == "scale":
        f = float(variant["factor"])
        ys, xs = np.where(m > 0)
        if len(xs) == 0:
            out = m
        else:
            cx, cy = xs.mean(), ys.mean()
            M = np.float32([[f, 0, cx * (1 - f)], [0, f, cy * (1 - f)]])
            out = cv2.warpAffine(m, M, (w, h),
                                 flags=cv2.INTER_NEAREST)
    elif kind == "shift":
        M = np.float32([[1, 0, variant["dx"]], [0, 1, variant["dy"]]])
        out = cv2.warpAffine(m, M, (w, h), flags=cv2.INTER_NEAREST)
    elif kind == "jitter":
        amp = int(variant["amp"])
        noise = rng.uniform(-amp, amp, (h // 8 + 1, w // 8 + 1, 2))
        flow = cv2.resize(noise.astype(np.float32), (w, h))
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        out = cv2.remap(m, gx + flow[..., 0], gy + flow[..., 1],
                        cv2.INTER_NEAREST)
    else:
        raise ValueError(f"unknown mask variant kind: {kind}")
    if out.sum() == 0:  # never hand the model an empty mask
        out = m
    return out[:, :, None].astype(np.float32)


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2))
    return 99.0 if mse == 0 else float(10 * np.log10(4.0 / mse))


def label_tile(tile, text):
    import cv2
    bar = np.zeros((18, tile.shape[1], 3), np.uint8)
    cv2.putText(bar, text, (2, 13), cv2.FONT_HERSHEY_SIMPLEX, 0.35,
                (255, 255, 255), 1, cv2.LINE_AA)
    return np.concatenate([bar, tile], axis=0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True)
    p.add_argument("--paths_in_file", required=True,
                   help="'<image> <bbox.txt>' per line; first two frames "
                        "are used (context, target)")
    p.add_argument("--dataset_root", default="")
    p.add_argument("--dir_out", required=True)
    p.add_argument("--study_mode", default="context",
                   choices=["context", "mask", "both"])
    p.add_argument("--denoise_timesteps", type=int, default=0)
    p.add_argument("--label", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--grid_cols", type=int, default=6)
    p.add_argument("--output_name", default="corruption_grid.png")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    model, opt = load_model_from_file(args.model_in_file, cpu=args.cpu)
    assert opt.model_type == "b2b" and model.is_video, \
        "context corruption studies need a video B2B checkpoint"
    nf = int(getattr(opt, "data_temporal_number_frames", 2) or 2)
    size = opt.data_crop_size

    from b2b_stablehlo_denoiser_infer_autoregressive_progress_bbox import \
        load_sequence, read_bbox
    from joligen_tpu.data.online_creation import crop_image
    imgs, bboxes = load_sequence(args.paths_in_file, args.dataset_root, nf)
    assert len(imgs) >= 2, "need at least two frames"

    first = load_image_rgb(imgs[0])
    x1, y1, x2, y2 = read_bbox(bboxes[0])
    crop_dim = min(max(2 * max(x2 - x1, y2 - y1), size),
                   min(first.shape[0], first.shape[1]))
    coords = crop_image(imgs[0], bboxes[0], crop_delta=0, crop_center=True,
                        crop_dim=crop_dim, output_dim=size,
                        get_crop_coordinates=True)
    crops, masks = [], []
    for ip, bp in zip(imgs, bboxes):
        c, m, _, _ = crop_image(ip, bp, crop_delta=0, crop_center=True,
                                crop_dim=crop_dim, output_dim=size,
                                crop_coordinates=coords)
        crops.append(c)
        masks.append(m.astype(np.float32))
    while len(crops) < nf:
        crops.append(crops[-1])
        masks.append(masks[-1])

    ctx_variants = default_corruption_variants() \
        if args.study_mode in ("context", "both") else \
        [{"name": "clean", "kind": "clean"}]
    mask_variants = default_mask_variants() \
        if args.study_mode in ("mask", "both") else \
        [{"name": "mask_clean", "kind": "clean"}]

    rng = np.random.RandomState(args.seed)
    names, gts, cmasks, ctxs = [], [], [], []
    for cv_ in ctx_variants:
        for mv in mask_variants:
            ctx = corrupt_context(crops[0], cv_, rng)
            clip = np.stack([ctx] + crops[1:])
            cmask = np.stack(
                [np.zeros_like(masks[0])]
                + [perturb_mask(m, mv, rng) for m in masks[1:]])
            nm = cv_["name"] if mv["kind"] == "clean" else (
                mv["name"] if cv_["kind"] == "clean"
                else f"{cv_['name']}+{mv['name']}")
            names.append(nm)
            gts.append(clip)
            cmasks.append(cmask)
            ctxs.append(ctx)

    B = np.stack(gts)
    M = np.stack(cmasks)
    batch = {"B": B, "B_label_mask": M}
    if getattr(model, "conditional", False):
        batch["A"] = B * (1.0 - np.clip(M, 0.0, 1.0))
    kwargs = {}
    if args.denoise_timesteps:
        kwargs["denoise_timesteps"] = args.denoise_timesteps
    import jax
    model.rng = jax.random.PRNGKey(args.seed)
    out = model.inference(batch, **kwargs)  # (V,F,H,W,C), one dispatch

    os.makedirs(args.dir_out, exist_ok=True)
    gt_target = to_uint8(crops[1])
    tiles, metrics = [], {}
    for i, nm in enumerate(names):
        gen = to_uint8(out[i][1])
        m8 = (cmasks[i][1][:, :, 0] > 0)
        metrics[nm] = {
            "psnr": psnr(out[i][1], crops[1]),
            "psnr_masked": psnr(out[i][1][m8], crops[1][m8])
            if m8.any() else None,
        }
        row = np.concatenate([to_uint8(ctxs[i]), gen, gt_target], axis=1)
        tiles.append(label_tile(row, f"{nm}  psnr={metrics[nm]['psnr']:.1f}"))

    cols = max(1, args.grid_cols)
    rows = []
    th, tw = tiles[0].shape[:2]
    for r in range(0, len(tiles), cols):
        chunk = tiles[r:r + cols]
        while len(chunk) < cols:
            chunk.append(np.zeros((th, tw, 3), np.uint8))
        rows.append(np.concatenate(chunk, axis=1))
    grid = np.concatenate(rows, axis=0)
    grid_path = os.path.join(args.dir_out, args.output_name)
    save_image_rgb(grid_path, grid)
    with open(os.path.join(args.dir_out, "corruption_metrics.json"),
              "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"grid ({len(names)} variants, one batched dispatch) -> "
          f"{grid_path}")


if __name__ == "__main__":
    main()
