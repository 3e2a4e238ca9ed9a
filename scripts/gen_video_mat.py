"""MAT video inference: inpaint every frame of a directory with a trained
MAT checkpoint and synchronized per-frame masks (reference
scripts/gen_video_mat.py — frame loop over the single-image MAT path)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import (load_image_rgb, load_model_from_file,  # noqa: E402
                    save_image_rgb, to_m1p1, to_uint8)


def _frames(d):
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.lower().endswith((".png", ".jpg", ".jpeg")))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True)
    p.add_argument("--dir_in", required=True, help="frame directory")
    p.add_argument("--mask_dir_in", required=True,
                   help="per-frame mask directory (same ordering); a single "
                        "file is reused for every frame")
    p.add_argument("--dir_out", default=".")
    p.add_argument("--video_out", default="")
    p.add_argument("--fps", "--vid_fps", type=int, default=25)
    p.add_argument("--max_frames", type=int, default=-1)
    p.add_argument("--truncation_psi", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=-1,
                   help="fixed z across frames for temporal stability")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()

    model, opt = load_model_from_file(a.model_in_file, cpu=a.cpu)
    assert opt.model_type == "mat", f"not a MAT checkpoint: {opt.model_type}"
    from PIL import Image
    size = opt.data_crop_size
    frames = _frames(a.dir_in)
    if a.max_frames > 0:
        frames = frames[: a.max_frames]
    if os.path.isdir(a.mask_dir_in):
        masks = _frames(a.mask_dir_in)
    else:
        masks = [a.mask_dir_in] * len(frames)
    os.makedirs(a.dir_out, exist_ok=True)
    outs = []
    for i, (fp, mp) in enumerate(zip(frames, masks)):
        orig = load_image_rgb(fp)
        x = to_m1p1(np.asarray(Image.fromarray(orig).resize(
            (size, size), Image.BICUBIC)))
        m = Image.open(mp).convert("L").resize((size, size), Image.NEAREST)
        label_mask = (np.asarray(m) > 0).astype(np.int32)[:, :, None]
        out = model.inference(
            {"B": x[None], "B_label_mask": label_mask[None]},
            truncation_psi=a.truncation_psi,
            seed=(a.seed if a.seed >= 0 else None))
        full = np.asarray(Image.fromarray(to_uint8(out[0])).resize(
            (orig.shape[1], orig.shape[0]), Image.BICUBIC))
        save_image_rgb(os.path.join(a.dir_out,
                                    f"frame_{i:05d}_generated.png"), full)
        outs.append(full)
    if a.video_out and outs:
        import cv2
        hh, ww = outs[0].shape[:2]
        vw = cv2.VideoWriter(a.video_out, cv2.VideoWriter_fourcc(*"mp4v"),
                             a.fps, (ww, hh))
        for fr in outs:
            vw.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        vw.release()
    print(f"Successfully generated {len(outs)} frames")


if __name__ == "__main__":
    main()
