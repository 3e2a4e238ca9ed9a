"""GAN video inference: run a trained GAN generator frame-by-frame over a
directory/video (reference scripts/gen_video_gan.py)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import (load_image_rgb, load_model_from_file,  # noqa: E402
                    save_image_rgb, to_m1p1, to_uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True)
    p.add_argument("--dir_in", required=True)
    p.add_argument("--dir_out", default=".")
    p.add_argument("--video_out", default="")
    p.add_argument("--fps", "--vid_fps", type=int, default=25)
    p.add_argument("--max_frames", type=int, default=-1)
    p.add_argument("--img_width", type=int, default=0)
    p.add_argument("--img_height", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()

    model, opt = load_model_from_file(a.model_in_file, cpu=a.cpu)
    from PIL import Image
    frames = sorted(os.path.join(a.dir_in, f) for f in os.listdir(a.dir_in)
                    if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if a.max_frames > 0:
        frames = frames[: a.max_frames]
    w = a.img_width or opt.data_crop_size
    h = a.img_height or opt.data_crop_size
    os.makedirs(a.dir_out, exist_ok=True)
    outs = []
    for i, fp in enumerate(frames):
        orig = load_image_rgb(fp)
        x = to_m1p1(np.asarray(Image.fromarray(orig).resize(
            (w, h), Image.BICUBIC)))[None]
        fake = model.inference({"A": x, "B": x})
        u8 = to_uint8(fake[0])
        full = np.asarray(Image.fromarray(u8).resize(
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
