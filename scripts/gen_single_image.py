"""GAN single-image inference (reference scripts/gen_single_image.py):
load a trained generator checkpoint, translate one image, save the result.

    python scripts/gen_single_image.py --model_in_file ckpt/latest_net_G_A.pth \
        --img_in in.png --img_out out.png [--img_width 256 --img_height 256]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import (load_image_rgb, load_model_from_file,  # noqa: E402
                    save_image_rgb, to_m1p1, to_uint8)


def inference(args):
    model, opt = load_model_from_file(args.model_in_file, cpu=args.cpu)

    img = load_image_rgb(args.img_in)
    w = args.img_width or opt.data_crop_size
    h = args.img_height or opt.data_crop_size
    from PIL import Image
    img_r = np.asarray(
        Image.fromarray(img).resize((w, h), Image.BICUBIC), np.uint8)

    batch = {"A": to_m1p1(img_r)[None], "B": to_m1p1(img_r)[None]}
    fake = model.inference(batch)
    out = to_uint8(fake[0])
    if (out.shape[0], out.shape[1]) != img.shape[:2]:
        out = np.asarray(Image.fromarray(out).resize(
            (img.shape[1], img.shape[0]), Image.BICUBIC), np.uint8)
    save_image_rgb(args.img_out, out)
    print("Successfully generated image", args.img_out)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True,
                   help="path to a <prefix>_net_G_A.pth checkpoint")
    p.add_argument("--img_in", required=True)
    p.add_argument("--img_out", required=True)
    p.add_argument("--img_width", type=int, default=0)
    p.add_argument("--img_height", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    inference(p.parse_args())
