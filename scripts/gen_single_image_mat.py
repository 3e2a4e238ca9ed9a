"""MAT single-image inpainting inference (reference
scripts/gen_single_image_mat.py): load a MAT checkpoint, inpaint the masked
region of one image, save the result."""

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
    assert opt.model_type == "mat", f"not a MAT checkpoint: {opt.model_type}"
    from PIL import Image
    size = opt.data_crop_size
    img = load_image_rgb(args.img_in)
    x = to_m1p1(np.asarray(Image.fromarray(img).resize((size, size),
                                                       Image.BICUBIC)))
    m = Image.open(args.mask_in).convert("L").resize((size, size),
                                                     Image.NEAREST)
    label_mask = (np.asarray(m) > 0).astype(np.int32)[:, :, None]
    batch = {"B": x[None], "B_label_mask": label_mask[None]}
    out = model.inference(batch, truncation_psi=args.truncation_psi,
                          seed=(args.seed if args.seed >= 0 else None))
    u8 = to_uint8(out[0])
    full = np.asarray(Image.fromarray(u8).resize(
        (img.shape[1], img.shape[0]), Image.BICUBIC))
    save_image_rgb(args.img_out, full)
    print("Successfully generated image", args.img_out)
    return full


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True)
    p.add_argument("--img_in", required=True)
    p.add_argument("--mask_in", required=True)
    p.add_argument("--img_out", required=True)
    p.add_argument("--truncation_psi", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--cpu", action="store_true")
    inference(p.parse_args())
