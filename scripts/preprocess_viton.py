"""VITON-HD preprocessing into the joliGEN mask-dataset layout (reference
scripts/preprocess_viton.py): extract images from the VITON-HD zip, derive
the upper-clothes binary mask from the image-parse-v3 segmentation (the
orange [0,85,254] BGR class), optionally dilate it, and write
train/testA dirs with paths.txt 'img mask' lines.

    python scripts/preprocess_viton.py --zip-file viton_hd.zip \
        --target-dir datasets/viton [--dilate 9]
"""

from __future__ import annotations

import argparse
import os
import zipfile
from pathlib import Path

import cv2
import numpy as np


def process(image_name, zf, target_dir, dilate):
    stage = Path("trainA" if "train/" in image_name else "testA")
    basename = Path(image_name).stem

    rel_image = stage / "imgs" / (basename + ".jpg")
    (target_dir / rel_image).write_bytes(zf.read(image_name))

    parse_name = image_name.replace("/image/", "/image-parse-v3/") \
        .replace(".jpg", ".png")
    raw = zf.read(parse_name)
    seg = cv2.imdecode(np.frombuffer(raw, np.uint8), 1)
    orange = np.array([0, 85, 254])          # upper-clothes class (BGR)
    mask = np.clip(cv2.inRange(seg, orange, orange), 0, 1)
    if dilate > 1:
        mask = cv2.dilate(mask, np.ones((dilate, dilate), np.uint8))
    rel_mask = stage / "mask" / (basename + ".png")
    cv2.imwrite(str(target_dir / rel_mask), mask)

    with (target_dir / stage / "paths.txt").open("a") as f:
        f.write(f"{rel_image} {rel_mask}\n")


def main():
    p = argparse.ArgumentParser("VITON-HD dataset preprocessing")
    p.add_argument("--zip-file", required=True)
    p.add_argument("--target-dir", required=True)
    p.add_argument("--dilate", type=int, default=1)
    a = p.parse_args()

    target = Path(a.target_dir)
    for stage in ("trainA", "testA"):
        for sub in ("imgs", "mask"):
            os.makedirs(target / stage / sub, exist_ok=True)
        pt = target / stage / "paths.txt"
        if pt.exists():
            pt.unlink()

    with zipfile.ZipFile(a.zip_file) as zf:
        images = [n for n in zf.namelist()
                  if "/image/" in n and n.endswith(".jpg")]
        for i, name in enumerate(images):
            process(name, zf, target, a.dilate)
            if (i + 1) % 500 == 0:
                print(f"{i + 1}/{len(images)}")
    print(f"done: {len(images)} samples -> {a.target_dir} "
          f"(use data_dataset_mode=self_supervised_labeled_mask with "
          f"--data_relative_paths)")


if __name__ == "__main__":
    main()
