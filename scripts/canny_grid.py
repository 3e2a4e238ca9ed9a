"""Render a grid of Canny edge maps over a (low, high) threshold product to
pick sketch-conditioning thresholds (reference scripts/canny_grid.py, built
with matplotlib there; a plain PIL montage here)."""

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw


def make_grid(image, thresholds=(0, 255), n_steps=5, tile=192):
    import cv2
    ts = np.linspace(thresholds[0], thresholds[1], n_steps).astype(int)
    label_h = 20
    W, H = n_steps * tile, n_steps * (tile + label_h)
    canvas = Image.new("RGB", (W, H), "white")
    draw = ImageDraw.Draw(canvas)
    for yi, t2 in enumerate(ts):
        for xi, t1 in enumerate(ts):
            edges = cv2.Canny(image, int(t1), int(t2))
            im = Image.fromarray(edges).convert("RGB").resize(
                (tile, tile), Image.NEAREST)
            x0, y0 = xi * tile, yi * (tile + label_h)
            canvas.paste(im, (x0, y0 + label_h))
            draw.text((x0 + 4, y0 + 4), f"low={t1} high={t2}", fill="black")
    return canvas


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_in", required=True)
    p.add_argument("--img_out", default="canny_grid.png")
    p.add_argument("--thresholds", type=int, nargs=2, default=[0, 255])
    p.add_argument("--n_steps", type=int, default=5)
    a = p.parse_args()
    img = np.asarray(Image.open(a.img_in).convert("RGB"))
    grid = make_grid(img, tuple(a.thresholds), a.n_steps)
    grid.save(a.img_out)
    print("wrote", os.path.abspath(a.img_out))


if __name__ == "__main__":
    main()
