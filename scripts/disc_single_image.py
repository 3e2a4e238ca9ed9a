"""Score a single image with a trained discriminator (reference
scripts/disc_single_image.py): loads the D checkpoint alongside the G and
prints per-discriminator realness scores."""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import load_image_rgb, load_model_from_file, to_m1p1  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True,
                   help="any checkpoint in the run dir (D nets are loaded "
                        "from the same prefix)")
    p.add_argument("--img_in", required=True)
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()

    model, opt = load_model_from_file(a.model_in_file, cpu=a.cpu)
    img = load_image_rgb(a.img_in)
    from PIL import Image
    size = opt.data_crop_size
    x = to_m1p1(np.asarray(Image.fromarray(img).resize((size, size),
                                                       Image.BICUBIC)))[None]
    netDs = getattr(model, "netDs", None)
    assert netDs, f"model type {opt.model_type} has no discriminators"
    import jax
    scores = {}
    for name, netD in netDs.items():
        pred = jax.jit(lambda p, x: netD.apply(p, x))(
            model.states[name].params, x)
        scores[name] = float(np.mean(np.asarray(pred)))
    print(json.dumps(scores))
    return scores


if __name__ == "__main__":
    main()
