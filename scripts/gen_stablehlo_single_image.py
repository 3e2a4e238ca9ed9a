"""Run an exported StableHLO generator artifact on one image — the analog
of reference scripts/gen_jit_single_image.py (TorchScript) and
gen_dd_single_image.py (DeepDetect): inference straight from the exported
artifact, no model rebuild.

    python scripts/export_model.py --model_in_file ckpt/latest_net_G_A.pth
    python scripts/gen_stablehlo_single_image.py \
        --model_in_file ckpt/G_A.stablehlo --img_in in.png --img_out out.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import load_image_rgb, save_image_rgb, to_m1p1, to_uint8  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True,
                   help=".stablehlo artifact from export_model.py")
    p.add_argument("--img_in", required=True)
    p.add_argument("--img_out", required=True)
    p.add_argument("--img_size", type=int, default=0,
                   help="defaults to the artifact's compiled input size")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()

    # the sitecustomize on TPU hosts force-selects the tunnel platform, so
    # env JAX_PLATFORMS / --cpu must be applied at the config level
    plat = "cpu" if a.cpu else os.environ.get("JAX_PLATFORMS")
    import jax
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    from jax import export as jexport

    with open(a.model_in_file, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    in_aval = exported.in_avals[0]
    size = a.img_size or in_aval.shape[1]

    from PIL import Image
    orig = load_image_rgb(a.img_in)
    x = to_m1p1(np.asarray(Image.fromarray(orig).resize(
        (size, size), Image.BICUBIC)))[None].astype(in_aval.dtype)
    args = [jnp.asarray(x)]
    if len(exported.in_avals) > 1:  # denoiser artifacts also take t
        args.append(jnp.zeros(exported.in_avals[1].shape,
                              exported.in_avals[1].dtype))
    out = np.asarray(exported.call(*args))
    if isinstance(out, (list, tuple)):
        out = out[0]
    full = np.asarray(Image.fromarray(to_uint8(out[0])).resize(
        (orig.shape[1], orig.shape[0]), Image.BICUBIC))
    save_image_rgb(a.img_out, full)
    print("Successfully generated image", a.img_out)


if __name__ == "__main__":
    main()
