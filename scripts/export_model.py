"""Export a trained generator to StableHLO (+ raw params) — the TPU-native
analog of reference scripts/export_model.py (ONNX/TorchScript).

    python scripts/export_model.py --model_in_file ckpt/latest_net_G_A.pth \
        [--img_size 256] [--dir_out exports]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import load_model_from_file  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True)
    p.add_argument("--dir_out", default="")
    p.add_argument("--img_size", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()

    model, opt = load_model_from_file(a.model_in_file, cpu=a.cpu)
    from joligen_tpu.utils.export import export_generator
    cin = opt.model_input_nc
    if opt.model_type in ("palette", "cm", "sc", "b2b"):
        print("note: diffusion exports serialize the single denoiser "
              "forward; sampling loops stay in the framework")
        cin = opt.model_input_nc + opt.model_output_nc
        # denoiser signature differs; export the GAN-style path when possible
    written = export_generator(
        model, out_dir=(a.dir_out or None),
        size=(a.img_size or None), in_channels=cin)
    for kind, path in written.items():
        print(f"exported {kind}: {path}")


if __name__ == "__main__":
    main()
