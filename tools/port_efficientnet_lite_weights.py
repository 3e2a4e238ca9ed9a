"""Port timm tf_efficientnet_lite0 weights to the projected-D frozen trunk
(joligen_tpu/models/modules/projected_d.EfficientNetLiteTrunk; reference
models/modules/projected_d/projector.py builds the same timm backbone).

Run on a machine WITH timm / the checkpoint:

    python tools/port_efficientnet_lite_weights.py                 # via timm
    python tools/port_efficientnet_lite_weights.py lite0.pth out.npz

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/efficientnet_lite0.npz``.

BatchNorm (eps 1e-3, tf_ variants) folds into each conv:
    w' = w * gamma / sqrt(var + eps);  b' = beta - mean * gamma / sqrt(var+eps)
Kernels transpose OIHW -> HWIO. Key contract: ``stem.{kernel,bias}`` and
``b{stage}_{rep}.{expand,dw,project}.{kernel,bias}`` (no ``expand`` for the
expand-1 stage 0 block).
"""

import sys

import numpy as np

# (out_ch, kernel, stride, repeats, expand) — must match _LITE0_STAGES
STAGES = ((16, 3, 1, 1, 1), (24, 3, 2, 2, 6), (40, 5, 2, 2, 6),
          (80, 3, 2, 3, 6), (112, 5, 1, 3, 6), (192, 5, 2, 4, 6),
          (320, 3, 1, 1, 6))


def fold(w, bn_prefix, sd, eps=1e-3):
    gamma = sd[f"{bn_prefix}.weight"]
    beta = sd[f"{bn_prefix}.bias"]
    mean = sd[f"{bn_prefix}.running_mean"]
    var = sd[f"{bn_prefix}.running_var"]
    scale = gamma / np.sqrt(var + eps)
    w_f = w * scale[:, None, None, None]          # scale output channels
    b_f = beta - mean * scale
    return np.transpose(w_f, (2, 3, 1, 0)), b_f   # OIHW -> HWIO


def map_state_dict(sd, eps=1e-3):
    out = {}
    out["stem.kernel"], out["stem.bias"] = fold(
        sd["conv_stem.weight"], "bn1", sd, eps)
    for si, (_, _, _, reps, expand) in enumerate(STAGES):
        for ri in range(reps):
            p = f"blocks.{si}.{ri}."
            q = f"b{si}_{ri}."
            if expand == 1:  # DepthwiseSeparableConv: dw(bn1), pw(bn2)
                out[q + "dw.kernel"], out[q + "dw.bias"] = fold(
                    sd[p + "conv_dw.weight"], p + "bn1", sd, eps)
                out[q + "project.kernel"], out[q + "project.bias"] = fold(
                    sd[p + "conv_pw.weight"], p + "bn2", sd, eps)
            else:  # InvertedResidual: pw(bn1), dw(bn2), pwl(bn3)
                out[q + "expand.kernel"], out[q + "expand.bias"] = fold(
                    sd[p + "conv_pw.weight"], p + "bn1", sd, eps)
                out[q + "dw.kernel"], out[q + "dw.bias"] = fold(
                    sd[p + "conv_dw.weight"], p + "bn2", sd, eps)
                out[q + "project.kernel"], out[q + "project.bias"] = fold(
                    sd[p + "conv_pwl.weight"], p + "bn3", sd, eps)
    return out


def main(argv):
    import torch

    if len(argv) <= 1:
        import timm
        model = timm.create_model("tf_efficientnet_lite0", pretrained=True)
        sd = model.state_dict()
        dst = argv[0] if argv else "efficientnet_lite0.npz"
    else:
        sd = torch.load(argv[0], map_location="cpu")
        dst = argv[1]
    sd = {k: v.numpy() for k, v in sd.items()}
    np.savez(dst, **map_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
