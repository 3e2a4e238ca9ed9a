"""Port the MLSD-large checkpoint (mlsd_large_512_fp32.pth,
lllyasviel/ControlNet annotator — reference sketch_generation/mlsd.py
downloads it) to the flax MLSD (joligen_tpu/utils/mlsd.py).

Run on a machine WITH the checkpoint:

    python tools/port_mlsd_weights.py mlsd_large_512_fp32.pth out.npz

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/mlsd_large.npz``.

BatchNorm (default eps 1e-5) folds into each conv.
"""

import sys

import numpy as np

_MBV2 = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
         (6, 96, 3, 1))


def fold(w, bn_prefix, sd, eps=1e-5, conv_bias=None):
    """BN fold; decoder convs carry their own bias (conv_bias), backbone
    convs do not."""
    scale = sd[f"{bn_prefix}.weight"] / np.sqrt(
        sd[f"{bn_prefix}.running_var"] + eps)
    w_f = w * scale[:, None, None, None]
    b0 = 0.0 if conv_bias is None else conv_bias
    b_f = sd[f"{bn_prefix}.bias"] + (b0 - sd[f"{bn_prefix}.running_mean"])         * scale
    return np.transpose(w_f, (2, 3, 1, 0)), b_f


def t(w):
    return np.transpose(w, (2, 3, 1, 0))


def map_state_dict(sd):
    out = {}
    out["stem/kernel"], out["stem/bias"] = fold(
        sd["backbone.features.0.0.weight"], "backbone.features.0.1", sd)
    fi = 1
    for si, (texp, c, n, s) in enumerate(_MBV2):
        for ri in range(n):
            p = f"backbone.features.{fi}.conv"
            q = f"b{si}_{ri}"
            if texp == 1:  # dw ConvBNReLU (conv.0), pw conv.1 + bn conv.2
                out[f"{q}/dw/kernel"], out[f"{q}/dw/bias"] = fold(
                    sd[f"{p}.0.0.weight"], f"{p}.0.1", sd)
                out[f"{q}/project/kernel"], out[f"{q}/project/bias"] = fold(
                    sd[f"{p}.1.weight"], f"{p}.2", sd)
            else:  # pw ConvBNReLU conv.0, dw ConvBNReLU conv.1, pwl conv.2+3
                out[f"{q}/expand/kernel"], out[f"{q}/expand/bias"] = fold(
                    sd[f"{p}.0.0.weight"], f"{p}.0.1", sd)
                out[f"{q}/dw/kernel"], out[f"{q}/dw/bias"] = fold(
                    sd[f"{p}.1.0.weight"], f"{p}.1.1", sd)
                out[f"{q}/project/kernel"], out[f"{q}/project/bias"] = fold(
                    sd[f"{p}.2.weight"], f"{p}.3", sd)
            fi += 1
    # decoder: BlockTypeA (conv1 on deep input b, conv2 on lateral a),
    # BlockTypeB, BlockTypeC — their convs have bias=True
    for idx in (15, 16, 17, 18, 19, 20, 21, 22, 23):
        for conv in ("conv1", "conv2"):
            out[f"block{idx}_{conv}/kernel"], out[f"block{idx}_{conv}/bias"] \
                = fold(sd[f"block{idx}.{conv}.0.weight"],
                       f"block{idx}.{conv}.1", sd,
                       conv_bias=sd[f"block{idx}.{conv}.0.bias"])
    out["block23_conv3/kernel"] = t(sd["block23.conv3.weight"])
    out["block23_conv3/bias"] = sd["block23.conv3.bias"]
    return out


def main(src, dst):
    import torch

    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}
    np.savez(dst, **map_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
