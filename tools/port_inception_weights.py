"""Port torchvision/pytorch-fid InceptionV3 weights to the flax FID trunk.

Run on a machine WITH the torchvision checkpoint (this sandbox has no
network egress, so the npz must be produced elsewhere and dropped into
``$JOLIGEN_TPU_WEIGHTS_DIR/inception_v3_fid.npz``):

    python tools/port_inception_weights.py inception_v3_google.pth out.npz

BatchNorm is folded into each conv (inference-only network):
    w' = w * gamma / sqrt(var + eps);  b' = beta - mean * gamma / sqrt(var+eps)
Conv kernels transpose OIHW -> HWIO for the NHWC flax trunk
(joligen_tpu/utils/inception.py).
"""

import sys

import numpy as np


def fold_bn(w, bn_gamma, bn_beta, bn_mean, bn_var, eps=1e-3):
    scale = bn_gamma / np.sqrt(bn_var + eps)
    w_f = w * scale[:, None, None, None]          # OIHW scale on O
    b_f = bn_beta - bn_mean * scale
    return w_f, b_f


def main(src, dst):
    import torch

    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    convs = sorted({k[: -len(".conv.weight")] for k in sd
                    if k.endswith(".conv.weight")})
    for mod in convs:
        w = sd[f"{mod}.conv.weight"].numpy()
        g = sd[f"{mod}.bn.weight"].numpy()
        b = sd[f"{mod}.bn.bias"].numpy()
        mu = sd[f"{mod}.bn.running_mean"].numpy()
        var = sd[f"{mod}.bn.running_var"].numpy()
        w_f, b_f = fold_bn(w, g, b, mu, var)
        # torchvision names like Mixed_5b.branch1x1 -> flax path
        path = mod.replace(".", "/")
        out[f"{path}/conv/kernel"] = w_f.transpose(2, 3, 1, 0)  # OIHW->HWIO
        out[f"{path}/conv/bias"] = b_f
    np.savez(dst, **out)
    print(f"wrote {len(out)} arrays to {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
