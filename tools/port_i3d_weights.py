"""Port an I3D RGB checkpoint (piergiaj/pytorch-i3d ``rgb_imagenet.pt``
layout — the canonical public I3D used by FVD implementations; the
stylegan-v i3d_torchscript.pt referenced by util/fvd.py:130 exposes the same
tensors via ``torch.jit.load(...).state_dict()``) to the flax I3D
(joligen_tpu/utils/i3d.py).

Run on a machine WITH the checkpoint:

    python tools/port_i3d_weights.py rgb_imagenet.pt out.npz

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/i3d_fvd.npz``.

BatchNorm3d (eps 1e-3) folds into each conv; kernels transpose
O,I,T,H,W -> T,H,W,I,O.
"""

import sys

import numpy as np

_UNITS = ["Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"] + [
    f"{m}.{b}" for m in ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c",
                         "Mixed_4d", "Mixed_4e", "Mixed_4f", "Mixed_5b",
                         "Mixed_5c")
    for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")]


def fold(w, sd, bn_prefix, eps=1e-3):
    gamma = sd[f"{bn_prefix}.weight"]
    beta = sd[f"{bn_prefix}.bias"]
    mean = sd[f"{bn_prefix}.running_mean"]
    var = sd[f"{bn_prefix}.running_var"]
    scale = gamma / np.sqrt(var + eps)
    w_f = w * scale[:, None, None, None, None]
    b_f = beta - mean * scale
    return np.transpose(w_f, (2, 3, 4, 1, 0)), b_f


def map_state_dict(sd):
    out = {}
    for unit in _UNITS:
        out[f"{unit}.kernel"], out[f"{unit}.bias"] = fold(
            sd[f"{unit}.conv3d.weight"], sd, f"{unit}.bn")
    # Logits: plain conv3d 1x1x1 with bias, no BN -> dense (in,out)
    w = sd["logits.conv3d.weight"]  # (400, 1024, 1, 1, 1)
    out["Logits.kernel"] = w[:, :, 0, 0, 0].T
    out["Logits.bias"] = sd["logits.conv3d.bias"]
    return out


def main(src, dst):
    import torch

    m = torch.load(src, map_location="cpu")
    if not isinstance(m, dict):
        try:  # torchscript detector (util/fvd.py variant)
            m = torch.jit.load(src, map_location="cpu").state_dict()
        except Exception:
            m = m.state_dict()
    sd = {k: v.numpy() for k, v in m.items()}
    np.savez(dst, **map_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
