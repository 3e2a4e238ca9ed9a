"""Port the MiDaS v2.1 small checkpoint (midas_v21_small, torch.hub
"intel-isl/MiDaS" / "MiDaS_small") to the flax MidasSmall
(joligen_tpu/utils/midas.py; reference models/modules/utils.py:240 downloads
the same file for depth conditioning).

Run on a machine WITH the checkpoint:

    python tools/port_midas_weights.py                  # via torch.hub
    python tools/port_midas_weights.py midas_v21_small.pt out.npz

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/midas_small.npz``.

Encoder: MidasNet_small wraps tf_efficientnet_lite3 as
pretrained.layer1 = Sequential(conv_stem, bn1, act1, blocks[0], blocks[1]),
layer2 = blocks[2], layer3 = blocks[3:5], layer4 = blocks[5:7] — keys below
re-map those Sequential indices back to (stage, repeat) and fold BN
(eps 1e-3) like the other EfficientNet porter. Decoder convs copy directly.
"""

import sys

import numpy as np

# lite3 stages: (out_ch, kernel, stride, repeats, expand)
STAGES = ((24, 3, 1, 1, 1), (32, 3, 2, 3, 6), (48, 5, 2, 3, 6),
          (96, 3, 2, 5, 6), (136, 5, 1, 5, 6), (232, 5, 2, 6, 6),
          (384, 3, 1, 1, 6))
# (midas layer, sequential index) for each encoder stage 0..6
_STAGE_AT = [("layer1", 3), ("layer1", 4), ("layer2", 0), ("layer3", 0),
             ("layer3", 1), ("layer4", 0), ("layer4", 1)]


def fold(w, bn_prefix, sd, eps=1e-3):
    scale = sd[f"{bn_prefix}.weight"] / np.sqrt(
        sd[f"{bn_prefix}.running_var"] + eps)
    w_f = w * scale[:, None, None, None]
    b_f = sd[f"{bn_prefix}.bias"] - sd[f"{bn_prefix}.running_mean"] * scale
    return np.transpose(w_f, (2, 3, 1, 0)), b_f


def t(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def map_state_dict(sd):
    out = {}
    out["pretrained.stem.kernel"], out["pretrained.stem.bias"] = fold(
        sd["pretrained.layer1.0.weight"], "pretrained.layer1.1", sd)
    for si, (_, _, _, reps, e) in enumerate(STAGES):
        layer, idx = _STAGE_AT[si]
        for ri in range(reps):
            p = f"pretrained.{layer}.{idx}.{ri}."
            q = f"pretrained.b{si}_{ri}."
            if e == 1:
                out[q + "dw.kernel"], out[q + "dw.bias"] = fold(
                    sd[p + "conv_dw.weight"], p + "bn1", sd)
                out[q + "project.kernel"], out[q + "project.bias"] = fold(
                    sd[p + "conv_pw.weight"], p + "bn2", sd)
            else:
                out[q + "expand.kernel"], out[q + "expand.bias"] = fold(
                    sd[p + "conv_pw.weight"], p + "bn1", sd)
                out[q + "dw.kernel"], out[q + "dw.bias"] = fold(
                    sd[p + "conv_dw.weight"], p + "bn2", sd)
                out[q + "project.kernel"], out[q + "project.bias"] = fold(
                    sd[p + "conv_pwl.weight"], p + "bn3", sd)
    for i in range(1, 5):
        out[f"layer{i}_rn.kernel"] = t(sd[f"scratch.layer{i}_rn.weight"])
        rn = f"scratch.refinenet{i}."
        q = f"refinenet{i}."
        for rcu, tname in (("rcu1", "resConfUnit1"), ("rcu2", "resConfUnit2")):
            for conv in ("conv1", "conv2"):
                out[f"{q}{rcu}.{conv}.kernel"] = t(
                    sd[f"{rn}{tname}.{conv}.weight"])
                out[f"{q}{rcu}.{conv}.bias"] = sd[f"{rn}{tname}.{conv}.bias"]
        out[q + "out_conv.kernel"] = t(sd[rn + "out_conv.weight"])
        out[q + "out_conv.bias"] = sd[rn + "out_conv.bias"]
    for i in (0, 2, 4):
        out[f"output_conv{i}.kernel"] = t(
            sd[f"scratch.output_conv.{i}.weight"])
        out[f"output_conv{i}.bias"] = sd[f"scratch.output_conv.{i}.bias"]
    # refinenet4 takes a single input: its rcu1 exists upstream but is
    # unused; drop it if present so tree structures match
    out.pop("refinenet4.rcu1.conv1.kernel", None)
    out.pop("refinenet4.rcu1.conv1.bias", None)
    out.pop("refinenet4.rcu1.conv2.kernel", None)
    out.pop("refinenet4.rcu1.conv2.bias", None)
    return out


def main(argv):
    import torch

    if len(argv) <= 1:
        model = torch.hub.load("intel-isl/MiDaS", "MiDaS_small")
        sd = model.state_dict()
        dst = argv[0] if argv else "midas_small.npz"
    else:
        sd = torch.load(argv[0], map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        dst = argv[1]
    sd = {k: np.asarray(v) for k, v in sd.items()}
    np.savez(dst, **map_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
