"""Port torchvision ResNet-18/34/50 ImageNet weights to the flax classifier
template (joligen_tpu/models/modules/semantic_networks.ResNetTemplate;
reference classifiers.py:249-260 torch_model consumes the same torchvision
models with a rewired fc head).

Run on a machine WITH torchvision:

    python tools/port_torchvision_resnet_weights.py resnet18 [out.npz]
    python tools/port_torchvision_resnet_weights.py resnet50 ckpt.pth out.npz

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/resnet{18,34,50}_tv.npz``.

BatchNorm is folded into per-channel affines (FrozenBN): scale =
gamma / sqrt(var + eps), bias = beta - mean * scale; conv kernels transpose
OIHW -> HWIO verbatim. The fc head is NOT exported — the reference always
replaces it with a fresh nclasses Linear (classifiers.py:254).
"""

import sys

import numpy as np

_EPS = 1e-5
_BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
           "resnet50": (3, 4, 6, 3)}
_BOTTLENECK = {"resnet18": False, "resnet34": False, "resnet50": True}


def _fold_bn(sd, prefix):
    g = np.asarray(sd[prefix + ".weight"])
    b = np.asarray(sd[prefix + ".bias"])
    mean = np.asarray(sd[prefix + ".running_mean"])
    var = np.asarray(sd[prefix + ".running_var"])
    scale = g / np.sqrt(var + _EPS)
    return {"scale": scale, "bias": b - mean * scale}


def _conv(sd, key):
    return {"kernel": np.transpose(np.asarray(sd[key + ".weight"]),
                                   (2, 3, 1, 0))}


def map_state_dict(sd, variant):
    out = {"conv1": _conv(sd, "conv1")}
    out["bn1"] = _fold_bn(sd, "bn1")
    nconvs = 3 if _BOTTLENECK[variant] else 2
    for si, n in enumerate(_BLOCKS[variant]):
        for bi in range(n):
            t = f"layer{si + 1}.{bi}"
            q = f"layer{si + 1}_{bi}"
            for ci in range(1, nconvs + 1):
                out[f"{q}_conv{ci}"] = _conv(sd, f"{t}.conv{ci}")
                out[f"{q}_bn{ci}"] = _fold_bn(sd, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                out[f"{q}_down"] = _conv(sd, f"{t}.downsample.0")
                out[f"{q}_downbn"] = _fold_bn(sd, f"{t}.downsample.1")
    return {f"{k}/{leaf}": v for k, d in out.items() for leaf, v in d.items()}


def main(argv):
    variant = argv[0]
    assert variant in _BLOCKS, f"variant must be one of {sorted(_BLOCKS)}"
    if len(argv) <= 2:
        import torchvision.models as tvm
        sd = getattr(tvm, variant)(weights="IMAGENET1K_V1").state_dict()
        dst = argv[1] if len(argv) > 1 else f"{variant}_tv.npz"
    else:
        import torch
        sd = torch.load(argv[1], map_location="cpu")
        dst = argv[2]
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    np.savez(dst, **map_state_dict(sd, variant))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
