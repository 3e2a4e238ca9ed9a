"""Port DINOv2 ViT-B/14 weights to the flax encoder used by the DINOv2
metric (joligen_tpu/utils/dinov2.py; reference util/dino_metric.py loads
the same model from torch.hub).

Run on a machine WITH network access (this sandbox has none):

    python tools/port_dinov2_weights.py out.npz
    # or from a local state_dict:
    python tools/port_dinov2_weights.py dinov2_vitb14_pretrain.pth out.npz

then drop the npz into ``$JOLIGEN_TPU_WEIGHTS_DIR/dinov2_vitb14.npz``.

Key contract (consumed by load_dinov2_params):
    cls_token (1,1,D), pos_embed (1,1370,D),
    patch_embed.kernel (14,14,3,D) HWIO, patch_embed.bias (D,),
    block{i}.norm{1,2}.{scale,bias}, block{i}.attn.{qkv_w,qkv_b,
    proj_w,proj_b} (torch (out,in) layout), block{i}.{ls1,ls2},
    block{i}.fc{1,2}.{kernel,bias} (kernel transposed to (in,out)),
    norm.{scale,bias}.
"""

import sys

import numpy as np


def main(argv):
    import torch

    if len(argv) == 1:
        model = torch.hub.load("facebookresearch/dinov2", "dinov2_vitb14")
        sd = model.state_dict()
        dst = argv[0]
    else:
        sd = torch.load(argv[0], map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        dst = argv[1]
    sd = {k: v.numpy() for k, v in sd.items()}

    out = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        # torch OIHW -> flax HWIO
        "patch_embed.kernel": sd["patch_embed.proj.weight"].transpose(
            2, 3, 1, 0),
        "patch_embed.bias": sd["patch_embed.proj.bias"],
        "norm.scale": sd["norm.weight"],
        "norm.bias": sd["norm.bias"],
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        p = f"blocks.{i}."
        q = f"block{i}."
        out[q + "norm1.scale"] = sd[p + "norm1.weight"]
        out[q + "norm1.bias"] = sd[p + "norm1.bias"]
        out[q + "norm2.scale"] = sd[p + "norm2.weight"]
        out[q + "norm2.bias"] = sd[p + "norm2.bias"]
        out[q + "attn.qkv_w"] = sd[p + "attn.qkv.weight"]
        out[q + "attn.qkv_b"] = sd[p + "attn.qkv.bias"]
        out[q + "attn.proj_w"] = sd[p + "attn.proj.weight"]
        out[q + "attn.proj_b"] = sd[p + "attn.proj.bias"]
        out[q + "ls1"] = sd[p + "ls1.gamma"]
        out[q + "ls2"] = sd[p + "ls2.gamma"]
        out[q + "fc1.kernel"] = sd[p + "mlp.fc1.weight"].T
        out[q + "fc1.bias"] = sd[p + "mlp.fc1.bias"]
        out[q + "fc2.kernel"] = sd[p + "mlp.fc2.weight"].T
        out[q + "fc2.bias"] = sd[p + "mlp.fc2.bias"]
        i += 1
    np.savez(dst, **out)
    print(f"wrote {dst}: {i} blocks, dim {out['cls_token'].shape[-1]}")


if __name__ == "__main__":
    main(sys.argv[1:])
