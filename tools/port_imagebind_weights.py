"""Port the ImageBind (imagebind_huge) VISION branch to the flax tower
(joligen_tpu/utils/image_bind.py; reference palette_denoise_fn.py:83-85
consumes the frozen vision trunk for ref-image conditioning).

Run on a machine WITH the imagebind_huge.pth checkpoint:

    python tools/port_imagebind_weights.py imagebind_huge.pth [out.npz]

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/imagebind_vision.npz``.

The reference rgbt stem is a Conv3d (kernel (2,14,14), stride same, no
bias) over a 2-frame repeat of the image (PadIm2Video, reference
image_bind/imagebind_model.py:156-166). Identical frames make the temporal
conv an exact sum over the temporal kernel axis, so the port folds it into
a 2D kernel: w2d = w3d[:, :, 0] + w3d[:, :, 1].
"""

import sys

import numpy as np


def map_state_dict(sd):
    """sd: full ImageBindModel state dict (or any dict holding the
    modality_preprocessors/trunks/heads 'vision' keys)."""
    pre = "modality_preprocessors.vision."
    trunk = "modality_trunks.vision."
    head = "modality_heads.vision."
    w3d = np.asarray(sd[pre + "rgbt_stem.proj.1.weight"])  # (D,3,T,14,14)
    w2d = w3d.sum(axis=2)                                  # fold T (repeat)
    out = {
        "patch_conv.kernel": np.transpose(w2d, (2, 3, 1, 0)),  # HWIO
        "cls_token": np.asarray(sd[pre + "cls_token"]),
        "pos_embed": np.asarray(
            sd[pre + "pos_embedding_helper.pos_embed"]),
        "pre_ln.scale": np.asarray(
            sd[trunk + "pre_transformer_layer.0.weight"]),
        "pre_ln.bias": np.asarray(
            sd[trunk + "pre_transformer_layer.0.bias"]),
        "head_ln.scale": np.asarray(sd[head + "0.weight"]),
        "head_ln.bias": np.asarray(sd[head + "0.bias"]),
        "head_proj": np.asarray(sd[head + "2.weight"]).T,
    }
    i = 0
    while trunk + f"blocks.{i}.norm_1.weight" in sd:
        p = trunk + f"blocks.{i}."
        q = f"block{i}."
        out[q + "norm_1.scale"] = np.asarray(sd[p + "norm_1.weight"])
        out[q + "norm_1.bias"] = np.asarray(sd[p + "norm_1.bias"])
        out[q + "norm_2.scale"] = np.asarray(sd[p + "norm_2.weight"])
        out[q + "norm_2.bias"] = np.asarray(sd[p + "norm_2.bias"])
        out[q + "attn.qkv_w"] = np.asarray(sd[p + "attn.in_proj_weight"])
        out[q + "attn.qkv_b"] = np.asarray(sd[p + "attn.in_proj_bias"])
        out[q + "attn.proj_w"] = np.asarray(sd[p + "attn.out_proj.weight"])
        out[q + "attn.proj_b"] = np.asarray(sd[p + "attn.out_proj.bias"])
        out[q + "fc1.kernel"] = np.asarray(sd[p + "mlp.fc1.weight"]).T
        out[q + "fc1.bias"] = np.asarray(sd[p + "mlp.fc1.bias"])
        out[q + "fc2.kernel"] = np.asarray(sd[p + "mlp.fc2.weight"]).T
        out[q + "fc2.bias"] = np.asarray(sd[p + "mlp.fc2.bias"])
        i += 1
    assert i > 0, "no vision trunk blocks found in the state dict"
    return out


def main(argv):
    import torch
    sd = torch.load(argv[0], map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.float().numpy() for k, v in sd.items()
          if ".vision" in k or "vision." in k}
    dst = argv[1] if len(argv) > 1 else "imagebind_vision.npz"
    np.savez(dst, **map_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
