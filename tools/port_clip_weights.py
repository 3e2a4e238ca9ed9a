"""Port the OpenAI CLIP ViT-B/16 visual tower to the flax encoder
(joligen_tpu/utils/clip_vit.py; reference palette_denoise_fn.py:77-80 and
vision_aided_d.py consume the same model via the clip package).

Run on a machine WITH the clip package / checkpoint:

    python tools/port_clip_weights.py                  # clip.load("ViT-B/16")
    python tools/port_clip_weights.py ViT-B-16.pt out.npz

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/clip_vitb16.npz``.
"""

import sys

import numpy as np


def map_state_dict(sd):
    """sd: the *visual* submodule state dict (keys without 'visual.')."""
    out = {
        "conv1.kernel": np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
        "class_embedding": sd["class_embedding"],
        "positional_embedding": sd["positional_embedding"],
        "ln_pre.scale": sd["ln_pre.weight"],
        "ln_pre.bias": sd["ln_pre.bias"],
        "ln_post.scale": sd["ln_post.weight"],
        "ln_post.bias": sd["ln_post.bias"],
        "proj": sd["proj"],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        p = f"transformer.resblocks.{i}."
        q = f"block{i}."
        out[q + "ln_1.scale"] = sd[p + "ln_1.weight"]
        out[q + "ln_1.bias"] = sd[p + "ln_1.bias"]
        out[q + "ln_2.scale"] = sd[p + "ln_2.weight"]
        out[q + "ln_2.bias"] = sd[p + "ln_2.bias"]
        out[q + "attn.qkv_w"] = sd[p + "attn.in_proj_weight"]
        out[q + "attn.qkv_b"] = sd[p + "attn.in_proj_bias"]
        out[q + "attn.proj_w"] = sd[p + "attn.out_proj.weight"]
        out[q + "attn.proj_b"] = sd[p + "attn.out_proj.bias"]
        out[q + "c_fc.kernel"] = sd[p + "mlp.c_fc.weight"].T
        out[q + "c_fc.bias"] = sd[p + "mlp.c_fc.bias"]
        out[q + "c_proj.kernel"] = sd[p + "mlp.c_proj.weight"].T
        out[q + "c_proj.bias"] = sd[p + "mlp.c_proj.bias"]
        i += 1
    return out


def main(argv):
    import torch

    if len(argv) <= 1:
        import clip
        model, _ = clip.load("ViT-B/16", device="cpu")
        sd = model.visual.float().state_dict()
        dst = argv[0] if argv else "clip_vitb16.npz"
    else:
        sd = torch.load(argv[0], map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}
        dst = argv[1]
    sd = {k: np.asarray(v.float()) for k, v in sd.items()}
    np.savez(dst, **map_state_dict(sd))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
