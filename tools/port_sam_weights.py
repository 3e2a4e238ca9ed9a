"""Port a SAM checkpoint to the flax SamModel (joligen_tpu/utils/sam.py).

Consumes the HuggingFace layout (``facebook/sam-vit-base`` — the same
weights as the original sam_vit_b .pth, re-keyed by HF). Run on a machine
WITH transformers weights access:

    python tools/port_sam_weights.py                    # downloads HF base
    python tools/port_sam_weights.py pytorch_model.bin out.npz

then drop into ``$JOLIGEN_TPU_WEIGHTS_DIR/sam_vit.npz``.

The key mapping below is validated bit-for-bit against a random
``transformers.SamModel`` in tests/test_numerical_parity.py.
"""

import sys

import numpy as np


def _dense(sd, tname):
    return {"kernel": sd[tname + ".weight"].T, "bias": sd[tname + ".bias"]}


def _ln(sd, tname):
    return {"scale": sd[tname + ".weight"], "bias": sd[tname + ".bias"]}


def _attn(sd, tname):
    return {f"{p}_proj": _dense(sd, f"{tname}.{p}_proj")
            for p in ("q", "k", "v", "out")}


def map_state_dict(sd):
    """HF SamModel state dict -> flax param tree (nested dicts)."""
    out = {"vision_encoder": {}, "prompt_encoder": {}, "mask_decoder": {}}
    ve = out["vision_encoder"]
    ve["patch_embed"] = {
        "kernel": np.transpose(
            sd["vision_encoder.patch_embed.projection.weight"], (2, 3, 1, 0)),
        "bias": sd["vision_encoder.patch_embed.projection.bias"]}
    ve["pos_embed"] = sd["vision_encoder.pos_embed"]
    i = 0
    while f"vision_encoder.layers.{i}.layer_norm1.weight" in sd:
        p = f"vision_encoder.layers.{i}."
        ve[f"layer{i}"] = {
            "ln1": _ln(sd, p + "layer_norm1"),
            "ln2": _ln(sd, p + "layer_norm2"),
            "attn": {"qkv": _dense(sd, p + "attn.qkv"),
                     "proj": _dense(sd, p + "attn.proj"),
                     "rel_pos_h": sd[p + "attn.rel_pos_h"],
                     "rel_pos_w": sd[p + "attn.rel_pos_w"]},
            "lin1": _dense(sd, p + "mlp.lin1"),
            "lin2": _dense(sd, p + "mlp.lin2"),
        }
        i += 1
    ve["neck_conv1"] = {"kernel": np.transpose(
        sd["vision_encoder.neck.conv1.weight"], (2, 3, 1, 0))}
    ve["neck_ln1"] = _ln(sd, "vision_encoder.neck.layer_norm1")
    ve["neck_conv2"] = {"kernel": np.transpose(
        sd["vision_encoder.neck.conv2.weight"], (2, 3, 1, 0))}
    ve["neck_ln2"] = _ln(sd, "vision_encoder.neck.layer_norm2")

    pe = out["prompt_encoder"]
    pe["pe_table"] = sd["shared_image_embedding.positional_embedding"]
    pe["point_embed"] = np.concatenate(
        [sd[f"prompt_encoder.point_embed.{j}.weight"] for j in range(4)], 0)
    pe["not_a_point"] = sd["prompt_encoder.not_a_point_embed.weight"]
    pe["no_mask"] = sd["prompt_encoder.no_mask_embed.weight"]

    md = out["mask_decoder"]
    md["iou_token"] = sd["mask_decoder.iou_token.weight"]
    md["mask_tokens"] = sd["mask_decoder.mask_tokens.weight"]
    i = 0
    while f"mask_decoder.transformer.layers.{i}.layer_norm1.weight" in sd:
        p = f"mask_decoder.transformer.layers.{i}."
        md[f"block{i}"] = {
            "self_attn": _attn(sd, p + "self_attn"),
            "cross_t2i": _attn(sd, p + "cross_attn_token_to_image"),
            "cross_i2t": _attn(sd, p + "cross_attn_image_to_token"),
            "ln1": _ln(sd, p + "layer_norm1"),
            "ln2": _ln(sd, p + "layer_norm2"),
            "ln3": _ln(sd, p + "layer_norm3"),
            "ln4": _ln(sd, p + "layer_norm4"),
            "mlp_lin1": _dense(sd, p + "mlp.lin1"),
            "mlp_lin2": _dense(sd, p + "mlp.lin2"),
        }
        i += 1
    md["final_t2i"] = _attn(
        sd, "mask_decoder.transformer.final_attn_token_to_image")
    md["ln_final"] = _ln(
        sd, "mask_decoder.transformer.layer_norm_final_attn")
    # torch ConvTranspose2d weight (in, out, kh, kw); flax ConvTranspose
    # kernel (kh, kw, in, out) — non-flipped (validated in the parity test)
    for j in (1, 2):
        w = sd[f"mask_decoder.upscale_conv{j}.weight"]
        md[f"upscale_conv{j}"] = {
            "kernel": np.transpose(w, (2, 3, 0, 1)),
            "bias": sd[f"mask_decoder.upscale_conv{j}.bias"]}
    md["upscale_ln"] = _ln(sd, "mask_decoder.upscale_layer_norm")
    n = 0
    while f"mask_decoder.output_hypernetworks_mlps.{n}.proj_in.weight" in sd:
        p = f"mask_decoder.output_hypernetworks_mlps.{n}."
        md[f"hyper{n}"] = {
            "proj_in": _dense(sd, p + "proj_in"),
            "proj_out": _dense(sd, p + "proj_out"),
        }
        j = 0
        while f"{p}layers.{j}.weight" in sd:
            md[f"hyper{n}"][f"layer{j}"] = _dense(sd, f"{p}layers.{j}")
            j += 1
        n += 1
    md["iou_head"] = {"proj_in": _dense(sd, "mask_decoder.iou_prediction_head.proj_in"),
                      "proj_out": _dense(sd, "mask_decoder.iou_prediction_head.proj_out")}
    j = 0
    while f"mask_decoder.iou_prediction_head.layers.{j}.weight" in sd:
        md["iou_head"][f"layer{j}"] = _dense(
            sd, f"mask_decoder.iou_prediction_head.layers.{j}")
        j += 1
    return out


def flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten(v, key))
        else:
            flat[key] = v
    return flat


def config_entries(hf_config):
    """Scalar config entries stored alongside the weights so the flax
    loader can rebuild any SAM variant (base/large/huge or test-tiny)."""
    v = hf_config.vision_config
    m = hf_config.mask_decoder_config
    return {
        "cfg_image_size": v.image_size, "cfg_patch": v.patch_size,
        "cfg_vis_dim": v.hidden_size, "cfg_vis_layers": v.num_hidden_layers,
        "cfg_vis_heads": v.num_attention_heads, "cfg_vis_mlp": v.mlp_dim,
        "cfg_window": v.window_size,
        "cfg_global_idx": np.asarray(v.global_attn_indexes, np.int32),
        "cfg_out_ch": v.output_channels, "cfg_dec_mlp": m.mlp_dim,
        "cfg_dec_heads": m.num_attention_heads,
        "cfg_iou_hidden": m.iou_head_hidden_dim,
    }


def main(argv):
    import torch

    if len(argv) <= 1:
        from transformers import SamModel
        model = SamModel.from_pretrained("facebook/sam-vit-base")
        sd = model.state_dict()
        cfg = config_entries(model.config)
        dst = argv[0] if argv else "sam_vit.npz"
    else:
        sd = torch.load(argv[0], map_location="cpu")
        cfg = {}  # raw state dicts are assumed ViT-B (flax defaults)
        dst = argv[1]
    sd = {k: np.asarray(v) for k, v in sd.items()}
    np.savez(dst, **flatten(map_state_dict(sd)), **cfg)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
