"""Convert a reference joliGEN checkpoint to this framework's format.

Usage (diffusion unet_mha checkpoints — palette/cm/sc — and GAN
resnet/mobile_resnet checkpoints — cut/cycle_gan):

    python tools/convert_reference_checkpoint.py \
        --model_in_file /path/to/ckpt/latest_net_G_A.pth \
        --dir_out converted_ckpt [--cpu]

Reads the torch ``.pth`` state dict (+ ``train_config.json`` beside it,
which this framework's option parser loads unchanged), maps every tensor
onto the flax ``PaletteDenoiser(UNetMHA)`` tree, validates the tree against
a fresh model init, and writes:

- ``<dir_out>/latest_net_G_A.pth`` (+ ``_ema`` when the reference EMA file
  exists) — flax msgpack, loadable by train.py ``--train_continue_from``,
  test.py, the inference scripts, and the server;
- ``<dir_out>/train_config.json`` — the original config plus
  ``G_unet_mha_attn_norm: "instance"`` (the reference's attention pre-norm
  is a parameterless InstanceNorm1d, unet_attn_utils.py:60-66; our default
  GroupNorm is architecture-level, so converted weights must run with the
  reference-exact norm).

Mapping notes (reference models/modules/unet_generator_attn/
unet_generator_attn.py):
- block traversal order is deterministic from (res_blocks, channel_mults,
  attn_res): input_blocks / middle_block / output_blocks pair 1:1 with this
  framework's auto-numbered ResBlock_i / AttentionBlock_j;
- attention qkv is a Conv1d whose output channels are HEAD-major
  ([head][q,k,v][ch], QKVAttentionLegacy :331-363) while ours are
  QKV-major — rows are permuted accordingly;
- conv kernels transpose OIHW->HWIO, linears transpose (out,in)->(in,out);
- the reference's registered gamma-schedule buffers (train_gammas/...) are
  dropped: schedules are recomputed from the config at load.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _conv(sd, key):
    return {"kernel": np.transpose(np.asarray(sd[key + ".weight"]),
                                   (2, 3, 1, 0)),
            "bias": np.asarray(sd[key + ".bias"])}


def _linear(sd, key):
    return {"kernel": np.asarray(sd[key + ".weight"]).T,
            "bias": np.asarray(sd[key + ".bias"])}


def _gn(sd, key):
    return {"GroupNorm_0": {"scale": np.asarray(sd[key + ".weight"]),
                            "bias": np.asarray(sd[key + ".bias"])}}


def convert_resblock(sd, p):
    out = {
        "GroupNorm32_0": _gn(sd, p + ".in_layers.0.norm"),
        "in_conv": _conv(sd, p + ".in_layers.2"),
        "emb_proj": _linear(sd, p + ".emb_layers.1"),
        "GroupNorm32_1": _gn(sd, p + ".out_layers.0.norm"),
        "out_conv": _conv(sd, p + ".out_layers.3"),
    }
    if p + ".skip_connection.weight" in sd:
        out["skip"] = _conv(sd, p + ".skip_connection")
    return out


def convert_attention(sd, p, num_heads, num_head_channels):
    w = np.asarray(sd[p + ".qkv.weight"])[:, :, 0]   # (3C, C)
    b = np.asarray(sd[p + ".qkv.bias"])
    c = w.shape[1]
    heads = (num_heads if num_head_channels == -1
             else max(1, c // num_head_channels))
    hd = c // heads
    # reference rows are [head][q|k|v][ch]; ours are [q|k|v][head][ch]
    w = w.reshape(heads, 3, hd, c).transpose(1, 0, 2, 3).reshape(3 * c, c)
    b = b.reshape(heads, 3, hd).transpose(1, 0, 2).reshape(3 * c)
    proj = np.asarray(sd[p + ".proj_out.weight"])[:, :, 0]
    return {
        "qkv": {"kernel": w.T, "bias": b},
        "proj_out": {"kernel": proj.T,
                     "bias": np.asarray(sd[p + ".proj_out.bias"])},
    }


def unet_layout(res_blocks, channel_mults, attn_res):
    """(ref_prefix, kind) in the shared construction order; kind in
    {res, attn}."""
    pairs = []
    ib, ds = 1, 1
    for level in range(len(channel_mults)):
        for _ in range(res_blocks[level]):
            pairs.append((f"input_blocks.{ib}.0", "res"))
            if ds in attn_res:
                pairs.append((f"input_blocks.{ib}.1", "attn"))
            ib += 1
        if level != len(channel_mults) - 1:
            pairs.append((f"input_blocks.{ib}.0", "res"))
            ib += 1
            ds *= 2
    pairs += [("middle_block.0", "res"), ("middle_block.1", "attn"),
              ("middle_block.2", "res")]
    ob = 0
    for level in reversed(range(len(channel_mults))):
        for i in range(res_blocks[level] + 1):
            sub = 0
            pairs.append((f"output_blocks.{ob}.{sub}", "res"))
            sub += 1
            if ds in attn_res:
                pairs.append((f"output_blocks.{ob}.{sub}", "attn"))
                sub += 1
            if level and i == res_blocks[level]:
                pairs.append((f"output_blocks.{ob}.{sub}", "res"))
                ds //= 2
            ob += 1
    return pairs


def map_unet(sd, res_blocks, channel_mults, attn_res, num_heads,
             num_head_channels, prefix="denoise_fn.model."):
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    out = {"in_conv": _conv(sd, "input_blocks.0.0"),
           "GroupNorm32_0": _gn(sd, "out.0.norm"),
           "out_proj": _conv(sd, "out.2")}
    res_i = attn_i = 0
    for ref, kind in unet_layout(res_blocks, channel_mults, attn_res):
        if kind == "res":
            out[f"ResBlock_{res_i}"] = convert_resblock(sd, ref)
            res_i += 1
        else:
            out[f"AttentionBlock_{attn_i}"] = convert_attention(
                sd, ref, num_heads, num_head_channels)
            attn_i += 1
    return out


def map_uvit(sd, res_blocks, channel_mults, prefix="denoise_fn.model."):
    """Reference UViT (unet_generator_attn.py:765-1010) -> UNetMHA params
    with transformer_blocks>0. UViT has NO encoder/decoder attention,
    plain conv resampling (Downsample.op / Upsample.conv), and an
    EmbedSequential(FeedForward, AttentionBlock) middle stack on the
    CHW-memory token reshape."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    out = {"in_conv": _conv(sd, "input_blocks.0.0"),
           "GroupNorm32_0": _gn(sd, "out.0.norm"),
           "out_proj": _conv(sd, "out.2")}
    res_i = down_i = up_i = 0
    ib = 1
    for level in range(len(channel_mults)):
        for _ in range(res_blocks[level]):
            out[f"ResBlock_{res_i}"] = convert_resblock(
                sd, f"input_blocks.{ib}.0")
            res_i += 1
            ib += 1
        if level != len(channel_mults) - 1:
            out[f"Downsample_{down_i}"] = {
                "Conv_0": _conv(sd, f"input_blocks.{ib}.0.op")}
            down_i += 1
            ib += 1
    ti = 0
    while f"middle_blocks.{ti}.0.proj_in.0.weight" in sd:
        p = f"middle_blocks.{ti}"
        qkv_w = np.asarray(sd[p + ".1.qkv.weight"])[:, :, 0]
        proj_w = np.asarray(sd[p + ".1.proj_out.weight"])[:, :, 0]
        out[f"mid_t{ti}"] = {
            "ff": {
                "proj_in": {"kernel": np.asarray(
                    sd[p + ".0.proj_in.0.weight"]).T},
                "to_scale_shift": _linear(sd, p + ".0.to_scale_shift.1"),
                "proj_out": {"kernel": np.asarray(
                    sd[p + ".0.proj_out.1.weight"]).T},
            },
            "attn": {
                "qkv_kernel": qkv_w,
                "qkv_bias": np.asarray(sd[p + ".1.qkv.bias"]),
                "proj_kernel": proj_w,
                "proj_bias": np.asarray(sd[p + ".1.proj_out.bias"]),
            },
        }
        ti += 1
    ob = 0
    for level in reversed(range(len(channel_mults))):
        for i in range(res_blocks[level] + 1):
            out[f"ResBlock_{res_i}"] = convert_resblock(
                sd, f"output_blocks.{ob}.0")
            res_i += 1
            if level and i == res_blocks[level]:
                out[f"Upsample_{up_i}"] = {
                    "Conv_0": _conv(sd, f"output_blocks.{ob}.1.conv")}
                up_i += 1
            ob += 1
    return out


def map_palette_g(sd, opt):
    params = {"inner": map_unet(
        sd, list(opt.G_unet_mha_res_blocks),
        list(opt.G_unet_mha_channel_mults),
        list(opt.G_unet_mha_attn_res),
        opt.G_unet_mha_num_heads, opt.G_unet_mha_num_head_channels)}
    if "cond_embed.0.weight" in sd:
        params["cond_embed_0"] = _linear(sd, "cond_embed.0")
        params["cond_embed_1"] = _linear(sd, "cond_embed.2")
    for ref_name, our_name in (
            ("denoise_fn.netl_embedder_class.embedding_table",
             "embedder_class"),
            ("denoise_fn.netl_embedder_mask.embedding_table",
             "embedder_mask")):
        if ref_name + ".weight" in sd:
            params[our_name] = {
                "embedding": np.asarray(sd[ref_name + ".weight"])}
    return {"params": params}


def map_cm_g(sd, opt):
    """Map a reference consistency-model checkpoint (CMGenerator state
    dict, cm_generator.py:283-326: ``cm_model.*`` UNet + ``cm_cond_embed``
    NoiseLevelEmbedding :255-281) onto our CMDenoiser(inner=UNetMHA) tree.
    The Fourier W buffer copies verbatim; projection.0/2 transpose like
    every linear."""
    params = {"inner": map_unet(
        sd, list(opt.G_unet_mha_res_blocks),
        list(opt.G_unet_mha_channel_mults),
        list(opt.G_unet_mha_attn_res),
        opt.G_unet_mha_num_heads, opt.G_unet_mha_num_head_channels,
        prefix="cm_model."),
        "sigma_embed": {
            "W": np.asarray(sd["cm_cond_embed.W"]),
            "proj0": _linear(sd, "cm_cond_embed.projection.0"),
            "proj1": _linear(sd, "cm_cond_embed.projection.2"),
    }}
    return {"params": params}


def map_sc_g(sd, opt):
    """Map a reference shortcut-model checkpoint (SCGenerator state dict,
    sc_generator.py:104-135: ``sc_model.*`` UNet + ``t_embedder``/
    ``dt_embedder`` TimestepEmbedder MLPs :17-66) onto our
    SCDenoiser(inner=UNetMHA) tree."""
    return {"params": {
        "inner": map_unet(
            sd, list(opt.G_unet_mha_res_blocks),
            list(opt.G_unet_mha_channel_mults),
            list(opt.G_unet_mha_attn_res),
            opt.G_unet_mha_num_heads, opt.G_unet_mha_num_head_channels,
            prefix="sc_model."),
        "t_0": _linear(sd, "t_embedder.mlp.0"),
        "t_1": _linear(sd, "t_embedder.mlp.2"),
        "dt_0": _linear(sd, "dt_embedder.mlp.0"),
        "dt_1": _linear(sd, "dt_embedder.mlp.2"),
    }}


def map_resnet_g(sd, opt):
    """Map a reference GAN ResnetGenerator checkpoint (models/modules/
    resnet_architecture/resnet_generator.py:98-347 — encoder.model /
    decoder.model torch Sequentials) onto our ResnetGenerator tree. The
    decoder's ConvTranspose2d kernels are flipped+transposed into the
    TorchConvTranspose layout, and the emitted train_config.json sets
    G_resnet_up_mode=convtranspose so the converted model reproduces
    reference outputs exactly (the training default is resize+conv).
    InstanceNorm2d is affine=False upstream, so norms carry no tensors;
    mobile (SeparableConv2d) blocks map depthwise/pointwise pairs."""
    assert opt.G_norm == "instance", (
        f"resnet converter expects G_norm=instance (got {opt.G_norm}); "
        "batch-norm checkpoints carry running stats our GroupNorm "
        "replacement does not consume")
    mobile = "mobile" in opt.G_netG
    dropout = bool(getattr(opt, "G_dropout", False))
    enc = {"stem": _conv(sd, "encoder.model.1"),
           "down0": _conv(sd, "encoder.model.4"),
           "down1": _conv(sd, "encoder.model.7")}
    # ResnetBlock.conv_block indices (resnet_generator.py:51-90): pad(0)
    # conv(1) norm(2) relu(3) [dropout(4)] pad conv norm — dropout shifts
    # the second conv from 5 to 6
    c2 = "6" if dropout else "5"
    for i in range(opt.G_nblocks):
        p = f"encoder.model.{10 + i}.conv_block"
        blk = {}
        for ours, idx in (("conv1", "1"), ("conv2", c2)):
            if mobile:
                blk[ours] = {
                    "depthwise": _conv(sd, f"{p}.{idx}.conv.0"),
                    "pointwise": _conv(sd, f"{p}.{idx}.conv.2")}
            else:
                blk[ours] = _conv(sd, f"{p}.{idx}")
        enc[f"res{i}"] = blk
    # decoder.model: convT(0) norm relu convT(3) norm relu pad conv(7) tanh
    dec = {"head": _conv(sd, "decoder.model.7")}
    for i, idx in ((0, "0"), (1, "3")):
        w = np.asarray(sd[f"decoder.model.{idx}.weight"])  # (in,out,kh,kw)
        dec[f"up{i}"] = {
            "kernel": np.flip(np.transpose(w, (2, 3, 0, 1)),
                              axis=(0, 1)).copy(),
            "bias": np.asarray(sd[f"decoder.model.{idx}.bias"])}
    return {"params": {"encoder": enc, "decoder": dec}}


def map_nlayer_d(sd):
    """Map a reference NLayerDiscriminator state_dict (models/modules/
    discriminators.py:10-104 — a flat torch Sequential of stride-2 4x4
    convs with non-affine InstanceNorm/LeakyReLU between, so the only
    tensors are the conv weights/biases at model.<i>) onto our flax
    NLayerDiscriminator(antialias=False) tree, whose convs auto-name
    Conv_0..Conv_{n+1} in call order. Instance norms carry no tensors on
    either side; order-preserving index sort keeps the mapping valid for
    any n_layers and for dropout variants (Dropout has no tensors)."""
    idxs = sorted(
        {int(k.split(".")[1]) for k in sd
         if k.startswith("model.") and k.endswith(".weight")})
    params = {}
    for n, i in enumerate(idxs):
        params[f"Conv_{n}"] = _conv(sd, f"model.{i}")
    return {"params": params}


def _tree_check(got, want, path=""):
    if isinstance(want, dict) != isinstance(got, dict):
        raise SystemExit(f"structure mismatch at {path}")
    if isinstance(want, dict):
        missing = set(want) - set(got)
        extra = set(got) - set(want)
        if missing or extra:
            raise SystemExit(
                f"key mismatch at {path}: missing={sorted(missing)} "
                f"extra={sorted(extra)}")
        for k in want:
            _tree_check(got[k], want[k], f"{path}/{k}")
    elif tuple(np.shape(got)) != tuple(np.shape(want)):
        raise SystemExit(f"shape mismatch at {path}: "
                         f"{np.shape(got)} vs {np.shape(want)}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True,
                   help="reference <prefix>_net_G_A.pth")
    p.add_argument("--dir_out", required=True)
    p.add_argument("--train_config", default="",
                   help="default: train_config.json beside the checkpoint")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()
    if a.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import torch
    sd = torch.load(a.model_in_file, map_location="cpu",
                    weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: (v.float().numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}

    cfg_path = a.train_config or os.path.join(
        os.path.dirname(os.path.abspath(a.model_in_file)),
        "train_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)

    from joligen_tpu.options import TrainOptions
    flat = TrainOptions().parse_json(dict(cfg), verbose=False)
    import jax

    gan_family = flat.model_type in ("cut", "cycle_gan", "re_cut",
                                     "re_cycle_gan")
    if gan_family:
        assert flat.G_netG in ("resnet", "mobile_resnet", "resnet_9blocks",
                               "resnet_6blocks"), (
            "GAN conversion supports the resnet/mobile_resnet G family "
            f"(got G_netG={flat.G_netG})")
        flat.G_resnet_up_mode = "convtranspose"
        mapper = map_resnet_g
        params = mapper(sd, flat)
        from joligen_tpu.models.gan_networks import define_G
        net = define_G(flat)
        size = flat.data_crop_size
        init = net.init(jax.random.PRNGKey(0),
                        np.zeros((1, size, size, flat.model_input_nc),
                                 np.float32))
    else:
        flat.G_unet_mha_attn_norm = "instance"
        assert flat.model_type in ("palette", "cm", "cm_gan", "sc"), (
            "this converter handles the diffusion unet_mha family and the "
            f"GAN resnet family; got model_type={flat.model_type}")
        assert flat.G_netG == "unet_mha", (
            f"only G_netG=unet_mha is supported (got {flat.G_netG})")
        size = flat.data_crop_size
        # cm/sc generators concat x_cond only when conditioned on an image
        # (cm_model.py / sc_model.py conditional flag); mirror that here so
        # net.init produces the same input_blocks.0.0 fan-in as the ckpt.
        conditional = (getattr(flat, "alg_diffusion_cond_image_creation",
                               "y_t") != "y_t"
                       or getattr(flat, "dataset_mode", "") == "pix2pix")
        if flat.model_type in ("cm", "cm_gan"):
            mapper = map_cm_g
            params = mapper(sd, flat)
            from joligen_tpu.models.modules.cm import CMDenoiser
            from joligen_tpu.models.diffusion_networks import define_inner_G
            net = CMDenoiser(
                inner=define_inner_G(flat),
                cond_embed_dim=flat.alg_diffusion_cond_embed_dim,
                ft_proj=getattr(flat, "alg_diffusion_ddpm_cm_ft", False))
            ex_x = np.zeros((1, size, size, flat.model_output_nc), np.float32)
            init = net.init(jax.random.PRNGKey(0), ex_x,
                            np.ones((1,), np.float32),
                            x_cond=ex_x if conditional else None, train=True)
        elif flat.model_type == "sc":
            mapper = map_sc_g
            params = mapper(sd, flat)
            from joligen_tpu.models.modules.sc import SCDenoiser
            from joligen_tpu.models.diffusion_networks import define_inner_G
            net = SCDenoiser(inner=define_inner_G(flat),
                             cond_embed_dim=flat.alg_diffusion_cond_embed_dim)
            ex_x = np.zeros((1, size, size, flat.model_output_nc), np.float32)
            init = net.init(jax.random.PRNGKey(0), ex_x,
                            np.ones((1,), np.float32),
                            np.zeros((1,), np.float32),
                            x_cond=ex_x if conditional else None)
        else:
            mapper = map_palette_g
            params = mapper(sd, flat)

            from joligen_tpu.models.diffusion_networks import define_G
            net = define_G(flat)
            cin = flat.model_input_nc + flat.model_output_nc
            init = net.init(jax.random.PRNGKey(0),
                            np.zeros((1, size, size, cin), np.float32),
                            np.zeros((1,), np.float32))
    _tree_check(params["params"], jax.device_get(init)["params"])

    os.makedirs(a.dir_out, exist_ok=True)
    from flax import serialization
    base = os.path.basename(a.model_in_file)
    out_path = os.path.join(a.dir_out, base)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    written = [out_path]

    ema_in = a.model_in_file[:-4] + "_ema.pth"
    if os.path.exists(ema_in):
        ema_sd = torch.load(ema_in, map_location="cpu", weights_only=False)
        if hasattr(ema_sd, "state_dict"):
            ema_sd = ema_sd.state_dict()
        ema_sd = {k: (v.float().numpy() if hasattr(v, "numpy") else v)
                  for k, v in ema_sd.items()}
        ema_params = mapper(ema_sd, flat)
        ema_path = out_path[:-4] + "_ema.pth"
        with open(ema_path, "wb") as f:
            f.write(serialization.to_bytes(ema_params))
        written.append(ema_path)

    if gan_family:
        cfg["G_resnet_up_mode"] = "convtranspose"
    else:
        cfg["G_unet_mha_attn_norm"] = "instance"
    cfg_out = os.path.join(a.dir_out, "train_config.json")
    with open(cfg_out, "w") as f:
        json.dump(cfg, f, indent=2)
    written.append(cfg_out)
    for w in written:
        print("wrote", w)


if __name__ == "__main__":
    main()
