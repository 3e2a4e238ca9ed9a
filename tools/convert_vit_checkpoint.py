"""Convert reference JiT / JiTViD torch state_dicts to joligen_tpu flax
params (converted-weight forward parity, VERDICT r3 next #4).

Reference: models/modules/vit/vit.py (JiT) and vit/vit_vid.py (JiTViD).
Our modules scan-stack the transformer blocks (leading axis = block index
within the scan segment), split at ``in_context_start`` (JiT: blocks_pre /
blocks_post) or at motion-insert boundaries (JiTViD: blocks{i}).

Usage as a library (the parity tests): ``map_jit_g(sd, depth,
in_context_start)`` / ``map_jitvid_g(sd, depth, in_context_start,
motion_every)`` return flax param trees.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _lin(sd, key):
    out = {"kernel": np.asarray(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        out["bias"] = np.asarray(sd[key + ".bias"])
    return out


def _rms(sd, key):
    return {"scale": np.asarray(sd[key + ".weight"])}


def _patch_linear_from_conv(sd, key, bias=True):
    """Reference BottleneckPatchEmbed.proj1 is a Conv2d(C, out, p, p,
    stride p): kernel (out, C, p, p). Our patch vector is flattened
    (ph, pw, c) so the linear kernel is (p*p*C, out)."""
    w = np.asarray(sd[key + ".weight"])          # (out, C, p, p)
    w = w.transpose(2, 3, 1, 0)                  # (p, p, C, out)
    out = {"kernel": w.reshape(-1, w.shape[-1])}
    if bias and key + ".bias" in sd:
        out["bias"] = np.asarray(sd[key + ".bias"])
    return out


def _jit_block(sd, p):
    """One reference JiTBlock -> our JiTBlock param dict."""
    d = np.asarray(sd[p + ".attn.qkv.weight"]).shape[1]
    w12 = np.asarray(sd[p + ".mlp.w12.weight"])   # (2h, d)
    b12 = np.asarray(sd[p + ".mlp.w12.bias"])
    h = w12.shape[0] // 2
    return {
        "adaLN": _lin(sd, p + ".adaLN_modulation.1"),
        "norm1": _rms(sd, p + ".norm1"),
        "qkv": _lin(sd, p + ".attn.qkv"),
        "q_norm": _rms(sd, p + ".attn.q_norm"),
        "k_norm": _rms(sd, p + ".attn.k_norm"),
        "proj": _lin(sd, p + ".attn.proj"),
        "norm2": _rms(sd, p + ".norm2"),
        "mlp": {
            "w1": {"kernel": w12[:h].T, "bias": b12[:h]},
            "w3": {"kernel": w12[h:].T, "bias": b12[h:]},
            "w2": _lin(sd, p + ".mlp.w3"),
        },
    }


def _stack(blocks):
    """Stack per-block param dicts along a new leading (scan) axis."""
    out = {}
    for k in blocks[0]:
        if isinstance(blocks[0][k], dict):
            out[k] = _stack([b[k] for b in blocks])
        else:
            out[k] = np.stack([b[k] for b in blocks])
    return out


def _common_embedders(sd, params, prefix=""):
    params["patch_bneck"] = _patch_linear_from_conv(
        sd, prefix + "x_embedder.proj1", bias=False)
    params["patch_proj"] = _patch_linear_from_conv(
        sd, prefix + "x_embedder.proj2")
    params["t_0"] = _lin(sd, prefix + "t_embedder.mlp.0")
    params["t_1"] = _lin(sd, prefix + "t_embedder.mlp.2")
    params["y_embed"] = np.asarray(
        sd[prefix + "y_embedder.embedding_table.weight"])
    if prefix + "mask_size_embedder.0.weight" in sd:
        params["ms_0"] = _lin(sd, prefix + "mask_size_embedder.0")
        params["ms_1"] = _lin(sd, prefix + "mask_size_embedder.2")
    if prefix + "register_tokens" in sd:
        params["register_tokens"] = np.asarray(sd[prefix + "register_tokens"])
    if prefix + "in_context_posemb" in sd:
        params["in_context_posemb"] = np.asarray(
            sd[prefix + "in_context_posemb"])
    params["final_adaLN"] = _lin(sd, prefix + "final_layer.adaLN_modulation.1")
    params["final_norm"] = _rms(sd, prefix + "final_layer.norm_final")
    params["final_proj"] = _lin(sd, prefix + "final_layer.linear")


def map_jit_g(sd, depth, in_context_start):
    """Reference JiT state_dict -> flax params for modules/jit.py JiT."""
    params = {}
    _common_embedders(sd, params)
    blocks = [_jit_block(sd, f"blocks.{i}") for i in range(depth)]
    start = max(0, min(in_context_start, depth))
    if start > 0:
        params["blocks_pre"] = {"block": _stack(blocks[:start])}
    if start < depth:
        params["blocks_post"] = {"block": _stack(blocks[start:])}
    return {"params": params}


def _motion(sd, p):
    """Reference MotionModule (vit_vid.py:311-495 / per-layer-motion copy)
    -> our TokenMotionModule params. ``p`` ends at temporal_transformer."""
    out = {
        "norm": {"scale": np.asarray(sd[p + ".norm.weight"]),
                 "bias": np.asarray(sd[p + ".norm.bias"])},
        "proj_in": _lin(sd, p + ".proj_in"),
        "proj_out": _lin(sd, p + ".proj_out"),
    }
    i = 0
    while f"{p}.transformer_blocks.{i}.ff_norm.weight" in sd:
        bp = f"{p}.transformer_blocks.{i}"
        blk = {"norm_ff": {"scale": np.asarray(sd[bp + ".ff_norm.weight"]),
                           "bias": np.asarray(sd[bp + ".ff_norm.bias"])},
               "ff_geglu": {"proj": _lin(sd, bp + ".ff.net.0.proj")},
               "ff_out": _lin(sd, bp + ".ff.net.2")}
        j = 0
        while f"{bp}.norms.{j}.weight" in sd:
            blk[f"norm{j}"] = {
                "scale": np.asarray(sd[f"{bp}.norms.{j}.weight"]),
                "bias": np.asarray(sd[f"{bp}.norms.{j}.bias"])}
            ap = f"{bp}.attention_blocks.{j}"
            blk[f"attn{j}"] = {
                "to_q": {"kernel": np.asarray(sd[ap + ".to_q.weight"]).T},
                "to_k": {"kernel": np.asarray(sd[ap + ".to_k.weight"]).T},
                "to_v": {"kernel": np.asarray(sd[ap + ".to_v.weight"]).T},
                "to_out": _lin(sd, ap + ".to_out.0"),
            }
            j += 1
        out[f"block{i}"] = blk
        i += 1
    return out


def _ref_converter():
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "convert_reference_checkpoint",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "convert_reference_checkpoint.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def map_unet_vid(sd, res_blocks, channel_mults, attn_res,
                 prefix="denoise_fn.model."):
    """Reference UNetVid (unet_generator_attn_vid.py:1057-1407) -> our
    modules/unet_vid.py UNetVid params: unet_mha spatial graph + a
    MotionModule after every encoder/decoder res(+attn) group (none in
    the middle). UNetVid uses use_new_attention_order=True, so qkv rows
    are already [q|k|v][head][ch] — no head reorder (unlike the legacy
    order the unet_mha converter handles)."""
    rc = _ref_converter()
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def attn(p):
        w = np.asarray(sd[p + ".qkv.weight"])[:, :, 0]
        proj = np.asarray(sd[p + ".proj_out.weight"])[:, :, 0]
        return {"qkv": {"kernel": w.T, "bias": np.asarray(sd[p + ".qkv.bias"])},
                "proj_out": {"kernel": proj.T,
                             "bias": np.asarray(sd[p + ".proj_out.bias"])}}

    out = {"in_conv": rc._conv(sd, "input_blocks.0.0"),
           "GroupNorm32_0": rc._gn(sd, "out.0.norm"),
           "out_proj": rc._conv(sd, "out.2")}
    res_i = attn_i = 0
    ib, ds = 1, 1
    menc = 0
    for level in range(len(channel_mults)):
        for _ in range(res_blocks[level]):
            out[f"ResBlock_{res_i}"] = rc.convert_resblock(
                sd, f"input_blocks.{ib}.0")
            res_i += 1
            sub = 1
            if ds in attn_res:
                out[f"AttentionBlock_{attn_i}"] = attn(f"input_blocks.{ib}.{sub}")
                attn_i += 1
                sub += 1
            out[f"motion_enc{menc}"] = _motion(
                sd, f"input_blocks.{ib}.{sub}.temporal_transformer")
            menc += 1
            ib += 1
        if level != len(channel_mults) - 1:
            out[f"ResBlock_{res_i}"] = rc.convert_resblock(
                sd, f"input_blocks.{ib}.0")
            res_i += 1
            ib += 1
            ds *= 2
    out[f"ResBlock_{res_i}"] = rc.convert_resblock(sd, "middle_block.0")
    res_i += 1
    out[f"AttentionBlock_{attn_i}"] = attn("middle_block.1")
    attn_i += 1
    out[f"ResBlock_{res_i}"] = rc.convert_resblock(sd, "middle_block.2")
    res_i += 1
    ob = mdec = 0
    for level in reversed(range(len(channel_mults))):
        for i in range(res_blocks[level] + 1):
            out[f"ResBlock_{res_i}"] = rc.convert_resblock(
                sd, f"output_blocks.{ob}.0")
            res_i += 1
            sub = 1
            if ds in attn_res:
                out[f"AttentionBlock_{attn_i}"] = attn(
                    f"output_blocks.{ob}.{sub}")
                attn_i += 1
                sub += 1
            out[f"motion_dec{mdec}"] = _motion(
                sd, f"output_blocks.{ob}.{sub}.temporal_transformer")
            mdec += 1
            sub += 1
            if level and i == res_blocks[level]:
                out[f"ResBlock_{res_i}"] = rc.convert_resblock(
                    sd, f"output_blocks.{ob}.{sub}")
                res_i += 1
                ds //= 2
            ob += 1
    return {"params": out}


def map_ref_attn(sd, res_blocks, channel_mults, attn_res, num_heads,
                 num_head_channels, prefix="denoise_fn.model."):
    """Reference UNetGeneratorRefAttn (unet_generator_attn.py:1136-1660)
    -> our dual-tower modules/unet_ref_attn.py UNetRefAttn params.

    Our AttentionBlockRef keeps the reference's native head-major row
    layout (incl. the chunk(3) cross-branch quirk), so qkv kernels map
    WITHOUT any head reorder."""
    rc = _ref_converter()
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def attn(p, terminal=False):
        w = np.asarray(sd[p + ".qkv.weight"])[:, :, 0]
        b = np.asarray(sd[p + ".qkv.bias"])
        out = {"qkv": {"kernel": w.T, "bias": b}}
        if not terminal:
            proj = np.asarray(sd[p + ".proj_out.weight"])[:, :, 0]
            out["proj_out"] = {"kernel": proj.T,
                               "bias": np.asarray(sd[p + ".proj_out.bias"])}
        return out

    out = {"in_conv": rc._conv(sd, "input_blocks.0.0"),
           "ref_in_conv": rc._conv(sd, "input_blocks_ref.0.0"),
           "GroupNorm32_0": rc._gn(sd, "out.0.norm"),
           "out_proj": rc._conv(sd, "out.2")}

    def tower(blocks_key, mid_key, out_key, res_name, attn_name,
              dec_until_terminal):
        res_i = attn_i = 0
        ib, ds = 1, 1
        last = len(channel_mults) - 1
        for level in range(len(channel_mults)):
            for _ in range(res_blocks[level]):
                out[f"{res_name}_{res_i}"] = rc.convert_resblock(
                    sd, f"{blocks_key}.{ib}.0")
                res_i += 1
                if ds in attn_res:
                    out[f"{attn_name}_{attn_i}"] = attn(
                        f"{blocks_key}.{ib}.1")
                    attn_i += 1
                ib += 1
            if level != last:
                out[f"{res_name}_{res_i}"] = rc.convert_resblock(
                    sd, f"{blocks_key}.{ib}.0")
                res_i += 1
                ib += 1
                ds *= 2
        out[f"{res_name}_{res_i}"] = rc.convert_resblock(sd, mid_key + ".0")
        res_i += 1
        out[f"{attn_name}_{attn_i}"] = attn(mid_key + ".1")
        attn_i += 1
        out[f"{res_name}_{res_i}"] = rc.convert_resblock(sd, mid_key + ".2")
        res_i += 1
        # decoder
        ob = 0
        done = False
        for level in reversed(range(len(channel_mults))):
            if done:
                break
            for i in range(res_blocks[level] + 1):
                is_terminal = (i == res_blocks[level]
                               and (ds // 2) not in attn_res)
                out[f"{res_name}_{res_i}"] = rc.convert_resblock(
                    sd, f"{out_key}.{ob}.0")
                res_i += 1
                sub = 1
                if ds in attn_res:
                    out[f"{attn_name}_{attn_i}"] = attn(
                        f"{out_key}.{ob}.{sub}",
                        terminal=dec_until_terminal and is_terminal)
                    attn_i += 1
                    sub += 1
                if level and i == res_blocks[level]:
                    if not (dec_until_terminal and is_terminal):
                        out[f"{res_name}_{res_i}"] = rc.convert_resblock(
                            sd, f"{out_key}.{ob}.{sub}")
                        res_i += 1
                    ds //= 2
                ob += 1
            if dec_until_terminal and is_terminal:
                done = True

    tower("input_blocks_ref", "middle_block_ref", "output_blocks_ref",
          "RefResBlock", "RefAttn", dec_until_terminal=True)
    tower("input_blocks", "middle_block", "output_blocks",
          "ResBlock", "AttnRef", dec_until_terminal=False)
    return {"params": out}


def map_hdit(sd, depths, prefix=""):
    """Reference HDiT (hdit/hdit.py:738-918) -> our modules/hdit.py HDiT
    params. All Linears are bias-free; GEGLU halves and token merge/split
    orderings match by construction."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def lin(key):
        return {"kernel": np.asarray(sd[key + ".weight"]).T}

    def scale(key):
        return {"scale": np.asarray(sd[key + ".scale"])}

    def block(p):
        return {
            "attn_norm": {"lin": lin(p + ".self_attn.norm.linear")},
            "qkv": lin(p + ".self_attn.qkv_proj"),
            "attn_scale": np.asarray(sd[p + ".self_attn.scale"]),
            "proj": lin(p + ".self_attn.out_proj"),
            "ff_norm": {"lin": lin(p + ".ff.norm.linear")},
            "ff_in": lin(p + ".ff.up_proj"),
            "ff_out": lin(p + ".ff.down_proj"),
        }

    params = {
        "patch_in": lin("patch_in.proj"),
        "final_norm": scale("out_norm"),
        "patch_out": lin("patch_out.proj"),
    }
    mapping = {"in_norm": scale("mapping.in_norm"),
               "out_norm": scale("mapping.out_norm")}
    i = 0
    while f"mapping.blocks.{i}.norm.scale" in sd:
        mapping[f"norm{i}"] = scale(f"mapping.blocks.{i}.norm")
        mapping[f"up{i}"] = lin(f"mapping.blocks.{i}.up_proj")
        mapping[f"down{i}"] = lin(f"mapping.blocks.{i}.down_proj")
        i += 1
    params["mapping"] = mapping

    n_levels = len(depths)
    for li in range(n_levels - 1):
        for bi in range(depths[li]):
            params[f"enc{li}_{bi}"] = block(f"down_levels.{li}.{bi}")
            params[f"dec{li}_{bi}"] = block(f"up_levels.{li}.{bi}")
        params[f"merge{li}"] = lin(f"merges.{li}.proj")
        params[f"split{li}"] = lin(f"splits.{li}.proj")
        params[f"lerp{li}"] = np.asarray(sd[f"splits.{li}.fac"]).reshape(())
    for bi in range(depths[-1]):
        params[f"mid_{bi}"] = block(f"mid_level.{bi}")
    return {"params": params}


def map_ittr(sd, n_blocks, prefix=""):
    """Reference ITTRGenerator (ittr/ittr_generator.py:283-342) -> our
    modules/ittr.py params."""
    rc = _ref_converter()
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def convt(key):
        w = np.asarray(sd[key + ".weight"])          # (in, out, kh, kw)
        return {"kernel": np.flip(np.transpose(w, (2, 3, 0, 1)),
                                  axis=(0, 1)).copy(),
                "bias": np.asarray(sd[key + ".bias"])}

    params = {
        "stem0": rc._conv(sd, "stem.ff.1"),
        "stem_down0": rc._conv(sd, "stem.ff.4"),
        "stem_down1": rc._conv(sd, "stem.ff.7"),
        "dec_up0": convt("decoder.decoder.0"),
        "dec_up1": convt("decoder.decoder.3"),
        "dec_out": rc._conv(sd, "decoder.decoder.7"),
    }
    for i in range(n_blocks):
        p = f"ittr.{i}"
        qkv = np.asarray(sd[p + ".attn.to_qkv.weight"])  # (3inner, c, 1, 1)
        params[f"hpb{i}"] = {
            "attn": {
                "norm": {"g": np.asarray(sd[p + ".attn.norm.g"]).reshape(-1),
                         "b": np.asarray(sd[p + ".attn.norm.b"]).reshape(-1)},
                "to_qkv": {"kernel": np.transpose(qkv, (2, 3, 1, 0))},
                "to_out": rc._conv(sd, p + ".attn.to_out"),
            },
            "dwconv": rc._conv(sd, p + ".dwconv"),
            "combine": rc._conv(sd, p + ".attn_parallel_combine_out"),
            "ff_in": rc._conv(sd, p + ".ff.0"),
            "ff_dw": rc._conv(sd, p + ".ff.4.fn.0"),
            "ff_out": rc._conv(sd, p + ".ff.5"),
        }
    return {"params": params}


def map_hat(sd, depths, prefix=""):
    """Reference HAT (hat/hat.py:851-1160) -> our modules/hat.py params."""
    rc = _ref_converter()
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def ln(key):
        return {"scale": np.asarray(sd[key + ".weight"]),
                "bias": np.asarray(sd[key + ".bias"])}

    def mlp(key):
        return {"fc1": _lin(sd, key + ".fc1"), "fc2": _lin(sd, key + ".fc2")}

    params = {
        "conv_first": rc._conv(sd, "conv_first"),
        "patch_norm": ln("patch_embed.norm"),
        "norm": ln("norm"),
        "conv_after_body": rc._conv(sd, "conv_after_body"),
        "conv_before_upsample": rc._conv(sd, "conv_before_upsample.0"),
        "conv_last": rc._conv(sd, "conv_last"),
    }
    ui = 0
    while f"upsample.{2 * ui}.weight" in sd:
        params[f"up{ui}"] = rc._conv(sd, f"upsample.{2 * ui}")
        ui += 1
    for gi, depth in enumerate(depths):
        g = f"layers.{gi}.residual_group"
        grp = {"conv": rc._conv(sd, f"layers.{gi}.conv")}
        for i in range(depth):
            p = f"{g}.blocks.{i}"
            grp[f"hab{i}"] = {
                "norm1": ln(p + ".norm1"),
                "norm2": ln(p + ".norm2"),
                "attn": {
                    "qkv": _lin(sd, p + ".attn.qkv"),
                    "proj": _lin(sd, p + ".attn.proj"),
                    "rpb": np.asarray(
                        sd[p + ".attn.relative_position_bias_table"]),
                },
                "conv_block": {
                    "conv1": rc._conv(sd, p + ".conv_block.cab.0"),
                    "conv2": rc._conv(sd, p + ".conv_block.cab.2"),
                    "ca1": rc._conv(sd, p + ".conv_block.cab.3.attention.1"),
                    "ca2": rc._conv(sd, p + ".conv_block.cab.3.attention.3"),
                },
                "mlp": mlp(p + ".mlp"),
            }
        o = f"{g}.overlap_attn"
        grp["ocab"] = {
            "norm1": ln(o + ".norm1"),
            "norm2": ln(o + ".norm2"),
            "qkv": _lin(sd, o + ".qkv"),
            "proj": _lin(sd, o + ".proj"),
            "rpb": np.asarray(sd[o + ".relative_position_bias_table"]),
            "mlp": mlp(o + ".mlp"),
        }
        params[f"rhag{gi}"] = grp
    return {"params": params}


def map_jitvid_g(sd, depth, in_context_start, motion_every, has_prefix=True):
    """Reference JiTViD state_dict -> flax params for vit_vid.py JiTViD.

    Segment layout mirrors JiTViD._segments: split at motion inserts and
    at in_context_start (when a prefix is inserted)."""
    params = {}
    # JiTViD patch embed lives under x_embedder too, but our module nests
    # it in a _BottleneckPatchEmbed submodule named x_embed
    params["x_embed"] = {
        "proj1": _patch_linear_from_conv(sd, "x_embedder.proj1", bias=False),
        "proj2": _patch_linear_from_conv(sd, "x_embedder.proj2"),
    }
    params["t_0"] = _lin(sd, "t_embedder.mlp.0")
    params["t_1"] = _lin(sd, "t_embedder.mlp.2")
    params["y_embed"] = np.asarray(sd["y_embedder.embedding_table.weight"])
    if "mask_size_embedder.0.weight" in sd:
        params["ms_0"] = _lin(sd, "mask_size_embedder.0")
        params["ms_1"] = _lin(sd, "mask_size_embedder.2")
    if "temporal_frame_step_embedder.mlp.0.weight" in sd:
        params["fs_0"] = _lin(sd, "temporal_frame_step_embedder.mlp.0")
        params["fs_1"] = _lin(sd, "temporal_frame_step_embedder.mlp.2")
    if "register_tokens" in sd:
        params["register_tokens"] = np.asarray(sd["register_tokens"])
    if "in_context_posemb" in sd:
        params["in_context_posemb"] = np.asarray(sd["in_context_posemb"])
    params["final_adaLN"] = _lin(sd, "final_layer.adaLN_modulation.1")
    params["final_norm"] = _rms(sd, "final_layer.norm_final")
    params["final_proj"] = _lin(sd, "final_layer.linear")

    blocks = [_jit_block(sd, f"blocks.{i}") for i in range(depth)]
    if motion_every <= 0:
        motion_after = {depth - 1}
    else:
        motion_after = {i for i in range(depth)
                        if (i + 1) % motion_every == 0}
        motion_after.add(depth - 1)
    split_at = in_context_start if has_prefix else depth
    bounds = {0, depth} | {i + 1 for i in motion_after if i + 1 < depth}
    if 0 < split_at < depth:
        bounds.add(split_at)
    bounds = sorted(bounds)
    motion_idx = 0
    for si, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
        params[f"blocks{si}"] = {"block": _stack(blocks[a:b])}
        if (b - 1) in motion_after:
            if motion_every <= 0:
                params["motion"] = _motion(
                    sd, "motion_module.temporal_transformer")
            else:
                params[f"motion{si}"] = _motion(
                    sd, f"motion_modules.{motion_idx}.temporal_transformer")
            motion_idx += 1
    return {"params": params}
