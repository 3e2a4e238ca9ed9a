"""Diffusion denoiser factory (reference models/diffusion_networks.py:24-300).

Maps option namespaces to flax denoiser modules wrapped in the palette
conditioning layer. flax convs infer input channels lazily, so the
reference's in_channel bookkeeping is unnecessary here.
"""

from __future__ import annotations

import jax.numpy as jnp

from .modules.palette_diffusion import PaletteDenoiser
from .modules.unet_mha import UNetMHA


def _compute_dtype(opt):
    return jnp.bfloat16 if getattr(opt, "tpu_bf16", True) else jnp.float32


def define_inner_G(opt):
    netG = opt.G_netG
    dtype = _compute_dtype(opt)
    if netG in ("unet_mha", "uvit"):
        return UNetMHA(
            transformer_blocks=(getattr(opt, "G_uvit_num_transformer_blocks", 6)
                                if netG == "uvit" else 0),
            in_channel=opt.model_input_nc + opt.model_output_nc,
            out_channel=opt.model_output_nc,
            inner_channel=opt.G_ngf,
            cond_embed_dim=opt.alg_diffusion_cond_embed_dim,
            res_blocks=tuple(opt.G_unet_mha_res_blocks),
            attn_res=tuple(opt.G_unet_mha_attn_res),
            channel_mults=tuple(opt.G_unet_mha_channel_mults),
            num_heads=opt.G_unet_mha_num_heads,
            num_head_channels=opt.G_unet_mha_num_head_channels,
            norm=opt.G_unet_mha_norm_layer,
            group_size=opt.G_unet_mha_group_norm_size,
            dropout=0.0,
            tanh=False,
            attn_norm=getattr(opt, "G_unet_mha_attn_norm", "group"),
            freq_space=getattr(opt, "train_feat_wavelet", False),
            remat=getattr(opt, "tpu_remat", False),
            remat_policy=getattr(opt, "tpu_remat_policy", "conv"),
            dtype=dtype,
        )
    if netG in ("resnet_attn", "mobile_resnet_attn"):
        from .modules.resnet_generator import ResnetGeneratorAttnDiff
        return ResnetGeneratorAttnDiff(
            out_channels=opt.model_output_nc,
            nb_mask_attn=opt.G_attn_nb_mask_attn,
            nb_mask_input=opt.G_attn_nb_mask_input,
            ngf=opt.G_ngf, n_blocks=opt.G_nblocks,
            cond_embed_dim=opt.alg_diffusion_cond_embed_dim,
            norm=opt.G_norm, padding_type=opt.G_padding_type,
            freq_space=getattr(opt, "train_feat_wavelet", False),
            dtype=dtype)
    if netG == "unet_vid":
        from .modules.unet_vid import UNetVid
        return UNetVid(
            in_channel=opt.model_input_nc + opt.model_output_nc,
            out_channel=opt.model_output_nc,
            inner_channel=opt.G_ngf,
            cond_embed_dim=opt.alg_diffusion_cond_embed_dim,
            res_blocks=tuple(opt.G_unet_mha_res_blocks),
            attn_res=tuple(opt.G_unet_mha_attn_res),
            channel_mults=tuple(opt.G_unet_mha_channel_mults),
            num_heads=opt.G_unet_mha_num_heads,
            num_head_channels=opt.G_unet_mha_num_head_channels,
            norm=opt.G_unet_mha_norm_layer,
            group_size=opt.G_unet_mha_group_norm_size,
            max_sequence_length=getattr(
                opt, "G_unet_vid_max_sequence_length", 25),
            motion_num_heads=getattr(opt, "G_unet_vid_num_attention_heads", 8),
            motion_num_transformer_blocks=getattr(
                opt, "G_unet_vid_num_transformer_blocks", 2),
            attn_norm=getattr(opt, "G_unet_mha_attn_norm", "group"),
            remat=getattr(opt, "tpu_remat", False),
            dtype=dtype,
        )
    if netG == "unet_mha_ref_attn":
        from .modules.unet_ref_attn import UNetRefAttn
        return UNetRefAttn(
            in_channel=opt.model_input_nc + opt.model_output_nc,
            out_channel=opt.model_output_nc,
            inner_channel=opt.G_ngf,
            cond_embed_dim=opt.alg_diffusion_cond_embed_dim,
            res_blocks=tuple(opt.G_unet_mha_res_blocks),
            attn_res=tuple(opt.G_unet_mha_attn_res),
            channel_mults=tuple(opt.G_unet_mha_channel_mults),
            num_heads=opt.G_unet_mha_num_heads,
            num_head_channels=opt.G_unet_mha_num_head_channels,
            norm=opt.G_unet_mha_norm_layer,
            group_size=opt.G_unet_mha_group_norm_size,
            attn_norm=getattr(opt, "G_unet_mha_attn_norm", "group"),
            remat=getattr(opt, "tpu_remat", False),
            dtype=dtype,
        )
    if netG == "hdit":
        from .modules.hdit import HDiT
        widths = tuple(getattr(opt, "G_hdit_widths", None)
                       or (192, 384, 768))
        depths = tuple(getattr(opt, "G_hdit_depths", None) or (2, 2, 4))
        return HDiT(
            patch_size=getattr(opt, "G_hdit_patch_size", 4) or 4,
            widths=widths, depths=depths,
            out_channels=opt.model_output_nc, dtype=dtype)
    if netG in ("vit", "dit"):
        from .modules.jit import JiT
        return JiT.from_opt(opt, dtype=dtype)
    if netG == "vit_vid":
        from .modules.vit_vid import JiTViD
        return JiTViD.from_opt(opt, dtype=dtype)
    raise NotImplementedError(f"diffusion generator {netG}")


VIDEO_NETGS = ("unet_vid", "vit_vid")


def define_G(opt):
    """Full conditioned denoiser: (params, x, gammas, cls, mask) -> eps_hat."""
    conditioning = getattr(opt, "alg_diffusion_cond_embed", "") or ""
    nclasses = max(getattr(opt, "f_s_semantic_nclasses", 2),
                   getattr(opt, "cls_semantic_nclasses", 2))
    ref_embed_net = getattr(opt, "alg_diffusion_ref_embed_net", "") or ""
    return PaletteDenoiser(
        inner=define_inner_G(opt),
        cond_embed_dim=opt.alg_diffusion_cond_embed_dim,
        conditioning=conditioning,
        nclasses=nclasses,
        raw_t=opt.G_netG in ("vit", "dit", "hdit", "vit_vid"),
        ref_embed_net=(ref_embed_net
                       if ref_embed_net in ("clip", "imagebind") else ""),
        dtype=_compute_dtype(opt),
    )
