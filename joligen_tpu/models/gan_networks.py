"""GAN network factories (reference models/gan_networks.py:51-560)."""

from __future__ import annotations

import jax.numpy as jnp

from .modules.cut_networks import PatchSampleF
from .modules.discriminators import NLayerDiscriminator, PixelDiscriminator
from .modules.resnet_generator import ResnetGenerator, ResnetGeneratorAttn


def _dtype(opt):
    return jnp.bfloat16 if getattr(opt, "tpu_bf16", True) else jnp.float32


def define_G(opt):
    netG = opt.G_netG
    dtype = _dtype(opt)
    if netG in ("resnet", "mobile_resnet", "resnet_9blocks", "resnet_6blocks"):
        return ResnetGenerator(
            out_channels=opt.model_output_nc, ngf=opt.G_ngf,
            n_blocks=opt.G_nblocks, norm=opt.G_norm,
            padding_type=opt.G_padding_type,
            dropout=0.5 if opt.G_dropout else 0.0,
            mobile="mobile" in netG,
            freq_space=getattr(opt, "train_feat_wavelet", False),
            use_spectral=getattr(opt, "G_spectral", False),
            up_mode=getattr(opt, "G_resnet_up_mode", "resize"),
            dtype=dtype)
    if netG in ("resnet_attn", "mobile_resnet_attn"):
        return ResnetGeneratorAttn(
            out_channels=opt.model_output_nc,
            nb_mask_attn=opt.G_attn_nb_mask_attn,
            nb_mask_input=opt.G_attn_nb_mask_input,
            ngf=opt.G_ngf, n_blocks=opt.G_nblocks, norm=opt.G_norm,
            padding_type=opt.G_padding_type,
            mobile="mobile" in netG,
            freq_space=getattr(opt, "train_feat_wavelet", False),
            use_spectral=getattr(opt, "G_spectral", False),
            up_mode=getattr(opt, "G_resnet_up_mode", "resize"),
            dtype=dtype)
    if netG in ("unet_mha", "uvit"):
        from .modules.unet_mha import UNetMHA
        return UNetMHA(
            transformer_blocks=(getattr(opt, "G_uvit_num_transformer_blocks", 6)
                                if netG == "uvit" else 0),
            in_channel=opt.model_input_nc, out_channel=opt.model_output_nc,
            inner_channel=opt.G_ngf,
            cond_embed_dim=opt.G_ngf * 4,
            res_blocks=tuple(opt.G_unet_mha_res_blocks),
            attn_res=tuple(opt.G_unet_mha_attn_res),
            channel_mults=tuple(opt.G_unet_mha_channel_mults),
            num_heads=opt.G_unet_mha_num_heads,
            num_head_channels=opt.G_unet_mha_num_head_channels,
            norm=opt.G_unet_mha_norm_layer,
            group_size=opt.G_unet_mha_group_norm_size,
            freq_space=getattr(opt, "train_feat_wavelet", False),
            tanh=True, dtype=dtype)
    if "segformer" in netG:  # segformer_attn_conv
        from .modules.segformer import SegformerGeneratorAttn
        return SegformerGeneratorAttn(
            out_channels=opt.model_output_nc,
            nb_mask_attn=opt.G_attn_nb_mask_attn,
            nb_mask_input=opt.G_attn_nb_mask_input, dtype=dtype)
    if netG == "hdit":
        # hourglass transformer as a GAN generator (reference
        # gan_networks.py:247-263: constant mapping conditioning,
        # last_zero_init=False)
        from .modules.hdit import HDiT
        return HDiT(
            patch_size=getattr(opt, "G_hdit_patch_size", 4) or 4,
            widths=tuple(getattr(opt, "G_hdit_widths", None)
                         or (192, 384, 768)),
            depths=tuple(getattr(opt, "G_hdit_depths", None) or (2, 2, 4)),
            out_channels=opt.model_output_nc, last_zero_init=False,
            dtype=dtype)
    if netG == "hat":
        from .modules.hat import HAT
        # reference config (gan_networks.py:264-273): window_size=16,
        # upsampler=pixelshuffle with default upscale 1; small crops are
        # handled by HAT's internal window clamp
        return HAT(out_channels=opt.model_output_nc, window_size=16,
                   upscale=1, dtype=dtype)
    if netG == "ittr":
        from .modules.ittr import ITTRGenerator
        return ITTRGenerator(
            out_channels=opt.model_output_nc, ngf=opt.G_ngf,
            n_blocks=opt.G_nblocks, img_size=opt.data_crop_size, dtype=dtype)
    if netG in ("unet_256", "unet_128"):
        from .modules.unet_mha import UNetMHA
        # classic pix2pix unet approximated by the attention-free unet_mha
        return UNetMHA(
            in_channel=opt.model_input_nc, out_channel=opt.model_output_nc,
            inner_channel=opt.G_ngf, cond_embed_dim=opt.G_ngf * 4,
            res_blocks=(1, 1, 1, 1), attn_res=(),
            channel_mults=(1, 2, 4, 8), tanh=True, dtype=dtype)
    raise NotImplementedError(f"GAN generator {netG}")


def define_D(opt, names=None):
    """Returns dict name -> discriminator module
    (reference gan_networks.py:289-482 builds one D per D_netDs entry)."""
    dtype = _dtype(opt)
    names = names if names is not None else list(opt.D_netDs)
    ds = {}
    for name in names:
        if name in ("basic", "n_layers"):
            # the reference pins basic at 3 layers and only n_layers reads
            # D_n_layers (gan_networks.py:356-377); honoring D_n_layers for
            # both (default 3) keeps reference configs identical while
            # letting small-resolution configs shrink the PatchGAN
            ds["D_B_" + name] = NLayerDiscriminator(
                ndf=opt.D_ndf,
                n_layers=opt.D_n_layers,
                norm=opt.D_norm,
                antialias=not getattr(opt, "D_no_antialias", False),
                use_dropout=getattr(opt, "D_dropout", False),
                use_spectral=getattr(opt, "D_spectral", False),
                freq_space=getattr(opt, "train_feat_wavelet", False),
                dtype=dtype)
        elif name == "pixel":
            ds["D_B_" + name] = PixelDiscriminator(
                ndf=opt.D_ndf, norm=opt.D_norm, dtype=dtype)
        elif name == "projected_d":
            from .modules.projected_d import (_LITE0_STAGES, _LITE3_STAGES,
                                              ProjectedDiscriminator)
            ptype = getattr(opt, "D_proj_network_type",
                            "efficientnet") or "efficientnet"
            if ptype in ("vitbase", "vitsmall", "vitclip16", "siglip",
                         "dinov2_vitb14"):
                raise NotImplementedError(
                    f"D_proj_network_type={ptype}: use D_netDs vision_aided "
                    "(frozen CLIP tower) or sam for ViT-feature "
                    "discriminators in this framework")
            ds["D_B_" + name] = ProjectedDiscriminator(
                interp=getattr(opt, "D_proj_interp", -1),
                network_type=ptype,
                trunk_stages=(_LITE3_STAGES if ptype == "depth"
                              else _LITE0_STAGES),
                dtype=dtype)
        elif name == "temporal":
            from .modules.projected_d import TemporalProjectedDiscriminator
            ds["D_B_" + name] = TemporalProjectedDiscriminator(
                interp=getattr(opt, "D_proj_interp", -1), dtype=dtype)
        elif name == "vision_aided":
            # frozen vision towers + trainable heads; ported weights swap
            # in post-init (see cut_model). D_vision_aided_backbones picks
            # the ensemble (reference vision-aided-gan "clip+dino+swin");
            # swin is not ported and is skipped
            from .modules.vision_aided_d import VisionAidedDiscriminator
            from ..utils.clip_vit import clip_weights_path
            spec = (getattr(opt, "D_vision_aided_backbones",
                            "clip+dino+swin") or "clip").lower()
            bks = []
            for tok in spec.split("+"):
                tok = tok.strip()
                if tok.startswith("clip"):
                    bks.append("clip")
                elif tok.startswith("dino"):
                    bks.append("dino")
                elif tok:
                    print(f"vision_aided D: backbone '{tok}' not ported — "
                          "skipped (available: clip, dino)")
            bks = tuple(dict.fromkeys(bks)) or ("clip",)
            if clip_weights_path() is None and "clip" in bks:
                print("vision_aided D: clip_vitb16.npz not found in "
                      "JOLIGEN_TPU_WEIGHTS_DIR — using frozen random CLIP "
                      "features (port with tools/port_clip_weights.py)")
            ds["D_B_" + name] = VisionAidedDiscriminator(backbones=bks,
                                                         dtype=dtype)
        elif name == "depth":
            # projected D over the frozen MiDaS (lite3) encoder (reference
            # projected_d projector type depth); midas_small.npz swaps in
            # post-init, else frozen random features
            from .modules.projected_d import (ProjectedDiscriminator,
                                              _LITE3_STAGES)
            ds["D_B_" + name] = ProjectedDiscriminator(
                interp=getattr(opt, "D_proj_interp", -1),
                trunk_stages=_LITE3_STAGES, dtype=dtype)
        elif name == "sam":
            # frozen SAM vision encoder + trainable head; sam_vit.npz swaps
            # in post-init (random frozen features otherwise)
            from .modules.vision_aided_d import SamFeatureDiscriminator
            from ..utils.sam import sam_weights_path
            if sam_weights_path() is None:
                print("sam D: sam_vit.npz not found in "
                      "JOLIGEN_TPU_WEIGHTS_DIR — using frozen random SAM "
                      "features (port with tools/port_sam_weights.py)")
            ds["D_B_" + name] = SamFeatureDiscriminator(dtype=dtype)
        elif name == "mask":
            # judges one-hot semantic masks: real = one-hot label mask,
            # fake = gumbel-softmax of f_s(fake) (reference
            # gan_networks.py:465-474); channels infer lazily in flax
            ds["D_B_" + name] = NLayerDiscriminator(
                ndf=opt.D_ndf, n_layers=opt.D_n_layers, norm=opt.D_norm,
                antialias=not getattr(opt, "D_no_antialias", False),
                use_dropout=getattr(opt, "D_dropout", False),
                use_spectral=getattr(opt, "D_spectral", False),
                dtype=dtype)
        else:
            # torchvision-template classifier D (reference
            # gan_networks.py:383-393 TORCH_MODEL_CLASSES)
            from .modules.semantic_networks import ResNetTemplate
            if name in ResNetTemplate._CFG:
                ds["D_B_" + name] = ResNetTemplate(nclasses=1, variant=name)
            else:
                raise NotImplementedError(f"discriminator {name}")
    return ds


def define_F(opt):
    netF = getattr(opt, "alg_cut_netF", "mlp_sample")
    return PatchSampleF(nc=opt.alg_cut_netF_nc,
                        use_mlp="mlp" in netF, dtype=_dtype(opt))
