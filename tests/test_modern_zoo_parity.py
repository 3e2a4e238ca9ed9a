"""Converted-weight forward parity for the modern generator zoo
(VERDICT r3 next #4): the reference torch modules are imported and
executed DIRECTLY, random-initialized, converted with the tools/ porters,
and the flax forward must match <=1e-4.

Covered here: JiT (vit/vit.py), JiTViD (vit/vit_vid.py), UViT
(unet_generator_attn.py:765), UNetVid (unet_generator_attn_vid.py),
ref-attn UNet (unet_generator_attn.py UNetGeneratorRefAttn), HDiT
(hdit/hdit.py), ITTR (ittr/ittr_generator.py), HAT (hat/hat.py).
"""

import importlib.util as ilu
import os
import sys
import types

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

pytestmark = pytest.mark.parity


def _load_tool(name):
    spec = ilu.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_package(name, path):
    """Register a synthetic package so reference intra-package imports
    resolve without executing reference __init__ files."""
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m


def _reference_vit_importable():
    """Import reference models/modules/vit/vit.py directly (needs
    /root/reference on sys.path for `util.model_util`)."""
    _ref_package("models", "/root/reference/models")
    _ref_package("models.modules", "/root/reference/models/modules")
    _ref_package("models.modules.vit", "/root/reference/models/modules/vit")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.modules.vit import vit as ref_vit
    return ref_vit


def _unzero(module, torch, skip=()):
    """Reference zero-inits (adaLN, final linear) make the forward
    insensitive to most params; perturb them so parity is meaningful.
    ``skip``: name substrings to leave zeroed (e.g. motion proj_out)."""
    with torch.no_grad():
        for name, p in module.named_parameters():
            if p.abs().sum() == 0 and not any(s in name for s in skip):
                p.add_(0.05 * torch.randn_like(p))


def test_jit_converted_weight_forward_parity():
    """JiT: bottleneck patch embed, RoPE, in-context tokens at block
    in_context_start, SwiGLU, AdaLN — reference vit.py:261-496 executed
    directly vs our scanned flax JiT with ported weights."""
    torch = pytest.importorskip("torch")
    ref_vit = _reference_vit_importable()

    torch.manual_seed(7)
    depth, d, heads, p, icl, ics, nreg = 3, 96, 2, 4, 4, 1, 2
    ref = ref_vit.JiT(
        input_size=16, patch_size=p, in_channels=3, hidden_size=d,
        depth=depth, num_heads=heads, num_classes=2, bottleneck_dim=16,
        in_context_len=icl, in_context_start=ics,
        num_register_tokens=nreg).eval()
    _unzero(ref, torch)

    rng = np.random.RandomState(11)
    x_np = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    t_np = np.asarray([0.25, 0.8], np.float32)
    y_np = np.asarray([0, 1], np.int64)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x_np).permute(0, 3, 1, 2),
                      torch.tensor(t_np), torch.tensor(y_np))
    ref_out = ref_out.permute(0, 2, 3, 1).numpy()

    conv = _load_tool("convert_vit_checkpoint")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = conv.map_jit_g(sd, depth=depth, in_context_start=ics)

    import jax.numpy as jnp

    from joligen_tpu.models.modules.jit import JiT
    net = JiT(patch_size=p, hidden_size=d, depth=depth, num_heads=heads,
              bottleneck_dim=16, num_classes=2, in_context_len=icl,
              in_context_start=ics, num_register_tokens=nreg,
              out_channels=3)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x_np), jnp.asarray(t_np), jnp.asarray(y_np)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-4)


def _faithful_pe1d(torch):
    """The positional_encodings package's PositionalEncoding1D, rebuilt
    faithfully (interleaved [sin f0, cos f0, ...]); the package is not in
    the image, so the reference import is stubbed with THIS instead of
    the no-op stub used by the UNet tests."""
    import numpy as _np

    class PE1D(torch.nn.Module):
        def __init__(self, channels):
            super().__init__()
            self.org_channels = channels
            ch = int(_np.ceil(channels / 2) * 2)
            self.channels = ch
            inv = 1.0 / (10000 ** (torch.arange(0, ch, 2).float() / ch))
            self.register_buffer("inv_freq", inv)

        def forward(self, tensor):
            b, n, oc = tensor.shape
            pos = torch.arange(n, dtype=self.inv_freq.dtype)
            sin_inp = torch.einsum("i,j->ij", pos, self.inv_freq)
            emb = torch.stack((sin_inp.sin(), sin_inp.cos()),
                              dim=-1).flatten(-2, -1)
            out = torch.zeros(n, self.channels)
            out[:, :emb.shape[1]] = emb
            return out[None, :, :oc].repeat(b, 1, 1)

    return PE1D


def _reference_unet_module():
    """Import the reference unet_generator_attn module directly (stubs
    for positional_encodings as in test_numerical_parity)."""
    if "positional_encodings" not in sys.modules:
        pe = types.ModuleType("positional_encodings")
        pet = types.ModuleType("positional_encodings.torch_encodings")

        class _P:
            def __init__(self, *a, **k):
                pass
        pet.PositionalEncoding1D = pet.Summer = _P
        pe.torch_encodings = pet
        sys.modules.update({"positional_encodings": pe,
                            "positional_encodings.torch_encodings": pet})
    _ref_package("models", "/root/reference/models")
    _ref_package("models.modules", "/root/reference/models/modules")
    _ref_package("models.modules.unet_generator_attn",
                 "/root/reference/models/modules/unet_generator_attn")
    from models.modules.unet_generator_attn import unet_generator_attn
    return unet_generator_attn


def test_uvit_converted_weight_forward_parity():
    """UViT: conv encoder/decoder (no attention, plain resampling) +
    transformer bottleneck on the reference's CHW-memory token reshape,
    with the positional_encodings 1D table, non-residual FiLM FF and
    InstanceNorm1d'd legacy-QKV attention (unet_generator_attn.py:765-1010
    executed directly)."""
    torch = pytest.importorskip("torch")
    ref_mod = _reference_unet_module()
    # swap the no-op PositionalEncoding1D stub for the faithful one
    ref_mod.PositionalEncoding1D = _faithful_pe1d(torch)

    torch.manual_seed(5)
    res_blocks, mults, ngf, cond = [1, 1], (1, 2), 16, 32
    ref = ref_mod.UViT(
        image_size=16, in_channel=6, inner_channel=ngf, out_channel=3,
        res_blocks=res_blocks, attn_res=[8], tanh=False,
        n_timestep_train=10, n_timestep_test=5, norm="groupnorm",
        group_norm_size=8, cond_embed_dim=cond, dropout=0.0,
        channel_mults=mults, num_head_channels=8,
        num_transformer_blocks=2).eval()
    _unzero(ref, torch)

    rng = np.random.RandomState(23)
    x_np = rng.uniform(-1, 1, (2, 16, 16, 6)).astype(np.float32)
    emb_np = rng.randn(2, cond).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x_np).permute(0, 3, 1, 2),
                      torch.tensor(emb_np))
    ref_out = ref_out.permute(0, 2, 3, 1).numpy()

    conv = _load_tool("convert_reference_checkpoint")
    sd = {f"denoise_fn.model.{k}": v.numpy()
          for k, v in ref.state_dict().items()}
    params = {"params": conv.map_uvit(sd, res_blocks, list(mults))}

    import jax.numpy as jnp

    from joligen_tpu.models.modules.unet_mha import UNetMHA
    net = UNetMHA(in_channel=6, out_channel=3, inner_channel=ngf,
                  cond_embed_dim=cond, res_blocks=tuple(res_blocks),
                  attn_res=(8,), channel_mults=mults, num_head_channels=8,
                  group_size=8, transformer_blocks=2)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x_np), jnp.asarray(emb_np)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-4)


def test_hat_converted_weight_forward_parity():
    """HAT: RHAG groups (shifted-window HABs with relative-position bias
    + CAB conv branch, OCAB overlapping cross-attention), pixelshuffle
    head (hat/hat.py:851-1160 executed directly)."""
    torch = pytest.importorskip("torch")
    _ref_package("models", "/root/reference/models")
    _ref_package("models.modules", "/root/reference/models/modules")
    _ref_package("models.modules.hat", "/root/reference/models/modules/hat")
    from models.modules.hat import hat as ref_hat

    torch.manual_seed(59)
    depths, heads = (2, 2), (2, 2)
    ref = ref_hat.HAT(img_size=16, patch_size=1, in_chans=3, out_chans=3,
                      embed_dim=24, depths=depths, num_heads=heads,
                      window_size=4, upsampler="pixelshuffle", upscale=1,
                      squeeze_factor=6, drop_path_rate=0.0).eval()
    rng = np.random.RandomState(61)
    x_np = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x_np).permute(0, 3, 1, 2))
    ref_out = ref_out.permute(0, 2, 3, 1).numpy()

    conv = _load_tool("convert_vit_checkpoint")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = conv.map_hat(sd, depths)

    import jax.numpy as jnp

    from joligen_tpu.models.modules.hat import HAT
    net = HAT(out_channels=3, embed_dim=24, depths=depths,
              num_heads=heads, window_size=4, upscale=1,
              squeeze_factor=6, drop_path_rate=0.0)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x_np)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


def test_ittr_converted_weight_forward_parity():
    """ITTR: stem -> HPB blocks (dual-pruned cosine attention + depthwise
    conv branch, non-residual IN/GELU conv FFN) -> ConvTranspose decoder
    (ittr/ittr_generator.py:283-342 executed directly)."""
    torch = pytest.importorskip("torch")
    _ref_package("models", "/root/reference/models")
    _ref_package("models.modules", "/root/reference/models/modules")
    _ref_package("models.modules.ittr", "/root/reference/models/modules/ittr")
    from models.modules.ittr import ittr_generator as ref_ittr

    torch.manual_seed(47)
    # img 32 -> stem map 8x8; dim_head = 8; top_k 4 prunes both axes
    ref = ref_ittr.ITTRGenerator(input_nc=3, output_nc=3, img_size=32,
                                 n_blocks=2, ngf=16).eval()
    for blk in ref.ittr:
        blk.attn.height_top_k = blk.attn.width_top_k = 4
    rng = np.random.RandomState(53)
    x_np = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x_np).permute(0, 3, 1, 2))
    ref_out = ref_out.permute(0, 2, 3, 1).numpy()

    conv = _load_tool("convert_vit_checkpoint")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = conv.map_ittr(sd, n_blocks=2)

    import jax.numpy as jnp

    from joligen_tpu.models.modules.ittr import ITTRGenerator
    net = ITTRGenerator(out_channels=3, ngf=16, n_blocks=2, img_size=32,
                        height_top_k=4, width_top_k=4)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x_np)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


def test_hdit_converted_weight_forward_parity():
    """HDiT: hourglass transformer with cosine-sim RoPE attention,
    shifted-window levels + global bottleneck, GEGLU FF, AdaRMSNorm,
    token merge/split with lerp skips (hdit/hdit.py:738-918 executed
    directly with embed_gammas fed to the mapping network)."""
    torch = pytest.importorskip("torch")
    _ref_package("models", "/root/reference/models")
    _ref_package("models.modules", "/root/reference/models/modules")
    _ref_package("models.modules.hdit", "/root/reference/models/modules/hdit")
    from models.modules.hdit import hdit as ref_hdit

    torch.manual_seed(41)
    depths, widths = [1, 2], [64, 128]
    cfg = ref_hdit.HDiTConfig.__new__(ref_hdit.HDiTConfig)
    levels = []
    for i, (d, w) in enumerate(zip(depths, widths)):
        attn = (ref_hdit.ShiftedWindowAttentionSpec(32, 4)
                if i < len(depths) - 1
                else ref_hdit.GlobalAttentionSpec(32))
        levels.append(ref_hdit.LevelSpec(d, w, w * 3, attn, 0.0))
    mapping = ref_hdit.MappingSpec(2, 128, 128 * 3, 0.0)
    ref = ref_hdit.HDiT(levels, mapping, in_channel=6, out_channel=3,
                        patch_size=[2, 2]).eval()
    _unzero(ref, torch)

    rng = np.random.RandomState(43)
    x_np = rng.uniform(-1, 1, (2, 32, 32, 6)).astype(np.float32)
    emb_np = rng.randn(2, 128).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x_np).permute(0, 3, 1, 2),
                      torch.tensor(emb_np))
    ref_out = ref_out.permute(0, 2, 3, 1).numpy()

    conv = _load_tool("convert_vit_checkpoint")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = conv.map_hdit(sd, depths)

    import jax.numpy as jnp

    from joligen_tpu.models.modules.hdit import HDiT
    net = HDiT(patch_size=2, widths=tuple(widths), depths=tuple(depths),
               d_head=32, window=4, out_channels=3, mapping_depth=2,
               mid_dropout=0.0)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x_np), emb=jnp.asarray(emb_np)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


def test_ref_attn_unet_converted_weight_forward_parity():
    """UNetGeneratorRefAttn: dual-tower UNet where the ref tower exports
    qkv at each attention site and the main tower cross-attends
    (attn(q, k_ref, v_ref), 2C->C zero proj), ref decoder stopping at its
    terminal site (unet_generator_attn.py:1136-1660 executed directly)."""
    torch = pytest.importorskip("torch")
    ref_mod = _reference_unet_module()

    torch.manual_seed(31)
    res_blocks, mults, ngf, cond = [1, 1], (1, 2), 16, 32
    ref = ref_mod.UNetGeneratorRefAttn(
        image_size=16, in_channel=6, inner_channel=ngf, out_channel=3,
        res_blocks=res_blocks, attn_res=[2], tanh=False,
        n_timestep_train=10, n_timestep_test=5, norm="groupnorm",
        group_norm_size=8, cond_embed_dim=cond, dropout=0.0,
        channel_mults=mults, num_head_channels=8).eval()
    _unzero(ref, torch)

    rng = np.random.RandomState(37)
    x_np = rng.uniform(-1, 1, (2, 16, 16, 6)).astype(np.float32)
    ref_np = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    emb_np = rng.randn(2, cond).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x_np).permute(0, 3, 1, 2),
                      torch.tensor(emb_np),
                      ref=torch.tensor(ref_np).permute(0, 3, 1, 2))
    ref_out = ref_out.permute(0, 2, 3, 1).numpy()

    conv = _load_tool("convert_vit_checkpoint")
    sd = {f"denoise_fn.model.{k}": v.numpy()
          for k, v in ref.state_dict().items()}
    params = conv.map_ref_attn(sd, res_blocks, list(mults), [2],
                               num_heads=1, num_head_channels=8)

    import jax.numpy as jnp

    from joligen_tpu.models.modules.unet_ref_attn import UNetRefAttn
    net = UNetRefAttn(in_channel=6, out_channel=3, inner_channel=ngf,
                      cond_embed_dim=cond, res_blocks=tuple(res_blocks),
                      attn_res=(2,), channel_mults=mults,
                      num_head_channels=8, group_size=8)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x_np), jnp.asarray(emb_np), ref=jnp.asarray(ref_np)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


def test_unet_vid_converted_weight_forward_parity():
    """UNetVid: unet_mha spatial graph + AnimateDiff temporal motion
    modules after every encoder/decoder group, new-order QKV attention
    (unet_generator_attn_vid.py:1057-1407 executed directly), motion
    weights included."""
    torch = pytest.importorskip("torch")
    _reference_unet_module()  # installs package stubs
    from models.modules.unet_generator_attn import unet_generator_attn_vid

    torch.manual_seed(19)
    # motion norm_num_groups is hardcoded 32 in the reference -> >=32ch
    res_blocks, mults, ngf, cond = [1, 1], (1, 2), 32, 32
    ref = unet_generator_attn_vid.UNetVid(
        image_size=16, in_channel=6, inner_channel=ngf, out_channel=3,
        res_blocks=res_blocks, attn_res=[2], tanh=False,
        n_timestep_train=10, n_timestep_test=5, norm="groupnorm",
        group_norm_size=8, cond_embed_dim=cond, dropout=0.0,
        channel_mults=mults, num_head_channels=16,
        max_sequence_length=8, num_attention_heads=4,
        num_transformer_blocks=2).eval()
    _unzero(ref, torch)

    rng = np.random.RandomState(29)
    B, F = 2, 3
    x_np = rng.uniform(-1, 1, (B, F, 16, 16, 6)).astype(np.float32)
    emb_np = rng.randn(B, cond).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x_np).permute(0, 1, 4, 2, 3),
                      torch.tensor(emb_np))
    ref_out = ref_out.permute(0, 1, 3, 4, 2).numpy()

    conv = _load_tool("convert_vit_checkpoint")
    sd = {f"denoise_fn.model.{k}": v.numpy()
          for k, v in ref.state_dict().items()}
    params = conv.map_unet_vid(sd, res_blocks, list(mults), [2])

    import jax.numpy as jnp

    from joligen_tpu.models.modules.unet_vid import UNetVid
    net = UNetVid(in_channel=6, out_channel=3, inner_channel=ngf,
                  cond_embed_dim=cond, res_blocks=tuple(res_blocks),
                  attn_res=(2,), channel_mults=mults, num_head_channels=16,
                  group_size=8, attn_norm="instance",
                  max_sequence_length=8, motion_num_heads=4,
                  motion_num_transformer_blocks=2)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x_np), jnp.asarray(emb_np)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


def test_jitvid_converted_weight_forward_parity():
    """JiTViD: JiT spatial blocks + temporal MotionModules (GroupNorm ->
    proj_in -> 2x VersatileAttention temporal blocks -> zero proj_out),
    reference vit_vid.py:727-1330 executed directly, MOTION WEIGHTS
    INCLUDED (un-zeroed proj_out so the temporal path is exercised)."""
    torch = pytest.importorskip("torch")
    _reference_vit_importable()
    from models.modules.vit import vit_vid as ref_vv

    torch.manual_seed(13)
    depth, d, heads, p, icl, ics = 3, 96, 2, 4, 4, 1
    ref = ref_vv.JiTViD(
        input_size=16, patch_size=p, in_channels=3, hidden_size=d,
        depth=depth, num_heads=heads, num_classes=2, bottleneck_dim=16,
        in_context_len=icl, in_context_start=ics, num_register_tokens=2,
        motion_every=2, max_frames=8).eval()
    _unzero(ref, torch)

    rng = np.random.RandomState(17)
    B, F = 2, 3
    x_np = rng.uniform(-1, 1, (B, F, 16, 16, 3)).astype(np.float32)
    t_np = np.asarray([0.3, 0.6], np.float32)
    y_np = np.asarray([1, 0], np.int64)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x_np).permute(0, 1, 4, 2, 3),
                      torch.tensor(t_np), torch.tensor(y_np))
    ref_out = ref_out.permute(0, 1, 3, 4, 2).numpy()

    conv = _load_tool("convert_vit_checkpoint")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = conv.map_jitvid_g(sd, depth=depth, in_context_start=ics,
                               motion_every=2)

    import jax.numpy as jnp

    from joligen_tpu.models.modules.vit_vid import JiTViD
    net = JiTViD(patch_size=p, hidden_size=d, depth=depth, num_heads=heads,
                 bottleneck_dim=16, num_classes=2, in_context_len=icl,
                 in_context_start=ics, num_register_tokens=2,
                 motion_every=2, max_frames=8, out_channels=3)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x_np), jnp.asarray(t_np), jnp.asarray(y_np)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)
