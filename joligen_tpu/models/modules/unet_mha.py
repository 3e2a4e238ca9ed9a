"""Guided-diffusion style UNet ("unet_mha") in flax, NHWC, TPU-first.

Behavioral parity with the reference UNet
(models/modules/unet_generator_attn/unet_generator_attn.py:390-736):
FiLM scale-shift GroupNorm ResBlocks, self-attention at configured
downsample rates, resblock up/down sampling, zero-initialized output
projections, and a GAN mode (tanh head + constant embedding). Rebuilt
rather than ported: NHWC layout for TPU convolutions, Pallas flash
attention on TPU (ops/flash_attention.py), compute-dtype (bf16) policy with
fp32 params, and optional rematerialization instead of torch checkpointing.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

zeros_init = nn.initializers.zeros
default_kernel = nn.initializers.lecun_normal()

# Tag for the selective remat policy: MXU-op outputs (convs, attention)
# carry this name so ``remat_policy="conv"`` saves exactly those residuals
# and recomputes only the elementwise norm/FiLM/SiLU chains in backward.
# ``checkpoint_name`` is an identity outside a jax.checkpoint region.
REMAT_SAVE = "mxu_out"


def _ckpt(x):
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(x, REMAT_SAVE)


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 STATISTICS but compute-dtype IO.

    flax's ``_compute_stats`` always accumulates mean/var in float32, so
    keeping the surrounding elementwise math in the compute dtype (bf16
    under the default policy) loses no statistical precision while halving
    the norm's HBM traffic — measured +8% on the 256px train step, which
    is HBM-bandwidth-bound (BASELINE.md roofline)."""
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups:
            groups -= 1
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                            dtype=x.dtype)(x)


def _norm(kind: str, group_size: int):
    if "groupnorm" in kind:
        return GroupNorm32(num_groups=group_size)
    if kind == "instancenorm":
        return GroupNorm32(num_groups=10 ** 9)  # clipped to C groups
    if kind == "layernorm":
        return GroupNorm32(num_groups=1)
    # batchnorm/switchablenorm degrade to groupnorm on TPU (no cross-device
    # batch stats needed; reference default for unet_mha is groupnorm anyway)
    return GroupNorm32(num_groups=group_size)


def _to_pixel(x, freq_space):
    if freq_space:
        from ...ops.upfirdn2d import inverse_haar_transform
        return inverse_haar_transform(x)
    return x


def _to_freq(x, freq_space):
    if freq_space:
        from ...ops.upfirdn2d import haar_transform
        return haar_transform(x)
    return x


class Upsample(nn.Module):
    out_channel: int
    use_conv: bool = True
    freq_space: bool = False   # resample in pixel space (reference :82-96)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...ops.resize import nearest_up2
        x = _to_pixel(x, self.freq_space)
        x = nearest_up2(x)
        if self.use_conv:
            ch = self.out_channel // 4 if self.freq_space else self.out_channel
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(x)
        return _to_freq(x, self.freq_space)


class Downsample(nn.Module):
    out_channel: int
    use_conv: bool = True
    freq_space: bool = False   # resample in pixel space (reference :106-140)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _to_pixel(x, self.freq_space)
        if self.use_conv:
            ch = self.out_channel // 4 if self.freq_space else self.out_channel
            x = nn.Conv(ch, (3, 3), strides=2, padding=1,
                        dtype=self.dtype)(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return _to_freq(x, self.freq_space)


class ResBlock(nn.Module):
    """FiLM-conditioned residual block (reference unet_generator_attn.py:141-272)."""
    out_channel: int
    norm: str = "groupnorm"
    group_size: int = 32
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    freq_space: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic=True):
        h = _norm(self.norm, self.group_size)(x)
        h = nn.silu(h)

        def _resample(t, up):
            # freq-space resamples happen in pixel space (reference
            # unet_generator_attn.py:82-96,131-140 wavelet Up/Downsample)
            from ...ops.resize import nearest_up2
            t = _to_pixel(t, self.freq_space)
            t = (nearest_up2(t) if up
                 else nn.avg_pool(t, (2, 2), strides=(2, 2)))
            return _to_freq(t, self.freq_space)

        if self.up:
            h = _resample(h, True)
            x = _resample(x, True)
        elif self.down:
            h = _resample(h, False)
            x = _resample(x, False)

        h = _ckpt(nn.Conv(self.out_channel, (3, 3), padding=1,
                          dtype=self.dtype, name="in_conv")(h))

        emb_out = nn.Dense(
            2 * self.out_channel if self.use_scale_shift_norm else self.out_channel,
            dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _norm(self.norm, self.group_size)(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = _norm(self.norm, self.group_size)(h)
            h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _ckpt(nn.Conv(self.out_channel, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=zeros_init,
                          bias_init=zeros_init, name="out_conv")(h))

        if x.shape[-1] != self.out_channel:
            x = _ckpt(nn.Conv(self.out_channel, (1, 1), dtype=self.dtype,
                              name="skip")(x))
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention (reference unet_generator_attn.py:269-330),
    with the qk scaling applied pre-softmax for bf16 stability and softmax
    in fp32. Uses the XLA fused dot-product-attention path.

    ``norm_kind="instance"`` reproduces the reference's pre-attention
    normalization exactly (normalization1d = parameterless InstanceNorm1d,
    unet_attn_utils.py:60-66,116-117) — required when loading converted
    reference checkpoints; the framework default is groupnorm."""
    num_heads: int = 1
    num_head_channels: int = -1
    norm_kind: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        heads = (self.num_heads if self.num_head_channels == -1
                 else max(1, c // self.num_head_channels))
        hd = c // heads
        seq = x.reshape(n, h * w, c)
        if self.norm_kind == "instance":
            f32 = seq.astype(jnp.float32)
            mu = f32.mean(axis=1, keepdims=True)
            var = f32.var(axis=1, keepdims=True)
            y = ((f32 - mu) / jnp.sqrt(var + 1e-5)).astype(seq.dtype)
        else:
            y = _norm("groupnorm", 32)(
                seq.reshape(n, h * w, 1, c)).reshape(n, h * w, c)
        qkv = _ckpt(nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, h * w, heads, hd)
        k = k.reshape(n, h * w, heads, hd)
        v = v.reshape(n, h * w, heads, hd)
        from ...ops.flash_attention import flash_attention
        a = _ckpt(flash_attention(q, k, v))
        a = a.reshape(n, h * w, c)
        a = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                     bias_init=zeros_init, name="proj_out")(a)
        return x + a.reshape(n, h, w, c)


def sinu_pos_encoding_1d(n, channels):
    """Interleaved [sin f0, cos f0, sin f1, ...] 1D table — the
    positional_encodings package's PositionalEncoding1D used by the
    reference UViT (unet_generator_attn.py:877-878,975-977)."""
    ch = int(np.ceil(channels / 2) * 2)
    inv = 1.0 / (10000 ** (np.arange(0, ch, 2, dtype=np.float64) / ch))
    sin_inp = np.arange(n, dtype=np.float64)[:, None] * inv[None]
    emb = np.stack([np.sin(sin_inp), np.cos(sin_inp)], -1).reshape(n, ch)
    return emb[:, :channels].astype(np.float32)


def _uvit_layernorm(x):
    """Reference LayerNorm(scale=False) (unet_generator_attn.py:714-731):
    fp32 stats over the last dim, rsqrt of var CLAMPED at eps (not
    var+eps), no affine."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return ((x32 - mean)
            * jax.lax.rsqrt(jnp.clip(var, 1e-5))).astype(x.dtype)


class UViTFeedForward(nn.Module):
    """Reference UViT FeedForward (unet_generator_attn.py:734-763):
    NON-residual token MLP — LayerNorm(no scale) -> bias-free Dense(4C) ->
    SiLU -> FiLM on the HIDDEN dim (zero-init from emb) -> bias-free
    Dense(C). Output REPLACES the input (EmbedSequential chaining)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        c = x.shape[-1]
        h = _uvit_layernorm(x)
        h = nn.silu(nn.Dense(4 * c, use_bias=False, dtype=self.dtype,
                             name="proj_in")(h))
        e = nn.Dense(8 * c, dtype=self.dtype, kernel_init=zeros_init,
                     bias_init=zeros_init,
                     name="to_scale_shift")(nn.silu(emb))
        scale, shift = jnp.split(e[:, None, :], 2, axis=-1)
        h = h * (scale + 1) + shift
        return nn.Dense(c, use_bias=False, dtype=self.dtype,
                        name="proj_out")(h)


class UViTAttention(nn.Module):
    """Reference UViT middle attention (AttentionBlock with
    use_transformer=True, unet_generator_attn.py:269-319): the (B, N, C)
    token buffer is REINTERPRETED (reshape, not transpose) as (B, C, N),
    InstanceNorm1d'd per channel, 1x1-conv qkv'd, QKVAttentionLegacy'd
    with the double-sqrt scale, zero-init projected, residually added,
    and reinterpreted back. The reshapes are memory reinterpretations in
    the reference; parity requires reproducing them exactly."""
    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        b, n, c = z.shape
        za = z.reshape(b, c, n)            # memory reinterpretation
        # InstanceNorm1d (no affine): fp32 stats per channel over length
        za32 = za.astype(jnp.float32)
        mu = za32.mean(axis=-1, keepdims=True)
        var = za32.var(axis=-1, keepdims=True)
        zn = ((za32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(self.dtype)

        heads = (self.num_heads if self.num_head_channels == -1
                 else max(1, c // self.num_head_channels))
        hd = c // heads
        wq = self.param("qkv_kernel", nn.initializers.lecun_normal(),
                        (3 * c, c)).astype(self.dtype)
        bq = self.param("qkv_bias", zeros_init, (3 * c,)).astype(self.dtype)
        qkv = jnp.einsum("oc,bcn->bon", wq, zn) + bq[None, :, None]
        # QKVAttentionLegacy: (B, heads*3*hd, N) -> (B*heads, 3hd, N)
        qkv = qkv.reshape(b * heads, 3 * hd, n)
        q, k, v = jnp.split(qkv, 3, axis=1)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(hd, jnp.float32)))
        w = jnp.einsum("bct,bcs->bts", (q * scale).astype(jnp.float32),
                       (k * scale).astype(jnp.float32))
        w = jax.nn.softmax(w, axis=-1).astype(self.dtype)
        a = jnp.einsum("bts,bcs->bct", w, v).reshape(b, c, n)
        wo = self.param("proj_kernel", zeros_init, (c, c)).astype(self.dtype)
        bo = self.param("proj_bias", zeros_init, (c,)).astype(self.dtype)
        a = jnp.einsum("oc,bcn->bon", wo, a) + bo[None, :, None]
        return (za + a).reshape(b, n, c)   # reinterpretation back


class TransformerBlock(nn.Module):
    """One UViT middle entry: EmbedSequential(FeedForward, AttentionBlock)
    — FF first (non-residual), then attention (reference
    unet_generator_attn.py:879-893). Operates on the (B, N, C) token
    buffer produced by UNetMHA's CHW-memory reshape."""
    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, emb):
        z = UViTFeedForward(dtype=self.dtype, name="ff")(z, emb)
        return UViTAttention(num_heads=self.num_heads,
                             num_head_channels=self.num_head_channels,
                             dtype=self.dtype, name="attn")(z)


class UNetMHA(nn.Module):
    """The unet_mha denoiser/generator.

    Config mirrors reference UNet.__init__ (unet_generator_attn.py:417-445);
    ``tanh=True`` gives the GAN generator variant (gan_networks.py:209-226)
    where the embedding input is a constant ones vector.
    """

    in_channel: int
    out_channel: int
    inner_channel: int
    cond_embed_dim: int
    res_blocks: Sequence[int] = (2, 2, 2, 2)
    attn_res: Sequence[int] = (16,)
    channel_mults: Sequence[int] = (1, 2, 4, 8)
    num_heads: int = 1
    num_head_channels: int = 32
    norm: str = "groupnorm"
    group_size: int = 32
    dropout: float = 0.0
    tanh: bool = False
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    transformer_blocks: int = 0   # >0 = UViT: transformer middle stack
    attn_norm: str = "group"      # "instance" = reference-exact attention norm
    freq_space: bool = False      # train_feat_wavelet: trunk in Haar space
    remat: bool = False
    remat_policy: str = "conv"    # "conv": save MXU outputs, recompute the
    # elementwise norm/FiLM/SiLU chains (bandwidth lever on a step that is
    # HBM-bound — BASELINE.md roofline); "full": save nothing (max memory
    # headroom, recomputes convs too)
    dtype: jnp.dtype = jnp.float32

    def _block_args(self):
        return dict(norm=self.norm, group_size=self.group_size,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    freq_space=self.freq_space,
                    dtype=self.dtype)

    @nn.compact
    def __call__(self, x, emb=None, deterministic=True, extract_layer_ids=None):
        """x: (B, H, W, in_channel). emb: (B, cond_embed_dim) or None (GAN mode).

        If ``extract_layer_ids`` is given, returns the list of encoder
        features at those indices (for CUT-style NCE on diffusion backbones,
        reference UNet.get_feats).
        """
        if emb is None:
            emb = jnp.ones((x.shape[0], self.cond_embed_dim), dtype=self.dtype)
        emb = emb.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.freq_space:
            # train_feat_wavelet: the whole trunk runs on the Haar bands
            # (reference unet_generator_attn.py:465-472,672,692)
            x = _to_freq(x, True)

        # static arg = `deterministic` (flax counts self as argnum 0, so
        # __call__(self, x, emb, deterministic) puts it at 3; (2,)
        # would wrongly mark the traced embedding static)
        if self.remat:
            kw = {}
            if self.remat_policy == "conv":
                kw = dict(policy=jax.checkpoint_policies
                          .save_only_these_names(REMAT_SAVE),
                          prevent_cse=False)
            RematRes = nn.remat(ResBlock, static_argnums=(3,), **kw)
            RematAttn = nn.remat(AttentionBlock, **kw)
        else:
            RematRes, RematAttn = ResBlock, AttentionBlock
        # nn.remat renames the lifted class (ResBlock -> CheckpointResBlock),
        # which would silently fork the param tree between remat and
        # non-remat runs — checkpoints must interchange, so pin the
        # auto-naming explicitly (ResBlock_i / AttentionBlock_i in
        # instantiation order, exactly what non-remat auto-naming yields).
        counters = {"res": 0, "attn": 0}

        def Res(**f):
            m = RematRes(name=f"ResBlock_{counters['res']}", **f)
            counters["res"] += 1
            return m

        def Attn(**f):
            m = RematAttn(name=f"AttentionBlock_{counters['attn']}", **f)
            counters["attn"] += 1
            return m
        args = self._block_args()

        ch = int(self.channel_mults[0] * self.inner_channel)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(x)
        hs = [h]
        ds = 1
        # Reference UViT (unet_generator_attn.py:835-923) has NO
        # encoder/decoder attention and always uses plain conv resampling,
        # regardless of attn_res / resblock_updown.
        is_uvit = self.transformer_blocks > 0
        # encoder
        for level, mult in enumerate(self.channel_mults):
            for _ in range(self.res_blocks[level]):
                ch = int(mult * self.inner_channel)
                h = Res(out_channel=ch, **args)(h, emb, deterministic)
                if ds in self.attn_res and not is_uvit:
                    h = Attn(num_heads=self.num_heads,
                                       num_head_channels=self.num_head_channels,
                                       norm_kind=self.attn_norm,
                                       dtype=self.dtype)(h)
                hs.append(h)
            if level != len(self.channel_mults) - 1:
                if self.resblock_updown and not is_uvit:
                    h = Res(out_channel=ch, down=True, **args)(h, emb, deterministic)
                else:
                    h = Downsample(ch, freq_space=self.freq_space,
                                   dtype=self.dtype)(h)
                hs.append(h)
                ds *= 2

        if extract_layer_ids is not None:
            return [hs[i] for i in extract_layer_ids]

        # middle
        if self.transformer_blocks > 0:   # UViT variant
            # Reference UViT tokenization (unet_generator_attn.py:973-982):
            # the NCHW buffer is reshaped (B, H*W, C) WITHOUT a transpose —
            # tokens are contiguous C-sized chunks of the CHW-flat volume —
            # then the positional_encodings-package 1D table is added.
            n_, hh_, ww_, c_ = h.shape
            z = h.transpose(0, 3, 1, 2).reshape(n_, hh_ * ww_, c_)
            z = z + jnp.asarray(sinu_pos_encoding_1d(hh_ * ww_, c_),
                                z.dtype)[None]
            for ti in range(self.transformer_blocks):
                z = TransformerBlock(num_heads=self.num_heads,
                                     num_head_channels=self.num_head_channels,
                                     dtype=self.dtype, name=f"mid_t{ti}")(z, emb)
            h = z.reshape(n_, c_, hh_, ww_).transpose(0, 2, 3, 1)
        else:
            h = Res(out_channel=ch, dropout=self.dropout, **args)(h, emb, deterministic)
            h = Attn(num_heads=self.num_heads,
                     num_head_channels=self.num_head_channels,
                     norm_kind=self.attn_norm, dtype=self.dtype)(h)
            h = Res(out_channel=ch, dropout=self.dropout, **args)(h, emb, deterministic)

        # decoder
        for level, mult in reversed(list(enumerate(self.channel_mults))):
            for i in range(self.res_blocks[level] + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                ch = int(mult * self.inner_channel)
                h = Res(out_channel=ch, **args)(h, emb, deterministic)
                if ds in self.attn_res and not is_uvit:
                    h = Attn(num_heads=self.num_heads,
                                       num_head_channels=self.num_head_channels,
                                       norm_kind=self.attn_norm,
                                       dtype=self.dtype)(h)
                if level and i == self.res_blocks[level]:
                    if self.resblock_updown and not is_uvit:
                        h = Res(out_channel=ch, up=True, **args)(h, emb, deterministic)
                    else:
                        h = Upsample(ch, freq_space=self.freq_space,
                                     dtype=self.dtype)(h)
                    ds //= 2

        h = _norm(self.norm, self.group_size)(h)
        out_ch = self.out_channel * 4 if self.freq_space else self.out_channel
        if self.tanh:
            out = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                          name="out_proj")(h)
            # reference applies tanh to the frequency bands and THEN
            # inverse-transforms (unet_generator_attn.py:684-695)
            out = _to_pixel(jnp.tanh(out), self.freq_space)
            return out.astype(jnp.float32)
        h = nn.silu(h)
        out = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                      kernel_init=zeros_init, bias_init=zeros_init,
                      name="out_proj")(h)
        out = _to_pixel(out, self.freq_space)
        return out.astype(jnp.float32)
