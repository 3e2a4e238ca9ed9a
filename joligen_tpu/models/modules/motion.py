"""Temporal motion modules (AnimateDiff-style) for video denoisers.

Behavioral rebuild of the reference MotionModule/TemporalTransformer3DModel
(models/modules/unet_generator_attn/unet_generator_attn_vid.py:374-560 and
vit/vit_vid.py:311-470): per-spatial-location self-attention over the frame
axis with sinusoidal temporal positional encodings, GEGLU feed-forward, and
zero-initialized output projection so a freshly added motion module is the
identity (enables finetuning an image model into a video model).

TPU-first: frames ride the batch axis everywhere except inside the temporal
attention, where the tensor is reshaped to (B*H*W, F, C) sequences — F is
small (<=25) so this is a perfectly MXU-shaped batched matmul; attention
runs through the Pallas flash kernel on TPU (XLA fallback elsewhere).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

zeros_init = nn.initializers.zeros


def temporal_pos_encoding(max_len, d):
    """Classic sinusoidal PE table (reference PositionalEncoding,
    unet_generator_attn_vid.py:932-948)."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * (-np.log(10000.0) / d))
    pe = np.zeros((max_len, d), dtype=np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)[:, : d // 2]
    return pe.astype(np.float32)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(2 * self.dim_out, dtype=self.dtype, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu — reference GEGLU uses F.gelu's default
        # (vit_vid.py:618-640), not the tanh approximation
        return a * nn.gelu(gate, approximate=False)


class TemporalSelfAttention(nn.Module):
    """One temporal self-attention over the frame axis. Input (S, F, C)."""
    num_heads: int
    max_len: int = 25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s, f, c = x.shape
        pe = temporal_pos_encoding(self.max_len, c)[:f]
        h = x + jnp.asarray(pe, x.dtype)[None]
        heads = self.num_heads
        hd = c // heads
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_v")(h)
        q = q.reshape(s, f, heads, hd)
        k = k.reshape(s, f, heads, hd)
        v = v.reshape(s, f, heads, hd)
        from ...ops.flash_attention import flash_attention
        a = flash_attention(q, k, v).reshape(s, f, c)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(a)


class TemporalTransformerBlock(nn.Module):
    """norm -> temporal attn (x2) -> norm -> GEGLU FF, all residual
    (reference TemporalTransformerBlock, unet_generator_attn_vid.py:516-592)."""
    num_heads: int
    num_attention_blocks: int = 2
    max_len: int = 25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_attention_blocks):
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(x)
            x = x + TemporalSelfAttention(
                self.num_heads, max_len=self.max_len, dtype=self.dtype,
                name=f"attn{i}")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff")(x)
        h = GEGLU(x.shape[-1] * 4, dtype=self.dtype, name="ff_geglu")(h)
        x = x + nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(h)
        return x


class MotionModule(nn.Module):
    """Temporal transformer over the frame axis of (B, F, H, W, C) features.

    GroupNorm -> proj_in -> N temporal transformer blocks -> zero-init
    proj_out, residual (reference MotionModule + TemporalTransformer3DModel).
    """
    num_heads: int = 8
    num_transformer_blocks: int = 2
    max_len: int = 25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        groups = 32
        while c % groups:
            groups -= 1
        res = x
        y = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(
            x.reshape(b * f, h, w, c).astype(self.dtype))
        y = nn.Dense(c, dtype=self.dtype, name="proj_in")(y)
        # (B,F,H,W,C) -> (B*H*W, F, C) temporal sequences
        y = y.reshape(b, f, h * w, c).transpose(0, 2, 1, 3).reshape(b * h * w, f, c)
        for i in range(self.num_transformer_blocks):
            y = TemporalTransformerBlock(
                self.num_heads, max_len=self.max_len, dtype=self.dtype,
                name=f"block{i}")(y)
        y = y.reshape(b, h * w, f, c).transpose(0, 2, 1, 3).reshape(b, f, h, w, c)
        y = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                     bias_init=zeros_init, name="proj_out")(y)
        return res + y
