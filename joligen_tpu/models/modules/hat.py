"""HAT — Hybrid Attention Transformer super-resolution generator
(reference models/modules/hat/hat.py, arXiv 2205.04437).

Residual Hybrid Attention Groups: each block couples shifted-window
self-attention with a parallel channel-attention conv branch (scaled by
conv_scale), groups end with an overlapping cross-attention block and a
residual conv; reconstruction is a pixel-shuffle upsampler. Rebuilt NHWC
for TPU: window partitioning is pure reshape/transpose, attention runs on
the MXU with fp32 softmax, channel attention is a squeeze-excite.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def window_partition(x, wsz):
    b, h, w, c = x.shape
    x = x.reshape(b, h // wsz, wsz, w // wsz, wsz, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wsz * wsz, c)


def window_merge(wins, wsz, h, w):
    b = wins.shape[0] // ((h // wsz) * (w // wsz))
    x = wins.reshape(b, h // wsz, w // wsz, wsz, wsz, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class ChannelAttentionBlock(nn.Module):
    """CAB: conv -> gelu -> conv -> squeeze-excite channel attention."""
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(max(1, c // self.compress_ratio), (3, 3), padding=1,
                    dtype=self.dtype, name="c1")(x)
        h = nn.gelu(h)
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="c2")(h)
        s = jnp.mean(h, axis=(1, 2))
        s = nn.Dense(max(1, c // self.squeeze_factor), dtype=self.dtype,
                     name="se1")(s)
        s = nn.relu(s)
        s = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="se2")(s))
        return h * s[:, None, None, :]


class WindowAttention(nn.Module):
    num_heads: int
    wsz: int
    shift: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        wins = window_partition(x, self.wsz)          # (nW, T, C)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(wins)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.num_heads
        n, t, _ = q.shape
        q = q.reshape(n, t, self.num_heads, hd)
        k = k.reshape(n, t, self.num_heads, hd)
        v = v.reshape(n, t, self.num_heads, hd)
        # relative position bias (Swin-style)
        nbias = (2 * self.wsz - 1) ** 2
        table = self.param("rel_bias", nn.initializers.normal(0.02),
                           (nbias, self.num_heads))
        coords = jnp.stack(jnp.meshgrid(jnp.arange(self.wsz),
                                        jnp.arange(self.wsz),
                                        indexing="ij"), -1).reshape(-1, 2)
        rel = coords[:, None] - coords[None, :] + self.wsz - 1
        idx = rel[..., 0] * (2 * self.wsz - 1) + rel[..., 1]
        bias = jnp.take(table, idx.reshape(-1), axis=0).reshape(
            t, t, self.num_heads).transpose(2, 0, 1)
        logits = jnp.einsum("nthd,nshd->nhts", q, k) / math.sqrt(hd)
        logits = logits + bias[None].astype(logits.dtype)
        p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("nhts,nshd->nthd", p, v).reshape(n, t, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        y = window_merge(out, self.wsz, h, w)
        if self.shift:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        return y


class HAB(nn.Module):
    """Hybrid attention block: window attn + conv_scale * CAB, then MLP."""
    num_heads: int
    wsz: int
    shift: int = 0
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.LayerNorm(dtype=jnp.float32, name="n1")(x).astype(self.dtype)
        attn = WindowAttention(self.num_heads, self.wsz, self.shift,
                               dtype=self.dtype, name="attn")(y)
        cab = ChannelAttentionBlock(dtype=self.dtype, name="cab")(y)
        x = x + attn + self.conv_scale * cab
        y = nn.LayerNorm(dtype=jnp.float32, name="n2")(x).astype(self.dtype)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(y)
        y = nn.gelu(y)
        return x + nn.Dense(c, dtype=self.dtype, name="fc2")(y)


class OCAB(nn.Module):
    """Overlapping cross-attention block: queries from windows, keys/values
    from enlarged (overlapping) windows — approximated with an extra
    unshifted window attention over 2x window size when divisible."""
    num_heads: int
    wsz: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        wsz = self.wsz * 2 if (h % (self.wsz * 2) == 0
                               and w % (self.wsz * 2) == 0) else self.wsz
        y = nn.LayerNorm(dtype=jnp.float32, name="n")(x).astype(self.dtype)
        return x + WindowAttention(self.num_heads, wsz, dtype=self.dtype,
                                   name="attn")(y)


class RHAG(nn.Module):
    """Residual hybrid attention group."""
    depth: int
    num_heads: int
    wsz: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.depth):
            h = HAB(self.num_heads, self.wsz,
                    shift=(self.wsz // 2 if i % 2 else 0),
                    dtype=self.dtype, name=f"hab{i}")(h)
        h = OCAB(self.num_heads, self.wsz, dtype=self.dtype, name="ocab")(h)
        h = nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(h)
        return x + h


class HAT(nn.Module):
    """call(x (B,H,W,C) in [-1,1]) -> (B, H*upscale, W*upscale, out)."""
    out_channels: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: int = 6
    window_size: int = 16
    upscale: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, extract_layer_ids=None):
        b, H, W, C = x.shape
        wsz = self.window_size
        # pad to window multiples
        ph = (-H) % wsz
        pw = (-W) % wsz
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), "reflect") \
            if (ph or pw) else x
        shallow = nn.Conv(self.embed_dim, (3, 3), padding=1,
                          dtype=self.dtype, name="shallow")(
            xp.astype(self.dtype))
        h = shallow
        feats = []
        for gi, depth in enumerate(self.depths):
            h = RHAG(depth, self.num_heads, wsz, dtype=self.dtype,
                     name=f"rhag{gi}")(h)
            feats.append(h)
        if extract_layer_ids is not None:
            return [feats[i] for i in extract_layer_ids]
        h = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="body_conv")(h) + shallow
        # pixelshuffle reconstruction
        s = self.upscale
        if s > 1:
            h = nn.Conv(self.embed_dim * s * s, (3, 3), padding=1,
                        dtype=self.dtype, name="up_conv")(h)
            n, hh, ww, _ = h.shape
            h = h.reshape(n, hh, ww, s, s, self.embed_dim)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh * s, ww * s,
                                                      self.embed_dim)
        out = nn.Conv(self.out_channels, (3, 3), padding=1,
                      dtype=self.dtype, name="out_conv")(h)
        out = out[:, : H * s, : W * s]
        return jnp.tanh(out).astype(jnp.float32)
