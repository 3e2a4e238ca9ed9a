"""HDiT — hourglass diffusion transformer (reference models/modules/hdit/,
arXiv 2401.11605 "Scalable High-Resolution Pixel-Space Image Synthesis").

Hourglass of transformer levels: shallow levels use windowed neighborhood
attention over high-resolution tokens, the bottleneck uses global attention;
token merging/splitting is a pure space-to-depth/depth-to-space reshape
(free on TPU), skip connections are learnable lerps. Positional information
comes from axial RoPE applied to q/k (reference hdit/axial_rope.py).
Conditioning is AdaLN on the timestep (+class) embedding.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.schedules import timestep_embedding
from .jit import RMSNorm


def axial_rope_freqs(dim, h, w, base=10000.0):
    """Axial RoPE angle tables: half the head dim rotates with row position,
    half with column (reference axial_rope.py). Returns (h*w, dim//2)."""
    quarter = dim // 4
    freqs = 1.0 / base ** (np.arange(quarter, dtype=np.float64) / quarter)
    ys = np.arange(h, dtype=np.float64)[:, None] * freqs[None]   # (h, q)
    xs = np.arange(w, dtype=np.float64)[:, None] * freqs[None]   # (w, q)
    ang_y = np.broadcast_to(ys[:, None, :], (h, w, quarter))
    ang_x = np.broadcast_to(xs[None, :, :], (h, w, quarter))
    ang = np.concatenate([ang_y, ang_x], axis=-1).reshape(h * w, 2 * quarter)
    return ang.astype(np.float32)


def apply_rope(x, ang):
    """x: (..., T, D); ang: (T, D//2) angles. Rotates pairs."""
    d2 = ang.shape[-1]
    x1, x2 = x[..., :d2], x[..., d2:2 * d2]
    rest = x[..., 2 * d2:]
    cos = jnp.cos(ang).astype(x.dtype)
    sin = jnp.sin(ang).astype(x.dtype)
    y1 = x1 * cos - x2 * sin
    y2 = x1 * sin + x2 * cos
    return jnp.concatenate([y1, y2, rest], axis=-1)


class HDiTBlock(nn.Module):
    """Transformer block with RoPE attention (windowed or global) + GEGLU
    FFN, AdaLN-modulated.

    ``shift``: Swin-style cyclic shift of the window partition. The
    reference's shallow levels use overlapped NEIGHBORHOOD attention
    (hdit/hdit.py, natten); alternating shifted windows are the
    TPU-friendly equivalent — information crosses window borders every
    second block instead of through per-pixel overlapping windows (which
    gather poorly on TPU). RoPE is applied BEFORE the shift so each
    token keeps its true absolute rotation."""
    num_heads: int
    window: int = 0        # 0 = global attention
    shift: int = 0         # cyclic shift of the window partition
    grid: Sequence[int] = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        b, t, d = x.shape
        gh, gw = self.grid
        mod = nn.Dense(6 * d, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       name="adaLN")(nn.silu(c))
        s1, g1, a1, s2, g2, a2 = jnp.split(mod, 6, axis=-1)

        h = RMSNorm(name="norm1")(x) * (1 + g1[:, None]) + s1[:, None]
        qkv = nn.Dense(3 * d, use_bias=False, dtype=self.dtype,
                       name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // self.num_heads
        q = q.reshape(b, t, self.num_heads, hd)
        k = k.reshape(b, t, self.num_heads, hd)
        v = v.reshape(b, t, self.num_heads, hd)
        ang = jnp.asarray(axial_rope_freqs(hd, gh, gw))
        q = apply_rope(q.transpose(0, 2, 1, 3), ang).transpose(0, 2, 1, 3)
        k = apply_rope(k.transpose(0, 2, 1, 3), ang).transpose(0, 2, 1, 3)

        if self.window and self.window < min(gh, gw):
            wsz = self.window
            nwh, nww = gh // wsz, gw // wsz
            shift = self.shift % wsz

            def to_windows(z):
                z = z.reshape(b, gh, gw, self.num_heads, hd)
                if shift:
                    z = jnp.roll(z, (-shift, -shift), axis=(1, 2))
                z = z.reshape(b, nwh, wsz, nww, wsz, self.num_heads, hd)
                z = z.transpose(0, 1, 3, 2, 4, 5, 6)
                return z.reshape(b * nwh * nww, wsz * wsz, self.num_heads, hd)

            qw, kw, vw = map(to_windows, (q, k, v))
            if shift:
                # Swin seam mask: cyclically wrapped tokens (opposite image
                # borders rolled into one window) must not attend to each
                # other. Windows are tiny (wsz^2 tokens), so the XLA fused
                # path with an additive bias beats the Pallas kernel here.
                from .mat import _shift_attn_bias
                bias = _shift_attn_bias(gh, gw, wsz, shift)
                bias = jnp.tile(bias, (b, 1, 1))[:, None].astype(qw.dtype)
                aw = jax.nn.dot_product_attention(qw, kw, vw, bias=bias)
            else:
                from ...ops.flash_attention import flash_attention
                aw = flash_attention(qw, kw, vw)
            a = aw.reshape(b, nwh, nww, wsz, wsz, self.num_heads, hd)
            a = a.transpose(0, 1, 3, 2, 4, 5, 6)
            if shift:
                a = a.reshape(b, gh, gw, self.num_heads, hd)
                a = jnp.roll(a, (shift, shift), axis=(1, 2))
            a = a.reshape(b, t, d)
        else:
            from ...ops.flash_attention import flash_attention
            a = flash_attention(q, k, v).reshape(b, t, d)

        x = x + a1[:, None] * nn.Dense(d, use_bias=False, dtype=self.dtype,
                                       name="proj")(a)
        h = RMSNorm(name="norm2")(x) * (1 + g2[:, None]) + s2[:, None]
        u = nn.Dense(2 * d * 3, use_bias=False, dtype=self.dtype,
                     name="ff_in")(h)
        uu, gate = jnp.split(u, 2, axis=-1)
        h = nn.Dense(d, use_bias=False, dtype=self.dtype,
                     name="ff_out")(uu * nn.gelu(gate))
        return x + a2[:, None] * h


def token_merge(x, gh, gw):
    """(B, gh*gw, D) -> (B, gh/2*gw/2, 4D): space-to-depth."""
    b, t, d = x.shape
    x = x.reshape(b, gh // 2, 2, gw // 2, 2, d).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (gh // 2) * (gw // 2), 4 * d)


def token_split(x, gh, gw):
    """(B, gh*gw, D) -> (B, 2gh*2gw, D/4): depth-to-space."""
    b, t, d = x.shape
    x = x.reshape(b, gh, gw, 2, 2, d // 4).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw * 4, d // 4)


class HDiT(nn.Module):
    """call(x (B,H,W,C), t (B,) in [0,1] or gammas, y labels) -> (B,H,W,out).

    levels: widths per hourglass level (shallow->deep); depths: block count
    per level (encoder side; mirrored on the decoder)."""
    patch_size: int = 4
    widths: Sequence[int] = (128, 256)
    depths: Sequence[int] = (2, 4)
    num_heads_base: int = 4
    window: int = 8
    num_classes: int = 1
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, y=None, deterministic=True):
        b, H, W, C = x.shape
        p = self.patch_size
        gh, gw = H // p, W // p

        patches = x.reshape(b, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh * gw, p * p * C).astype(self.dtype)
        h = nn.Dense(self.widths[0], use_bias=False, dtype=self.dtype,
                     name="patch_in")(patches)

        t = jnp.asarray(t).reshape(b)
        c = nn.Dense(self.widths[-1], dtype=self.dtype, name="t_0")(
            timestep_embedding(t * 1000.0, 256))
        c = nn.Dense(self.widths[-1], dtype=self.dtype,
                     name="t_1")(nn.silu(c))
        if self.num_classes > 1 and y is not None:
            ytab = self.param("y_embed", nn.initializers.normal(0.02),
                              (self.num_classes + 1, self.widths[-1]))
            c = c + jnp.take(ytab, y, axis=0).astype(c.dtype)

        n_levels = len(self.widths)
        skips = []
        cur_gh, cur_gw = gh, gw
        # encoder levels (windowed attention)
        for li in range(n_levels - 1):
            cl = nn.Dense(self.widths[li], dtype=self.dtype,
                          name=f"c_enc{li}")(c)
            for bi in range(self.depths[li]):
                h = HDiTBlock(num_heads=max(1, self.widths[li] // 64),
                              window=self.window,
                              shift=(self.window // 2 if bi % 2 else 0),
                              grid=(cur_gh, cur_gw),
                              dtype=self.dtype,
                              name=f"enc{li}_{bi}")(h, cl)
            skips.append((h, cur_gh, cur_gw))
            h = token_merge(h, cur_gh, cur_gw)
            cur_gh, cur_gw = cur_gh // 2, cur_gw // 2
            h = nn.Dense(self.widths[li + 1], use_bias=False,
                         dtype=self.dtype, name=f"merge{li}")(h)

        # bottleneck (global attention)
        for bi in range(self.depths[-1]):
            h = HDiTBlock(num_heads=max(1, self.widths[-1] // 64), window=0,
                          grid=(cur_gh, cur_gw), dtype=self.dtype,
                          name=f"mid_{bi}")(h, c)

        # decoder levels
        for li in reversed(range(n_levels - 1)):
            h = nn.Dense(self.widths[li] * 4, use_bias=False,
                         dtype=self.dtype, name=f"split{li}")(h)
            h = token_split(h, cur_gh, cur_gw)
            cur_gh, cur_gw = cur_gh * 2, cur_gw * 2
            skip, _, _ = skips.pop()
            lerp = self.param(f"lerp{li}", nn.initializers.constant(0.5), ())
            h = lerp.astype(h.dtype) * h + (1 - lerp.astype(h.dtype)) * skip
            cl = nn.Dense(self.widths[li], dtype=self.dtype,
                          name=f"c_dec{li}")(c)
            for bi in range(self.depths[li]):
                h = HDiTBlock(num_heads=max(1, self.widths[li] // 64),
                              window=self.window,
                              shift=(self.window // 2 if bi % 2 else 0),
                              grid=(cur_gh, cur_gw),
                              dtype=self.dtype,
                              name=f"dec{li}_{bi}")(h, cl)

        h = RMSNorm(name="final_norm")(h)
        h = nn.Dense(p * p * self.out_channels, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="patch_out")(h)
        h = h.reshape(b, gh, gw, p, p, self.out_channels)
        h = h.transpose(0, 1, 3, 2, 4, 5)
        return h.reshape(b, H, W, self.out_channels).astype(jnp.float32)
