"""HDiT — hourglass diffusion transformer (reference models/modules/hdit/,
arXiv 2401.11605 "Scalable High-Resolution Pixel-Space Image Synthesis").

Reference-faithful semantics (hdit/hdit.py, hdit/axial_rope.py):

- shallow levels use SHIFTED-WINDOW attention — that IS the reference's
  shipped configuration: HDiTConfig hard-codes
  ``{"type": "shifted-window", d_head 64, window 8}`` for every non-global
  level (hdit.py:930-934); the natten neighborhood path exists only as
  commented-out dead code (hdit.py:936-942). Shift = window//2 on odd
  LAYER INDEX, with the index continuing from encoder into decoder level
  (hdit.py:546-560, up levels are built with index i+depth).
- cosine-similarity attention: q and k are L2-normalized per head and
  multiplied by sqrt(scale) with a LEARNABLE per-head scale (init 10.0,
  fp32 statistics), and the dot-product attention then runs with
  scale=1.0 (hdit.py:135-152, 476, 490).
- AdaRMSNorm conditioning: rms_norm(x, 1 + zero_init_linear(cond)) —
  scale-only modulation, no shift and no residual gates (hdit.py:184-197).
- axial RoPE on HALF of each head (d_head//4 angle pairs): per-head
  log-spaced frequencies exp(linspace(log pi, log 10pi)) over CONTINUOUS
  positions in the aspect-corrected [-1,1] bounding box (pixel centers,
  axial_rope.py:37-78, hdit.py:255-270); positions are mean-pooled 2x2
  per hourglass level (hdit.py:77-79 downscale_pos).
- GEGLU FFN with d_ff = 3*width and zero-init down projection
  (hdit.py:118-123, 503-517, HDiTConfig d_ffs).
- conditioning runs through a MappingNetwork (RMSNorm -> depth x
  [RMSNorm, GEGLU, zero-init down, residual] -> RMSNorm) of width
  = deepest level width (hdit.py:600-618, HDiTConfig mapping_width).
- token merge/split are 2x2 space-to-depth reshapes + unbiased Linear;
  decoder skips are learnable lerps (init 0.5) (hdit.py:622-676); the
  patch head is RMSNorm + zero-init unpatch projection (hdit.py:822-826).

TPU-first deviations: the window partition rolls by -shift instead of
+shift (identical partition for the only shift ever used, window//2) so
the Swin seam mask is shared with the MAT module; window attention uses
the XLA fused dot-product-attention (tiny windows gather poorly in
Pallas); all linears run in the compute dtype with fp32 normalization
statistics.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.schedules import timestep_embedding


def make_axial_pos(h, w):
    """Pixel-center positions over the aspect-corrected [-1,1] bounding
    box (reference axial_rope.py:37-78). Returns (h*w, 2) float32."""
    ar = w / h
    y_min, y_max, x_min, x_max = -1.0, 1.0, -1.0, 1.0
    if ar > 1:
        y_min, y_max = -1 / ar, 1 / ar
    elif ar < 1:
        x_min, x_max = -ar, ar

    def centers(a, b, n):
        edges = np.linspace(a, b, n + 1, dtype=np.float64)
        return (edges[:-1] + edges[1:]) / 2

    ys = centers(y_min, y_max, h)
    xs = centers(x_min, x_max, w)
    grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1)
    return grid.reshape(h * w, 2).astype(np.float32)


def downscale_pos(pos, h, w):
    """Mean-pool positions 2x2 (reference hdit.py:77-79)."""
    p = pos.reshape(h // 2, 2, w // 2, 2, 2).mean(axis=(1, 3))
    return p.reshape((h // 2) * (w // 2), 2)


def axial_rope_freqs(d_head, n_heads):
    """Per-head log-spaced RoPE frequencies (reference axial_rope.py
    AxialRoPE with dim=d_head//2): (n_heads, d_head//8)."""
    n = n_heads * (d_head // 8)
    freqs = np.exp(np.linspace(math.log(math.pi), math.log(10 * math.pi),
                               n + 1, dtype=np.float64))[:-1]
    return freqs.reshape(d_head // 8, n_heads).T.astype(np.float32)


def rope_theta(pos, d_head, n_heads):
    """(T,2) positions -> (T, n_heads, d_head//4) rotation angles:
    first half of the angles rotate with y, second half with x."""
    freqs = axial_rope_freqs(d_head, n_heads)          # (H, d/8)
    th_y = pos[:, None, 0:1] * freqs[None]             # (T, H, d/8)
    th_x = pos[:, None, 1:2] * freqs[None]
    return np.concatenate([th_y, th_x], axis=-1)       # (T, H, d/4)


def apply_rope(x, theta):
    """x: (B, H, T, D); theta: (T, H, D//4) or broadcastable. Rotates the
    first 2*(D//4) channels pairwise, passes the rest through
    (reference hdit.py apply_rotary_emb)."""
    d = theta.shape[-1]
    th = jnp.asarray(theta).transpose(1, 0, 2)[None]   # (1, H, T, d)
    x1, x2, rest = x[..., :d], x[..., d:2 * d], x[..., 2 * d:]
    cos = jnp.cos(th).astype(x.dtype)
    sin = jnp.sin(th).astype(x.dtype)
    y1 = x1 * cos - x2 * sin
    y2 = x2 * cos + x1 * sin
    return jnp.concatenate([y1, y2, rest], axis=-1)


def _shifted_window_mask(nwh, nww, wsz, shift):
    """Boolean allow-mask (nwh*nww, wsz*wsz, wsz*wsz) replicating the
    reference make_shifted_window_masks (hdit.py:307-338): after the
    +shift roll, tokens at h/w < shift in the top/left patches are
    wrapped and may only attend within their wrap group."""
    ph, pw, qh, qw_, kh, kw = np.meshgrid(
        np.arange(nwh), np.arange(nww), np.arange(wsz), np.arange(wsz),
        np.arange(wsz), np.arange(wsz), indexing="ij")
    is_top = ph == 0
    is_left = pw == 0
    q_up, k_up = qh < shift, kh < shift
    q_lf, k_lf = qw_ < shift, kw < shift
    m = ((is_left & is_top & (q_lf == k_lf) & (q_up == k_up))
         | (is_left & ~is_top & (q_lf == k_lf))
         | (~is_left & is_top & (q_up == k_up))
         | (~is_left & ~is_top))
    return m.reshape(nwh * nww, wsz * wsz, wsz * wsz)


def rms_norm(x, scale, eps=1e-6):
    """x * scale / rms(x) with fp32 statistics (reference hdit.py:127-131)."""
    f32 = x.astype(jnp.float32)
    ms = jnp.mean(f32 * f32, axis=-1, keepdims=True)
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(ms + eps)
    return x * s.astype(x.dtype)


def scale_for_cosine_sim(q, k, scale, eps=1e-6):
    """L2-normalize q,k per head and multiply each by sqrt(scale)
    (reference hdit.py:135-143). q,k: (B,H,T,D); scale: (H,)."""
    f32q, f32k = q.astype(jnp.float32), k.astype(jnp.float32)
    ssq = jnp.sum(f32q * f32q, axis=-1, keepdims=True)
    ssk = jnp.sum(f32k * f32k, axis=-1, keepdims=True)
    root = jnp.sqrt(scale.astype(jnp.float32))[None, :, None, None]
    qs = root * jax.lax.rsqrt(ssq + eps)
    ks = root * jax.lax.rsqrt(ssk + eps)
    return q * qs.astype(q.dtype), k * ks.astype(k.dtype)


class RMSNorm(nn.Module):
    """Plain RMSNorm with a learnable scale (reference hdit.py:170-181)."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return rms_norm(x, scale)


class AdaRMSNorm(nn.Module):
    """rms_norm(x, 1 + zero_init_linear(cond)) (reference hdit.py:184-197)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        s = nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="lin")(cond)
        return rms_norm(x, 1.0 + s[:, None, :])


class HDiTBlock(nn.Module):
    """One transformer layer: cosine-sim RoPE attention (windowed or
    global) + GEGLU FFN, both AdaRMSNorm-conditioned with zero-init
    output projections (reference ShiftedWindow/GlobalTransformerLayer,
    hdit.py:427-560)."""
    num_heads: int
    window: int = 0        # 0 = global attention
    shift: int = 0         # cyclic shift of the window partition
    grid: Sequence[int] = (0, 0)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, deterministic=True):
        b, t, d = x.shape
        gh, gw = self.grid
        hd = d // self.num_heads

        h = AdaRMSNorm(dtype=self.dtype, name="attn_norm")(x, c)
        qkv = nn.Dense(3 * d, use_bias=False, dtype=self.dtype,
                       name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)
        scale = self.param("attn_scale", nn.initializers.constant(10.0),
                           (self.num_heads,))
        q, k = scale_for_cosine_sim(q, k, scale)
        theta = rope_theta(make_axial_pos(gh, gw), hd, self.num_heads)
        q = apply_rope(q, theta)
        k = apply_rope(k, theta)
        # back to (B, T, H, hd) for the fused attention path
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        if self.window and self.window < min(gh, gw):
            # Reference apply_window_attention (hdit.py:295-360): roll by
            # +shift before windowing (wrapped tokens land in the TOP/LEFT
            # patches at coords < shift), Swin seam mask separating wrap
            # groups, roll back by -shift after.
            wsz = self.window
            shift = self.shift
            nwh, nww = gh // wsz, gw // wsz

            def to_windows(z):
                z = z.reshape(b, gh, gw, self.num_heads, hd)
                if shift:
                    z = jnp.roll(z, (shift, shift), axis=(1, 2))
                z = z.reshape(b, nwh, wsz, nww, wsz, self.num_heads, hd)
                z = z.transpose(0, 1, 3, 2, 4, 5, 6)
                return z.reshape(b * nwh * nww, wsz * wsz, self.num_heads, hd)

            qw, kw, vw = map(to_windows, (q, k, v))
            if shift:
                allow = _shifted_window_mask(nwh, nww, wsz, shift)
                bias = jnp.where(jnp.asarray(allow), 0.0, -jnp.inf)
                bias = jnp.tile(bias, (b, 1, 1))[:, None].astype(qw.dtype)
                aw = jax.nn.dot_product_attention(qw, kw, vw, bias=bias,
                                                  scale=1.0)
            else:
                aw = jax.nn.dot_product_attention(qw, kw, vw, scale=1.0)
            a = aw.reshape(b, nwh, nww, wsz, wsz, self.num_heads, hd)
            a = a.transpose(0, 1, 3, 2, 4, 5, 6)
            a = a.reshape(b, gh, gw, self.num_heads, hd)
            if shift:
                a = jnp.roll(a, (-shift, -shift), axis=(1, 2))
            a = a.reshape(b, t, d)
        else:
            a = jax.nn.dot_product_attention(q, k, v, scale=1.0)
            a = a.reshape(b, t, d)

        if self.dropout > 0:
            a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
        x = x + nn.Dense(d, use_bias=False, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros, name="proj")(a)

        h = AdaRMSNorm(dtype=self.dtype, name="ff_norm")(x, c)
        u = nn.Dense(2 * d * 3, use_bias=False, dtype=self.dtype,
                     name="ff_in")(h)
        uu, gate = jnp.split(u, 2, axis=-1)
        h = uu * nn.gelu(gate, approximate=False)   # reference F.gelu (erf)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(d, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="ff_out")(h)
        return x + h


class MappingNetwork(nn.Module):
    """RMSNorm -> depth x [RMSNorm, GEGLU(3w), zero-init down, residual]
    -> RMSNorm (reference hdit.py:600-618)."""
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = RMSNorm(name="in_norm")(x)
        for i in range(self.depth):
            h = RMSNorm(name=f"norm{i}")(x)
            u = nn.Dense(2 * d * 3, use_bias=False, dtype=self.dtype,
                         name=f"up{i}")(h)
            uu, gate = jnp.split(u, 2, axis=-1)
            h = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         name=f"down{i}")(uu * nn.gelu(gate,
                                                      approximate=False))
            x = x + h
        return RMSNorm(name="out_norm")(x)


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

    widths/depths mirror --G_hdit_widths/--G_hdit_depths (reference
    defaults [192,384,768]/[2,2,4], common_options.py:386-398); every
    non-deepest level runs shifted-window attention (window 8), the
    deepest level global attention, exactly like HDiTConfig. The timestep
    embedding + MappingNetwork here compose what the reference splits
    between PaletteDenoiseFn's cond embedding and HDiT.mapping."""
    patch_size: int = 4
    widths: Sequence[int] = (192, 384, 768)
    depths: Sequence[int] = (2, 2, 4)
    d_head: int = 64
    window: int = 8
    num_classes: int = 1
    out_channels: int = 3
    mapping_depth: int = 2
    mid_dropout: float = 0.1   # reference dropout_rates[-1]
    last_zero_init: bool = True   # False for the GAN variant
    # (reference gan_networks.py:251-263)
    dtype: jnp.dtype = jnp.float32

    def _heads(self, width):
        return max(1, width // self.d_head)

    @nn.compact
    def __call__(self, x, t=None, y=None, deterministic=True,
                 extract_layer_ids=None, emb=None):
        b, H, W, C = x.shape
        p = self.patch_size
        gh, gw = H // p, W // p

        patches = x.reshape(b, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh * gw, p * p * C).astype(self.dtype)
        h = nn.Dense(self.widths[0], use_bias=False, dtype=self.dtype,
                     name="patch_in")(patches)

        mw = self.widths[-1]
        if emb is not None:
            # precomputed conditioning fed straight to the mapping network
            # (the reference's embed_gammas path, hdit.py:866-881)
            c = emb.astype(self.dtype)
        elif t is None:
            # GAN mode: constant conditioning (reference compute_feats
            # passes embed_gammas = ones into the mapping network)
            c = jnp.ones((b, mw), self.dtype)
        else:
            t = jnp.asarray(t).reshape(b)
            c = nn.Dense(mw, dtype=self.dtype, name="t_0")(
                timestep_embedding(t * 1000.0, 256))
            c = nn.Dense(mw, dtype=self.dtype, name="t_1")(nn.silu(c))
        if self.num_classes > 1 and y is not None:
            ytab = self.param("y_embed", nn.initializers.normal(0.02),
                              (self.num_classes + 1, mw))
            c = c + jnp.take(ytab, y, axis=0).astype(c.dtype)
        c = MappingNetwork(depth=self.mapping_depth, dtype=self.dtype,
                           name="mapping")(c)

        n_levels = len(self.widths)
        skips = []
        cur_gh, cur_gw = gh, gw

        def shift_for(index):
            # ShiftedWindowTransformerLayer derives the shift from the
            # layer index (hdit.py:551: window//2 for odd layers); the
            # index continues from encoder into decoder (layer_factory(i)
            # down, layer_factory(i+depth) up)
            return self.window // 2 if index % 2 == 1 else 0

        # encoder levels (shifted-window attention)
        feats = []   # post-merge encoder features, one per non-deepest
        # level (reference compute_feats hs, hdit.py:888-896)
        for li in range(n_levels - 1):
            for bi in range(self.depths[li]):
                h = HDiTBlock(num_heads=self._heads(self.widths[li]),
                              window=self.window, shift=shift_for(bi),
                              grid=(cur_gh, cur_gw), dtype=self.dtype,
                              name=f"enc{li}_{bi}")(h, c, deterministic)
            skips.append((h, cur_gh, cur_gw))
            h = token_merge(h, cur_gh, cur_gw)
            cur_gh, cur_gw = cur_gh // 2, cur_gw // 2
            h = nn.Dense(self.widths[li + 1], use_bias=False,
                         dtype=self.dtype, name=f"merge{li}")(h)
            feats.append(h.reshape(b, cur_gh, cur_gw, -1))

        if extract_layer_ids is not None:
            # CUT NCE taps (reference get_feats returns all encoder
            # features regardless of the requested ids, hdit.py:903-906);
            # honor in-range ids, fall back to all otherwise
            if all(0 <= i < len(feats) for i in extract_layer_ids):
                return [feats[i] for i in extract_layer_ids]
            return feats

        # bottleneck (global attention)
        for bi in range(self.depths[-1]):
            h = HDiTBlock(num_heads=self._heads(self.widths[-1]), window=0,
                          grid=(cur_gh, cur_gw), dropout=self.mid_dropout,
                          dtype=self.dtype,
                          name=f"mid_{bi}")(h, c, deterministic)

        # decoder levels
        for li in reversed(range(n_levels - 1)):
            h = nn.Dense(self.widths[li] * 4, use_bias=False,
                         dtype=self.dtype, name=f"split{li}")(h)
            h = token_split(h, cur_gh, cur_gw)
            cur_gh, cur_gw = cur_gh * 2, cur_gw * 2
            skip, _, _ = skips.pop()
            lerp = self.param(f"lerp{li}", nn.initializers.constant(0.5), ())
            h = lerp.astype(h.dtype) * h + (1 - lerp.astype(h.dtype)) * skip
            for bi in range(self.depths[li]):
                h = HDiTBlock(num_heads=self._heads(self.widths[li]),
                              window=self.window,
                              shift=shift_for(bi + self.depths[li]),
                              grid=(cur_gh, cur_gw), dtype=self.dtype,
                              name=f"dec{li}_{bi}")(h, c, deterministic)

        h = RMSNorm(name="final_norm")(h)
        out_init = (nn.initializers.zeros if self.last_zero_init
                    else nn.initializers.lecun_normal())
        h = nn.Dense(p * p * self.out_channels, dtype=self.dtype,
                     use_bias=False, kernel_init=out_init,
                     name="patch_out")(h)
        h = h.reshape(b, gh, gw, p, p, self.out_channels)
        h = h.transpose(0, 1, 3, 2, 4, 5)
        return h.reshape(b, H, W, self.out_channels).astype(jnp.float32)
