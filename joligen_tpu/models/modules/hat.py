"""HAT — Hybrid Attention Transformer generator (super-resolution).

Faithful rebuild of reference models/modules/hat/hat.py (HAT, :851-1160):
shallow conv -> RHAG groups (depth HABs with window attention + relative
position bias + CAB conv branch scaled by conv_scale, then an OCAB
overlapping cross-attention block, then a 3x3 conv with group residual)
-> LayerNorm -> conv_after_body + global residual -> pixelshuffle head.
The joliGEN factory config (gan_networks.py:264-273): patch_size=1,
window_size=16, upsampler='pixelshuffle', upscale default 1 (identity
upsample -> img2img generator).

TPU-first: NHWC layout, window partitions as pure reshapes, the OCAB
unfold as conv_general_dilated_patches, fp32 softmax/LayerNorm stats.
Checked by converted-weight forward parity
(tests/test_modern_zoo_parity.py) against the reference module executed
directly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

trunc02 = nn.initializers.truncated_normal(0.02)


def calculate_rpi_sa(wsz):
    """Swin relative-position index (hat.py:1037-1053)."""
    coords = np.stack(np.meshgrid(np.arange(wsz), np.arange(wsz),
                                  indexing="ij"))
    cf = coords.reshape(2, -1)
    rel = cf[:, :, None] - cf[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wsz - 1
    rel[:, :, 1] += wsz - 1
    rel[:, :, 0] *= 2 * wsz - 1
    return rel.sum(-1)


def calculate_rpi_oca(wsz, owsz):
    """Overlapping-window relative-position index (hat.py:1055-1085)."""
    co = np.stack(np.meshgrid(np.arange(wsz), np.arange(wsz),
                              indexing="ij")).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(owsz), np.arange(owsz),
                              indexing="ij")).reshape(2, -1)
    rel = ce[:, None, :] - co[:, :, None]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wsz - owsz + 1
    rel[:, :, 1] += wsz - owsz + 1
    rel[:, :, 0] *= wsz + owsz - 1
    return rel.sum(-1)


def calculate_mask(h, w, wsz, shift):
    """SW-MSA attention mask, (nw, n, n) of {0, -100} (hat.py:1087-1116)."""
    img = np.zeros((h, w))
    slices = (slice(0, -wsz), slice(-wsz, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // wsz, wsz, w // wsz, wsz).transpose(0, 2, 1, 3)
    win = win.reshape(-1, wsz * wsz)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x, wsz):
    """(b, h, w, c) -> (b*nw, wsz, wsz, c) (hat.py:107-121)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // wsz, wsz, w // wsz, wsz, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wsz, wsz, c)


def window_reverse(wins, wsz, h, w):
    b = wins.shape[0] // ((h // wsz) * (w // wsz))
    x = wins.reshape(b, h // wsz, w // wsz, wsz, wsz, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _ln(name):
    # torch LayerNorm: eps 1e-5, affine
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)


class Mlp(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)


class CAB(nn.Module):
    """Conv block + RCAN channel attention (hat.py:41-77)."""
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(c // self.compress_ratio, (3, 3), padding=1,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        # channel attention: global avg pool -> 1x1 squeeze/excite
        s = h.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(max(1, c // self.squeeze_factor), (1, 1),
                    dtype=self.dtype, name="ca1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="ca2")(s)
        return h * jax.nn.sigmoid(s)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (hat.py:143-237). Input
    (b*nw, n, c); mask (nw, n, n) or None."""
    wsz: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rpi, mask=None):
        b_, n, c = x.shape
        heads = self.num_heads
        hd = c // heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (hd ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        rpb = self.param("rpb", trunc02,
                         ((2 * self.wsz - 1) ** 2, heads))
        bias = rpb[np.asarray(rpi).reshape(-1)].reshape(n, n, heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, heads, n, n) \
                + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b_, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class HAB(nn.Module):
    """Hybrid Attention Block (hat.py:238-370)."""
    num_heads: int
    wsz: int
    shift: int
    conv_scale: float = 0.01
    compress_ratio: int = 3
    squeeze_factor: int = 30
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, rpi, mask, deterministic=True):
        h, w = hw
        b, _, c = x.shape
        shortcut = x
        y = _ln("norm1")(x).astype(self.dtype)
        y = y.reshape(b, h, w, c)

        conv_x = CAB(self.compress_ratio, self.squeeze_factor,
                     dtype=self.dtype, name="conv_block")(y)
        conv_x = conv_x.reshape(b, h * w, c)

        if self.shift > 0:
            ys = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        else:
            ys, mask = y, None
        wins = window_partition(ys, self.wsz).reshape(
            -1, self.wsz * self.wsz, c)
        wins = WindowAttention(self.wsz, self.num_heads, dtype=self.dtype,
                               name="attn")(wins, rpi, mask)
        ys = window_reverse(wins.reshape(-1, self.wsz, self.wsz, c),
                            self.wsz, h, w)
        if self.shift > 0:
            ys = jnp.roll(ys, (self.shift, self.shift), axis=(1, 2))
        attn_x = ys.reshape(b, h * w, c)

        def dp(t):
            if self.drop_path <= 0.0 or deterministic:
                return t
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            m = jax.random.bernoulli(rng, keep, (t.shape[0], 1, 1))
            return t / keep * m.astype(t.dtype)

        x = shortcut + dp(attn_x) + conv_x * self.conv_scale
        y = _ln("norm2")(x).astype(self.dtype)
        return x + dp(Mlp(int(c * self.mlp_ratio), dtype=self.dtype,
                          name="mlp")(y))


class OCAB(nn.Module):
    """Overlapping cross-attention block (hat.py:411-536)."""
    num_heads: int
    wsz: int
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, rpi):
        h, w = hw
        b, _, c = x.shape
        owsz = int(self.wsz * self.overlap_ratio) + self.wsz
        pad = (owsz - self.wsz) // 2
        heads = self.num_heads
        hd = c // heads

        shortcut = x
        y = _ln("norm1")(x).astype(self.dtype).reshape(b, h, w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, kk, vv = jnp.split(qkv, 3, axis=-1)

        q_wins = window_partition(q, self.wsz).reshape(
            -1, self.wsz * self.wsz, c)
        # torch Unfold: (b, 2c*owsz*owsz, nw), channel-major patch layout
        kv = jnp.concatenate([kk, vv], axis=-1).transpose(0, 3, 1, 2)
        patches = jax.lax.conv_general_dilated_patches(
            kv, (owsz, owsz), (self.wsz, self.wsz),
            [(pad, pad), (pad, pad)])       # (b, 2c*owsz*owsz, nh, nw)
        nwh, nww = patches.shape[2], patches.shape[3]
        patches = patches.reshape(b, 2, c, owsz * owsz, nwh * nww)
        patches = patches.transpose(1, 0, 4, 3, 2).reshape(
            2, b * nwh * nww, owsz * owsz, c)
        k_wins, v_wins = patches[0], patches[1]

        b_, nq, _ = q_wins.shape
        n = owsz * owsz
        qh = q_wins.reshape(b_, nq, heads, hd).transpose(0, 2, 1, 3)
        kh = k_wins.reshape(b_, n, heads, hd).transpose(0, 2, 1, 3)
        vh = v_wins.reshape(b_, n, heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh * (hd ** -0.5),
                          kh).astype(jnp.float32)
        rpb = self.param("rpb", trunc02,
                         ((self.wsz + owsz - 1) ** 2, heads))
        bias = rpb[np.asarray(rpi).reshape(-1)].reshape(nq, n, heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b_, nq, c)
        out = window_reverse(out.reshape(-1, self.wsz, self.wsz, c),
                             self.wsz, h, w).reshape(b, h * w, c)
        x = nn.Dense(c, dtype=self.dtype, name="proj")(out) + shortcut
        y = _ln("norm2")(x).astype(self.dtype)
        return x + Mlp(int(c * self.mlp_ratio), dtype=self.dtype,
                       name="mlp")(y)


class RHAG(nn.Module):
    """Residual Hybrid Attention Group (hat.py:643-748): depth HABs +
    OCAB + 3x3 conv, residual over the group."""
    depth: int
    num_heads: int
    wsz: int
    overlap_ratio: float = 0.5
    conv_scale: float = 0.01
    compress_ratio: int = 3
    squeeze_factor: int = 30
    mlp_ratio: float = 4.0
    drop_paths: Sequence[float] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, rpi_sa, rpi_oca, mask, deterministic=True):
        h, w = hw
        res = x
        for i in range(self.depth):
            dp = self.drop_paths[i] if i < len(self.drop_paths) else 0.0
            x = HAB(self.num_heads, self.wsz,
                    shift=0 if (i % 2 == 0 or mask is None)
                    else self.wsz // 2,
                    conv_scale=self.conv_scale,
                    compress_ratio=self.compress_ratio,
                    squeeze_factor=self.squeeze_factor,
                    mlp_ratio=self.mlp_ratio, drop_path=dp,
                    dtype=self.dtype, name=f"hab{i}")(
                x, hw, rpi_sa, mask, deterministic)
        # AttenBlocks passes the group's mlp_ratio to OCAB (overriding
        # OCAB's own default of 2)
        x = OCAB(self.num_heads, self.wsz, self.overlap_ratio,
                 mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                 name="ocab")(x, hw, rpi_oca)
        b = x.shape[0]
        y = x.reshape(b, h, w, -1)
        y = nn.Conv(y.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(y)
        return y.reshape(b, h * w, -1) + res


def pixel_shuffle(x, r):
    """torch PixelShuffle in NHWC: (b,h,w,C*r*r) -> (b,h*r,w*r,C)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


class HAT(nn.Module):
    """call(x NHWC) -> NHWC (hat.py:851-1160; factory config
    gan_networks.py:264-273)."""
    out_channels: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 16
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    upscale: int = 1
    num_feat: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, extract_layer_ids=None):
        b, H, W, C = x.shape
        wsz = self.window_size
        # reference HAB clamp (hat.py:283-287): window >= resolution ->
        # no partitioning, no shift
        clamped = min(H, W) <= wsz
        if clamped:
            wsz = min(H, W)
        shift = 0 if clamped else wsz // 2
        owsz = int(wsz * self.overlap_ratio) + wsz
        rpi_sa = calculate_rpi_sa(wsz)
        rpi_oca = calculate_rpi_oca(wsz, owsz)
        mask = calculate_mask(H, W, wsz, shift) if shift else None

        x = x.astype(self.dtype)
        first = nn.Conv(self.embed_dim, (3, 3), padding=1,
                        dtype=self.dtype, name="conv_first")(x)
        h = first.reshape(b, H * W, self.embed_dim)
        h = _ln("patch_norm")(h).astype(self.dtype)

        # stochastic depth schedule (hat.py:1126-1128 linspace over all
        # blocks)
        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        feats = []
        start = 0
        for gi, (depth, heads) in enumerate(zip(self.depths,
                                                self.num_heads)):
            h = RHAG(depth, heads, wsz, self.overlap_ratio,
                     self.conv_scale, self.compress_ratio,
                     self.squeeze_factor, self.mlp_ratio,
                     drop_paths=tuple(dpr[start:start + depth]),
                     dtype=self.dtype, name=f"rhag{gi}")(
                h, (H, W), rpi_sa, rpi_oca, mask, deterministic)
            feats.append(h.reshape(b, H, W, self.embed_dim))
            start += depth
        if extract_layer_ids is not None:
            if all(0 <= i < len(feats) for i in extract_layer_ids):
                return [feats[i] for i in extract_layer_ids]
            return feats

        h = _ln("norm")(h).astype(self.dtype)
        h = h.reshape(b, H, W, self.embed_dim)
        h = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_after_body")(h) + first
        h = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_before_upsample")(h)
        h = nn.leaky_relu(h, 0.01)
        s = self.upscale
        ui = 0
        while s > 1:
            r = 3 if s == 3 else 2
            h = nn.Conv(self.num_feat * r * r, (3, 3), padding=1,
                        dtype=self.dtype, name=f"up{ui}")(h)
            h = pixel_shuffle(h, r)
            s //= r
            ui += 1
        out = nn.Conv(self.out_channels, (3, 3), padding=1,
                      dtype=self.dtype, name="conv_last")(h)
        return out.astype(jnp.float32)
