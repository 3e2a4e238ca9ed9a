"""ITTR generator — transformer image-to-image translation
(reference models/modules/ittr/ittr_generator.py, arXiv 2203.16015).

Stem (7x7 conv + 2 stride-2 convs) -> n_blocks Hybrid Perception Blocks
(dual-pruned cosine self-attention branch + depthwise conv branch, fused by
a 1x1 conv, then a conv FFN) -> decoder (2 transposed convs + 7x7 + tanh).

TPU-first: NHWC layout, top-k row/column pruning via ``jnp.take_along_axis``
(one gather per axis — XLA lowers this to efficient dynamic-slices), cosine
attention as one batched matmul per head group, fp32 softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet_generator import InstanceNorm, TorchConvTranspose


def l2norm(t, axis=-1, eps=1e-12):
    # F.normalize: x / max(||x||, eps)
    n = jnp.sqrt(jnp.sum(t * t, axis=axis, keepdims=True))
    return t / jnp.maximum(n, eps)


class ChanLayerNorm(nn.Module):
    """Reference ChanLayerNorm (ittr_generator.py:34-44): affine LN over
    the channel dim, biased var, eps INSIDE the sqrt, eps=1e-5."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],))
        b = self.param("b", nn.initializers.zeros, (x.shape[-1],))
        f32 = x.astype(jnp.float32)
        mean = f32.mean(axis=-1, keepdims=True)
        var = f32.var(axis=-1, keepdims=True)
        y = (f32 - mean) / jnp.sqrt(var + self.eps)
        return (y * g + b).astype(x.dtype)


class DPSA(nn.Module):
    """Dual-pruned self-attention: select top-k rows then top-k columns of
    the key/value map before full attention (reference DPSA)."""
    height_top_k: int = 16
    width_top_k: int = 16
    dim_head: int = 32
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        y = ChanLayerNorm(name="norm")(x).astype(self.dtype)
        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # Reference quirk reproduced bit-for-bit (ittr_generator.py:
        # 131-214): after the head fold the tensor is ((B*heads),
        # dim_head, H, W), but the einops patterns relabel those axes as
        # (b, h, w, d) — so l2norm/attention FEATURES are the WIDTH axis,
        # tokens are (channel, row) pairs, "height" pruning selects
        # CHANNELS and "width" pruning selects ROWS. This is only
        # shape-consistent because the generator sets dim_head = the stem
        # feature-map side (ittr_generator.py:292), making all three axes
        # equal.
        def fold(t):  # (B,H,W,heads*dh) -> (B*heads, dh, H, W)
            t = t.transpose(0, 3, 1, 2).reshape(
                b, self.heads, self.dim_head, h, w)
            return t.reshape(b * self.heads, self.dim_head, h, w)

        q, k, v = map(fold, (q, k, v))     # axes: (bh, A=dh, B=H, D=W)
        q = l2norm(q)                      # over the W axis
        k = l2norm(k)

        if self.height_top_k < h:
            q_probe = q.sum(axis=(1, 2))                       # (bh, W)
            k_height = k.sum(axis=2)                           # (bh, A, W)
            scores = jnp.einsum("bd,bhd->bh", q_probe, k_height)
            idx = jax.lax.top_k(scores, self.height_top_k)[1]  # over A
            k = jnp.take_along_axis(k, idx[:, :, None, None], axis=1)
            v = jnp.take_along_axis(v, idx[:, :, None, None], axis=1)
        if self.width_top_k < w:
            q_probe = q.sum(axis=(1, 2))
            k_width = k.sum(axis=1)                            # (bh, B, W)
            scores = jnp.einsum("bd,bwd->bw", q_probe, k_width)
            idx = jax.lax.top_k(scores, self.width_top_k)[1]   # over B
            k = jnp.take_along_axis(k, idx[:, None, :, None], axis=2)
            v = jnp.take_along_axis(v, idx[:, None, :, None], axis=2)

        qf = q.reshape(q.shape[0], -1, w)       # tokens (A*B), features W
        kf = k.reshape(k.shape[0], -1, w)
        vf = v.reshape(v.shape[0], -1, w)
        sim = jnp.einsum("bid,bjd->bij", qf, kf).astype(jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bij,bjd->bid", attn, vf)
        # "(b h) (x y) d -> b (h d) x y" with x=H, y=W (token dim A*B
        # reinterpreted as the pixel grid) -> NHWC
        out = out.reshape(b, self.heads, h, w, w)       # (b,hd,x,y,d)
        out = out.transpose(0, 1, 4, 2, 3)              # (b,hd,d,x,y)
        out = out.reshape(b, self.heads * w, h, w).transpose(0, 2, 3, 1)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="to_out")(out)


class HPB(nn.Module):
    """Hybrid perception block (reference HPB)."""
    dim_head: int = 32
    heads: int = 8
    ff_mult: int = 4
    height_top_k: int = 16
    width_top_k: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        attn_out = DPSA(self.height_top_k, self.width_top_k, self.dim_head,
                        self.heads, dtype=self.dtype, name="attn")(x)
        conv_out = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                           dtype=self.dtype, name="dwconv")(x)
        combined = jnp.concatenate([attn_out, conv_out], axis=-1)
        h = nn.Conv(c, (1, 1), dtype=self.dtype,
                    name="combine")(combined) + x
        # reference conv FFN (ittr_generator.py:79-106): conv1x1 -> IN ->
        # GELU -> [residual: dwconv3x3 -> IN -> GELU] -> conv1x1 -> IN.
        # The FFN output REPLACES h (HPB.forward returns self.ff(attn_out)
        # with NO outer residual) and all GELUs are exact (erf).
        inner = c * self.ff_mult
        y = nn.Conv(inner, (1, 1), dtype=self.dtype, name="ff_in")(h)
        y = nn.gelu(InstanceNorm()(y), approximate=False)
        z = nn.Conv(inner, (3, 3), padding=1, feature_group_count=inner,
                    dtype=self.dtype, name="ff_dw")(y)
        z = nn.gelu(InstanceNorm()(z), approximate=False)
        y = y + z
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="ff_out")(y)
        return InstanceNorm()(y)


class ITTRGenerator(nn.Module):
    """call(x NHWC [-1,1]) -> NHWC tanh output. ``extract_layer_ids`` returns
    HPB features for CUT NCE (reference get_feats)."""
    out_channels: int = 3
    ngf: int = 64
    n_blocks: int = 9
    img_size: int = 256
    height_top_k: int = 16   # reference fixed attn_height_top_k
    width_top_k: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extract_layer_ids=None):
        x = x.astype(self.dtype)
        # stem
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.ngf, (7, 7), padding=0, dtype=self.dtype,
                    name="stem0")(h)
        h = InstanceNorm()(h)
        h = nn.gelu(h, approximate=False)
        for i in range(2):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=2, padding=1,
                        dtype=self.dtype, name=f"stem_down{i}")(h)
            h = InstanceNorm()(h)
            h = nn.gelu(h, approximate=False)

        # reference: dim_head = img_size / 4 (the stem output feature-map
        # side, ittr_generator.py:292)
        dim_head = self.img_size // 4
        feats = []
        for i in range(self.n_blocks):
            h = HPB(dim_head=dim_head, height_top_k=self.height_top_k,
                    width_top_k=self.width_top_k, dtype=self.dtype,
                    name=f"hpb{i}")(h)
            if extract_layer_ids is not None and i in extract_layer_ids:
                feats.append(h)
        if extract_layer_ids is not None:
            return feats

        # decoder
        for i in range(2):
            mult = 2 ** (2 - i)
            h = TorchConvTranspose(self.ngf * mult // 2, dtype=self.dtype,
                                   name=f"dec_up{i}")(h)
            h = InstanceNorm()(h)
            h = nn.gelu(h, approximate=False)
        h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.out_channels, (7, 7), padding=0, dtype=self.dtype,
                    name="dec_out")(h)
        return jnp.tanh(h).astype(jnp.float32)
