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

from .resnet_generator import InstanceNorm


def l2norm(t, axis=-1, eps=1e-12):
    return t / jnp.sqrt(jnp.sum(t * t, axis=axis, keepdims=True) + eps)


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
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):  # (B,h,w,heads*dh) -> (B*heads,h,w,dh)
            t = t.reshape(b, h, w, self.heads, self.dim_head)
            return t.transpose(0, 3, 1, 2, 4).reshape(
                b * self.heads, h, w, self.dim_head)

        q, k, v = map(heads_first, (q, k, v))
        q = l2norm(q)
        k = l2norm(k)

        if self.height_top_k < h:
            q_probe = q.sum(axis=(1, 2))                       # (bh, d)
            k_height = k.sum(axis=2)                           # (bh, h, d)
            scores = jnp.einsum("bd,bhd->bh", q_probe, k_height)
            idx = jax.lax.top_k(scores, self.height_top_k)[1]  # (bh, k)
            gather = idx[:, :, None, None]
            k = jnp.take_along_axis(k, gather, axis=1)
            v = jnp.take_along_axis(v, gather, axis=1)
        if self.width_top_k < w:
            q_probe = q.sum(axis=(1, 2))
            k_width = k.sum(axis=1)                            # (bh, w, d)
            scores = jnp.einsum("bd,bwd->bw", q_probe, k_width)
            idx = jax.lax.top_k(scores, self.width_top_k)[1]
            gather = idx[:, None, :, None]
            k = jnp.take_along_axis(k, gather, axis=2)
            v = jnp.take_along_axis(v, gather, axis=2)

        qf = q.reshape(q.shape[0], -1, self.dim_head)
        kf = k.reshape(k.shape[0], -1, self.dim_head)
        vf = v.reshape(v.shape[0], -1, self.dim_head)
        sim = jnp.einsum("bid,bjd->bij", qf, kf).astype(jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bij,bjd->bid", attn, vf)
        out = out.reshape(b, self.heads, h, w, self.dim_head)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, inner)
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
        # conv FFN with residual
        y = nn.LayerNorm(dtype=jnp.float32, name="ff_norm")(h).astype(self.dtype)
        y = nn.Conv(c * self.ff_mult, (1, 1), dtype=self.dtype,
                    name="ff_in")(y)
        y = nn.gelu(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="ff_out")(y)
        return h + y


class ITTRGenerator(nn.Module):
    """call(x NHWC [-1,1]) -> NHWC tanh output. ``extract_layer_ids`` returns
    HPB features for CUT NCE (reference get_feats)."""
    out_channels: int = 3
    ngf: int = 64
    n_blocks: int = 9
    img_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extract_layer_ids=None):
        x = x.astype(self.dtype)
        # stem
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.ngf, (7, 7), padding=0, dtype=self.dtype,
                    name="stem0")(h)
        h = InstanceNorm()(h)
        h = nn.gelu(h)
        for i in range(2):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=2, padding=1,
                        dtype=self.dtype, name=f"stem_down{i}")(h)
            h = InstanceNorm()(h)
            h = nn.gelu(h)

        dim_head = max(8, self.img_size // 4 // 4)
        feats = []
        for i in range(self.n_blocks):
            h = HPB(dim_head=dim_head, dtype=self.dtype, name=f"hpb{i}")(h)
            if extract_layer_ids is not None and i in extract_layer_ids:
                feats.append(h)
        if extract_layer_ids is not None:
            return feats

        # decoder
        for i in range(2):
            mult = 2 ** (2 - i)
            h = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name=f"dec_up{i}")(h)
            h = InstanceNorm()(h)
            h = nn.gelu(h)
        h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.out_channels, (7, 7), padding=0, dtype=self.dtype,
                    name="dec_out")(h)
        return jnp.tanh(h).astype(jnp.float32)
