"""Segformer — MiT backbone, all-MLP decode head, and the attention-decoder
generator variant.

Rebuild of reference models/modules/segformer/ (from-scratch MiT, no mmseg):
overlapping patch embeds, efficient self-attention with spatial-reduction
(SR) on K/V, MixFFN with a depthwise conv, and LayerNorms. The decode head
projects every stage to a common width, upsamples to 1/4 resolution and
fuses (SegFormer paper, arXiv 2105.15203). ``SegformerGeneratorAttn``
mirrors the reference SegformerGenerator_attn (segformer_generator.py:95):
backbone features drive an attention decoder that blends content images
with softmax masks (same contract as resnet_attn).

TPU-first: the SR attention is plain batched MXU matmuls; all reductions in
fp32; stages configurable via widths/depths (B0 default).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class OverlapPatchEmbed(nn.Module):
    features: int
    patch: int = 7
    stride: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.patch, self.patch),
                    strides=self.stride, padding=self.patch // 2,
                    dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(dtype=jnp.float32,
                            name="norm")(x).astype(self.dtype)


class EfficientAttention(nn.Module):
    """Self-attention with spatial reduction of K/V (MiT)."""
    num_heads: int
    sr_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        q = nn.Dense(c, dtype=self.dtype, name="q")(x).reshape(n, h * w, c)
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                            strides=self.sr_ratio, dtype=self.dtype,
                            name="sr")(x)
            kv_in = nn.LayerNorm(dtype=jnp.float32,
                                 name="sr_norm")(kv_in).astype(self.dtype)
        kh, kw = kv_in.shape[1], kv_in.shape[2]
        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv")(kv_in)
        k, v = jnp.split(kv.reshape(n, kh * kw, 2 * c), 2, axis=-1)
        hd = c // self.num_heads
        qh = q.reshape(n, -1, self.num_heads, hd)
        kh_ = k.reshape(n, -1, self.num_heads, hd)
        vh = v.reshape(n, -1, self.num_heads, hd)
        a = jax.nn.dot_product_attention(qh, kh_, vh).reshape(n, h * w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(a).reshape(
            n, h, w, c)


class MixFFN(nn.Module):
    """FFN with a 3x3 depthwise conv between the projections (MiT)."""
    expand: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = c * self.expand
        h = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.Conv(hidden, (3, 3), padding=1, feature_group_count=hidden,
                    dtype=self.dtype, name="dw")(h)
        h = nn.gelu(h, approximate=False)  # torch-exact GELU (mit pretrain)
        return nn.Dense(c, dtype=self.dtype, name="fc2")(h)


class MiTBlock(nn.Module):
    num_heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x).astype(self.dtype)
        x = x + EfficientAttention(self.num_heads, self.sr_ratio,
                                   dtype=self.dtype, name="attn")(y)
        y = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x).astype(self.dtype)
        return x + MixFFN(dtype=self.dtype, name="ffn")(y)


class MiTBackbone(nn.Module):
    """4-stage hierarchy; returns per-stage features at 1/4..1/32."""
    widths: Sequence[int] = (32, 64, 160, 256)   # B0
    depths: Sequence[int] = (2, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    heads: Sequence[int] | None = None   # default: width-derived (B0 rule)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        h = x
        for si in range(4):
            patch, stride = (7, 4) if si == 0 else (3, 2)
            if self.heads is not None:
                heads = self.heads[si]
            else:
                # head count scales with width and always divides it
                heads = max(1, self.widths[si] // 32)
                while self.widths[si] % heads:
                    heads -= 1
            h = OverlapPatchEmbed(self.widths[si], patch, stride,
                                  dtype=self.dtype, name=f"embed{si}")(h)
            for bi in range(self.depths[si]):
                h = MiTBlock(heads, self.sr_ratios[si],
                             dtype=self.dtype, name=f"s{si}b{bi}")(h)
            h = nn.LayerNorm(dtype=jnp.float32,
                             name=f"norm{si}")(h).astype(self.dtype)
            feats.append(h)
        return feats


class SegformerHead(nn.Module):
    """All-MLP decode head: project + upsample + fuse -> logits at 1/4."""
    num_classes: int
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        n = feats[0].shape[0]
        th, tw = feats[0].shape[1], feats[0].shape[2]
        ups = []
        for i, f in enumerate(feats):
            p = nn.Dense(self.embed_dim, dtype=self.dtype,
                         name=f"proj{i}")(f)
            if p.shape[1] != th:
                p = jax.image.resize(p, (n, th, tw, self.embed_dim),
                                     "bilinear")
            ups.append(p)
        h = jnp.concatenate(ups[::-1], axis=-1)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="fuse")(h)
        h = nn.gelu(h)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="cls")(h)


class SegformerSegmenter(nn.Module):
    """f_s segmenter: (B,H,W,C) -> (B,H,W,num_classes) logits (reference
    f_s_net='segformer', models/semantic_networks.py + segformer/)."""
    num_classes: int = 2
    widths: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, H, W, _ = x.shape
        feats = MiTBackbone(widths=self.widths, depths=self.depths,
                            dtype=self.dtype, name="backbone")(x)
        logits = SegformerHead(self.num_classes, dtype=self.dtype,
                               name="head")(feats)
        return jax.image.resize(
            logits.astype(jnp.float32), (n, H, W, self.num_classes),
            "bilinear")


class SegformerGeneratorAttn(nn.Module):
    """segformer_attn generator: MiT encoder + attention decoder blending
    content images with softmax masks (reference
    segformer/segformer_generator.py SegformerGenerator_attn; same blend
    contract as resnet_attn)."""
    out_channels: int = 3
    nb_mask_attn: int = 10
    nb_mask_input: int = 1
    widths: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, extract_layer_ids=None):
        n, H, W, _ = x.shape
        feats = MiTBackbone(widths=self.widths, depths=self.depths,
                            dtype=self.dtype, name="backbone")(x)
        if extract_layer_ids is not None:
            return [feats[i] for i in extract_layer_ids]
        n_content = self.nb_mask_attn - self.nb_mask_input
        fused = SegformerHead(256, dtype=self.dtype,
                              name="neck")(feats)   # (n, H/4, W/4, 256)
        fused = nn.gelu(fused)
        contents = nn.Dense(self.out_channels * n_content * 16,
                            dtype=self.dtype, name="content_out")(fused)
        # pixel-shuffle x4 back to full resolution
        h4, w4 = fused.shape[1], fused.shape[2]
        contents = contents.reshape(n, h4, w4, 4, 4,
                                    self.out_channels * n_content)
        contents = contents.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, H, W, self.out_channels * n_content)
        contents = jnp.tanh(contents)
        attn = nn.Dense(self.nb_mask_attn * 16, dtype=self.dtype,
                        name="attn_out")(fused)
        attn = attn.reshape(n, h4, w4, 4, 4, self.nb_mask_attn)
        attn = attn.transpose(0, 1, 3, 2, 4, 5).reshape(n, H, W,
                                                        self.nb_mask_attn)
        attn = jax.nn.softmax(attn.astype(jnp.float32),
                              axis=-1).astype(x.dtype)
        inp = x[..., : self.out_channels]
        out = 0.0
        for i in range(n_content):
            ci = contents[..., i * self.out_channels:(i + 1) * self.out_channels]
            out = out + ci * attn[..., i:i + 1]
        for i in range(n_content, self.nb_mask_attn):
            out = out + inp * attn[..., i:i + 1]
        return out.astype(jnp.float32)


def load_mit_backbone(params, node_name="backbone"):
    """Swap every ``node_name`` subtree for ported MiT ImageNet weights when
    ``$JOLIGEN_TPU_WEIGHTS_DIR/segformer_mit_b0.npz`` exists (reference
    models/modules/utils.py:224 inits segformer nets from the same
    pretrain). The backbone stays trainable — this is an init, not a
    freeze."""
    import os

    import numpy as np

    path = os.path.join(os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", ""),
                        "segformer_mit_b0.npz")
    if not os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR") \
            or not os.path.exists(path):
        return params
    z = np.load(path)
    tree = {}
    for key in z.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])

    def walk(node):
        if not isinstance(node, dict):
            return node
        return {k: (tree if k == node_name else walk(v))
                for k, v in node.items()}

    return walk(params)
