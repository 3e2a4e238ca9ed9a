"""Semantic auxiliary nets: classifier C and segmenter f_s
(reference models/semantic_networks.py:19-105, models/modules/classifiers.py,
models/modules/UNet_classification.py). Compact NHWC flax versions; the
heavy pretrained options (VGG16-FCN8s, Segformer, SAM) are follow-ups —
'vgg'/'basic' map to these trainable-from-scratch nets as the reference's
CI-tested path does."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class Classifier(nn.Module):
    """Downsampling CNN classifier (reference classifiers.py Classifier)."""
    nclasses: int
    nf: int = 64
    img_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math
        h = x.astype(self.dtype)
        n_levels = max(2, int(math.log2(max(1, self.img_size // 8))))
        f = self.nf
        for i in range(n_levels):
            h = nn.Conv(f, (3, 3), strides=2, padding=1, dtype=self.dtype)(h)
            h = nn.LayerNorm(dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
            f = min(f * 2, self.nf * 8)
        h = h.mean(axis=(1, 2))
        return nn.Dense(self.nclasses, dtype=self.dtype)(h).astype(jnp.float32)


class UNetSegmenter(nn.Module):
    """Small UNet per-pixel classifier (reference UNet_classification.py)."""
    nclasses: int
    nf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax
        h = x.astype(self.dtype)
        skips = []
        f = self.nf
        for i in range(3):
            h = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype)(h)
            h = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h).astype(self.dtype)
            h = nn.relu(h)
            skips.append(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            f *= 2
        h = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.relu(h)
        for i in range(3):
            f //= 2
            n, hh, ww, c = h.shape
            h = jax.image.resize(h, (n, hh * 2, ww * 2, c), method="nearest")
            h = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = jnp.concatenate([h, skips.pop()], axis=-1)
        return nn.Conv(self.nclasses, (1, 1), dtype=self.dtype)(h).astype(jnp.float32)


def define_C(opt):
    return Classifier(nclasses=opt.cls_semantic_nclasses, nf=opt.cls_nf,
                      img_size=opt.data_crop_size)


def define_f(opt):
    """f_s factory (reference semantic_networks.py:45): unet / vgg /
    segformer (from-scratch MiT; pretrained weights are weight-gated) /
    sam (needs downloaded SAM weights — unavailable in this image)."""
    net = getattr(opt, "f_s_net", "unet") or "unet"
    if net == "segformer":
        from .segformer import SegformerSegmenter
        return SegformerSegmenter(num_classes=opt.f_s_semantic_nclasses)
    if net == "sam":
        # frozen SAM as the segmenter: replaces the GT label mask with its
        # box-prompted prediction (reference base_model.py:1522-1560); the
        # f_s optimizer is a no-op for it
        from ...utils.sam import (SamSegmenter, load_sam_params,
                                  sam_weights_path)
        path = sam_weights_path()
        if path is None:
            raise NotImplementedError(
                "f_s_net=sam needs ported SAM weights: run "
                "tools/port_sam_weights.py and drop sam_vit.npz into "
                "JOLIGEN_TPU_WEIGHTS_DIR (zero-egress environment)")
        _, cfg = load_sam_params(path)
        return SamSegmenter(cfg)
    # 'unet' and 'vgg' both train from scratch here (the reference's
    # VGG16-FCN8s also needs torchvision weights)
    return UNetSegmenter(nclasses=opt.f_s_semantic_nclasses, nf=opt.f_s_nf)
