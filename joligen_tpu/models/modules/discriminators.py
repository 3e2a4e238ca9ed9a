"""Discriminators: PatchGAN NLayer + Pixel (reference
models/modules/discriminators.py:1-153), NHWC flax with optional
antialiased (blur-pool) striding matching the reference's no_antialias=False
default (StyleGAN3-ish downsampling)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .resnet_generator import make_norm
from ...ops.upfirdn2d import setup_filter, upfirdn2d


def blur_pool(x, stride=2):
    """Antialiased downsample: [1,3,3,1] FIR then stride."""
    f = setup_filter([1, 3, 3, 1])
    fh = f.shape[0]
    p = fh - stride
    return upfirdn2d(x, f, down=stride,
                     padding=((p + 1) // 2, p // 2, (p + 1) // 2, p // 2))


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN (reference discriminators.py NLayerDiscriminator)."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    antialias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw, padw = 4, 1
        if self.antialias:
            h = nn.Conv(self.ndf, (kw, kw), strides=1, padding=padw,
                        dtype=self.dtype)(x)
            h = nn.leaky_relu(h, 0.2)
            h = blur_pool(h)
        else:
            h = nn.Conv(self.ndf, (kw, kw), strides=2, padding=padw,
                        dtype=self.dtype)(x)
            h = nn.leaky_relu(h, 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            if self.antialias:
                h = nn.Conv(self.ndf * mult, (kw, kw), strides=1,
                            padding=padw, dtype=self.dtype)(h)
                h = make_norm(self.norm, self.dtype)(h)
                h = nn.leaky_relu(h, 0.2)
                h = blur_pool(h)
            else:
                h = nn.Conv(self.ndf * mult, (kw, kw), strides=2,
                            padding=padw, dtype=self.dtype)(h)
                h = make_norm(self.norm, self.dtype)(h)
                h = nn.leaky_relu(h, 0.2)
        mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * mult, (kw, kw), strides=1, padding=padw,
                    dtype=self.dtype)(h)
        h = make_norm(self.norm, self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        out = nn.Conv(1, (kw, kw), strides=1, padding=padw,
                      dtype=self.dtype)(h)
        assert 0 not in out.shape, (
            f"NLayerDiscriminator(n_layers={self.n_layers}) collapsed a "
            f"{x.shape[1]}px input to empty output; lower D_n_layers or "
            f"raise data_crop_size")
        return out.astype(jnp.float32)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (reference PixelDiscriminator)."""
    ndf: int = 64
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (1, 1), dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.ndf * 2, (1, 1), dtype=self.dtype)(h)
        h = make_norm(self.norm, self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (1, 1), dtype=self.dtype)(h).astype(jnp.float32)
