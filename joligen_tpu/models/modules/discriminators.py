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
    """70x70 PatchGAN (reference discriminators.py NLayerDiscriminator);
    ``use_dropout`` adds Dropout(0.5) after every LeakyReLU
    (reference :58-101, D_dropout) and ``freq_space`` judges the Haar
    bands (reference :21-42, train_feat_wavelet)."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    antialias: bool = True
    use_dropout: bool = False
    use_spectral: bool = False
    freq_space: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        def Conv(feat, strides=1):
            # D_spectral: spectrally normalized kernels
            # (reference discriminators.py use_spectral)
            if self.use_spectral:
                from .spectral import SNConv
                return SNConv(feat, (4, 4), strides=strides, padding=1,
                              dtype=self.dtype)
            return nn.Conv(feat, (4, 4), strides=strides, padding=1,
                           dtype=self.dtype)

        def drop(h):
            if self.use_dropout:
                h = nn.Dropout(0.5)(h, deterministic=deterministic)
            return h
        if self.freq_space:
            from ...ops.upfirdn2d import haar_transform
            x = haar_transform(x)
        kw, padw = 4, 1
        if self.antialias:
            h = Conv(self.ndf)(x)
            h = nn.leaky_relu(h, 0.2)
            h = drop(h)
            h = blur_pool(h)
        else:
            h = Conv(self.ndf, strides=2)(x)
            h = nn.leaky_relu(h, 0.2)
            h = drop(h)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            if self.antialias:
                h = Conv(self.ndf * mult)(h)
                h = make_norm(self.norm, self.dtype)(h)
                h = nn.leaky_relu(h, 0.2)
                h = drop(h)
                h = blur_pool(h)
            else:
                h = Conv(self.ndf * mult, strides=2)(h)
                h = make_norm(self.norm, self.dtype)(h)
                h = nn.leaky_relu(h, 0.2)
                h = drop(h)
        mult = min(2 ** self.n_layers, 8)
        h = Conv(self.ndf * mult)(h)
        h = make_norm(self.norm, self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        h = drop(h)   # reference discriminators.py:100-101
        out = Conv(1)(h)
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
