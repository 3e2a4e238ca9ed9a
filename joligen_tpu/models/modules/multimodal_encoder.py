"""Multimodal z-encoders (BicycleGAN-style) for multimodal CUT
(reference models/modules/multimodal_encoder.py: E_ResNet / E_NLayers;
used when --model_multimodal, cut_model.py E group).

E maps an image to (mu, logvar) of a latent z; the generator concatenates
z (tiled spatially) to its input. The latent regression loss
``train_mm_lambda_z`` pulls E(G(A, z)) back to z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class EResNet(nn.Module):
    """Residual downsampling encoder -> (mu, logvar) (reference E_ResNet)."""
    nz: int = 8
    nef: int = 64
    n_blocks: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.nef, (4, 4), strides=2, padding=1,
                    dtype=self.dtype, name="stem")(x.astype(self.dtype))
        f = self.nef
        for i in range(self.n_blocks):
            fo = min(f * 2, self.nef * 4)
            r = nn.Conv(fo, (1, 1), strides=2, dtype=self.dtype,
                        name=f"skip{i}")(h)
            y = nn.GroupNorm(num_groups=min(8, f), dtype=jnp.float32)(
                h.astype(jnp.float32)).astype(self.dtype)
            y = nn.leaky_relu(y, 0.2)
            y = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype,
                        name=f"c{i}a")(y)
            y = nn.leaky_relu(y, 0.2)
            y = nn.Conv(fo, (3, 3), strides=2, padding=1, dtype=self.dtype,
                        name=f"c{i}b")(y)
            h = r + y
            f = fo
        h = nn.leaky_relu(h, 0.2)
        h = jnp.mean(h, axis=(1, 2))
        mu = nn.Dense(self.nz, dtype=self.dtype, name="fc_mu")(h)
        logvar = nn.Dense(self.nz, dtype=self.dtype, name="fc_var")(h)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)


class ENLayers(nn.Module):
    """Plain conv-stack encoder (reference E_NLayers)."""
    nz: int = 8
    nef: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.nef, (4, 4), strides=2, padding=1,
                    dtype=self.dtype)(x.astype(self.dtype))
        h = nn.leaky_relu(h, 0.2)
        f = self.nef
        for i in range(1, self.n_layers):
            f = min(f * 2, self.nef * 4)
            h = nn.Conv(f, (4, 4), strides=2, padding=1,
                        dtype=self.dtype)(h)
            h = nn.GroupNorm(num_groups=min(8, f), dtype=jnp.float32)(
                h.astype(jnp.float32)).astype(self.dtype)
            h = nn.leaky_relu(h, 0.2)
        h = jnp.mean(h, axis=(1, 2))
        mu = nn.Dense(self.nz, dtype=self.dtype, name="fc_mu")(h)
        logvar = nn.Dense(self.nz, dtype=self.dtype, name="fc_var")(h)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)


def reparameterize(rng, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, mu.shape, mu.dtype)


def tile_z(z, h, w):
    """(B, nz) -> (B, h, w, nz) spatial broadcast for G conditioning."""
    return jnp.broadcast_to(z[:, None, None, :], (z.shape[0], h, w,
                                                  z.shape[-1]))


def define_E(opt):
    """reference gan_networks.define_E (:529)."""
    netE = getattr(opt, "G_netE", "resnet_256") or "resnet_256"
    nz = int(getattr(opt, "train_mm_nz", 8) or 8)
    if "resnet" in netE:
        return EResNet(nz=nz, nef=getattr(opt, "D_ndf", 64))
    return ENLayers(nz=nz, nef=getattr(opt, "D_ndf", 64))
