"""Spectral normalization (G_spectral / D_spectral).

TPU-native reparameterization of torch.nn.utils.spectral_norm (reference
models/modules/utils.py spectral_norm wrapper, used by
resnet_generator.py:427-486 and discriminators.py when use_spectral):
instead of torch's persistent power-iteration vector ``u`` mutated at every
forward (hidden state that breaks pure jitted steps), each apply runs a
fixed small number of power iterations from a deterministic start. Three
iterations estimate sigma_max within a few percent for conv-sized matrices,
the cost is a handful of matvecs per layer, and the op stays pure so XLA
can fuse and cache it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def spectral_normalize(w, iters=3, eps=1e-12):
    """w / sigma_max(w) with sigma estimated by power iteration over the
    (fan_in, fan_out) matricization."""
    mat = w.reshape(-1, w.shape[-1]).astype(jnp.float32)
    n = mat.shape[0]
    u = jnp.full((n,), 1.0 / jnp.sqrt(jnp.asarray(float(n))))
    v = None
    for _ in range(iters):
        v = mat.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = mat @ v
        u = u / (jnp.linalg.norm(u) + eps)
    sigma = u @ (mat @ v)
    return (w / jnp.maximum(sigma, eps)).astype(w.dtype)


class SNConv(nn.Module):
    """nn.Conv with a spectrally normalized kernel."""
    features: int
    kernel_size: tuple = (4, 4)
    strides: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        k = spectral_normalize(k)
        pad = [(self.padding, self.padding)] * 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(self.strides, self.strides), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(self.dtype)
