"""InceptionV3 (FID variant) in flax — pool3 2048-d feature trunk.

Architecture matches the pytorch-fid / torchvision InceptionV3 graph used by
the reference metric stack (reference util/metrics.py:53-144 extracts these
activations). Weights load from an ``inception_v3_fid.npz`` produced by
``tools/port_inception_weights.py`` (requires a machine with the torchvision
checkpoint); without weights the metric layer falls back to
RandomConvFeatures (see utils/metrics.py).

NHWC layout, fused conv+BN (BN folded into conv scale/bias at port time —
inference-only network, so folding is exact and saves memory bandwidth).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv with folded batchnorm (scale/bias baked in) + ReLU."""
    features: int
    kernel: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str | Sequence = "SAME"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel), strides=tuple(self.strides),
                    padding=self.padding, use_bias=True, name="conv")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), name="branch3x3dbl_3")(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), padding="VALID",
                    name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), padding="VALID",
                    name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), name="branch7x7dbl_5")(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), padding="VALID",
                    name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), padding="VALID",
                    name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """FID variant: the last block uses avg-pool in both E blocks (pytorch-fid
    modifies torchvision's E2 max-pool to avg — matched here via pool_op)."""
    pool_op: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_op == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """(N, 299, 299, 3) in [-1, 1] -> (N, 2048) pool3 features."""

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, (3, 3), strides=(2, 2), padding="VALID",
                   name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), padding="VALID", name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ConvBN(80, (1, 1), padding="VALID", name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), padding="VALID", name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool_op="avg", name="Mixed_7b")(x)
        x = InceptionE(pool_op="avg", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))


def load_inception_params(path):
    """Load a flat ``name/kernel``/``name/bias`` npz into the flax tree."""
    raw = np.load(path)
    tree = {}
    for key in raw.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(raw[key])
    return {"params": tree}
