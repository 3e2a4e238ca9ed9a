"""I3D (Inflated Inception-V1) video feature extractor in flax — the FVD
detector (reference util/fvd.py:128-156 loads the stylegan-v i3d
torchscript; the canonical public checkpoint layout is piergiaj/pytorch-i3d
``rgb_imagenet.pt``, which tools/port_i3d_weights.py consumes).

BatchNorm is folded into each conv (frozen inference net). Output: 400-dim
pre-softmax logits of the temporally averaged pooled features — linear layer
and temporal mean commute, so this matches the reference detector's
``return_features=True`` vector up to that reordering.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# Inception branch widths: name -> (b0, b1a, b1b, b2a, b2b, b3b)
_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


def _unit(x, ch, kernel, stride, name, use_bias=True, relu=True):
    h = nn.Conv(ch, kernel, strides=stride, padding="SAME", use_bias=use_bias,
                name=name)(x)
    return nn.relu(h) if relu else h


def _maxpool(x, kernel, stride):
    return nn.max_pool(x, kernel, strides=stride, padding="SAME")


class I3D(nn.Module):
    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        """x: (N, T, H, W, 3) in [-1,1]. Returns (N, num_classes) logits."""
        h = _unit(x, 64, (7, 7, 7), (2, 2, 2), "Conv3d_1a_7x7")
        h = _maxpool(h, (1, 3, 3), (1, 2, 2))
        h = _unit(h, 64, (1, 1, 1), (1, 1, 1), "Conv3d_2b_1x1")
        h = _unit(h, 192, (3, 3, 3), (1, 1, 1), "Conv3d_2c_3x3")
        h = _maxpool(h, (1, 3, 3), (1, 2, 2))
        for name, (b0, b1a, b1b, b2a, b2b, b3b) in _MIXED.items():
            if name == "Mixed_4b":
                h = _maxpool(h, (3, 3, 3), (2, 2, 2))
            if name == "Mixed_5b":
                h = _maxpool(h, (2, 2, 2), (2, 2, 2))
            br0 = _unit(h, b0, (1, 1, 1), (1, 1, 1), f"{name}.b0")
            br1 = _unit(h, b1a, (1, 1, 1), (1, 1, 1), f"{name}.b1a")
            br1 = _unit(br1, b1b, (3, 3, 3), (1, 1, 1), f"{name}.b1b")
            br2 = _unit(h, b2a, (1, 1, 1), (1, 1, 1), f"{name}.b2a")
            br2 = _unit(br2, b2b, (3, 3, 3), (1, 1, 1), f"{name}.b2b")
            br3 = _maxpool(h, (3, 3, 3), (1, 1, 1))
            br3 = _unit(br3, b3b, (1, 1, 1), (1, 1, 1), f"{name}.b3b")
            h = jnp.concatenate([br0, br1, br2, br3], axis=-1)
        h = jnp.mean(h, axis=(1, 2, 3))          # global spatiotemporal pool
        logits = nn.Dense(self.num_classes, name="Logits")(h)
        return logits


def load_i3d_params(npz_path):
    """npz contract (tools/port_i3d_weights.py): ``<unit>.kernel`` (3D HWIO:
    (t,h,w,in,out), BN folded) + ``<unit>.bias`` for every conv unit above,
    plus ``Logits.kernel`` (in,out) / ``Logits.bias``."""
    import jax

    z = np.load(npz_path)
    params = {}
    for k in z.files:
        name, leaf = k.rsplit(".", 1)
        params.setdefault(name, {})[leaf] = z[k]
    return {"params": jax.tree.map(jnp.asarray, params)}
