"""HED soft-edge detector in flax (reference
models/modules/sketch_generation/hed.py:10-192 — VGG16 trunk, five 1x1
side-score convs bilinearly upsampled to input size, 1x1 fuse + sigmoid).
Weights: ``$JOLIGEN_TPU_WEIGHTS_DIR/hed_bsds500.npz`` via
tools/port_hed_weights.py; without them callers fall back to canny."""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# caffe-style BGR means applied to a 0-255 BGR input
# (reference hed.py:116-121)
_BGR_MEAN = np.array([104.00698793, 116.66876762, 122.67891434], np.float32)

_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class HEDNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (N,H,W,3) BGR, already mean-subtracted 0-255 scale.
        Returns (N,H,W,1) edge probability."""
        n, H, W, _ = x.shape
        scores = []
        h = x
        for bi, (width, convs) in enumerate(_BLOCKS):
            if bi:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for ci in range(convs):
                h = nn.relu(nn.Conv(width, (3, 3), padding=1,
                                    name=f"vgg{bi}c{ci}")(h))
            s = nn.Conv(1, (1, 1), name=f"score{bi}")(h)
            scores.append(jax.image.resize(s, (n, H, W, 1), "bilinear"))
        fused = nn.Conv(1, (1, 1), name="combine")(
            jnp.concatenate(scores, axis=-1))
        return nn.sigmoid(fused)


def load_hed_params(npz_path):
    """npz contract: {vgg{b}c{c},score{b},combine}.{kernel(HWIO),bias}."""
    z = np.load(npz_path)
    names = sorted({k.rsplit(".", 1)[0] for k in z.files})
    return {"params": {name: {"kernel": jnp.asarray(z[f"{name}.kernel"]),
                              "bias": jnp.asarray(z[f"{name}.bias"])}
                       for name in names}}


_CACHED = None


def hed_edges(img_rgb_u8):
    """uint8 RGB (H,W,3) -> uint8 edge map (H,W), or None when the weights
    are absent (caller falls back to canny)."""
    global _CACHED
    weights_dir = os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", "")
    path = os.path.join(weights_dir, "hed_bsds500.npz")
    if not os.path.exists(path):
        return None
    if _CACHED is None:
        net = HEDNet()
        params = load_hed_params(path)
        _CACHED = jax.jit(lambda x: net.apply(params, x))
    x = img_rgb_u8[:, :, ::-1].astype(np.float32) - _BGR_MEAN  # RGB->BGR
    edge = np.asarray(_CACHED(jnp.asarray(x[None])))[0, :, :, 0]
    return (edge * 255.0).clip(0, 255).astype(np.uint8)
