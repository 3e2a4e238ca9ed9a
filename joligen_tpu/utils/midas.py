"""MiDaS v2.1 small monocular depth estimator in flax (reference
models/modules/utils.py:240 downloads midas_v21_small for depth
conditioning and the depth discriminator).

Topology (isl-org/MiDaS MidasNet_small, features=64, expand=True,
non_negative=True): tf_efficientnet_lite3 encoder (strides 4/8/16/32,
channels 32/48/136/384; BN folded — shared MBConv stack with the
projected-D trunk), per-tap 3x3 "rn" convs to (64,128,256,512), four
RefineNet-style fusion blocks with align-corners x2 upsampling, and a
3-conv output head. Weights: ``$JOLIGEN_TPU_WEIGHTS_DIR/midas_small.npz``
via tools/port_midas_weights.py.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.modules.projected_d import _LITE3_STAGES, EfficientNetLiteTrunk

MIDAS_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
MIDAS_STD = np.array([0.229, 0.224, 0.225], np.float32)


def resize_align_corners(x, oh, ow):
    """Bilinear resize with align_corners=True semantics (torch
    F.interpolate(..., align_corners=True); jax.image.resize is
    half-pixel-centers only). x: (N,H,W,C)."""
    n, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, oh) if oh > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, w - 1.0, ow) if ow > 1 else jnp.zeros((1,))
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    rows0 = jnp.take(x, y0, axis=1)
    rows1 = jnp.take(x, y1, axis=1)
    top = jnp.take(rows0, x0, axis=2) * (1 - wx) + \
        jnp.take(rows0, x1, axis=2) * wx
    bot = jnp.take(rows1, x0, axis=2) * (1 - wx) + \
        jnp.take(rows1, x1, axis=2) * wx
    return top * (1 - wy) + bot * wy


class _RCU(nn.Module):
    """ResidualConvUnit_custom (bn=False): x + conv2(relu(conv1(relu(x))))."""
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv1")(nn.relu(x))
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv2")(nn.relu(h))
        return x + h


class _Fusion(nn.Module):
    """FeatureFusionBlock_custom: optional skip via rcu1, rcu2, x2
    align-corners upsample, 1x1 out_conv."""
    ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + _RCU(self.ch, name="rcu1")(skip)
        x = _RCU(self.ch, name="rcu2")(x)
        x = resize_align_corners(x, x.shape[1] * 2, x.shape[2] * 2)
        return nn.Conv(self.out_ch, (1, 1), name="out_conv")(x)


class MidasSmall(nn.Module):
    features: int = 64

    @nn.compact
    def __call__(self, x):
        """x: (N,H,W,3) ImageNet-normalized. Returns (N,H,W) inverse
        depth (non-negative)."""
        f = self.features
        taps = EfficientNetLiteTrunk(stages=_LITE3_STAGES,
                                     name="pretrained")(x)
        rns = [nn.Conv(f * (2 ** i), (3, 3), padding=1, use_bias=False,
                       name=f"layer{i + 1}_rn")(t)
               for i, t in enumerate(taps)]
        path = _Fusion(f * 8, f * 4, name="refinenet4")(rns[3])
        path = _Fusion(f * 4, f * 2, name="refinenet3")(path, rns[2])
        path = _Fusion(f * 2, f, name="refinenet2")(path, rns[1])
        path = _Fusion(f, f, name="refinenet1")(path, rns[0])
        h = nn.Conv(f // 2, (3, 3), padding=1, name="output_conv0")(path)
        h = resize_align_corners(h, h.shape[1] * 2, h.shape[2] * 2)
        h = nn.relu(nn.Conv(32, (3, 3), padding=1, name="output_conv2")(h))
        h = nn.relu(nn.Conv(1, (1, 1), name="output_conv4")(h))
        return h[..., 0]


def load_midas_params(npz_path):
    """npz contract (tools/port_midas_weights.py): encoder under
    ``pretrained.<lite-trunk-key>`` (BN folded), decoder keys
    layer{i}_rn.kernel, refinenet{i}.{rcu1,rcu2}.{conv1,conv2}.{kernel,bias},
    refinenet{i}.out_conv.{kernel,bias}, output_conv{0,2,4}.{kernel,bias}."""
    z = np.load(npz_path)
    tree = {}
    for key in z.files:
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])
    return {"params": tree}


def load_midas_encoder_into_projected(params, net_name="feature_network"):
    """Swap a depth-projected discriminator's frozen lite3 trunk for the
    MiDaS encoder weights when midas_small.npz exists (reference projector
    type ``depth`` uses MiDaS features)."""
    path = os.path.join(os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", ""),
                        "midas_small.npz")
    if not os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR") \
            or not os.path.exists(path):
        return params
    if net_name not in params.get("params", {}):
        return params
    z = np.load(path)
    tree = {}
    for key in z.files:
        if not key.startswith("pretrained."):
            continue
        node = tree
        parts = key.split(".")[1:]
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])
    new_params = dict(params)
    new_params["params"] = dict(params["params"])
    new_params["params"][net_name] = tree
    return new_params


_CACHED = None


def midas_depth(img_rgb_u8, out_size=None):
    """uint8 RGB (H,W,3) -> uint8 inverse-depth map (H,W), or None when
    weights are absent (callers fall back to the blur proxy)."""
    global _CACHED
    wd = os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", "")
    path = os.path.join(wd, "midas_small.npz")
    if not wd or not os.path.exists(path):
        return None
    if _CACHED is None:
        net = MidasSmall()
        params = load_midas_params(path)
        _CACHED = jax.jit(lambda x: net.apply(params, x))
    from PIL import Image
    h, w = img_rgb_u8.shape[:2]
    x = np.asarray(Image.fromarray(img_rgb_u8).resize((256, 256),
                                                      Image.BICUBIC),
                   np.float32) / 255.0
    x = (x - MIDAS_MEAN) / MIDAS_STD
    d = np.asarray(_CACHED(jnp.asarray(x[None])))[0]
    d = (d - d.min()) / (d.max() - d.min() + 1e-8)
    u8 = (d * 255).astype(np.uint8)
    return np.asarray(Image.fromarray(u8).resize(
        out_size or (w, h), Image.BICUBIC), np.uint8)
