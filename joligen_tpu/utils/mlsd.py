"""MLSD (mobile line segment detector) in flax — the `hough` sketch
conditioning net (reference models/modules/sketch_generation/
mbv2_mlsd_large.py + mlsd.py, checkpoint mlsd_large_512_fp32.pth).

Truncated MobileNetV2 backbone on a 4-channel input (RGB + ones), FPN-style
decoder (BlockTypeA/B/C), 9-channel tpMap output (center heat + 4 start/end
displacements + aux). BN folds into convs (frozen net). Host-side line
decoding mirrors reference pred_lines/deccode_output_score_and_ptss.

Weights: ``$JOLIGEN_TPU_WEIGHTS_DIR/mlsd_large.npz`` via
tools/port_mlsd_weights.py; callers fall back to cv2 HoughLinesP without.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .midas import resize_align_corners

# MobileNetV2 inverted-residual config rows (t, c, n, s), truncated
_MBV2 = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
         (6, 96, 3, 1))
# FPN taps: feature indices [1, 3, 6, 10, 13] = ends of these stages
_TAP_AFTER = {(0, 0), (1, 1), (2, 2), (3, 3), (4, 2)}  # (stage, rep)


def _conv_bn_relu6(x, ch, k, s, groups, name):
    x = nn.Conv(ch, (k, k), strides=s, padding="SAME",
                feature_group_count=groups, name=name)(x)
    return jnp.minimum(nn.relu(x), 6.0)


class _IR(nn.Module):
    out_ch: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = x
        if self.expand != 1:
            h = _conv_bn_relu6(h, c * self.expand, 1, 1, 1, "expand")
        h = _conv_bn_relu6(h, h.shape[-1], 3, self.stride, h.shape[-1], "dw")
        h = nn.Conv(self.out_ch, (1, 1), name="project")(h)
        if self.stride == 1 and c == self.out_ch:
            h = h + x
        return h


def _block_b(x, out_c, name_prefix):
    """BlockTypeB (reference mbv2_mlsd_large.py:33-50): residual 3x3 then
    3x3 projection; call only from inside a compact module scope."""
    h = nn.relu(nn.Conv(x.shape[-1], (3, 3), padding=1,
                        name=f"{name_prefix}_conv1")(x)) + x
    return nn.relu(nn.Conv(out_c, (3, 3), padding=1,
                           name=f"{name_prefix}_conv2")(h))


class MLSDNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B,H,W,4) in [-1,1] (RGB + ones/127.5-1 channel).
        Returns (B,H/2,W/2,9) tpMap (center heat first, then 4 start/end
        displacements)."""
        h = _conv_bn_relu6(x, 32, 3, 2, 1, "stem")
        taps = []
        for si, (t, c, n, s) in enumerate(_MBV2):
            for ri in range(n):
                h = _IR(c, s if ri == 0 else 1, t, name=f"b{si}_{ri}")(h)
                if (si, ri) in _TAP_AFTER:
                    taps.append(h)
        c1, c2, c3, c4, c5 = taps

        def block_a(a, b, idx, upscale=True):
            b = nn.relu(nn.Conv(64, (1, 1), name=f"block{idx}_conv1")(b))
            a = nn.relu(nn.Conv(64, (1, 1), name=f"block{idx}_conv2")(a))
            if upscale:
                b = resize_align_corners(b, b.shape[1] * 2, b.shape[2] * 2)
            return jnp.concatenate([a, b], axis=-1)

        h = block_a(c4, c5, 15, upscale=False)
        h = _block_b(h, 64, "block16")
        h = block_a(c3, h, 17)
        h = _block_b(h, 64, "block18")
        h = block_a(c2, h, 19)
        h = _block_b(h, 64, "block20")
        h = block_a(c1, h, 21)
        h = _block_b(h, 64, "block22")
        # BlockTypeC: dilated 3x3 (rate 5), 3x3, 1x1
        h = nn.relu(nn.Conv(64, (3, 3), padding=5, kernel_dilation=5,
                            name="block23_conv1")(h))
        h = nn.relu(nn.Conv(64, (3, 3), padding=1, name="block23_conv2")(h))
        h = nn.Conv(16, (1, 1), name="block23_conv3")(h)
        return h[..., 7:]


def load_mlsd_params(npz_path):
    z = np.load(npz_path)
    tree = {}
    for key in z.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])
    return {"params": tree}


def decode_lines(tpmap, score_thr=0.10, dist_thr=20.0, topk=200, ksize=3):
    """Line decode (reference mlsd.py deccode_output_score_and_ptss +
    pred_lines, host numpy). tpmap: (h, w, 9) -> (N,4) segments in the
    2x-upscaled (input) pixel space."""
    import cv2
    center = tpmap[:, :, 0]
    heat = 1.0 / (1.0 + np.exp(-center))
    hmax = cv2.dilate(heat, np.ones((ksize, ksize), np.uint8))
    heat = np.where(hmax == heat, heat, 0.0)
    flat = heat.reshape(-1)
    idx = np.argsort(flat)[::-1][:topk]
    h, w = heat.shape
    disp = tpmap[:, :, 1:5]
    dist = np.sqrt(((disp[:, :, :2] - disp[:, :, 2:]) ** 2).sum(-1))
    segs = []
    for i in idx:
        y, x = divmod(int(i), w)
        if flat[i] > score_thr and dist[y, x] > dist_thr:
            dxs, dys, dxe, dye = disp[y, x]
            segs.append([x + dxs, y + dys, x + dxe, y + dye])
    return 2.0 * np.asarray(segs, np.float32) if segs else \
        np.zeros((0, 4), np.float32)


_CACHED = None


def mlsd_lines(img_rgb_u8, thr_v=0.1, thr_d=20.0):
    """uint8 RGB (H,W,3) -> uint8 line drawing (H,W), or None when weights
    are absent."""
    global _CACHED
    wd = os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", "")
    path = os.path.join(wd, "mlsd_large.npz")
    if not wd or not os.path.exists(path):
        return None
    import cv2
    if _CACHED is None:
        net = MLSDNet()
        params = load_mlsd_params(path)
        _CACHED = jax.jit(lambda x: net.apply(params, x))
    h, w = img_rgb_u8.shape[:2]
    size = 512
    resized = cv2.resize(img_rgb_u8, (size, size),
                         interpolation=cv2.INTER_AREA).astype(np.float32)
    # reference concatenates a raw ones-channel BEFORE normalizing
    # (mlsd.py:46-52), so the 4th channel lands at 1/127.5 - 1
    x = np.concatenate([resized, np.ones((size, size, 1), np.float32)],
                       axis=-1)
    x = x / 127.5 - 1.0
    tpmap = np.asarray(_CACHED(jnp.asarray(x[None])))[0]
    lines = decode_lines(tpmap, thr_v, thr_d)
    canvas = np.zeros((size, size), np.uint8)
    for x0, y0, x1, y1 in lines:
        cv2.line(canvas, (int(x0), int(y0)), (int(x1), int(y1)), 255, 1)
    return cv2.resize(canvas, (w, h), interpolation=cv2.INTER_NEAREST)
