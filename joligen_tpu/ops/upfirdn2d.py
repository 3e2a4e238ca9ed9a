"""upfirdn2d (upsample -> FIR filter -> downsample) as a single XLA op.

TPU-native replacement for the reference CUDA kernels
(models/modules/op/upfirdn2d_kernel.cu and
models/modules/mat/torch_utils/ops/upfirdn2d.cu): one
``lax.conv_general_dilated`` with input dilation (lhs_dilation = up) and
stride (window_strides = down) expresses the whole fused pipeline; XLA maps
it onto the MXU/VPU and fuses surrounding elementwise ops, and autodiff
provides the double-backward the CUDA version hand-codes.

Layout is NHWC (TPU conv native). Used by StyleGAN2/MAT-style blocks and the
Haar wavelet transform (reference models/modules/freq_utils.py:33-57).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def setup_filter(f, normalize=True, gain=1.0, separable=None):
    """Build a 2D FIR filter table from a 1D/2D spec (e.g. [1,3,3,1])."""
    if f is None:
        f = 1.0
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 0:
        f = f[None]
    if f.ndim == 1:
        f = np.outer(f, f)
    assert f.ndim == 2
    if normalize:
        f = f / f.sum()
    f = f * gain
    return jnp.asarray(f, dtype=jnp.float32)


def upfirdn2d(x, f, up=1, down=1, padding=(0, 0, 0, 0), gain=1.0):
    """x: (N, H, W, C) NHWC. f: (fh, fw) FIR filter. Returns NHWC.

    Semantics match the reference op (models/modules/op/upfirdn2d.py:103-208):
    zero-stuff upsample by ``up``, pad (left, right, top, bottom) — negative
    values crop — convolve with ``f`` (correlation of the flipped filter, as
    in conv), then subsample by ``down``.
    """
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    padx0, padx1, pady0, pady1 = padding
    n, h, w, c = x.shape
    fh, fw = f.shape

    # torch upfirdn2d zero-stuffs to h*up (trailing zeros after the last
    # sample); lax lhs_dilation inserts zeros only BETWEEN samples
    # (h*up - (up-1)). Add the missing trailing zeros as extra padding.
    pady1 += up[0] - 1
    padx1 += up[1] - 1

    # depthwise conv: kernel (fh, fw, 1, C) with feature_group_count=C
    kernel = jnp.tile(f[::-1, ::-1, None, None].astype(x.dtype), (1, 1, 1, c))
    out = lax.conv_general_dilated(
        x,
        kernel * (gain * up[0] * up[1]),
        window_strides=down,
        padding=((pady0, pady1), (padx0, padx1)),
        lhs_dilation=up,
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def upsample2d(x, f, up=2, gain=1.0):
    """Antialiased 2x (or ``up``x) upsampling (StyleGAN2 resample_kernel)."""
    fh, fw = f.shape
    p = fh - up
    return upfirdn2d(
        x, f, up=up,
        padding=((p + 1) // 2 + up - 1, p // 2, (p + 1) // 2 + up - 1, p // 2),
        gain=gain * (up ** 2) / (up ** 2),  # gain handled inside upfirdn2d by up^2
    )


def downsample2d(x, f, down=2, gain=1.0):
    """Antialiased downsampling."""
    fh, fw = f.shape
    p = fh - down
    return upfirdn2d(
        x, f, down=down,
        padding=((p + 1) // 2, p // 2, (p + 1) // 2, p // 2),
        gain=gain,
    )


# ---------------- Haar wavelet transform (freq-space feature option) -------
# Parity with reference models/modules/freq_utils.py:33-57 (train_feat_wavelet).

def _haar_filters():
    ll = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=np.float32)
    lh = np.array([[-0.5, -0.5], [0.5, 0.5]], dtype=np.float32)
    hl = np.array([[-0.5, 0.5], [-0.5, 0.5]], dtype=np.float32)
    hh = np.array([[0.5, -0.5], [-0.5, 0.5]], dtype=np.float32)
    return ll, lh, hl, hh


def haar_transform(x):
    """NHWC -> NHWC with 4x channels (LL, LH, HL, HH), half resolution."""
    outs = []
    for f in _haar_filters():
        outs.append(upfirdn2d(x, jnp.asarray(f), down=2, padding=(0, 1, 0, 1)))
    return jnp.concatenate(outs, axis=-1)


def inverse_haar_transform(x):
    """Inverse of :func:`haar_transform` (exact round trip: our up=2 FIR
    overlaps two taps per axis, contributing a global x4 that is divided
    back out)."""
    c = x.shape[-1] // 4
    ll, lh, hl, hh = (x[..., i * c:(i + 1) * c] for i in range(4))
    ll_f, lh_f, hl_f, hh_f = _haar_filters()
    out = 0.0
    for band, f in ((ll, ll_f), (lh, -lh_f), (hl, -hl_f), (hh, hh_f)):
        out = out + upfirdn2d(band, jnp.asarray(f), up=2, padding=(1, 0, 1, 0))
    return out * 0.25
