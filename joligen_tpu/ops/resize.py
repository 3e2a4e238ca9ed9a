"""TPU-friendly integer-factor nearest upsampling.

``jax.image.resize(method="nearest")`` lowers to a gather on TPU — slow
and awkwardly laid out (it showed up as multi-GB gather traffic in the
CUT train step's HLO; BASELINE.md roofline audit). For the 2x decoder
upsamples used throughout the generator zoo the same result is a pure
broadcast+reshape, which XLA turns into a cheap relayout copy.
"""

from __future__ import annotations

import jax.numpy as jnp


def nearest_up2(x):
    """(B, H, W, C) -> (B, 2H, 2W, C) nearest-neighbor upsample."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
