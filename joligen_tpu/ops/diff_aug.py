"""DiffAugment — differentiable augmentation for GAN discriminator inputs
(reference util/diff_aug.py:11-369), as pure jittable device functions.

The reference runs these on CPU tensors per batch; here they are traced into
the D/G step so augmentation rides the TPU (BASELINE north star:
device-resident augmentation). All ops keep static shapes: translation is a
pad + traced dynamic_slice, cutout is a coordinate mask — no data-dependent
shapes. Policies: "color", "translation", "cutout" (+ "noise", "resize_crop"
from the reference's wild policy). ``prob`` gates the whole augmentation per
batch like the reference's probability-gated variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(rng, x):
    b = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def rand_saturation(rng, x):
    s = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) * 2.0
    mean = x.mean(axis=-1, keepdims=True)
    return (x - mean) * s + mean


def rand_contrast(rng, x):
    c = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    return (x - mean) * c + mean


def rand_translation(rng, x, ratio=0.125):
    """Shift by up to ratio*size with zero padding, synchronized variant
    available through shared rng."""
    n, h, w, c = x.shape
    sh = max(1, int(h * ratio))
    sw = max(1, int(w * ratio))
    r1, r2 = jax.random.split(rng)
    ty = jax.random.randint(r1, (n,), -sh, sh + 1)
    tx = jax.random.randint(r2, (n,), -sw, sw + 1)
    pad = jnp.pad(x, ((0, 0), (sh, sh), (sw, sw), (0, 0)))

    def shift_one(img, dy, dx):
        return jax.lax.dynamic_slice(img, (sh + dy, sw + dx, 0), (h, w, c))

    return jax.vmap(shift_one)(pad, ty, tx)


def rand_cutout(rng, x, ratio=0.5):
    n, h, w, c = x.shape
    ch = max(1, int(h * ratio))
    cw = max(1, int(w * ratio))
    r1, r2 = jax.random.split(rng)
    cy = jax.random.randint(r1, (n, 1, 1), 0, h)
    cx = jax.random.randint(r2, (n, 1, 1), 0, w)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    inside = ((ys >= cy - ch // 2) & (ys < cy + ch - ch // 2)
              & (xs >= cx - cw // 2) & (xs < cx + cw - cw // 2))
    return x * (1.0 - inside[..., None].astype(x.dtype))


def rand_noise(rng, x, std=0.1):
    return x + std * jax.random.normal(rng, x.shape, x.dtype)


def rand_resize_crop(rng, x, scale=0.25):
    """Random per-image zoom-in then crop back to size (wild policy
    resize). scale_and_translate keeps output shapes static under jit
    while the zoom factor itself is traced and random per image."""
    n, h, w, c = x.shape
    r1, r2, r3 = jax.random.split(rng, 3)
    s = 1.0 + scale * jax.random.uniform(r1, (n,))
    oy = jax.random.uniform(r2, (n,)) * (h - h / s)
    ox = jax.random.uniform(r3, (n,)) * (w - w / s)

    def one(img, si, dy, dx):
        return jax.image.scale_and_translate(
            img, (h, w, c), (0, 1),
            jnp.stack([si, si]),
            jnp.stack([-dy * si, -dx * si]),
            method="linear")

    return jax.vmap(one)(x, s, oy, ox)


POLICY_FNS = {
    "color": (rand_brightness, rand_saturation, rand_contrast),
    "translation": (rand_translation,),
    "cutout": (rand_cutout,),
    "noise": (rand_noise,),
    "resize": (rand_resize_crop,),
}


def diff_augment(rng, x, policy="", prob=1.0):
    """Apply the comma-separated policy; with probability (1-prob) per batch
    return x unchanged (reference probability gate, diff_aug.py:330-369)."""
    if not policy:
        return x
    rng_gate, rng_ops = jax.random.split(rng)
    y = x
    for p in policy.split(","):
        p = p.strip()
        if not p or p not in POLICY_FNS:
            continue
        for fn in POLICY_FNS[p]:
            rng_ops, sub = jax.random.split(rng_ops)
            y = fn(sub, y)
    if prob >= 1.0:
        return y
    use = jax.random.uniform(rng_gate, ()) < prob
    return jnp.where(use, y, x)
