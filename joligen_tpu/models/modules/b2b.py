"""B2B flow matching core (x-prediction -> velocity).

Behavioral parity with reference models/modules/b2b_generator.py:
logistic-normal t sampling with uniform mixing, resolution-scaled noise,
masked noising/projection, x-pred -> v conversion v=(x_pred-z)/max(1-t,eps),
classifier-free label dropout (null class = num_classes), Heun ODE sampling
with a final Euler step and interval-gated CFG. The whole sampler is one
``lax.scan``; CFG runs the conditional/unconditional passes as one batched
call when enabled.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def sample_t(rng, batch, P_mean=-0.8, P_std=0.8, uniform_mix_prob=0.1):
    """(b2b_generator.py:196-212)"""
    r1, r2, r3 = jax.random.split(rng, 3)
    t = jax.nn.sigmoid(jax.random.normal(r1, (batch,)) * P_std + P_mean)
    if uniform_mix_prob <= 0:
        return t
    t_u = jax.random.uniform(r2, (batch,))
    use_u = jax.random.uniform(r3, (batch,)) < uniform_mix_prob
    return jnp.where(use_u, t_u, t)


def drop_labels(rng, labels, num_classes, drop_prob):
    """Null class = num_classes (b2b_generator.py:214-218)."""
    if drop_prob <= 0 or labels is None:
        return labels
    drop = jax.random.uniform(rng, labels.shape) < drop_prob
    return jnp.where(drop, num_classes, labels)


def mask_size_condition(mask, H, W):
    """Per-(leading-dims) mask-bbox descriptor [cx, cy, w, h, area,
    log_aspect] (b2b_generator.py:85-175). mask: (..., H, W, 1)."""
    flat = (mask[..., 0] > 0.5).reshape(-1, H, W)
    positive = jnp.any(flat, axis=(1, 2))
    area = jnp.mean(flat.astype(jnp.float32), axis=(1, 2))
    y_any = jnp.any(flat, axis=2)
    x_any = jnp.any(flat, axis=1)
    y_idx = jnp.arange(H, dtype=jnp.float32)
    x_idx = jnp.arange(W, dtype=jnp.float32)
    y_min = jnp.min(jnp.where(y_any, y_idx[None], float(H)), axis=1)
    y_max = jnp.max(jnp.where(y_any, y_idx[None], -1.0), axis=1)
    x_min = jnp.min(jnp.where(x_any, x_idx[None], float(W)), axis=1)
    x_max = jnp.max(jnp.where(x_any, x_idx[None], -1.0), axis=1)
    width = (x_max - x_min + 1.0) / max(1, W)
    height = (y_max - y_min + 1.0) / max(1, H)
    cx = (x_min + x_max + 1.0) / (2.0 * max(1, W))
    cy = (y_min + y_max + 1.0) / (2.0 * max(1, H))
    log_aspect = jnp.clip(jnp.log((width + 1e-6) / (height + 1e-6)),
                          -3.0, 3.0) / 3.0
    feats = jnp.stack([cx, cy, width, height, area, log_aspect], axis=1)
    feats = jnp.where(positive[:, None], feats, jnp.zeros_like(feats))
    return feats.reshape(mask.shape[:-3] + (6,))


def _bcast(t, ndim):
    return t.reshape(t.shape + (1,) * (ndim - t.ndim))


def b2b_training_outputs(apply_fn, params, rng, y0, y_cond=None, mask=None,
                         labels=None, num_classes=1, noise_scale=1.0,
                         P_mean=-0.8, P_std=0.8, uniform_mix_prob=0.1,
                         t_eps=5e-2, label_drop_prob=0.0, mask_size=None,
                         use_gt_prob=0.0, degrade_prob=0.0, degrade_std=0.0,
                         minsnr=False):
    """Returns (v_pred, v_target, loss_mask, x_pred).

    Image (4D) and video (5D) paths (b2b_generator.py b2b_forward + forward).
    For video with ``use_gt_prob>0`` (autoregressive training,
    b2b_model.py:906-931): with that probability per sample, one random frame
    is replaced by its clean GT (t=1) — optionally degraded with gaussian
    noise — and excluded from the loss; the model learns to propagate it.
    """
    b = y0.shape[0]
    video = y0.ndim == 5
    r_t, r_n, r_d, r_g, r_gi, r_dg, r_dn = jax.random.split(rng, 7)
    t = sample_t(r_t, b, P_mean, P_std, uniform_mix_prob)

    m = None if mask is None else jnp.clip(mask.astype(y0.dtype), 0.0, 1.0)
    e = jax.random.normal(r_n, y0.shape, y0.dtype) * noise_scale

    loss_mask = m
    if video and use_gt_prob > 0.0:
        f = y0.shape[1]
        use_gt = jax.random.uniform(r_g, (b,)) < use_gt_prob
        ref_idx = jax.random.randint(r_gi, (b,), 0, f)
        is_ref = (jnp.arange(f)[None, :] == ref_idx[:, None]) & use_gt[:, None]
        # per-frame t: GT frame pinned at 1.0 (clean)
        t_frames = jnp.where(is_ref, 1.0, t[:, None])           # (B,F)
        tb = _bcast(t_frames, y0.ndim)
        z_t = tb * y0 + (1.0 - tb) * e
        # GT frame content replaces its noisy version (optionally degraded)
        degrade = (jax.random.uniform(r_dg, (b,)) < degrade_prob) & use_gt
        gt_ref = y0 + degrade_std * jax.random.normal(r_dn, y0.shape, y0.dtype) \
            * _bcast(degrade.astype(y0.dtype), y0.ndim)
        z_t = jnp.where(_bcast(is_ref.astype(jnp.bool_), y0.ndim), gt_ref, z_t)
        # exclude GT frame from the loss
        keep = 1.0 - _bcast(is_ref.astype(y0.dtype), y0.ndim)
        loss_mask = keep if m is None else m * keep
        t_model = t_frames
    else:
        tb = _bcast(t, y0.ndim)
        z_t = tb * y0 + (1.0 - tb) * e
        t_model = t

    z = z_t * m + (1.0 - m) * y0 if m is not None else z_t

    labels_d = drop_labels(r_d, labels, num_classes, label_drop_prob)

    z_in = z if y_cond is None else jnp.concatenate([y_cond, z], axis=-1)
    denom = jnp.maximum(1.0 - tb, t_eps)
    v_target = (y0 - z) / denom

    raw_x_pred = apply_fn(params, z_in, t_model, labels_d, mask_size)
    x_pred = raw_x_pred * m + (1.0 - m) * y0 if m is not None else raw_x_pred
    v_pred = (x_pred - z) / denom
    if minsnr:
        # min-SNR-gamma weighting for the v objective (alg_b2b_minsnr; the
        # reference's own branch references an undefined weight and crashes
        # — this is the evident intent, Hang et al. 2023 with gamma=5;
        # SNR(t) = (t/(1-t))^2 for z_t = t*y0 + (1-t)*eps)
        snr = (tb / jnp.maximum(1.0 - tb, t_eps)) ** 2
        w = jnp.minimum(snr, 5.0) / (snr + 1.0)
        # both sides scale by sqrt(w) so the squared loss is weighted by w
        sw = jnp.sqrt(w)
        v_pred = v_pred * sw
        v_target = v_target * sw
    # is_ref indicator for the ref-copy loss (zeros when not autoregressive)
    if video and use_gt_prob > 0.0:
        is_ref_b = _bcast(is_ref.astype(y0.dtype), y0.ndim)
    else:
        is_ref_b = None
    return v_pred, v_target, loss_mask, raw_x_pred, is_ref_b


def b2b_sample(apply_fn, params, rng, y, y_cond=None, mask=None, labels=None,
               num_classes=1, denoise_timesteps=50, noise_scale=1.0,
               t_eps=5e-2, cfg_scale=1.0, cfg_interval=(0.1, 1.0),
               clip_denoised=False, mask_size=None):
    """Heun ODE sampler with final Euler step (b2b_generator.py restoration)."""
    b = y.shape[0]
    m = None if mask is None else jnp.clip(mask.astype(y.dtype), 0.0, 1.0)
    y_background = y * (1.0 - m) if m is not None else y

    noise = jax.random.normal(rng, y.shape, y.dtype)
    x = y_background + noise * noise_scale
    if m is not None:
        x = x * m + y * (1.0 - m)

    if labels is None:
        labels = jnp.zeros((b,), jnp.int32)

    use_cfg = cfg_scale != 1.0 and num_classes > 1

    def velocity(x, t_scalar):
        x_in = x * m + y * (1.0 - m) if m is not None else x
        z_in = x_in if y_cond is None else jnp.concatenate([y_cond, x_in],
                                                           axis=-1)
        tvec = jnp.full((b,), t_scalar, x.dtype)
        den = jnp.maximum(1.0 - t_scalar, t_eps)
        x_pred = apply_fn(params, z_in, tvec, labels, mask_size)
        if m is not None:
            x_pred = x_pred * m + y * (1.0 - m)
        v_cond = (x_pred - x_in) / den
        if not use_cfg:
            return v_cond
        lo, hi = cfg_interval
        in_interval = jnp.logical_and(t_scalar < hi,
                                      jnp.logical_or(lo == 0, t_scalar > lo))

        def with_cfg(_):
            # the unconditional forward only runs inside the CFG interval —
            # lax.cond skips its FLOPs entirely outside it
            xu = apply_fn(params, z_in, tvec,
                          jnp.full((b,), num_classes, jnp.int32), mask_size)
            xu_c = xu * m + y * (1.0 - m) if m is not None else xu
            v_uncond = (xu_c - x_in) / den
            return v_uncond + cfg_scale * (v_cond - v_uncond)

        return jax.lax.cond(in_interval, with_cfg, lambda _: v_cond, None)

    def project(x):
        if clip_denoised:
            x = jnp.clip(x, -1.0, 1.0)
        if m is not None:
            x = x * m + y * (1.0 - m)
        return x

    steps = int(denoise_timesteps)
    ts = jnp.linspace(0.0, 1.0, steps + 1)

    def heun_step(x, i):
        t, t_next = ts[i], ts[i + 1]
        dt = t_next - t
        v_t = velocity(x, t)
        x_euler = x + dt * v_t
        v_next = velocity(x_euler, t_next)
        x = x + dt * 0.5 * (v_t + v_next)
        return project(x), None

    if steps > 1:
        x, _ = jax.lax.scan(heun_step, x, jnp.arange(steps - 1))
    # final euler step
    v = velocity(x, ts[steps - 1])
    x = x + (ts[steps] - ts[steps - 1]) * v
    x = project(x)
    return jnp.clip(x, -1.0, 1.0)
