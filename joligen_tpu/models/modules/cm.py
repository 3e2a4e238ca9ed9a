"""Consistency model core (iCT) + ECT (easy consistency tuning).

Behavioral parity with reference models/modules/cm_generator.py:
Karras sigma schedule, improved timestep discretization schedule, lognormal
timestep sampling, skip/output scalings (train/test variants), ECT sigmoid
t->r mapping, pseudo-huber loss, and the multi-step consistency sampler.
The sampler is a lax.scan; the discretization stage (which changes array
sizes ~8 times over a run) is resolved host-side per stage.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SIGMA_MIN = 0.002
SIGMA_MAX = 80.0
SIGMA_DATA = 0.5
RHO = 7.0


def improved_timesteps_schedule(current_step, total_steps,
                                initial_timesteps=10, final_timesteps=1280):
    """(cm_generator.py:32-69)"""
    total_prime = math.floor(
        total_steps / (math.log2(math.floor(final_timesteps / initial_timesteps)) + 1))
    num = initial_timesteps * 2 ** math.floor(current_step / max(1, total_prime))
    return int(min(num, final_timesteps) + 1)


def karras_schedule(num_timesteps, sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX,
                    rho=RHO):
    """(cm_generator.py:72-106)"""
    rho_inv = 1.0 / rho
    steps = np.arange(num_timesteps) / max(num_timesteps - 1, 1)
    sigmas = sigma_min ** rho_inv + steps * (
        sigma_max ** rho_inv - sigma_min ** rho_inv)
    return np.asarray(sigmas ** rho, dtype=np.float32)


def lognormal_timestep_probs(sigmas, mean=-1.1, std=2.0):
    """Discrete pdf over intervals (cm_generator.py:109-144)."""
    from scipy.special import erf  # scipy is numpy-adjacent, host-side only
    s = np.asarray(sigmas, dtype=np.float64)
    pdf = erf((np.log(s[1:]) - mean) / (std * math.sqrt(2))) - erf(
        (np.log(s[:-1]) - mean) / (std * math.sqrt(2)))
    return np.asarray(pdf / pdf.sum(), dtype=np.float32)


def improved_loss_weighting(sigmas):
    """1/(sigma_{i+1}-sigma_i) (cm_generator.py:147-164)."""
    s = np.asarray(sigmas)
    return np.asarray(1.0 / (s[1:] - s[:-1]), dtype=np.float32)


def skip_scaling(sigma, train=False):
    if train:
        return SIGMA_DATA ** 2 / (sigma ** 2 + SIGMA_DATA ** 2)
    return SIGMA_DATA ** 2 / ((sigma - SIGMA_MIN) ** 2 + SIGMA_DATA ** 2)


def output_scaling(sigma, train=False):
    if train:
        return (SIGMA_DATA * sigma) / (SIGMA_DATA ** 2 + sigma ** 2) ** 0.5
    return (SIGMA_DATA * (sigma - SIGMA_MIN)) / (
        SIGMA_DATA ** 2 + sigma ** 2) ** 0.5


def ect_t_to_r_sigmoid(t, stage, k=8.0, b=1.0, q=2.0):
    """(cm_generator.py:325-333)"""
    adj = 1 + k * jax.nn.sigmoid(-b * t)
    decay = 1 / q ** (stage + 1)
    ratio = 1 - decay * adj
    return jnp.maximum(t * ratio, 0.0)


def pseudo_huber_loss(pred, target):
    """c = 0.00054 * sqrt(numel per sample) (reference cm_model.py:27-43)."""
    c = 0.00054 * math.sqrt(math.prod(pred.shape[1:]))
    return jnp.sqrt((pred - target) ** 2 + c ** 2) - c


class NoiseLevelEmbedding(nn.Module):
    """Fixed random Fourier features + MLP (cm_generator.py:253-283)."""
    channels: int
    scale: float = 0.02
    ft_proj: bool = False    # ddpm->cm finetune uses a same-width projection
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sigmas):
        W = self.param("W", nn.initializers.normal(stddev=self.scale),
                       (self.channels // 2,))
        W = jax.lax.stop_gradient(W)
        h = sigmas[:, None] * W[None, :] * 2 * jnp.pi
        h = jnp.concatenate([jnp.sin(h), jnp.cos(h)], axis=-1)
        hidden = self.channels if self.ft_proj else 4 * self.channels
        h = nn.Dense(hidden, dtype=self.dtype, name="proj0")(h)
        h = nn.silu(h)
        return nn.Dense(self.channels, dtype=self.dtype, name="proj1")(h)


class CMDenoiser(nn.Module):
    """Wraps an inner denoiser with the sigma embedding + consistency
    parameterization c_skip*x + c_out*F(x, emb)."""
    inner: nn.Module
    cond_embed_dim: int
    ft_proj: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sigma, x_cond=None, train=True):
        c_skip = skip_scaling(sigma, train).reshape(-1, 1, 1, 1)
        c_out = output_scaling(sigma, train).reshape(-1, 1, 1, 1)
        emb = NoiseLevelEmbedding(self.cond_embed_dim, ft_proj=self.ft_proj,
                                  dtype=self.dtype, name="sigma_embed")(sigma)
        xin = x if x_cond is None else jnp.concatenate([x_cond, x], axis=-1)
        f = self.inner(xin, emb)
        return c_skip * x + c_out * f


def cm_training_outputs(apply_fn, params, rng, step_count, total_steps, y0,
                        y_cond=None, mask=None):
    """One iCT training forward (cm_generator.py forward, non-ECT branch).
    Returns (pred_x, target_x, loss_weights). Host decides the
    discretization from step_count."""
    num_t = improved_timesteps_schedule(step_count, total_steps)
    sigmas = karras_schedule(num_t)
    probs = lognormal_timestep_probs(sigmas)
    weights_all = improved_loss_weighting(sigmas)

    b = y0.shape[0]
    rng_t, rng_n = jax.random.split(rng)
    timesteps = jax.random.choice(rng_t, num_t - 1, shape=(b,),
                                  p=jnp.asarray(probs))
    cur_sig = jnp.asarray(sigmas)[timesteps]
    next_sig = jnp.asarray(sigmas)[timesteps + 1]
    noise = jax.random.normal(rng_n, y0.shape, y0.dtype)

    m = None if mask is None else jnp.clip(mask.astype(y0.dtype), 0.0, 1.0)

    def noisy(sig):
        x = y0 + sig.reshape(-1, 1, 1, 1) * noise
        if m is not None:
            x = x * m + (1 - m) * y0
        return x

    pred_x = apply_fn(params, noisy(next_sig), next_sig, y_cond, True)
    target_x = jax.lax.stop_gradient(
        apply_fn(params, noisy(cur_sig), cur_sig, y_cond, True))
    w = jnp.asarray(weights_all)[timesteps].reshape(-1, 1, 1, 1)
    return pred_x, target_x, w


def ect_training_outputs(apply_fn, params, rng, stage, y0, y_cond=None,
                         mask=None, P_mean=-1.1, P_std=2.0):
    """ECT forward (cm_generator.py ect branch): continuous t ~ lognormal,
    r = sigmoid-shrunk t; consistency between D(x_t, t) and sg(D(x_r, r))."""
    b = y0.shape[0]
    rng_t, rng_n = jax.random.split(rng)
    t = jnp.exp(jax.random.normal(rng_t, (b,)) * P_std + P_mean)
    r = ect_t_to_r_sigmoid(t, stage)
    noise = jax.random.normal(rng_n, y0.shape, y0.dtype)
    m = None if mask is None else jnp.clip(mask.astype(y0.dtype), 0.0, 1.0)

    def noisy(sig):
        x = y0 + sig.reshape(-1, 1, 1, 1) * noise
        if m is not None:
            x = x * m + (1 - m) * y0
        return x

    D_yt = apply_fn(params, noisy(t), t, y_cond, True)
    D_yr = jax.lax.stop_gradient(apply_fn(params, noisy(r), r, y_cond, True))
    return D_yt, D_yr, t, r


def cm_sample(apply_fn, params, rng, sigmas, y, y_cond=None, mask=None,
              clip_denoised=True, noise_seq=None):
    """Multi-step consistency sampler (cm_generator.py restoration):
    sigmas: descending list of noise levels (few-step).

    ``noise_seq``: optional (len(sigmas), B, H, W, C) array of the
    injected noises (index 0 is the initial sigma_max draw). Used by the
    full-chain equivalence tests to drive this sampler and the reference
    torch loop with identical noise; production callers leave it None."""
    m = None if mask is None else jnp.clip(mask.astype(y.dtype), 0.0, 1.0)
    if m is not None:
        y_base = y * (1 - m)
    else:
        y_base = jnp.zeros_like(y)

    def project(x):
        if clip_denoised:
            x = jnp.clip(x, -1.0, 1.0)
        if m is not None:
            x = x * m + (1 - m) * y
        return x

    rng, sub = jax.random.split(rng)
    noise0 = (noise_seq[0] if noise_seq is not None
              else jax.random.normal(sub, y.shape, y.dtype))
    x = (y_base if m is not None else y) + sigmas[0] * noise0
    if m is not None:
        x = x * m + (1 - m) * y
    sig0 = jnp.full((y.shape[0],), sigmas[0], y.dtype)
    x = project(apply_fn(params, x, sig0, y_cond, False))

    if len(sigmas) > 1:
        def step(carry, scan_in):
            sig = scan_in[0] if noise_seq is not None else scan_in
            x, key = carry
            key, sub = jax.random.split(key)
            noise_scale = jnp.sqrt(jnp.maximum(sig ** 2 - SIGMA_MIN ** 2, 0.0))
            noise = (scan_in[1] if noise_seq is not None
                     else jax.random.normal(sub, x.shape, x.dtype))
            xi = x + noise_scale * noise
            if m is not None:
                xi = xi * m + (1 - m) * y
            sigb = jnp.full((x.shape[0],), sig, x.dtype)
            xi = project(apply_fn(params, xi, sigb, y_cond, False))
            return (xi, key), None

        tail = jnp.asarray(sigmas[1:], y.dtype)
        xs = (tail, jnp.asarray(noise_seq[1:])) if noise_seq is not None \
            else tail
        (x, _), _ = jax.lax.scan(step, (x, rng), xs)
    return x
