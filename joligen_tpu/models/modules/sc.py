"""Shortcut model (one/few-step flow distillation).

Behavioral parity with reference models/modules/sc_generator.py: t and dt
embeddings summed, dyadic step-size sampling, bootstrap self-consistency
targets (two half-steps, averaged, clipped to +-1.5) mixed with flow-matching
targets at ``bootstrap_ratio``, and the Euler few-step sampler. The bootstrap
branch decision is a traced bernoulli (jnp.where), so one compiled program
covers both modes (the reference re-randomizes per batch in Python).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.schedules import timestep_embedding


class SCDenoiser(nn.Module):
    """Wraps an inner denoiser with t + dt embeddings (sc_generator.py:17-66)."""
    inner: nn.Module
    cond_embed_dim: int
    freq_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_t, t, dt_base, x_cond=None):
        t_emb = timestep_embedding(t, self.freq_dim)
        t_emb = nn.Dense(self.cond_embed_dim, dtype=self.dtype, name="t_0")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.cond_embed_dim, dtype=self.dtype, name="t_1")(t_emb)
        dt_emb = timestep_embedding(dt_base, self.freq_dim)
        dt_emb = nn.Dense(self.cond_embed_dim, dtype=self.dtype, name="dt_0")(dt_emb)
        dt_emb = nn.silu(dt_emb)
        dt_emb = nn.Dense(self.cond_embed_dim, dtype=self.dtype, name="dt_1")(dt_emb)
        emb = t_emb + dt_emb
        xin = x_t if x_cond is None else jnp.concatenate([x_cond, x_t], axis=-1)
        return self.inner(xin, emb)


def sc_training_outputs(apply_fn, params, rng, y0, y_cond=None, mask=None,
                        num_timesteps=128, bootstrap_ratio=0.125,
                        return_x=False):
    """Returns (v_pred, v_target), plus the one-step x-prediction
    x_t + (1-t)·v_pred when ``return_x`` (for perceptual losses)
    (sc_generator.py:137-216)."""
    b = y0.shape[0]
    log2_sections = int(math.log2(num_timesteps))
    r_dt, r_t, r_n, r_mode = jax.random.split(rng, 4)

    dt_base = jax.random.randint(r_dt, (b,), 0, log2_sections).astype(jnp.float32)
    dt = 1.0 / (2.0 ** dt_base)
    dt_base_bootstrap = dt_base + 1
    dt_bootstrap = dt / 2

    dt_sections = 2.0 ** dt_base
    u = jax.random.uniform(r_t, (b,))
    t = jnp.floor(u * dt_sections) / dt_sections

    t_full = t.reshape(-1, 1, 1, 1)
    x1 = y0
    x0 = jax.random.normal(r_n, y0.shape, y0.dtype)
    x_t = (1 - (1 - 1e-5) * t_full) * x0 + t_full * x1
    m = None if mask is None else jnp.clip(mask.astype(y0.dtype), 0.0, 1.0)
    if m is not None:
        x_t = x_t * m + (1 - m) * x1

    # bootstrap targets
    v_b1 = jax.lax.stop_gradient(
        apply_fn(params, x_t, t, dt_base_bootstrap, y_cond))
    t2 = t + dt_bootstrap
    x_t2 = jnp.clip(x_t + dt_bootstrap.reshape(-1, 1, 1, 1) * v_b1, -1.5, 1.5)
    v_b2 = jax.lax.stop_gradient(
        apply_fn(params, x_t2, t2, dt_base_bootstrap, y_cond))
    v_boot = jnp.clip((v_b1 + v_b2) / 2, -1.5, 1.5)

    # flow-matching targets
    v_flow = x1 - (1 - 1e-5) * x0

    use_bootstrap = jax.random.uniform(r_mode, ()) < bootstrap_ratio
    v_target = jnp.where(use_bootstrap, v_boot, v_flow)

    v_pred = apply_fn(params, x_t, t, dt_base, y_cond)
    if return_x:
        x_pred = x_t + (1.0 - t_full) * v_pred
        return v_pred, jax.lax.stop_gradient(v_target), x_pred
    return v_pred, jax.lax.stop_gradient(v_target)


def sc_sample(apply_fn, params, rng, y, y_cond=None, mask=None,
              denoise_timesteps=8, clip_denoised=True, noise=None):
    """Euler sampler at a fixed step count (sc_generator.py:218-252).
    ``noise`` overrides the initial randn draw (parity tests)."""
    b = y.shape[0]
    m = None if mask is None else jnp.clip(mask.astype(y.dtype), 0.0, 1.0)
    base = y * (1 - m) if m is not None else y
    if noise is None:
        noise = jax.random.normal(rng, y.shape, y.dtype)
    x = base + noise
    # Recombine with the zeroed ``base`` (NOT the original y): the reference
    # mutates y = y*(1-mask) up front and recombines with that, so the kept
    # region is effectively (1-m)^2 * y_orig — identical for binary masks,
    # divergent for fractional ones; mirror it exactly (sc_generator.py
    # restoration).
    if m is not None:
        x = x * m + (1 - m) * base
    delta = 1.0 / denoise_timesteps
    dt_base = jnp.full((b,), math.log2(denoise_timesteps), y.dtype)

    def step(x, ti):
        t_vec = jnp.full((b,), ti / denoise_timesteps, y.dtype)
        v = apply_fn(params, x, t_vec, dt_base, y_cond)
        x = x + v * delta
        if clip_denoised:
            x = jnp.clip(x, -1.0, 1.0)
        if m is not None:
            x = x * m + (1 - m) * base
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(denoise_timesteps))
    return x
