"""Residual-minimal fused GroupNorm(+FiLM)(+activation).

STATUS: tested but NOT wired into any model — a documented negative
result. A/B on the 256px palette train step measured 74.9 img/s with
this op at every UNet-MHA ResBlock norm site vs 76.6 img/s unfused
(BASELINE.md "Fused GroupNorm+FiLM+SiLU custom VJP"): within one jitted
program XLA already schedules the decomposed norm backward well, and the
custom_vjp boundary only removes fusion freedom. Kept because the math
and its gradient-parity test (tests/test_native_ops.py) are a reusable
template for sites where an HLO audit shows XLA *does* materialize norm
intermediates.

The original motivation: the flax GroupNorm -> FiLM -> SiLU
chain in the UNet ResBlocks (reference unet_generator_attn.py:141-272) is
algebraically fine under jax.grad, but autodiff saves full-size
intermediates for the backward pass — the fp32 normalized tensor ``xhat``
(needed for d(gamma)) and the activation input ``z`` (needed for
d(silu)) — so every norm site materializes ~3 extra full-resolution
buffers forward and reads them back in backward. The 256px palette train
step is HBM-bandwidth-bound (BASELINE.md roofline: 108.9 GB/step at ~96%
of practical bandwidth), so those buffers are pure wall-clock.

This op carries a custom VJP whose residuals are only ``x`` (already
materialized — it is the producing conv's output), the per-group mean and
rstd (tiny), and the small FiLM inputs. The backward recomputes xhat and
z on the fly; XLA fuses the recompute into the two backward passes, so
the whole site costs reads of x and the cotangent plus the dx write —
nothing extra is saved.

Numerics match the unfused path: statistics are fp32 pure reductions
(E[x^2] - E[x]^2, exactly flax's ``_compute_stats`` form), the normalize
runs in fp32 registers and casts to the compute dtype ONCE (flax
``_normalize`` order: (x - mean) * (rsqrt(var+eps) * gamma) + beta), and
FiLM / activation run in the compute dtype like the open-coded module
code they replace.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_ACTS = ("none", "silu", "relu")


def _stats(x32, groups, eps):
    """Per-(batch, group) fp32 mean/rstd. x32: (B, S, C) fp32."""
    b, s, c = x32.shape
    cg = c // groups
    xg = x32.reshape(b, s, groups, cg)
    mean = xg.mean(axis=(1, 3))                        # (B, G)
    mean2 = (xg * xg).mean(axis=(1, 3))
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd


def _broadcast_groups(v, c):
    """(B, G) -> (B, 1, C) by repeating each group value over its channels."""
    b, g = v.shape
    return jnp.repeat(v, c // g, axis=1).reshape(b, 1, c)


def _apply(x, mean, rstd, gamma, beta, scale, shift, act):
    """Forward math from saved stats. x: (B, S, C) input-dtype."""
    c = x.shape[-1]
    mul = _broadcast_groups(rstd, c)
    mu = _broadcast_groups(mean, c)
    y = (x.astype(jnp.float32) - mu)
    if gamma is not None:
        mul = mul * gamma.astype(jnp.float32)
    y = y * mul
    if beta is not None:
        y = y + beta.astype(jnp.float32)
    y = y.astype(x.dtype)
    if scale is not None:
        y = y * (1 + scale) + shift
    if act == "silu":
        y = jax.nn.silu(y)
    elif act == "relu":
        y = jax.nn.relu(y)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gn(x, gamma, beta, scale, shift, groups, eps, act):
    mean, rstd = _stats(x.astype(jnp.float32), groups, eps)
    return _apply(x, mean, rstd, gamma, beta, scale, shift, act)


def _gn_fwd(x, gamma, beta, scale, shift, groups, eps, act):
    mean, rstd = _stats(x.astype(jnp.float32), groups, eps)
    out = _apply(x, mean, rstd, gamma, beta, scale, shift, act)
    return out, (x, mean, rstd, gamma, beta, scale, shift)


def _gn_bwd(groups, eps, act, res, ct):
    # Dtype discipline: every full-resolution tensor here stays in the
    # COMPUTE dtype (bf16 under the default policy). The first version of
    # this backward carried the cotangent chain in fp32 "for accuracy" —
    # XLA materialized those intermediates at ENTRY level (multi-consumer
    # values don't get duplicated into every fusion), doubling backward
    # HBM traffic and making the fused op SLOWER than the unfused chain
    # (76.5 -> 72 img/s on the 256px palette step). fp32 is reserved for
    # reduction accumulators (jnp.sum/mean dtype=f32, fused into the
    # reduce) and the tiny per-group stats — which is also exactly the
    # precision the unfused autodiff path had, since flax casts the
    # normalized tensor to the compute dtype before the affine/act ops.
    x, mean, rstd, gamma, beta, scale, shift = res
    b, s, c = x.shape
    cg = c // groups
    cd = x.dtype                                        # compute dtype

    mu = _broadcast_groups(mean, c)                     # (B,1,C) f32 (tiny)
    mul = _broadcast_groups(rstd, c)
    xhat = ((x.astype(jnp.float32) - mu) * mul).astype(cd)  # recomputed

    # recompute the activation input exactly as forward produced it
    y_c = xhat
    if gamma is not None:
        aff_mul = gamma.astype(jnp.float32)
        aff_add = beta.astype(jnp.float32)
        # forward applied affine in f32 before the single cast; reproduce
        # per-element in f32 registers, cast to compute dtype (fuses fine:
        # elementwise with scalar-per-channel operands)
        y_c = (xhat.astype(jnp.float32) * aff_mul + aff_add).astype(cd)
    if scale is not None:
        z = y_c * (1 + scale) + shift
    else:
        z = y_c

    g = ct.astype(cd)
    if act == "silu":
        zf = z.astype(jnp.float32)
        sig = jax.nn.sigmoid(zf)
        g = (g.astype(jnp.float32) * (sig * (1 + zf * (1 - sig)))).astype(cd)
    elif act == "relu":
        g = jnp.where(z > 0, g, jnp.zeros((), cd))

    if scale is not None:
        dscale = jnp.sum((g * y_c).astype(jnp.float32), axis=1,
                         keepdims=True).astype(scale.dtype)   # (B,1,C)
        dshift = jnp.sum(g.astype(jnp.float32), axis=1,
                         keepdims=True).astype(shift.dtype)
        g = g * (1 + scale)
    else:
        dscale = dshift = None

    if gamma is not None:
        dgamma = jnp.sum((g * xhat).astype(jnp.float32),
                         axis=(0, 1)).astype(gamma.dtype)     # (C,)
        dbeta = jnp.sum(g.astype(jnp.float32),
                        axis=(0, 1)).astype(beta.dtype)
        dxhat = g * gamma.astype(cd)
    else:
        dgamma = dbeta = None
        dxhat = g

    # group-mean terms of the GN backward (f32 accumulation in the reduce)
    dxg = dxhat.reshape(b, s, groups, cg)
    xg = xhat.reshape(b, s, groups, cg)
    m1 = jnp.mean(dxg, axis=(1, 3), dtype=jnp.float32)        # (B,G)
    m2 = jnp.mean((dxg * xg).astype(jnp.float32), axis=(1, 3))
    dx = ((dxhat.astype(jnp.float32) - _broadcast_groups(m1, c)
           - xhat.astype(jnp.float32) * _broadcast_groups(m2, c))
          * mul).astype(cd)
    return (dx, dgamma, dbeta, dscale, dshift)


_gn.defvjp(_gn_fwd, _gn_bwd)


def group_norm_film_act(x, gamma=None, beta=None, scale=None, shift=None,
                        *, groups=32, eps=1e-5, act=None):
    """Fused GroupNorm -> optional FiLM (y*(1+scale)+shift) -> activation.

    x: (B, *spatial, C) in the compute dtype. gamma/beta: (C,) affine
    params (None = parameterless norm, e.g. the reference's attention
    InstanceNorm). scale/shift: FiLM tensors broadcastable to
    (B, *1s, C) (e.g. the ResBlock's timestep embedding projection).
    act: None | "silu" | "relu". groups is clipped to divide C exactly
    (same rule as GroupNorm32). groups == C gives InstanceNorm semantics;
    groups == 1 gives (spatial+channel) LayerNorm semantics.
    """
    act = act or "none"
    if act not in _ACTS:
        raise ValueError(f"act must be one of {_ACTS}")
    if (scale is None) != (shift is None):
        raise ValueError("FiLM needs both scale and shift")
    if (gamma is None) != (beta is None):
        raise ValueError("affine needs both gamma and beta")
    c = x.shape[-1]
    g = min(groups, c)
    while c % g:
        g -= 1
    orig_shape = x.shape
    xr = x.reshape(x.shape[0], -1, c)
    if scale is not None:
        scale = jnp.broadcast_to(scale.astype(x.dtype),
                                 orig_shape[:1] + (1,) * (len(orig_shape) - 2)
                                 + (c,)).reshape(x.shape[0], 1, c)
        shift = jnp.broadcast_to(shift.astype(x.dtype),
                                 orig_shape[:1] + (1,) * (len(orig_shape) - 2)
                                 + (c,)).reshape(x.shape[0], 1, c)
    out = _gn(xr, gamma, beta, scale, shift, g, eps, act)
    return out.reshape(orig_shape)
