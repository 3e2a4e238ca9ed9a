"""Pallas TPU flash attention (forward + backward) for the denoiser
transformer blocks (JiT/JiTViD patch attention, UNet spatial attention,
temporal motion attention).

Design (per /opt/skills/guides/pallas_guide.md):
- forward: grid (batch*heads, q_blocks); the q block plus the FULL per-head
  K/V panels live in VMEM (at this framework's sequence lengths — <=4096
  patch tokens, <=25 frames — K/V fit comfortably in the 16 MB VMEM budget,
  so no HBM streaming loop is needed); online-softmax accumulation over
  block_k chunks keeps the S x S matrix out of memory entirely.
- backward: two kernels with the standard flash recomputation — dq over
  (bh, q_blocks), dk/dv over (bh, k_blocks) — using the saved logsumexp.
- all matmuls run on the MXU in fp32 accumulation
  (preferred_element_type), softmax math in fp32, inputs may be bf16.
- non-TPU backends fall back to ``jax.nn.dot_product_attention`` (the
  kernels also run under interpret=True for CPU tests).

Sequence lengths are padded to the block size with additive -inf key
masking; padded query rows are sliced off on return.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ceil_to(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, sm_scale, block_k,
                kv_len):
    q = q_ref[0].astype(jnp.float32) * sm_scale          # (bq, d)
    bq = q.shape[0]
    d = q.shape[1]
    nk = k_ref.shape[1] // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # mask padded keys
        kpos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(kpos < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_i - m_new)
        l_new = l_i * corr + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l_i, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m_i + jnp.log(l_safe)          # (bq, 1)


def _fwd(q, k, v, sm_scale, block_q, block_k, interpret, true_len=None):
    """q,k,v: (BH, S, D) padded. Returns (o, lse)."""
    bh, s, d = q.shape
    grid = (bh, s // block_q)
    kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale,
                               block_k=block_k, kv_len=true_len or s)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, sm_scale, block_k, kv_len):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                              # (bq, 1)
    delta = delta_ref[0]                          # (bq, 1)
    bq, d = q.shape
    nk = k_ref.shape[1] // block_k

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = sm_scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        kpos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(kpos < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * sm_scale
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, sm_scale, block_q, q_len):
    k = k_ref[0].astype(jnp.float32)                      # (bk, d)
    v = v_ref[0].astype(jnp.float32)
    bk, d = k.shape
    nq = q_ref.shape[1] // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]    # (bq, 1)
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        s = sm_scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (bq, bk)
        qpos = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, bk), 0)
        s = jnp.where(qpos < q_len, s, NEG_INF)
        p = jnp.exp(s - lse)                               # (bq, bk)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * sm_scale                   # (bq, bk)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(sm_scale, block_q, block_k, interpret, true_len, res, g):
    q, k, v, o, lse = res
    bh, s, d = q.shape
    tl = true_len or s
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)       # (bh, s, 1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale,
                          block_k=block_k, kv_len=tl),
        grid=(bh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale,
                          block_q=block_q, q_len=tl),
        grid=(bh, s // block_k),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        ],
        interpret=interpret,
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, sm_scale, block_q, block_k, interpret, true_len):
    o, _ = _fwd(q, k, v, sm_scale, block_q, block_k, interpret, true_len)
    return o


def _flash_fwd(q, k, v, sm_scale, block_q, block_k, interpret, true_len):
    o, lse = _fwd(q, k, v, sm_scale, block_q, block_k, interpret, true_len)
    return o, (q, k, v, o, lse)


def _flash_bwd(sm_scale, block_q, block_k, interpret, true_len, res, g):
    return _bwd(sm_scale, block_q, block_k, interpret, true_len, res, g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, sm_scale=None, block_q=128, block_k=128,
                    interpret=None, force=False):
    """Multi-head attention. q,k,v: (B, S, H, D) -> (B, S, H, D).

    On TPU this is the Pallas kernel above; elsewhere it falls back to the
    XLA fused path unless ``force`` (tests force interpret mode).
    """
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and not force:
        return jax.nn.dot_product_attention(q, k, v)
    if interpret is None:
        interpret = not on_tpu

    b, s, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, _ceil_to(s, 128))
    block_k = min(block_k, _ceil_to(s, 128))
    s_pad = _ceil_to(s, max(block_q, block_k))

    def to_bh(t):
        t = t.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0)))
        return t

    qf, kf, vf = map(to_bh, (q, k, v))
    o = _flash(qf, kf, vf, float(sm_scale), block_q, block_k, interpret, s)
    o = o[:, :s].reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return o.astype(q.dtype)
