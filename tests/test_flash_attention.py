"""Pallas flash attention: forward and backward match the XLA reference
(interpret mode on CPU), including padded (non-multiple-of-block) lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from joligen_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


@pytest.mark.parametrize("s,d,h", [(128, 64, 2), (256, 32, 1), (100, 64, 2),
                                   (5, 16, 2)])
def test_forward_matches_reference(s, d, h):
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (2, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (2, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (2, s, h, d), jnp.float32)
    out = flash_attention(q, k, v, force=True)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_backward_matches_reference():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    s, d, h = 160, 32, 2   # not a multiple of 128 -> exercises padding
    q = jax.random.normal(kq, (1, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (1, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (1, s, h, d), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, force=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_bf16_inputs():
    rng = jax.random.PRNGKey(2)
    q = jax.random.normal(rng, (2, 128, 2, 64), jnp.bfloat16)
    out = flash_attention(q, q, q, force=True)
    assert out.dtype == jnp.bfloat16
    ref = _ref(q.astype(jnp.float32), q.astype(jnp.float32),
               q.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
