"""Device-resident historical fake pool.

TPU-native rebuild of reference util/image_pool.py:5-76: instead of a host
list of tensors (which would force device->host->device round trips every
iteration), the pool lives in HBM as a pytree carried through the jitted
step: a (pool_size, H, W, C) buffer + fill counter. Semantics match the
reference: until full, insert and return the current fake; once full, each
sample returns the current fake with p=0.5, otherwise swaps with (and
returns) a random pool entry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class ImagePool(struct.PyTreeNode):
    buffer: jnp.ndarray          # (P, H, W, C)
    count: jnp.ndarray           # () int32, number of valid entries

    @classmethod
    def create(cls, pool_size, shape, dtype=jnp.float32):
        return cls(buffer=jnp.zeros((pool_size,) + tuple(shape), dtype),
                   count=jnp.zeros((), jnp.int32))

    @property
    def pool_size(self):
        return self.buffer.shape[0]

    def query(self, rng, fakes):
        """Returns (new_pool, images_for_D). fakes: (B, H, W, C)."""
        if self.pool_size == 0:
            return self, fakes
        b = fakes.shape[0]
        p = self.pool_size
        rng_u, rng_i = jax.random.split(rng)
        use_current = jax.random.uniform(rng_u, (b,)) < 0.5
        rand_idx = jax.random.randint(rng_i, (b,), 0, p)

        # insertion positions while filling: count, count+1, ...
        insert_idx = (self.count + jnp.arange(b)) % p
        filling = (self.count + jnp.arange(b)) < p

        # if filling: insert at insert_idx, return current fake
        # else: if use_current return fake (no swap); else swap with rand_idx
        target_idx = jnp.where(filling, insert_idx, rand_idx)
        do_write = filling | ~use_current

        old = jnp.take(self.buffer, target_idx, axis=0)
        returned = jnp.where(
            (filling | use_current)[:, None, None, None], fakes, old)

        write_vals = jnp.where(do_write[:, None, None, None], fakes, old)
        new_buffer = self.buffer.at[target_idx].set(write_vals)
        new_count = jnp.minimum(self.count + b, p)
        return self.replace(buffer=new_buffer, count=new_count), returned

    def get_random(self, rng, batch):
        """Random pool sample for APA (reference image_pool.py get_random)."""
        idx = jax.random.randint(rng, (batch,), 0,
                                 jnp.maximum(self.count, 1))
        return jnp.take(self.buffer, idx, axis=0)
