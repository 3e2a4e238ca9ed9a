"""One-dispatch HBM probe: 8 independent 1 GB streams inside a single
jitted program — no per-call tunnel overhead, no cross-array fusion."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import joligen_tpu  # noqa: F401,E402

n = 128 * 1024 * 1024
for dtype, bytes_per in ((jnp.float32, 4), (jnp.bfloat16, 2)):
    k = 4
    xs = tuple(jnp.ones((n,), dtype) * (i + 1) for i in range(k))
    jax.block_until_ready(xs)

    @jax.jit
    def f(xs):
        return tuple(x * 1.0001 + 0.5 for x in xs)

    ys = f(xs)
    _ = float(ys[0][0])
    reps = 4
    t0 = time.perf_counter()
    for _r in range(reps):
        ys = f(xs)
    _ = [float(y[0]) for y in ys]
    dt = time.perf_counter() - t0
    total = reps * k * n * bytes_per * 2
    print(f"one-dispatch {jnp.dtype(dtype).name:9s} "
          f"{total / dt / 1e9:7.1f} GB/s  ({dt / reps * 1e3:.1f} ms/call)")
