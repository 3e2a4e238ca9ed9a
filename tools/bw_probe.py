"""HBM stream-bandwidth probe: measures the achievable elementwise
read+write rate on the attached device, independent of any model.

Distinguishes "the program is at its roofline" from "the cost model
overcounts bytes": if this probe reaches ~spec bandwidth (819 GB/s on
v5e) while the train step only streams at ~466 GB/s, the step has
layout/fusion problems; if the probe also tops out near 466 GB/s, that
IS the machine's practical rate and BASELINE.md's roofline stands.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import joligen_tpu  # noqa: F401,E402  (compilation cache setup)


def main():
    n = 256 * 1024 * 1024
    for dtype, bytes_per in ((jnp.bfloat16, 2), (jnp.float32, 4)):
        xs = [jnp.ones((n,), dtype) * (i + 1) for i in range(4)]
        jax.block_until_ready(xs)

        @jax.jit
        def f(x):
            return x * 1.0001 + 0.5

        outs = [f(x) for x in xs]
        _ = [float(o[0]) for o in outs]  # warm + honest completion
        reps = 6
        t0 = time.perf_counter()
        for _r in range(reps):
            outs = [f(x) for x in xs]
        _ = [float(o[0]) for o in outs]
        dt = time.perf_counter() - t0
        total = reps * len(xs) * n * bytes_per * 2  # read + write
        print(f"independent {jnp.dtype(dtype).name:9s} "
              f"{total / dt / 1e9:7.1f} GB/s")

    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def g(x):
        return x * 1.0001

    x = g(x)
    _ = float(x[0])
    reps = 24
    t0 = time.perf_counter()
    for _r in range(reps):
        x = g(x)
    _ = float(x[0])
    dt = time.perf_counter() - t0
    print(f"chained     float32   "
          f"{reps * n * 4 * 2 / dt / 1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
