"""int8 MXU probe: can this chip run int8 convs/matmuls faster than bf16?

Decides whether a W8A8 quantized serving path is worth building: v5e
spec-sheets 394 int8 TOPS vs 197 bf16 TFLOPS (2x), but only if XLA:TPU
lowers s8xs8->s32 convolutions onto the MXU instead of upcasting.

Honest completion through the async tunnel: each measurement is ONE
dispatch of an on-device lax.fori_loop chaining REPS dependent convs
(output cast back to the input dtype and fed forward), then a host
fetch of a single element — the same pattern as the r1 conv
microbenchmarks (BASELINE.md "Roofline audit"), so per-dispatch ~30 ms
tunnel overhead is amortized to noise.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import joligen_tpu  # noqa: F401,E402

REPS = 64


def time_loop(f, *args):
    out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def conv_flops(b, h, w, cin, cout, k):
    return 2 * b * h * w * cin * cout * k * k


def chained_conv(dtype, acc_dtype, dn):
    @jax.jit
    def run(x, wgt):
        def body(_, x):
            y = lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc_dtype)
            # cast back so the chain stays in the probe dtype; the
            # shift keeps int8 values from saturating to a constant
            if dtype == jnp.int8:
                return (y >> 12).astype(jnp.int8)
            return y.astype(dtype)
        return lax.fori_loop(0, REPS, body, x)
    return run


def main():
    key = jax.random.PRNGKey(0)
    shapes = [
        # (batch, h, w, cin, cout, k) — UNet-MHA hot conv shapes at 256px
        (32, 64, 64, 128, 128, 3),
        (32, 32, 32, 256, 256, 3),
        (32, 16, 16, 512, 512, 3),
        (32, 128, 128, 64, 64, 3),
    ]
    print(f"{'shape':34s} {'bf16 TF/s':>10s} {'int8 TOP/s':>11s} {'ratio':>6s}")
    for (b, h, w, cin, cout, k) in shapes:
        x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
        wgt = jax.random.normal(key, (k, k, cin, cout), jnp.bfloat16) * 0.05
        xi = (jax.random.normal(key, (b, h, w, cin)) * 20).astype(jnp.int8)
        wi = (jax.random.normal(key, (k, k, cin, cout)) * 20).astype(jnp.int8)
        dn = lax.conv_dimension_numbers(x.shape, wgt.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        fl = conv_flops(b, h, w, cin, cout, k)
        try:
            dt16 = time_loop(chained_conv(jnp.bfloat16, jnp.float32, dn), x, wgt)
            dt8 = time_loop(chained_conv(jnp.int8, jnp.int32, dn), xi, wi)
            print(f"b{b} {h}x{w} {cin}->{cout} k{k}".ljust(34)
                  + f" {fl / dt16 / 1e12:10.1f} {fl / dt8 / 1e12:11.1f}"
                  + f" {dt16 / dt8:6.2f}")
        except Exception as e:
            print(f"b{b} {h}x{w} {cin}->{cout} k{k}: FAILED {e}")

    # dense / attention-projection shape, square so the chain feeds forward
    m, kk, n = 8192, 512, 512
    a16 = jax.random.normal(key, (m, kk), jnp.bfloat16) * 0.05
    b16 = jax.random.normal(key, (kk, n), jnp.bfloat16) * 0.05
    a8 = (jax.random.normal(key, (m, kk)) * 20).astype(jnp.int8)
    b8 = (jax.random.normal(key, (kk, n)) * 20).astype(jnp.int8)

    @jax.jit
    def mmloop16(a, b):
        def body(_, a):
            return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return lax.fori_loop(0, REPS, body, a)

    @jax.jit
    def mmloop8(a, b):
        def body(_, a):
            y = jnp.dot(a, b, preferred_element_type=jnp.int32)
            return (y >> 12).astype(jnp.int8)
        return lax.fori_loop(0, REPS, body, a)

    fl = 2 * m * kk * n
    dt16 = time_loop(mmloop16, a16, b16)
    dt8 = time_loop(mmloop8, a8, b8)
    print(f"matmul {m}x{kk}x{n}".ljust(34)
          + f" {fl / dt16 / 1e12:10.1f} {fl / dt8 / 1e12:11.1f}"
          + f" {dt16 / dt8:6.2f}")


if __name__ == "__main__":
    main()
