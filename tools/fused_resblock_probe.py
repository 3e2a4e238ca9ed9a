"""Go/no-go probe for whole-ResBlock VMEM fusion (VERDICT r3 next #2).

Stage A measures the critical unknown: can a Pallas tap-matmul 3x3 conv
(whole image resident in VMEM, 9 accumulated (S*W, C) @ (C, Co) MXU dots
with pltpu.roll column shifts and outer-dim row slices) reach XLA's conv
throughput at the UNet's 128-channel hot site (16, 128, 128, 128)?

This is a DIFFERENT formulation from the r1 negative (BASELINE.md
"Roofline audit"): r1's three variants (K=9C im2col panel, windowed-slice
tap dots, transposed arrangement) all paid Mosaic relayouts for windowed
slices along the sublane dim. Here the column shift is a pltpu.roll
(native sublane rotation, no relayout) and the row shift is a slice along
the OUTER dim of a (H+2, W, C) buffer (free). If Stage A's conv runs at
>=0.8x XLA's rate, whole-block fusion's bandwidth win can beat the chain;
if not, this records the tap-matmul negative with numbers and the
fused-ResBlock lever is closed with a measurement (not an estimate).

Stage B (--stage b) A/Bs the full fused forward block (GN+SiLU+conv1+
GN+FiLM+SiLU+conv2+skip, one kernel, see ops/fused_resblock.py) against
the XLA chain, under jit, honest host-fetch completion.

Timing discipline (BASELINE.md measurement-integrity note): on-device
dependency chain via lax.fori_loop, ONE host fetch at the end; per-call
timing through the axon tunnel measures dispatch, not compute.

Run:  python tools/fused_resblock_probe.py [--stage a|b|grad] [--iters 32]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = C = 128
S = 8  # rows per strip; S*W=1024 M-dim per MXU dot


def _conv_kernel(x_hbm, w_ref, out_hbm, apad, acc, ostage, sems):
    """out = conv3x3(x, w), zero 'SAME' padding; one batch element per
    grid program, whole image VMEM-resident. x/out stay in HBM and are
    DMA'd explicitly (a VMEM block spec would double-buffer 2x(in+out) =
    ~17 MB and blow the 16 MB VMEM budget)."""
    i = pl.program_id(0)
    ld = pltpu.make_async_copy(x_hbm.at[i], apad.at[pl.ds(1, H)],
                               sems.at[0])
    ld.start()
    apad[0, :, :] = jnp.zeros((W, C), apad.dtype)
    apad[H + 1, :, :] = jnp.zeros((W, C), apad.dtype)
    ld.wait()

    # Column shifts are applied to the f32 matmul OUTPUT (Mosaic supports
    # 32-bit rotates only): out[w] = raw[w+dx] with boundary mask, where
    # raw = a @ k[dy,dx]. Rolling the flattened (S*W) sublane dim crosses
    # row boundaries exactly at the positions the zero-pad mask kills.
    col = jax.lax.broadcasted_iota(jnp.int32, (S * W, C), 0) % W
    mask_l = (col >= 1).astype(jnp.float32)      # for dx = -1
    mask_r = (col < W - 1).astype(jnp.float32)   # for dx = +1
    n_strips = H // S
    for s_idx in range(n_strips):
        r0 = s_idx * S
        acc[...] = jnp.zeros((S * W, C), jnp.float32)
        for dy in range(3):
            a = apad[r0 + dy:r0 + dy + S].reshape(S * W, C)
            for dx in (-1, 0, 1):
                raw = jnp.dot(a, w_ref[dy * 3 + dx + 1],
                              preferred_element_type=jnp.float32)
                if dx == 0:
                    acc[...] += raw
                else:
                    rolled = pltpu.roll(raw, (-dx) % (S * W), 0)
                    acc[...] += rolled * (mask_l if dx == -1 else mask_r)
        slot = s_idx % 2
        if s_idx >= 2:   # reuse slot only after its DMA drained
            pltpu.make_async_copy(
                ostage.at[slot], out_hbm.at[i, pl.ds((s_idx - 2) * S, S)],
                sems.at[1 + slot]).wait()
        ostage[slot] = acc[...].reshape(S, W, C).astype(ostage.dtype)
        pltpu.make_async_copy(
            ostage.at[slot], out_hbm.at[i, pl.ds(r0, S)],
            sems.at[1 + slot]).start()
    for s_idx in (n_strips - 2, n_strips - 1):
        slot = s_idx % 2
        pltpu.make_async_copy(
            ostage.at[slot], out_hbm.at[i, pl.ds(s_idx * S, S)],
            sems.at[1 + slot]).wait()


@jax.jit
def conv_pallas(x, w):
    """x: (B, H, W, C) bf16; w: (3, 3, C, Co) -> taps (9, C, Co)."""
    b = x.shape[0]
    wt = w.reshape(9, C, C)
    return pl.pallas_call(
        _conv_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, C, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W, C), x.dtype),
            pltpu.VMEM((S * W, C), jnp.float32),
            pltpu.VMEM((2, S, W, C), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * x.shape[0] * H * W * C * C,
            bytes_accessed=2 * x.size * x.dtype.itemsize + wt.size * 2,
            transcendentals=0),
    )(x, wt)


def _conv_kernel_v2(x_hbm, w_ref, out_hbm, apad, ostage, sems, *, s2):
    """Variant: dy taps stacked along K (3 dots of (S*W, 3C) @ (3C, C)
    instead of 9 of K=C), python-var accumulation, configurable strip."""
    i = pl.program_id(0)
    ld = pltpu.make_async_copy(x_hbm.at[i], apad.at[pl.ds(1, H)],
                               sems.at[0])
    ld.start()
    apad[0, :, :] = jnp.zeros((W, C), apad.dtype)
    apad[H + 1, :, :] = jnp.zeros((W, C), apad.dtype)
    ld.wait()

    col = jax.lax.broadcasted_iota(jnp.int32, (s2 * W, C), 0) % W
    mask_l = (col >= 1).astype(jnp.float32)
    mask_r = (col < W - 1).astype(jnp.float32)
    n_strips = H // s2
    for s_idx in range(n_strips):
        r0 = s_idx * s2
        # (S, W, 3C): dy-shifted rows stacked on the lane dim
        a3 = jnp.concatenate(
            [apad[r0 + dy:r0 + dy + s2] for dy in range(3)],
            axis=-1).reshape(s2 * W, 3 * C)
        acc = None
        for dx in (-1, 0, 1):
            raw = jnp.dot(a3, w_ref[dx + 1],
                          preferred_element_type=jnp.float32)
            if dx == 0:
                term = raw
            else:
                rolled = pltpu.roll(raw, (-dx) % (s2 * W), 0)
                term = rolled * (mask_l if dx == -1 else mask_r)
            acc = term if acc is None else acc + term
        slot = s_idx % 2
        if s_idx >= 2:
            pltpu.make_async_copy(
                ostage.at[slot], out_hbm.at[i, pl.ds((s_idx - 2) * s2, s2)],
                sems.at[1 + slot]).wait()
        ostage[slot] = acc.reshape(s2, W, C).astype(ostage.dtype)
        pltpu.make_async_copy(
            ostage.at[slot], out_hbm.at[i, pl.ds(r0, s2)],
            sems.at[1 + slot]).start()
    for s_idx in (n_strips - 2, n_strips - 1):
        slot = s_idx % 2
        pltpu.make_async_copy(
            ostage.at[slot], out_hbm.at[i, pl.ds(s_idx * s2, s2)],
            sems.at[1 + slot]).wait()


@functools.partial(jax.jit, static_argnames=("s2",))
def conv_pallas_v2(x, w, s2=16):
    b = x.shape[0]
    # w (3,3,C,Co) -> (dx, dy*C, Co): K-dim stacks the dy taps
    wt = jnp.transpose(w, (1, 0, 2, 3)).reshape(3, 3 * C, C)
    return pl.pallas_call(
        functools.partial(_conv_kernel_v2, s2=s2),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3 * C, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W, C), x.dtype),
            pltpu.VMEM((2, s2, W, C), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * x.shape[0] * H * W * C * C,
            bytes_accessed=2 * x.size * x.dtype.itemsize + wt.size * 2,
            transcendentals=0),
    )(x, wt)


@jax.jit
def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _gn(h, groups=4):
    n, hh, ww, c = h.shape
    g = h.reshape(n, hh, ww, groups, c // groups)
    mu = g.mean(axis=(1, 2, 4), keepdims=True)
    var = (g * g).mean(axis=(1, 2, 4), keepdims=True) - mu * mu
    return ((g - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(h.shape)


@jax.jit
def chain_xla(x, g1, b1, w1, cb1, sc, sh, w2, cb2):
    """The production ResBlock chain as XLA sees it (bf16 compute, fp32
    stats — mirrors modules/unet_mha.py ResBlock at the hot site)."""
    f = jnp.float32
    h = _gn(x.astype(f)) * g1 + b1
    h = jax.nn.silu(h).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        h, w1.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + cb1.astype(x.dtype)
    h = _gn(h.astype(f)) * sc[:, None, None, :] + sh[:, None, None, :]
    h = jax.nn.silu(h).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        h, w2.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + cb2.astype(x.dtype)
    return x + h


def _chain(fn, x, *args, iters):
    def body(_, v):
        return fn(v, *args)
    return jax.lax.fori_loop(0, iters, body, x)


def _time_chain(fn, x, *args, iters, reps=3):
    run = jax.jit(functools.partial(_chain, fn, iters=iters))
    out = run(x, *args)
    float(np.asarray(jax.device_get(out[0, 0, 0, 0])))  # warm + drain
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x, *args)
        float(np.asarray(jax.device_get(out[0, 0, 0, 0])))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def stage_a(iters):
    rng = np.random.RandomState(0)
    b = 16
    x = jnp.asarray(rng.randn(b, H, W, C), jnp.bfloat16) * 0.1
    w = jnp.asarray(rng.randn(3, 3, C, C) * (1.0 / np.sqrt(9 * C)),
                    jnp.bfloat16)

    # correctness first (small tolerance: bf16 taps, f32 accum both sides)
    yp = np.asarray(conv_pallas(x[:2], w), np.float32)
    yx = np.asarray(conv_xla(x[:2], w), np.float32)
    err = np.abs(yp - yx).max() / max(1e-6, np.abs(yx).max())
    print(f"stage A correctness: rel err {err:.2e}")
    assert err < 3e-2, "tap conv mismatch vs XLA"

    for s2 in (8, 16, 32):
        yp2 = np.asarray(conv_pallas_v2(x[:2], w, s2=s2), np.float32)
        err2 = np.abs(yp2 - yx).max() / max(1e-6, np.abs(yx).max())
        assert err2 < 3e-2, f"v2 s2={s2} mismatch {err2}"

    flops = 2 * 9 * b * H * W * C * C
    tx = _time_chain(conv_xla, x, w, iters=iters)
    print(f"stage A: xla conv {tx * 1e3:.3f} ms ({flops / tx / 1e12:.1f} TF/s)")
    tp = _time_chain(conv_pallas, x, w, iters=iters)
    print(f"  v1 (9 K=C dots, S=8):   {tp * 1e3:.3f} ms "
          f"({flops / tp / 1e12:.1f} TF/s)  ratio {tp / tx:.2f}x")
    best = tp
    for s2 in (8, 16, 32):
        t2 = _time_chain(functools.partial(conv_pallas_v2, s2=s2), x, w,
                         iters=iters)
        print(f"  v2 (3 K=3C dots, S={s2:2d}): {t2 * 1e3:.3f} ms "
              f"({flops / t2 / 1e12:.1f} TF/s)  ratio {t2 / tx:.2f}x")
        best = min(best, t2)

    # the bar the FUSED BLOCK must beat: the full XLA chain (2 convs +
    # GN/FiLM/SiLU/skip elementwise traffic). Fused projection = 2 tap
    # convs + in-VMEM elementwise (~0).
    rng2 = np.random.RandomState(1)
    g1 = jnp.asarray(rng2.uniform(0.5, 1.5, (C,)), jnp.float32)
    b1 = jnp.asarray(rng2.randn(C) * 0.1, jnp.float32)
    cb = jnp.asarray(rng2.randn(C) * 0.1, jnp.float32)
    sc = jnp.asarray(rng2.uniform(0.8, 1.2, (b, C)), jnp.float32)
    sh = jnp.asarray(rng2.randn(b, C) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng2.randn(3, 3, C, C) / np.sqrt(9 * C), jnp.bfloat16)
    tc = _time_chain(lambda v: chain_xla(v, g1, b1, w, cb, sc, sh, w2, cb),
                     x, iters=iters)
    print(f"stage A bar: XLA full chain {tc * 1e3:.3f} ms vs fused fwd "
          f"projection 2x{best * 1e3:.3f}+eps = {2 * best * 1e3:.3f} ms "
          f"-> projected fwd gain {(tc - 2 * best) * 1e3:+.3f} ms/block")
    return tp / tx


def stage_b(iters):
    raise SystemExit(
        "stage B is moot: stage A measured 2x(best tap conv) = 3.30 ms vs "
        "1.83 ms for XLA's ENTIRE chain at the hot site, so the fused "
        "block cannot win regardless of how well the elementwise stages "
        "fuse. See BASELINE.md 'Whole-ResBlock fused kernel A/B (round "
        "4)'.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="a", choices=["a", "b"])
    ap.add_argument("--iters", type=int, default=32)
    a = ap.parse_args()
    print(f"devices: {jax.devices()}")
    if a.stage == "a":
        stage_a(a.iters)
    else:
        stage_b(a.iters)


if __name__ == "__main__":
    main()
