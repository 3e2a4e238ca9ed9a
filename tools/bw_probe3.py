"""Pallas DMA bandwidth probe: measures raw HBM->VMEM->HBM copy rate with
explicit double-buffered async DMA, bypassing XLA's elementwise emitters.

Purpose: bw_probe.py's XLA elementwise stream tops out at ~466 GB/s on the
attached v5e (819 GB/s spec). If a hand-rolled DMA pipeline reaches
substantially more, the 466 number is an XLA-emitter property and big
Pallas fusions could run faster than the cost-model roofline suggests; if
it also lands near 466, that is the machine's practical rate through this
tunnel and BASELINE.md's roofline audit stands.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import joligen_tpu  # noqa: F401,E402  (compilation cache setup)


def make_copy(n_rows, row, chunk_rows, dtype):
    """HBM->VMEM->HBM copy of an (n_rows, row) array, double-buffered."""
    n_chunks = n_rows // chunk_rows

    def kernel(src_hbm, dst_hbm):
        def body(scratch, sems_in, sems_out):
            def in_dma(slot, i):
                return pltpu.make_async_copy(
                    src_hbm.at[pl.ds(i * chunk_rows, chunk_rows), :],
                    scratch.at[slot],
                    sems_in.at[slot])

            def out_dma(slot, i):
                return pltpu.make_async_copy(
                    scratch.at[slot],
                    dst_hbm.at[pl.ds(i * chunk_rows, chunk_rows), :],
                    sems_out.at[slot])

            in_dma(0, 0).start()

            def loop(i, _):
                slot = i % 2
                nxt = (i + 1) % 2

                # WAR hazard guard: in_dma(nxt, i+1) writes scratch[nxt],
                # which out_dma(nxt, i-1) (started last iteration) is still
                # reading — wait that out-DMA BEFORE starting the input DMA
                # into the same slot.
                @pl.when((i >= 1) & (i + 1 < n_chunks))
                def _():
                    out_dma(nxt, i - 1).wait()

                @pl.when(i + 1 < n_chunks)
                def _():
                    in_dma(nxt, i + 1).start()

                in_dma(slot, i).wait()
                out_dma(slot, i).start()
                return 0

            jax.lax.fori_loop(0, n_chunks, loop, 0)
            # drain
            @pl.when(n_chunks >= 2)
            def _():
                out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
            out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, chunk_rows, row), dtype),
            sems_in=pltpu.SemaphoreType.DMA((2,)),
            sems_out=pltpu.SemaphoreType.DMA((2,)),
        )

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows, row), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    return run


def main():
    row = 1024  # lane-aligned
    for dtype, bytes_per in ((jnp.float32, 4), (jnp.bfloat16, 2)):
        n_rows = (1 << 30) // (row * bytes_per)  # 1 GB array
        for chunk_rows in (256, 1024, 4096):
            # position-dependent content so stale-slot reads are detectable
            # (an all-ones source would verify even under a WAR hazard)
            x = (jnp.arange(n_rows, dtype=jnp.float32)[:, None] % 997.0
                 ).astype(dtype) * jnp.ones((1, row), dtype)
            jax.block_until_ready(x)
            run = make_copy(n_rows, row, chunk_rows, dtype)
            y = run(x)
            _ = float(y[0, 0])
            reps = 8
            t0 = time.perf_counter()
            for _r in range(reps):
                y = run(x)
            _ = float(y[0, 0])
            dt = time.perf_counter() - t0
            total = reps * n_rows * row * bytes_per * 2  # read + write
            # correctness check (outside the timed window): the copy must
            # reproduce the source exactly — catches DMA hazards that would
            # otherwise just inflate the measured rate
            ok = bool(jnp.all(y == x))
            print(f"pallas-dma {jnp.dtype(dtype).name:9s} "
                  f"chunk={chunk_rows * row * bytes_per // 1024:6d}KiB "
                  f"{total / dt / 1e9:7.1f} GB/s "
                  f"{'ok' if ok else 'CORRUPT'}")


if __name__ == "__main__":
    main()
