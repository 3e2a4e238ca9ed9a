"""Roofline introspection for the headline bench step.

Compiles the palette DDPM train step (same construction as bench.py) and
prints XLA's own cost model for it: FLOPs, bytes accessed, and the
compiled memory footprint. This separates "we are bandwidth-bound" from
"XLA materializes more than it should" without guessing from first
principles.

Usage:
    python tools/profile_step.py [--size 256] [--batch 16] [--ngf 64]
        [--trace DIR]   # also capture a jax.profiler device trace

The cost analysis is compile-only (no step execution), so it is safe to
run on the shared tunnel chip; --trace executes ~5 steps.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


_DTYPE_BYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "bf16": 2,
                "f16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
                "f8e4m3fn": 1, "f8e5m2": 1, "s64": 8, "u64": 8}


def _shape_bytes(shape_str):
    """Bytes of an HLO shape string like 'bf16[16,256,256,64]' or a tuple
    '(bf16[...], f32[...])'. Layout annotations '{...}' must be stripped
    by the caller's regex already."""
    import re

    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _rank_entry_outputs(text, top=30):
    """Rank ENTRY-computation instruction outputs by size.

    Only ENTRY-level instruction outputs correspond to HBM buffers — values
    inside a fusion body stay in VMEM/registers, so counting them would
    overstate traffic (the mistake the first roofline audit made; see
    BASELINE.md). Aggregates by opcode and prints the largest individual
    outputs with their op metadata (source line) when present."""
    import re
    from collections import defaultdict

    entry = None
    for m in re.finditer(r"^ENTRY [^{]+\{$", text, re.M):
        start = m.end()
        depth = 1
        i = start
        while depth and i < len(text):
            c = text[i]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
            i += 1
        entry = text[start:i]
        break
    if entry is None:
        print("# no ENTRY computation found", file=sys.stderr)
        return

    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\w+\[[\d,]*\])"
        r"[^ ]*\s+([\w\-]+)\(", re.M)
    by_op = defaultdict(lambda: [0, 0])
    rows = []
    for name, shape, op in inst_re.findall(entry):
        b = _shape_bytes(shape)
        by_op[op][0] += b
        by_op[op][1] += 1
        if b > 1 << 20:
            rows.append((b, name, op, shape))

    print("# ENTRY output bytes by opcode (HBM-resident buffers):")
    for op, (b, n) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"#   {op:<28} {b / 1e9:8.3f} GB  ({n} instrs)")
    print(f"# top {top} largest ENTRY outputs:")
    for b, name, op, shape in sorted(rows, reverse=True)[:top]:
        print(f"#   {b / 1e6:9.1f} MB  {op:<24} {shape:<40} %{name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--workload",
                    choices=["palette", "gan", "sample", "cm", "sc", "mat",
                             "b2b_vid"],
                    default="palette")
    ap.add_argument("--frames", type=int, default=8,
                    help="clip length for --workload b2b_vid")
    ap.add_argument("--ddim_steps", type=int, default=10)
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace (executes steps)")
    ap.add_argument("--hlo", default=None,
                    help="write compiled HLO text here and print a ranking "
                         "of ENTRY-level instruction outputs by bytes (the "
                         "buffers that actually touch HBM — fusion-internal "
                         "values never leave VMEM)")
    a = ap.parse_args()

    import jax
    from bench import build, build_gan

    if a.workload == "gan":
        model, batch_np, _ = build_gan(a.size, a.batch)
        dev = model.prepare_batch(batch_np)
        if model._jit_step is None:
            model._jit_step = model._make_step()
        args = (model.states, model.pool, model.apa_p, model.next_rng(), dev)
        t0 = time.time()
        compiled = model._jit_step.lower(*args).compile()
    elif a.workload == "mat":
        from bench import build_mat
        model, batch_np, _ = build_mat(a.size, a.batch)
        dev = model.prepare_batch(batch_np)
        if model._jit_step is None:
            model._jit_step = model._make_step(dev["real"].shape[0])
        args = (model.states, model.w_avg, model.next_rng(), dev["real"],
                dev["mask"], dev.get("mask_class"))
        t0 = time.time()
        compiled = model._jit_step.lower(*args).compile()
    elif a.workload == "b2b_vid":
        from bench import build_b2b_vid
        model, batch_np, _ = build_b2b_vid(a.size, a.batch, frames=a.frames)
        dev = model.prepare_batch(batch_np)
        model.optimize_prepared(dev)   # builds the closure-captured step
        args = (model.states if model.use_lora else model.states["G_A"],
                model.next_rng(), dev["gt"], dev.get("y_cond"),
                dev.get("mask"), dev.get("labels"), dev.get("frame_step"),
                dev.get("global_context"))
        t0 = time.time()
        compiled = model._jit_step.lower(*args).compile()
    elif a.workload in ("cm", "sc"):
        from bench import build_cm, build_sc
        model, batch_np, _ = (build_cm if a.workload == "cm"
                              else build_sc)(a.size, a.batch)
        dev = model.prepare_batch(batch_np)
        if a.workload == "cm":
            from joligen_tpu.models.modules.cm import (
                improved_timesteps_schedule)
            stage = improved_timesteps_schedule(model.step_count,
                                                model.total_steps)
            fn = model._jit_steps.setdefault(stage, model._make_step(stage))
            args = (model.states, None, model.next_rng(), dev["gt"],
                    dev.get("y_cond"), dev.get("mask"))
        else:
            if model._jit_step is None:
                model.optimize_prepared(dev)   # builds + compiles the step
            fn = model._jit_step
            args = (model.states["G_A"], model.next_rng(), dev["gt"],
                    dev.get("y_cond"), dev.get("mask"))
        t0 = time.time()
        compiled = fn.lower(*args).compile()
    elif a.workload == "sample":
        model, batch_np, _ = build(a.size, a.ngf, a.batch, remat=a.remat)
        model.inference(batch_np, sampling_method="ddim",
                        num_steps=a.ddim_steps, output_uint8=True)
        key = next(iter(model._jit_sample))
        fn = model._jit_sample[key]
        from joligen_tpu.parallel.mesh import quantize_batch
        inp = quantize_batch(model.set_input(batch_np),
                             float_keys=("y_cond", "gt", "ref"),
                             int_keys=("mask",))
        dev = model.put_batch(inp)
        state = model.states["G_A"]
        params = (state.ema_params if state.ema_params is not None
                  else state.params)
        args = (params, model.next_rng(), dev["y_cond"], dev["gt"],
                dev.get("mask"), dev.get("cls"), dev.get("ref"))
        t0 = time.time()
        compiled = fn.lower(*args).compile()
    else:
        model, batch_np, _ = build(a.size, a.ngf, a.batch, remat=a.remat)
        from joligen_tpu.parallel.mesh import quantize_batch
        inp = model.set_input(batch_np)
        inp = quantize_batch(inp, float_keys=("y_cond", "gt", "ref"),
                             int_keys=("mask",))
        dev = model.put_batch(inp)
        if model._jit_train_step is None:
            model._jit_train_step = model._make_train_step()

        args = (model.states["G_A"], model.next_rng(), dev["y_cond"],
                dev["gt"], dev.get("mask"), dev.get("cls"), dev.get("ref"))

        t0 = time.time()
        lowered = model._jit_train_step.lower(*args)
        compiled = lowered.compile()
    print(f"# compile: {time.time() - t0:.1f}s", file=sys.stderr)

    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    mem = compiled.memory_analysis()

    flops = cost.get("flops", 0.0)
    btes = cost.get("bytes accessed", 0.0)
    out = {
        "flops_per_step": flops,
        "tflops_per_step": round(flops / 1e12, 2),
        "bytes_accessed_per_step_GB": round(btes / 1e9, 2),
        "arithmetic_intensity_flops_per_byte": round(flops / max(btes, 1), 1),
        # v5e: 197 TF/s bf16, 819 GB/s HBM
        "ideal_ms_compute_v5e": round(flops / 197e12 * 1e3, 1),
        "ideal_ms_bandwidth_v5e": round(btes / 819e9 * 1e3, 1),
    }
    for k in ("bytes accessed output", "transcendentals", "optimal_seconds"):
        if k in cost:
            out[k.replace(" ", "_")] = cost[k]
    if mem is not None:
        out["memory"] = {
            "argument_MB": round(mem.argument_size_in_bytes / 1e6, 1),
            "output_MB": round(mem.output_size_in_bytes / 1e6, 1),
            "temp_MB": round(mem.temp_size_in_bytes / 1e6, 1),
            "code_MB": round(mem.generated_code_size_in_bytes / 1e6, 1),
        }
    print(json.dumps(out, indent=2))

    # per-category bytes: every other cost_analysis key (XLA emits
    # "bytes accessed operand k {}" style entries per op category)
    extra = {k: v for k, v in sorted(cost.items())
             if k not in ("flops", "bytes accessed") and v and v > 1e8}
    if extra:
        print("# large cost entries:")
        for k, v in extra.items():
            print(f"#   {k}: {v:.3e}")

    if a.hlo:
        text = compiled.as_text()
        Path(a.hlo).write_text(text)
        print(f"# HLO written to {a.hlo} ({len(text) / 1e6:.1f} MB)")
        _rank_entry_outputs(text)

    if a.trace and a.workload == "palette":
        import numpy as np
        def drain():
            return float(np.asarray(jax.device_get(
                list(model.loss_log.values())[0])))
        def step():
            model.states["G_A"], model.loss_log = model._jit_train_step(
                model.states["G_A"], model.next_rng(), dev["y_cond"],
                dev["gt"], dev.get("mask"), dev.get("cls"), dev.get("ref"))
        step(); drain()   # warm
        with jax.profiler.trace(a.trace):
            for _ in range(5):
                step()
            drain()
        print(f"# trace written to {a.trace}")


if __name__ == "__main__":
    main()
