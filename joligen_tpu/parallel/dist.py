"""Multi-host (multi-process) initialization and helpers.

The reference's distributed story is one OS process per GPU with an NCCL
process group (reference train.py:38-48 ``setup``: MASTER_ADDR=localhost,
``dist.init_process_group("nccl")``). The TPU-native equivalent is one
process per HOST: ``jax.distributed.initialize`` brings up the
cross-host runtime over DCN, every host sees the full global device set,
and the 4-axis mesh (mesh.py) spans all of them — XLA then inserts the
cross-host collectives (gradient psum, fsdp all-gathers) exactly as it
does within a host over ICI.

Launch recipe (v5e-16 = 2 hosts, one process per host):

  host0$ python train.py --config_json cfg.json \
             --tpu_dist_coordinator host0:8476 \
             --tpu_dist_num_processes 2 --tpu_dist_process_id 0
  host1$ python train.py --config_json cfg.json \
             --tpu_dist_coordinator host0:8476 \
             --tpu_dist_num_processes 2 --tpu_dist_process_id 1

or env-driven (the flags and env are interchangeable; flags win):
JOLIGEN_DIST_COORDINATOR / JOLIGEN_DIST_NUM_PROCESSES /
JOLIGEN_DIST_PROCESS_ID.  On Cloud-TPU pods where the runtime can
auto-detect everything, ``JOLIGEN_DIST_AUTO=1`` calls
``jax.distributed.initialize()`` with no arguments instead.

CPU validation: the same code path runs multi-PROCESS on one machine
(gloo collectives) with ``--xla_force_host_platform_device_count=N`` per
process — tests/test_multihost.py launches 2x4-device processes and
checks the trained parameters against a single-process 8-device run.
"""

from __future__ import annotations

import os


def dist_config(opt=None):
    """Resolve (coordinator, num_processes, process_id, auto) from flags
    then env. Returns None when nothing is configured (single host)."""
    def flag(name, default=None):
        return getattr(opt, name, default) if opt is not None else default

    coord = flag("tpu_dist_coordinator", "") or \
        os.environ.get("JOLIGEN_DIST_COORDINATOR", "")
    auto = bool(int(os.environ.get("JOLIGEN_DIST_AUTO", "0") or 0))
    if not coord and not auto:
        return None
    if auto and not coord:
        return {"auto": True}
    nproc = int(flag("tpu_dist_num_processes", 0) or
                os.environ.get("JOLIGEN_DIST_NUM_PROCESSES", 0) or 0)
    pid = flag("tpu_dist_process_id", -1)
    if pid is None or int(pid) < 0:
        pid = int(os.environ.get("JOLIGEN_DIST_PROCESS_ID", -1))
    pid = int(pid)
    if nproc <= 0 or pid < 0:
        raise ValueError(
            "multi-host: --tpu_dist_coordinator requires "
            "--tpu_dist_num_processes and --tpu_dist_process_id (or the "
            "JOLIGEN_DIST_* env equivalents)")
    return {"auto": False, "coordinator": coord, "num_processes": nproc,
            "process_id": pid}


_initialized = False


def initialize_distributed(opt=None):
    """Bring up the multi-host runtime if configured; no-op otherwise.

    MUST run before the first JAX backend touch (device queries, array
    ops) — the entry points call it right after option parsing (the
    reference's analogous constraint: init_process_group before any CUDA
    collective, train.py:38-48). Returns True when the process is part of
    a multi-process job.
    """
    global _initialized
    if _initialized:
        return True
    cfg = dist_config(opt)
    if cfg is None:
        return False
    # NOTE: do not query jax.process_count() here — device queries
    # initialize the backend, after which distributed.initialize refuses
    # to run. The _initialized flag is the only pre-check.
    import jax
    if cfg.get("auto"):
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=cfg["coordinator"],
            num_processes=cfg["num_processes"],
            process_id=cfg["process_id"])
    _initialized = True
    print(f"multi-host: process {jax.process_index()}/{jax.process_count()}"
          f" up, local devices {jax.local_device_count()}"
          f" / global {jax.device_count()}", flush=True)
    return True


def is_main_process():
    """Rank-0 gate for host-side writes (reference rank==0 gating,
    train.py:147-180). NOTE: collective device programs (jitted steps,
    inference over the global mesh) must run on ALL processes — gate only
    pure host work (file writes, prints) with this."""
    import jax
    return jax.process_index() == 0
