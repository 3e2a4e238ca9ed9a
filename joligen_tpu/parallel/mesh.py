"""Device mesh + sharding policy.

The reference's only parallelism is single-node DDP over NCCL
(reference train.py:38-48, models/base_model.py:725-737). Here the
equivalent — and more — is expressed as a ``jax.sharding.Mesh`` with three
axes:

- ``data``: batch sharding (DDP equivalent; gradient psum inserted by XLA)
- ``fsdp``: parameter/optimizer-state sharding (ZeRO-style, sharded over ICI)
- ``tensor``: tensor-parallel axis reserved for attention-head/channel
  sharding of the largest denoisers
- ``seq``: sequence parallelism over the VIDEO FRAME axis (the reference
  has no distributed sequence story, SURVEY.md §5; here clips shard
  (B, F, H, W, C) -> frames over ``seq`` and XLA inserts the all-gathers
  around the temporal motion-attention layers)

All collectives ride ICI; multi-host initialization goes through
``jax.distributed.initialize`` (DCN) before mesh creation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "tensor", "seq")


def make_mesh(opt=None, devices=None):
    """Create the global mesh from tpu_mesh_* options (default: all devices
    on the data axis)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    fsdp = getattr(opt, "tpu_mesh_fsdp", 1) if opt is not None else 1
    tensor = getattr(opt, "tpu_mesh_tensor", 1) if opt is not None else 1
    seq = getattr(opt, "tpu_mesh_seq", 1) if opt is not None else 1
    data = getattr(opt, "tpu_mesh_data", -1) if opt is not None else -1
    if data == -1:
        data = n // (fsdp * tensor * seq)
    assert data * fsdp * tensor * seq == n, (
        f"mesh {data}x{fsdp}x{tensor}x{seq} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, fsdp, tensor, seq)
    return Mesh(dev_array, AXES)


def batch_sharding(mesh):
    """Batches shard over data AND fsdp axes (fsdp also processes distinct
    samples; its param gathers overlap with compute)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def param_sharding(mesh, params):
    """ZeRO-3-style policy: shard each array's largest divisible dimension
    over the fsdp axis and (when the tensor axis is >1) the next-largest
    divisible dimension over tensor — GSPMD then partitions the matmuls/
    convs consuming them (Megatron-style within each layer). Tiny arrays
    stay replicated."""
    fsdp = mesh.shape["fsdp"]
    tensor = mesh.shape["tensor"]

    def policy(x):
        if not hasattr(x, "shape") or x.size < 2 ** 16 \
                or (fsdp == 1 and tensor == 1):
            return NamedSharding(mesh, P())
        dims = list(x.shape)
        spec = [None] * len(dims)
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        if fsdp > 1:
            for i in order:
                if dims[i] % fsdp == 0 and spec[i] is None:
                    spec[i] = "fsdp"
                    break
        if tensor > 1:
            for i in order:
                if spec[i] is None and dims[i] % tensor == 0 \
                        and dims[i] >= 2 * tensor:
                    spec[i] = "tensor"
                    break
        if all(s is None for s in spec):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(policy, params)


def replicate(mesh):
    return NamedSharding(mesh, P())


def put_global(x, sharding):
    """Place a host value (or process-local array) as a global array with
    ``sharding``. Single-process this is a plain device_put; multi-process
    it builds the global array from the SAME host value on every process
    via make_array_from_callback (params, config tensors, rng keys —
    anything logically replicated across hosts; per-process DATA shards go
    through shard_batch instead)."""
    if x is None:
        return None
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding == sharding:
            return x
        # resharding a global array is a collective program
        return jax.jit(lambda t: t, out_shardings=sharding)(x)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def quantize_batch(batch, float_keys=(), int_keys=()):
    """Host-side wire compression: float32 [-1,1] images -> uint8, int label
    masks -> uint8 (4x less host->device traffic — the tunnel/PCIe transfer
    is the bench bottleneck, not HBM). Dequantization happens INSIDE the
    jitted step (see dequantize_on_device)."""
    import numpy as np
    out = dict(batch)
    for k in float_keys:
        v = out.get(k)
        if v is not None and getattr(v, "dtype", None) == np.float32:
            out[k] = ((np.asarray(v) + 1.0) * 127.5).round().clip(
                0, 255).astype(np.uint8)
    for k in int_keys:
        v = out.get(k)
        if v is not None and np.issubdtype(getattr(v, "dtype", np.int64),
                                           np.integer):
            out[k] = np.asarray(v).clip(0, 255).astype(np.uint8)
    return out


def dequantize_on_device(x, kind="image"):
    """Inverse of quantize_batch, traced into the step. No-op for float
    inputs (static dtype dispatch at trace time)."""
    if x is None or x.dtype != jnp.uint8:
        return x
    if kind == "image":
        return x.astype(jnp.float32) / 127.5 - 1.0
    return x.astype(jnp.int32)


def video_batch_sharding(mesh):
    """Clips (B, F, H, W, C): batch over data+fsdp, FRAMES over seq."""
    return NamedSharding(mesh, P(("data", "fsdp"), "seq"))


def shard_batch(mesh, batch):
    """Host numpy batch -> global device arrays sharded over the batch axis
    (and, for 5D video clips when the seq axis is live, the frame axis).
    Batches not divisible by the data extent (tiny eval remainders) are
    replicated instead — correctness over speed off the hot path.

    Multi-process (jax.process_count() > 1): each process passes its OWN
    shard of the global batch (the loader's per-process slice, reference
    DistributedSampler semantics, data/__init__.py:124-129) and the global
    array is assembled with jax.make_array_from_process_local_data —
    global batch = local batch x process_count. Requires the seq axis (if
    live) to sit within a process (make_mesh orders seq fastest-varying,
    so this holds whenever local_device_count % seq == 0)."""
    sharding = batch_sharding(mesh)
    n = mesh.shape["data"] * mesh.shape["fsdp"]
    seq = mesh.shape["seq"]
    vid = video_batch_sharding(mesh)
    repl = replicate(mesh)
    pc = jax.process_count()

    if pc == 1:
        def put(x):
            if not (hasattr(x, "shape") and x.ndim > 0):
                return jax.device_put(x, repl)
            if x.shape[0] % n == 0:
                if seq > 1 and x.ndim == 5 and x.shape[1] % seq == 0:
                    return jax.device_put(x, vid)
                return jax.device_put(x, sharding)
            return jax.device_put(x, repl)

        return jax.tree.map(put, batch)

    assert n % pc == 0, (
        f"batch-shard extent data x fsdp = {n} must divide by "
        f"process_count {pc}")
    if seq > 1:
        assert jax.local_device_count() % seq == 0, (
            "seq axis must not straddle hosts: local_device_count "
            f"{jax.local_device_count()} % seq {seq} != 0")
    n_local = n // pc

    def put(x):
        if not (hasattr(x, "shape") and x.ndim > 0):
            # python / 0-d scalars are config values, identical per process
            return put_global(x, repl)
        if x.shape[0] % n_local != 0:
            raise ValueError(
                f"multi-process batch dim {x.shape[0]} must divide the "
                f"per-process shard extent {n_local} (replicating a "
                "remainder would silently duplicate per-process data)")
        gshape = (x.shape[0] * pc,) + tuple(x.shape[1:])
        sh = sharding
        if seq > 1 and x.ndim == 5 and x.shape[1] % seq == 0:
            sh = vid
        return jax.make_array_from_process_local_data(sh, np.asarray(x),
                                                      gshape)

    return jax.tree.map(put, batch)
