"""Device mesh + sharding policy.

The reference's only parallelism is single-node DDP over NCCL
(reference train.py:38-48, models/base_model.py:725-737). Here the
equivalent — and more — is expressed as a ``jax.sharding.Mesh`` with three
axes:

- ``data``: batch sharding (DDP equivalent; gradient psum inserted by XLA)
- ``fsdp``: parameter/optimizer-state sharding (ZeRO-style, sharded over ICI)
- ``tensor``: tensor-parallel axis reserved for attention-head/channel
  sharding of the largest denoisers

All collectives ride ICI; multi-host initialization goes through
``jax.distributed.initialize`` (DCN) before mesh creation.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "tensor")


def make_mesh(opt=None, devices=None):
    """Create the global mesh from tpu_mesh_* options (default: all devices
    on the data axis)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    fsdp = getattr(opt, "tpu_mesh_fsdp", 1) if opt is not None else 1
    tensor = getattr(opt, "tpu_mesh_tensor", 1) if opt is not None else 1
    data = getattr(opt, "tpu_mesh_data", -1) if opt is not None else -1
    if data == -1:
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, (
        f"mesh {data}x{fsdp}x{tensor} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(dev_array, AXES)


def batch_sharding(mesh):
    """Batches shard over data AND fsdp axes (fsdp also processes distinct
    samples; its param gathers overlap with compute)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def param_sharding(mesh, params):
    """ZeRO-3-style policy: shard each array's largest divisible dimension
    over the fsdp axis; replicate over data. Tiny arrays stay replicated."""
    fsdp = mesh.shape["fsdp"]

    def policy(x):
        if fsdp == 1 or not hasattr(x, "shape") or x.size < 2 ** 16:
            return NamedSharding(mesh, P())
        dims = list(x.shape)
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        for i in order:
            if dims[i] % fsdp == 0:
                spec = [None] * len(dims)
                spec[i] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(policy, params)


def replicate(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Host numpy batch -> global device arrays sharded over the batch axis.
    Batches not divisible by the data extent (tiny eval remainders) are
    replicated instead — correctness over speed off the hot path."""
    sharding = batch_sharding(mesh)
    n = mesh.shape["data"] * mesh.shape["fsdp"]
    repl = replicate(mesh)

    def put(x):
        if hasattr(x, "shape") and x.ndim > 0 and x.shape[0] % n == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, repl)

    return jax.tree.map(put, batch)
