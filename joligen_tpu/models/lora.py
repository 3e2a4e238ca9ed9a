"""LoRA finetuning in parameter space (reference models/b2b_model.py:455-783
wraps torch modules with peft; the JAX-native equivalent keeps the model
function untouched and adapts the PARAMETER PYTREE instead):

- ``init_lora``: for every 2-D kernel whose path matches a target-module
  substring, allocate (A: d_in x r, B: r x d_out) with B zero-initialized —
  the merged weight starts exactly at the base weight.
- ``merge_lora``: W_eff = W + (alpha/r) * A @ B, computed INSIDE the jitted
  step, so gradients flow only into the LoRA leaves (the base tree is a
  stop_gradient constant).
- raw-vs-merged checkpoints: ``*_net_<name>_lora.pth`` stores the adapter
  tree; merging writes a standard checkpoint (reference merge path,
  b2b_model.py:784-833).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

DEFAULT_TARGETS = ("qkv", "proj", "w1", "w2", "w3", "kv", "q")


def _match(path_tuple, targets):
    """True if any target equals a module-name component exactly (so
    'proj' hits attention projections but not 'patch_proj')."""
    return any(t in path_tuple for t in targets)


def normalize_targets(targets):
    """Reference target names are torch module paths ('attn.qkv',
    'mlp.w12'); match on the leaf name in this module tree ('qkv', 'w1'+'w2')."""
    out = []
    for t in targets:
        leaf = t.split(".")[-1]
        if leaf == "w12":           # reference fused gate/up projection
            out += ["w1", "w2"]
        else:
            out.append(leaf)
    return tuple(out)


def init_lora(rng, params, rank=8, targets=DEFAULT_TARGETS):
    """Returns the adapter pytree {path: {"a","b"}} for matching kernels."""
    targets = normalize_targets(targets)
    flat = traverse_util.flatten_dict(params["params"])
    adapters = {}
    keys = jax.random.split(rng, max(1, len(flat)))
    for i, (path, w) in enumerate(sorted(flat.items())):
        # plain Dense kernels are rank-2; nn.scan-stacked blocks carry a
        # leading depth axis (rank-3) — LoRA factors get the same stacking
        if path[-1] != "kernel" or w.ndim not in (2, 3):
            continue
        if not _match(path[:-1], targets):
            continue
        lead = w.shape[:-2]
        d_in, d_out = w.shape[-2:]
        r = min(rank, d_in, d_out)
        a = jax.random.normal(keys[i % len(keys)], lead + (d_in, r),
                              jnp.float32) * (1.0 / np.sqrt(d_in))
        b = jnp.zeros(lead + (r, d_out), jnp.float32)
        adapters[path] = {"a": a, "b": b}
    assert adapters, (
        f"no kernels matched LoRA targets {targets}; available: "
        f"{sorted({p[-2] for p in flat if p[-1] == 'kernel'})[:20]}")
    return adapters


def merge_lora(params, adapters, alpha=16.0, rank=8, dropout=0.0, rng=None):
    """Base params + scaled adapter deltas (traced into the step).

    ``dropout`` implements alg_b2b_lora_dropout (reference
    b2b_model.py:312,464-466 via peft): peft drops the adapter-input
    activations; in this merged-weight formulation the equivalent
    expectation-preserving form drops whole input rows of the A factor
    per step (inverted dropout). Only active when ``rng`` is given."""
    scale = alpha / max(1, rank)
    flat = dict(traverse_util.flatten_dict(params["params"]))
    for i, (path, ab) in enumerate(sorted(adapters.items())):
        a = ab["a"]
        if dropout and dropout > 0.0 and rng is not None:
            key = jax.random.fold_in(rng, i)
            keep = jax.random.bernoulli(
                key, 1.0 - dropout, a.shape[:-1] + (1,)).astype(a.dtype)
            a = a * keep / (1.0 - dropout)
        # batched matmul handles both rank-2 and stacked rank-3 factors
        delta = jnp.matmul(a, ab["b"]) * scale
        flat[path] = flat[path] + delta.astype(flat[path].dtype)
    return {"params": traverse_util.unflatten_dict(flat)}


def count_lora_params(adapters):
    return sum(ab["a"].size + ab["b"].size for ab in adapters.values())
