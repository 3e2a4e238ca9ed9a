"""Per-network train state (params + optimizer + EMA) and optimizer factory.

TPU-native replacement for the mutable-attribute engine of reference
models/base_model.py: each network is an immutable pytree ``NetState``
updated by pure jitted steps. Gradient accumulation uses
``optax.MultiSteps`` (reference train_iter_size + DDP no_sync,
models/base_model.py:1313-1315); EMA is the same lerp as
models/base_model.py:1284-1297 performed inside the step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
import jax.numpy as jnp
import optax
from flax import struct


class NetState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    step: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def make_lr_schedule(opt, base_lr):
    """LR schedules with reference semantics (models/modules/utils.py:115-158):
    epoch-granular; we convert to per-step using steps_per_epoch set later via
    closure on opt.steps_per_epoch (host computes it before jit)."""
    policy = getattr(opt, "train_lr_policy", "linear")
    n_epochs = getattr(opt, "train_n_epochs", 100)
    n_decay = max(1, getattr(opt, "train_n_epochs_decay", 100))
    spe = max(1, int(getattr(opt, "steps_per_epoch", 1)))

    if policy == "linear":
        # flat for n_epochs then linear decay to 0 over n_epochs_decay
        def sched(step):
            epoch = step / spe
            frac = jnp.clip((epoch - n_epochs) / n_decay, 0.0, 1.0)
            return base_lr * (1.0 - frac)
        return sched
    if policy == "step":
        decay_iters = max(1, getattr(opt, "train_lr_decay_iters", 50))
        def sched(step):
            epoch = step // spe
            return base_lr * (0.1 ** (epoch // decay_iters))
        return sched
    if policy == "multistep":
        steps = getattr(opt, "train_lr_steps", []) or []
        def sched(step):
            epoch = step / spe
            k = sum(jnp.where(epoch >= s, 1, 0) for s in steps) if steps else 0
            return base_lr * (0.1 ** k)
        return sched
    if policy == "cosine":
        def sched(step):
            epoch = step / spe
            return base_lr * 0.5 * (1 + jnp.cos(jnp.pi * epoch / n_epochs))
        return sched
    # "plateau" requires metric feedback; approximate with constant
    return lambda step: base_lr


def madgrad(learning_rate, momentum=0.9, weight_decay=0.0, eps=1e-6):
    """MADGRAD (Defazio & Jelassi 2021) as an optax transformation
    (reference util/madgrad.py — dense path, momentum form).

    State: s = sum of lamb*g, v = sum of lamb*g^2, x0 = initial params.
    lamb_k = lr_k * sqrt(k+1);  z = x0 - s / (v^(1/3) + eps);
    p <- (1-c) p + c z with c = 1 - momentum.
    """

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"s": zeros, "v": jax.tree.map(jnp.zeros_like, params),
                "x0": jax.tree.map(jnp.copy, params),
                "k": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        lr = learning_rate(state["k"]) if callable(learning_rate) \
            else learning_rate
        # reference adds eps to lr (util/madgrad.py:96 "lr = lr + eps")
        lamb = (lr + eps) * jnp.sqrt(state["k"].astype(jnp.float32) + 1.0)
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p,
                                 grads, params)
        new_v = jax.tree.map(lambda v, g: v + lamb * g * g,
                             state["v"], grads)
        new_s = jax.tree.map(lambda s, g: s + lamb * g, state["s"], grads)
        ck = 1.0 - momentum
        def upd(p, s, v, x0):
            z = x0 - s / (jnp.cbrt(v) + eps)
            return (1.0 - ck) * p + ck * z - p
        updates = jax.tree.map(upd, params, new_s, new_v, state["x0"])
        return updates, {"s": new_s, "v": new_v, "x0": state["x0"],
                         "k": state["k"] + 1}

    return optax.GradientTransformation(init, update)


def _cast_mu(tx, dtype):
    """Store the ``mu`` field of any ScaleByAdam-style NamedTuple state in
    ``dtype`` (for optimizers whose optax factory lacks a ``mu_dtype``
    kwarg, e.g. optax 0.2.6 radam). The update still computes the moment in
    the promoted dtype (g is fp32), then the store is down-cast — the same
    numerics as optax's own mu_dtype handling."""

    def walk(s):
        if hasattr(s, "_fields"):  # NamedTuple state
            kw = {}
            for f in s._fields:
                v = getattr(s, f)
                if f == "mu":
                    v = jax.tree.map(lambda x: x.astype(dtype), v)
                else:
                    v = walk(v)
                kw[f] = v
            return type(s)(**kw)
        if isinstance(s, tuple):
            return tuple(walk(x) for x in s)
        if isinstance(s, list):
            return [walk(x) for x in s]
        return s

    def init(params):
        return walk(tx.init(params))

    def update(grads, state, params=None):
        upd, new_state = tx.update(grads, state, params)
        return upd, walk(new_state)

    return optax.GradientTransformation(init, update)


def make_optimizer(opt, lr, iter_size=None):
    """adam/radam/adamw/lion factory (reference train.py:51-62).
    adam8bit maps to adamw (quantized optimizer states are not a win on TPU:
    optimizer state shards over the fsdp axis instead).

    ``tpu_optim_moment_dtype=bfloat16`` stores the FIRST moment of
    adam/adamw/radam/lion in bf16 (optax mu_dtype), halving its HBM
    read+write per step (for lion that is the entire optimizer state). The
    second moment stays fp32: with b2=0.999 the per-step increment
    (1-b2)*g^2 is ~1e-3 of nu — below bf16's 8-bit mantissa ulp, so a bf16
    nu would stop updating entirely. madgrad/muon ignore the flag."""
    name = getattr(opt, "train_optim", "adam")
    b1 = getattr(opt, "train_beta1", 0.9)
    b2 = getattr(opt, "train_beta2", 0.999)
    eps = getattr(opt, "train_optim_eps", 1e-8)
    wd = getattr(opt, "train_optim_weight_decay", 0.0)
    mu_dtype = (jnp.bfloat16
                if getattr(opt, "tpu_optim_moment_dtype", "") == "bfloat16"
                else None)
    sched = make_lr_schedule(opt, lr)
    if name == "adam":
        tx = optax.adam(sched, b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype)
    elif name == "radam":
        # optax.radam (0.2.6) has no mu_dtype kwarg; cast mu after the fact
        # via tree-map so tpu_optim_moment_dtype still applies.
        tx = optax.radam(sched, b1=b1, b2=b2, eps=eps)
        if mu_dtype is not None:
            tx = _cast_mu(tx, mu_dtype)
    elif name in ("adamw", "adam8bit"):
        tx = optax.adamw(sched, b1=b1, b2=b2, eps=eps, weight_decay=wd,
                         mu_dtype=mu_dtype)
    elif name == "lion":
        tx = optax.lion(sched, b1=b1, b2=b2, weight_decay=wd,
                        mu_dtype=mu_dtype)
    elif name == "madgrad":
        tx = madgrad(sched, momentum=b1, weight_decay=wd)
    elif name == "muon":
        # Newton-Schulz orthogonalized momentum on matrix params (adam on the
        # rest) — pure matmul iterations, a natural MXU fit. The reference's
        # multi-dataset B2B tool emits train_optim=muon
        # (scripts/gen_multi_dataset_b2b_config.py:938) even though its own
        # train.py factory doesn't support it yet; here it is first-class.
        tx = optax.contrib.muon(sched, beta=max(b1, 0.9), weight_decay=wd,
                                adam_b1=b1, adam_b2=b2)
    else:
        raise NotImplementedError(f"optimizer {name}")
    if iter_size is None:
        iter_size = getattr(opt, "train_iter_size", 1)
    if iter_size and iter_size > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(iter_size))
    return tx


def apply_init_scheme(rng, params, init_type, init_gain=0.02):
    """Re-draw every Dense/Conv kernel with the pix2pix-lineage weight-init
    scheme and zero the biases (reference models/modules/utils.py:33-76
    init_weights: normal | xavier | kaiming | orthogonal, applied by
    init_net to every GAN G/D/F/E). Norm scales are left untouched (the
    reference only re-inits BatchNorm affines, which our norms do not
    use)."""
    if not init_type or init_type == "default":
        return params
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params)
    out = {}
    for i, (k, v) in enumerate(sorted(flat.items())):
        name = k[-1]
        sub = jax.random.fold_in(rng, i)
        if name == "kernel" and getattr(v, "ndim", 0) >= 2:
            shape = v.shape
            # torch fan convention for convs: both fans include the
            # receptive field (nn.init._calculate_fan_in_and_fan_out)
            receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
            fan_in = int(shape[-2]) * receptive
            fan_out = int(shape[-1]) * receptive
            if init_type == "normal":
                w = init_gain * jax.random.normal(sub, shape)
            elif init_type == "xavier":
                std = init_gain * np.sqrt(2.0 / (fan_in + fan_out))
                w = std * jax.random.normal(sub, shape)
            elif init_type == "kaiming":
                w = np.sqrt(2.0 / fan_in) * jax.random.normal(sub, shape)
            elif init_type == "orthogonal":
                w = jax.nn.initializers.orthogonal(scale=init_gain)(
                    sub, shape, jnp.float32)
            else:
                raise NotImplementedError(
                    f"initialization method [{init_type}] is not implemented")
            out[k] = w.astype(v.dtype)
        elif name == "bias":
            out[k] = jnp.zeros_like(v)
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out)


def scheme_from_opt(state, key, opt):
    """apply_init_scheme driven by opt.model_init_type/model_init_gain,
    refreshing the EMA copy to match (shared by the GAN models)."""
    params = apply_init_scheme(
        key, state.params,
        getattr(opt, "model_init_type", "normal") or "normal",
        float(getattr(opt, "model_init_gain", 0.02) or 0.02))
    return state.replace(
        params=params,
        ema_params=(jax.tree.map(jnp.copy, params)
                    if state.ema_params is not None else None))


def init_net_state(rng, module, example_inputs, tx, use_ema=False,
                   init_kwargs=None):
    # jit the init: eager flax init compiles every op separately, which is
    # catastrophically slow through remote-compile TPU tunnels.
    init_fn = jax.jit(lambda r: module.init(r, *example_inputs,
                                            **(init_kwargs or {})))
    params = init_fn(rng)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params) if use_ema else None
    return NetState(params=params, opt_state=opt_state, ema_params=ema,
                    step=jnp.zeros((), jnp.int32))


def apply_updates(state: NetState, grads, tx, ema_beta=0.0):
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = state.ema_params
    if state.ema_params is not None:
        # lerp: ema = beta*ema + (1-beta)*params (base_model.py:1284-1297)
        new_ema = jax.tree.map(
            lambda e, p: ema_beta * e + (1.0 - ema_beta) * p,
            state.ema_params, new_params)
    return state.replace(params=new_params, opt_state=new_opt_state,
                         ema_params=new_ema, step=state.step + 1)
