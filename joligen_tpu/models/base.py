"""Base training engine: pytree states, jitted steps, checkpoint contract.

TPU-native replacement for reference models/base_model.py: instead of
mutable nn.Modules with requires_grad toggling (base_model.py:1302-1377),
each network is a ``NetState`` pytree and each NetworkGroup becomes one
pure jitted step function; frozen subsets are expressed with
``stop_gradient``/separate param partitions. Checkpoints keep the
``{epoch}_net_{name}.pth`` naming contract (base_model.py:824-868) with
msgpack payloads.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..parallel import make_mesh, shard_batch
from .train_state import NetState


class BaseModel:
    def __init__(self, opt, phase="train"):
        self.opt = opt
        self.phase = phase
        self.is_train = phase == "train"
        self.device_dtype = jnp.bfloat16 if getattr(opt, "tpu_bf16", True) else jnp.float32
        self.mesh = make_mesh(opt)
        seed = getattr(opt, "seed", 0) or 0
        self.rng = jax.random.PRNGKey(seed)
        self.modules: Dict[str, Any] = {}
        self.states: Dict[str, NetState] = {}
        self.txs: Dict[str, Any] = {}
        self.loss_log: Dict[str, float] = {}
        self.save_dir = os.path.join(opt.checkpoints_dir, opt.name)
        if self.is_train:
            os.makedirs(self.save_dir, exist_ok=True)

    # ---------------- rng ----------------
    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # ---------------- data ----------------
    def put_batch(self, batch):
        """Host numpy batch -> device arrays sharded over the batch axis."""
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        return shard_batch(self.mesh, arrays)

    def replicated(self, params):
        """Params replicated over the mesh. Inference entry points feed
        mesh-sharded batches, but checkpoint-loaded params may sit
        committed on one device — jit then rejects the mixed placement
        (incompatible-devices error under a multi-device mesh). device_put
        to the replicated sharding is a no-op when already replicated."""
        from ..parallel.mesh import put_global, replicate
        rep = replicate(self.mesh)
        return jax.tree.map(lambda x: put_global(x, rep), params)

    def finalize_states(self):
        """Commit every NetState leaf to its mesh sharding: param_sharding
        policy for params/EMA/optimizer moments, replicated step counter.
        Single-process this just commits placements (the jitted steps
        would infer the same via GSPMD); multi-PROCESS it is REQUIRED —
        every jit input must be a global array spanning the full mesh, and
        each process holds only its local devices until this runs (called
        once by models.create_model after subclass __init__)."""
        from ..parallel.mesh import param_sharding, put_global, replicate
        rep = replicate(self.mesh)

        def put_tree(tree):
            if tree is None:
                return None
            sh = param_sharding(self.mesh, tree)
            return jax.tree.map(put_global, tree, sh)

        for name, st in list(self.states.items()):
            self.states[name] = st.replace(
                params=put_tree(st.params),
                ema_params=put_tree(st.ema_params),
                opt_state=put_tree(st.opt_state),
                step=put_global(st.step, rep))

    def _gathered(self, tree):
        """Host copy of a (possibly cross-host-sharded) state tree. Single
        process: plain device_get (shards are all addressable).
        Multi-process: all-gather to replicated first — a COLLECTIVE, so
        every process must call this (only rank 0 then writes files)."""
        if jax.process_count() == 1:
            return jax.device_get(tree)
        from ..parallel.mesh import replicate
        rep = replicate(self.mesh)
        return jax.device_get(jax.jit(lambda t: t, out_shardings=rep)(tree))

    # ---------------- training ----------------
    def optimize_parameters(self, batch):
        """One training step over all network groups. Returns loss dict."""
        raise NotImplementedError

    def get_current_losses(self):
        return dict(self.loss_log)

    def perceptual_terms(self, pred, target, kinds, mean=None, std=None):
        """Traceable LPIPS/DISTS perceptual distances for training losses
        (reference alg_{cm,sc,b2b,cut}_perceptual_loss; cm_model.py:241-255).
        5D video inputs fold frames into batch; 1-channel inputs tile."""
        from ..utils.metrics import (dists_from_feats, lpips_from_feats,
                                     vgg_feature_fn)
        a, b = target, pred
        if a.ndim == 5:
            a = a.reshape((-1,) + a.shape[2:])
            b = b.reshape((-1,) + b.shape[2:])
        if a.shape[-1] == 1:
            a = jnp.tile(a, (1, 1, 1, 3))
            b = jnp.tile(b, (1, 1, 1, 3))
        if getattr(self, "_perc_feats", None) is None:
            self._perc_feats = vgg_feature_fn(a.shape[1:], mean=mean, std=std)
        fa, fb = self._perc_feats(a), self._perc_feats(b)
        out = {}
        if "LPIPS" in kinds:
            out["lpips"] = jnp.mean(lpips_from_feats(fa, fb))
        if "DISTS" in kinds:
            out["dists"] = jnp.mean(dists_from_feats(fa, fb))
        return out

    # ---------------- checkpoint contract ----------------
    def _net_path(self, prefix, name, ema=False):
        suffix = "_ema" if ema else ""
        return os.path.join(self.save_dir, f"{prefix}_net_{name}{suffix}.pth")

    def save_networks(self, prefix):
        """Per-network files named {prefix}_net_{name}.pth (+_ema), matching
        the reference checkpoint layout (base_model.py:824-868). Payload is
        flax msgpack, not torch pickle.

        Multi-process: the gathers are collectives — ALL processes call
        this in lockstep (the train loop does); only process 0 writes
        (reference rank-0 gating, train.py:350-356)."""
        from ..parallel.dist import is_main_process
        write = is_main_process()
        for name, state in self.states.items():
            params = self._gathered(state.params)
            if write:
                with open(self._net_path(prefix, name), "wb") as f:
                    f.write(serialization.to_bytes(params))
            if state.ema_params is not None:
                ema = self._gathered(state.ema_params)
                if write:
                    with open(self._net_path(prefix, name, ema=True),
                              "wb") as f:
                        f.write(serialization.to_bytes(ema))
        # optimizer state for exact resume (the reference does NOT checkpoint
        # optimizer state — SURVEY.md §5; we do, as a strict improvement)
        opt_states = {n: self._gathered(s.opt_state)
                      for n, s in self.states.items()}
        if write:
            opt_path = os.path.join(self.save_dir, f"{prefix}_optim.pkl")
            with open(opt_path, "wb") as f:
                pickle.dump(opt_states, f)

    @staticmethod
    def _resize_token_table(lv, tshape):
        """Resize a (1,T,D) positional/token table to a new T. When both T's
        factor as [special-token prefix +] square grid, interpolate the grid
        BILINEARLY in 2D (reference base_model.py:957-1188 interpolates the
        2D positional grid on resolution change — a flat 1D resize would
        smear rows into each other); otherwise fall back to 1D linear."""
        import math
        t_old, t_new = lv.shape[1], tshape[1]
        d = lv.shape[-1]
        for n_special in (0, 1, 2, 4, 8, 16):  # cls / register prefixes
            go, gn = t_old - n_special, t_new - n_special
            if go <= 0 or gn <= 0:
                continue
            ho, hn = math.isqrt(go), math.isqrt(gn)
            if ho * ho == go and hn * hn == gn:
                spec = jnp.asarray(lv[:, :n_special])
                grid = jnp.asarray(lv[:, n_special:]).reshape(1, ho, ho, d)
                grid = jax.image.resize(grid, (1, hn, hn, d), "bilinear")
                grid = grid.reshape(1, hn * hn, d)
                if n_special:
                    grid = jnp.concatenate([spec, grid], axis=1)
                return np.asarray(grid, dtype=np.asarray(lv).dtype), "2d"
        return np.asarray(jax.image.resize(
            jnp.asarray(lv), tshape, "linear")), "1d"

    @staticmethod
    def _adapt_loaded(target, loaded):
        """Shape-tolerant restore (reference base_model.py:957-1188 remaps
        keys and interpolates positional embeddings on resolution change):
        matching leaves load as-is; (1,T,D) token tables with differing T
        are resized (2D-bilinear over the spatial grid when T is a square
        grid with an optional special-token prefix, else 1D-linear);
        anything else keeps the fresh init."""
        from flax import traverse_util
        tf = traverse_util.flatten_dict(target)
        lf = traverse_util.flatten_dict(loaded)
        out = {}
        for k, tv in tf.items():
            lv = lf.get(k)
            if lv is None:
                out[k] = tv
            elif tuple(lv.shape) == tuple(tv.shape):
                out[k] = lv
            elif (getattr(lv, "ndim", 0) == 3 and lv.shape[0] == 1
                  and lv.shape[-1] == tv.shape[-1]):
                out[k], how = BaseModel._resize_token_table(lv, tv.shape)
                print(f"resized token table ({how}) "
                      f"{'/'.join(map(str, k))}: {lv.shape} -> {tv.shape}")
            else:
                print(f"shape mismatch for {'/'.join(map(str, k))} "
                      f"({lv.shape} vs {tv.shape}); keeping fresh init")
                out[k] = tv
        return traverse_util.unflatten_dict(out)

    def load_networks(self, prefix, load_optim=True, strict=True):
        if getattr(self.opt, "model_load_no_strictness", False):
            # reference base_model.py:1030-1040 load_state_dict(strict=False)
            strict = False
        for name, state in self.states.items():
            path = self._net_path(prefix, name)
            if not os.path.exists(path):
                if strict and not getattr(self.opt, "train_finetune", False):
                    raise FileNotFoundError(path)
                continue
            with open(path, "rb") as f:
                blob = f.read()
            target = self._gathered(state.params)
            try:
                params = serialization.from_bytes(target, blob)
            except ValueError:
                # resolution / config drift: tolerant leaf-wise restore
                loaded = serialization.msgpack_restore(blob)
                params = self._adapt_loaded(target, loaded)
            def _put_like(new_tree, old_tree):
                # preserve the shardings established at init — a bare
                # device_put would collapse fsdp/tensor-sharded params onto
                # one device on resume (and multi-process needs global
                # arrays, mesh.put_global)
                from ..parallel.mesh import put_global

                def put(nv, ov):
                    sh = getattr(ov, "sharding", None)
                    return (put_global(nv, sh) if sh is not None
                            else jax.device_put(nv))
                return jax.tree.map(put, new_tree, old_tree)

            new = state.replace(params=_put_like(params, state.params))
            epath = self._net_path(prefix, name, ema=True)
            if state.ema_params is not None and os.path.exists(epath):
                with open(epath, "rb") as f:
                    ema = serialization.from_bytes(
                        self._gathered(state.ema_params), f.read())
                new = new.replace(ema_params=_put_like(ema,
                                                       state.ema_params))
            self.states[name] = new
        opt_path = os.path.join(self.save_dir, f"{prefix}_optim.pkl")
        if load_optim and os.path.exists(opt_path):
            with open(opt_path, "rb") as f:
                opt_states = pickle.load(f)
            for name, os_ in opt_states.items():
                if name in self.states:
                    target = self._gathered(self.states[name].opt_state)
                    restored = serialization.from_state_dict(target,
                        serialization.to_state_dict(os_))
                    from ..parallel.mesh import put_global
                    def put(nv, ov):
                        sh = getattr(ov, "sharding", None)
                        return (put_global(nv, sh) if sh is not None
                                else jax.device_put(nv))
                    self.states[name] = self.states[name].replace(
                        opt_state=jax.tree.map(put, restored,
                                               self.states[name].opt_state))

    # ---------------- metrics (reference base_model.py:148-206, 1791-2256) --
    def init_metrics(self, dataloader_real=None):
        """Build the feature extractor and cache real-set activations."""
        from ..utils.metrics import InceptionV3Features, _cov_mean
        self.metric_extractor = InceptionV3Features()
        self.real_stats = None
        if dataloader_real is not None:
            reals = []
            nmax = int(getattr(self.opt, "train_nb_img_max_fid", 10 ** 9))
            for batch in dataloader_real:
                reals.append(np.asarray(batch["B"], np.float32))
                if sum(r.shape[0] for r in reals) >= nmax:
                    break
            if reals:
                reals = np.concatenate(reals)[:nmax]
                if reals.ndim == 5:
                    reals = reals.reshape((-1,) + reals.shape[2:])
                acts = self.metric_extractor(reals)
                mu, sigma = _cov_mean(acts)
                self.real_stats = (mu, sigma, acts)

    def compute_metrics_test(self, dataloader_test, n_epoch="latest",
                             n_iter=0, save_images=None, test_name="",
                             **infer_kwargs):
        """Run inference over a test dataloader and compute the configured
        metric list (reference compute_metrics_test, base_model.py:1791).
        ``save_images`` (default: opt.train_metrics_save_images) writes the
        evaluated fake/real pairs under the experiment directory."""
        from ..utils.metrics import (VideoFeatures, compute_metrics, fvd,
                                     metric_key)
        if save_images is None:
            save_images = bool(getattr(self.opt, "train_metrics_save_images",
                                       False))
        metrics_list = list(getattr(self.opt, "train_metrics_list", ["FID"])
                            or ["FID"])
        nmax = int(getattr(self.opt, "train_nb_img_max_fid", 10 ** 9))
        fakes, reals, masks = [], [], []
        fake_clips, real_clips = [], []
        for batch in dataloader_test:
            fake = self.inference(batch, **infer_kwargs)
            real = np.asarray(batch["B"], np.float32)
            if fake.ndim == 5:  # video: clip metrics + frame metrics
                fake_clips.append(fake)
                real_clips.append(real)
                fake = fake.reshape((-1,) + fake.shape[2:])
                real = real.reshape((-1,) + real.shape[2:])
            base = sum(f.shape[0] for f in fakes)
            if save_images and base < 8:  # cap total images per eval
                import os as _os

                from ..utils.visualizer import tensor2im
                from PIL import Image
                d = _os.path.join(self.save_dir,
                                  f"metrics_imgs_{test_name or 'test'}")
                _os.makedirs(d, exist_ok=True)
                for j in range(min(fake.shape[0], 8 - base)):
                    Image.fromarray(tensor2im(fake[j])).save(
                        _os.path.join(d, f"{n_epoch}_{base + j}_fake.png"))
                    Image.fromarray(tensor2im(real[j])).save(
                        _os.path.join(d, f"{n_epoch}_{base + j}_real.png"))
            fakes.append(fake)
            reals.append(real)
            m = batch.get("B_label_mask")
            if m is not None:
                m = np.asarray(m, np.float32)
                if m.ndim == 5:
                    m = m.reshape((-1,) + m.shape[2:])
                masks.append(m)
            if sum(f.shape[0] for f in fakes) >= nmax:
                break
        if not fakes:
            return {}
        fakes = np.concatenate(fakes)[:nmax]
        reals = np.concatenate(reals)[:nmax]
        mask = np.concatenate(masks)[:nmax] if masks else None
        use_mask = bool(getattr(self.opt,
                                f"alg_{self.opt.model_type}_metric_mask", False))
        out = compute_metrics(
            fakes, reals, [m for m in metrics_list if m != "FVD"],
            extractor=getattr(self, "metric_extractor", None),
            real_stats=getattr(self, "real_stats", None),
            mask=(mask if use_mask else None))
        if "FVD" in metrics_list and fake_clips:
            vf = VideoFeatures()
            out[metric_key("FVD", vf.is_fallback)] = fvd(
                np.concatenate(real_clips), np.concatenate(fake_clips),
                extractor=vf)
        return {f"{k}_test": v for k, v in out.items()}

    def inference(self, batch, **kwargs):
        raise NotImplementedError

    # ---------------- misc ----------------
    def param_count(self):
        return {n: sum(x.size for x in jax.tree.leaves(s.params))
                for n, s in self.states.items()}

    def update_learning_rate(self):
        # LR schedules are step-driven closures inside the optimizers
        # (train_state.make_lr_schedule); nothing to do per-epoch.
        pass
