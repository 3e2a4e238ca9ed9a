"""B2B flow-matching trainer (reference models/b2b_model.py).

Image path: JiT x-prediction backbone, logistic-normal t, mask-as-channel,
class conditioning with CFG-null dropout, loss choices
L1/MSE/pseudo-huber/multiscale with masked-region-only option.

Video path (G_netG=vit_vid): JiTViD with temporal motion modules,
frame-step / mask-bbox-size / global-context / object-ref conditioning, and
autoregressive training (a random frame is swapped for clean — optionally
degraded — GT at t=1 and excluded from the flow loss, plus an image-space
ref-copy loss; reference b2b_model.py:906-931, 1087-1130).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .train_state import apply_updates, init_net_state, make_optimizer
from .modules.b2b import b2b_sample, b2b_training_outputs, mask_size_condition
from .modules.cm import pseudo_huber_loss


class B2BModel(BaseModel):
    def __init__(self, opt, phase="train"):
        super().__init__(opt, phase)
        self.task = getattr(opt, "alg_diffusion_task", "inpainting")
        self.lambda_G = float(getattr(opt, "alg_diffusion_lambda_G", 1.0))
        self.use_ema = bool(getattr(opt, "train_G_ema", False))
        self.ema_beta = float(getattr(opt, "train_G_ema_beta", 0.999))
        self.loss_kind = getattr(opt, "alg_b2b_loss", "MSE")
        self.masked_only = bool(getattr(opt, "alg_b2b_loss_masked_region_only",
                                        False))
        self.num_classes = max(1, int(getattr(opt, "G_vit_num_classes", 1)))
        self.label_drop_prob = float(getattr(opt, "alg_diffusion_dropout_prob",
                                             0.0) or 0.0)
        self.mask_as_channel = bool(getattr(opt, "alg_b2b_mask_as_channel",
                                            False))
        self.is_video = opt.G_netG == "vit_vid"
        self.num_frames = int(getattr(opt, "data_temporal_number_frames", 1) or 1)
        size = opt.data_crop_size
        req_noise = float(getattr(opt, "alg_b2b_noise_scale", -1.0) or -1.0)
        self.noise_scale = req_noise if req_noise > 0 else (
            1.0 if size <= 256 else 2.0)
        self.t_eps = float(getattr(opt, "alg_b2b_t_eps", 5e-2))
        self.P_mean = float(getattr(opt, "alg_b2b_P_mean", -0.8))
        self.P_std = float(getattr(opt, "alg_b2b_P_std", 0.8))
        self.uniform_mix = float(getattr(opt, "alg_b2b_timestep_uniform_mix_prob",
                                         0.1))
        # int or list: the reference takes one-or-more step counts
        # (b2b_model.py:146-151 nargs='+', default [50]); the first is the
        # default sampler, the full ladder drives per-stepcount eval.
        steps = getattr(opt, "alg_b2b_denoise_timesteps", [50])
        if isinstance(steps, (int, float)):
            steps = [int(steps)]
        if not steps or any(int(s) <= 0 for s in steps):
            raise ValueError("--alg_b2b_denoise_timesteps must be one or "
                             "more positive integers")
        self.denoise_timesteps_list = [int(s) for s in steps]
        self.denoise_timesteps = self.denoise_timesteps_list[0]
        self.cfg_scale = float(getattr(opt, "alg_b2b_cfg_scale", 1.0))
        self.clip_denoised = bool(getattr(opt, "alg_b2b_clip_denoised", False))
        self.mask_size_cond = bool(getattr(opt, "alg_b2b_mask_size_conditioning",
                                           False))
        self.frame_step_cond = bool(getattr(
            opt, "alg_b2b_temporal_frame_step_conditioning", False))
        self.autoregressive = bool(getattr(opt, "alg_b2b_autoregressive", False))
        self.use_gt_prob = (float(getattr(opt, "alg_b2b_use_gt_prob", 0.1))
                            if (self.autoregressive and self.is_video) else 0.0)
        self.minsnr = bool(getattr(opt, "alg_b2b_minsnr", False))
        self.perceptual = [x for x in (getattr(
            opt, "alg_b2b_perceptual_loss", [""]) or [""]) if x]
        self.lambda_perceptual = float(
            getattr(opt, "alg_b2b_lambda_perceptual", 1.0) or 1.0)
        self._perc_mean = getattr(opt, "alg_b2b_dists_mean", None)
        self._perc_std = getattr(opt, "alg_b2b_dists_std", None)
        self.degrade_prob = float(getattr(
            opt, "alg_b2b_ref_frame_degradation_prob", 0.0) or 0.0)
        self.degrade_std = float(getattr(
            opt, "alg_b2b_ref_frame_degradation_std", 0.0) or 0.0)
        self.lambda_ref_copy = float(getattr(opt, "alg_b2b_lambda_ref_copy",
                                             0.0) or 0.0)
        self.conditional = (
            getattr(opt, "alg_diffusion_cond_image_creation", "y_t") != "y_t"
            or self.task == "pix2pix")

        dtype = jnp.bfloat16 if getattr(opt, "tpu_bf16", True) else jnp.float32
        if self.is_video:
            from .modules.vit_vid import JiTViD
            self.netG = JiTViD.from_opt(opt, dtype=dtype)
        else:
            from .modules.jit import JiT
            self.netG = JiT.from_opt(opt, dtype=dtype)

        cin = opt.model_output_nc + (1 if self.mask_as_channel else 0)
        if self.conditional:
            cin += opt.model_input_nc
        if self.is_video:
            ex_x = jnp.zeros((1, self.num_frames, size, size, cin), jnp.float32)
        else:
            ex_x = jnp.zeros((1, size, size, cin), jnp.float32)
        ex_t = jnp.zeros((1,), jnp.float32)
        ex_y = jnp.zeros((1,), jnp.int32)
        init_kwargs = {}
        self.gc_mode = getattr(opt, "alg_b2b_global_context_mode", "none") \
            or "none"
        if self.is_video and self.gc_mode != "none":
            gs = int(getattr(opt, "alg_b2b_global_context_size", 128) or 128)
            init_kwargs["global_context"] = jnp.zeros(
                (1, self.num_frames, gs, gs, 3), jnp.float32)
        n_oref = len(getattr(opt, "alg_b2b_object_ref_paths", []) or [])
        if self.is_video and n_oref > 0:
            osz = int(getattr(opt, "alg_b2b_object_ref_size", 64) or 64)
            init_kwargs["object_ref"] = jnp.zeros((1, n_oref, osz, osz, 3),
                                                  jnp.float32)
        tx = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
        self.txs["G_A"] = tx
        self.states["G_A"] = init_net_state(
            self.next_rng(), self.netG, (ex_x, ex_t, ex_y), tx,
            use_ema=self.use_ema, init_kwargs=init_kwargs)

        # fixed object-reference images (reference alg_b2b_object_ref_paths:
        # loaded once, tokenized as conditioning prefix by JiTViD)
        self.object_refs = None
        if self.is_video and n_oref > 0:
            from PIL import Image
            osz = int(getattr(opt, "alg_b2b_object_ref_size", 64) or 64)
            refs = []
            for pth in opt.alg_b2b_object_ref_paths:
                im = Image.open(pth).convert("RGB").resize((osz, osz),
                                                           Image.BICUBIC)
                refs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
            self.object_refs = np.stack(refs)[None]     # (1, N, s, s, 3)

        # LoRA finetuning: base params frozen, adapter pytree optimized
        # (reference b2b_model.py:455-783; see models/lora.py)
        self.use_lora = bool(getattr(opt, "alg_b2b_lora", False)) \
            and phase == "train"
        if self.use_lora:
            from .lora import DEFAULT_TARGETS, init_lora
            self.lora_rank = int(getattr(opt, "alg_b2b_lora_rank", 8) or 8)
            self.lora_dropout = float(
                getattr(opt, "alg_b2b_lora_dropout", 0.05) or 0.0)
            self.lora_alpha = float(getattr(opt, "alg_b2b_lora_alpha", 16)
                                    or 16)
            targets = tuple(getattr(opt, "alg_b2b_lora_target_modules", None)
                            or DEFAULT_TARGETS)
            adapters = init_lora(self.next_rng(),
                                 self.states["G_A"].params,
                                 rank=self.lora_rank, targets=targets)
            tx_l = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
            self.txs["G_lora"] = tx_l
            from .train_state import NetState
            self.states["G_lora"] = NetState(
                params=adapters, opt_state=tx_l.init(adapters),
                ema_params=None, step=jnp.zeros((), jnp.int32))

        self._jit_step = None
        self._jit_sample = {}


    def set_input(self, batch):
        gt = batch["B"]
        mask = batch.get("B_label_mask")
        cond = batch["A"] if self.conditional else None
        # video data through an image backbone: frames fold into the batch
        if gt.ndim == 5 and not self.is_video:
            b, f = gt.shape[:2]
            gt = gt.reshape((b * f,) + gt.shape[2:])
            if mask is not None:
                mask = mask.reshape((b * f,) + mask.shape[2:])
            if cond is not None:
                cond = cond.reshape((b * f,) + cond.shape[2:])
        out = {"gt": gt}
        if self.task == "inpainting" and mask is not None:
            out["mask"] = mask
        if cond is not None:
            out["y_cond"] = cond
        if self.num_classes > 1 and "B_label_cls" in batch:
            out["labels"] = np.asarray(batch["B_label_cls"], np.int32)
        if self.frame_step_cond and "temporal_frame_step" in batch:
            out["frame_step"] = np.asarray(batch["temporal_frame_step"],
                                           np.float32)
        if "B_global_context" in batch:
            out["global_context"] = batch["B_global_context"]
        return out

    def _make_apply(self, mask=None, frame_step=None, global_context=None):
        """Builds apply_fn(params, z_in, t, labels, mask_size) closing over
        the static conditioning inputs."""
        mch = None
        if self.mask_as_channel and mask is not None:
            mch = jnp.clip(mask.astype(jnp.float32), 0.0, 1.0)

        def apply_fn(params, z_in, t, labels, mask_size):
            if self.mask_as_channel:
                pad = (mch if mch is not None else
                       jnp.zeros(z_in.shape[:-1] + (1,), z_in.dtype))
                z_in = jnp.concatenate([z_in, pad], axis=-1)
            kwargs = {}
            if self.is_video:
                if self.frame_step_cond:
                    kwargs["temporal_frame_step"] = frame_step
                if global_context is not None:
                    kwargs["global_context"] = global_context
                if self.object_refs is not None:
                    b = z_in.shape[0]
                    kwargs["object_ref"] = jnp.broadcast_to(
                        jnp.asarray(self.object_refs),
                        (b,) + self.object_refs.shape[1:])
                return self.netG.apply(params, z_in, t, y=labels,
                                       mask_size=mask_size, **kwargs)
            return self.netG.apply(params, z_in, t, y=labels,
                                   mask_size=mask_size)
        return apply_fn

    def _loss(self, v_pred, v_target, mask):
        if v_pred.ndim == 5:  # fold frames for the spatial loss pyramid
            if mask is not None:
                # per-frame keep indicators are (B,F,1,1,1); broadcast to a
                # full spatial mask BEFORE folding so the masked
                # normalization counts pixels, not frames
                mask = jnp.broadcast_to(
                    jnp.clip(mask.astype(v_pred.dtype), 0.0, 1.0),
                    v_pred.shape[:-1] + (mask.shape[-1],))
                mask = mask.reshape((-1,) + mask.shape[2:])
            v_pred = v_pred.reshape((-1,) + v_pred.shape[2:])
            v_target = v_target.reshape((-1,) + v_target.shape[2:])
        if self.loss_kind == "L1":
            err = jnp.abs(v_pred - v_target)
        elif self.loss_kind == "pseudo_huber":
            err = pseudo_huber_loss(v_pred, v_target)
        elif self.loss_kind.startswith("multiscale"):
            from flax import linen as nn
            base = (jnp.abs if "L1" in self.loss_kind
                    else (lambda d: d ** 2))
            total, e, m = 0.0, (v_pred - v_target), mask
            for _ in range(3):
                if m is not None and self.masked_only:
                    mm = jnp.clip(m.astype(e.dtype), 0.0, 1.0)
                    total = total + jnp.sum(base(e) * mm) / jnp.maximum(
                        jnp.sum(mm) * e.shape[-1], 1.0)
                    m = nn.avg_pool(m.astype(e.dtype), (2, 2), strides=(2, 2))
                else:
                    total = total + jnp.mean(base(e))
                e = nn.avg_pool(e, (2, 2), strides=(2, 2))
            return total / 3.0
        else:
            err = (v_pred - v_target) ** 2
        if mask is not None and self.masked_only:
            m = jnp.clip(mask.astype(err.dtype), 0.0, 1.0)
            return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1], 1.0)
        if mask is not None:
            m = jnp.clip(mask.astype(err.dtype), 0.0, 1.0)
            err = err * m
        return jnp.mean(err)

    def prepare_batch(self, batch):
        from ..parallel.mesh import quantize_batch
        inp = self.set_input(batch)
        inp = quantize_batch(inp, float_keys=("gt", "y_cond"),
                             int_keys=("mask",))
        return self.put_batch(inp)

    def optimize_prepared(self, dev):
        from ..parallel.mesh import dequantize_on_device
        if self._jit_step is None:
            tx = self.txs["G_A"]

            def loss_fn(params, rng, gt, y_cond, mask, labels, frame_step,
                        global_context):
                gt = dequantize_on_device(gt, "image")
                y_cond = dequantize_on_device(y_cond, "image")
                mask = dequantize_on_device(mask, "label")
                apply_fn = self._make_apply(mask, frame_step, global_context)
                ms = None
                if self.mask_size_cond and mask is not None:
                    ms = mask_size_condition(mask, gt.shape[-3], gt.shape[-2])
                v_pred, v_target, loss_mask, raw_x_pred, is_ref = \
                    b2b_training_outputs(
                        apply_fn, params, rng, gt, y_cond=y_cond,
                        mask=(None if self.mask_as_channel else mask),
                        labels=labels, num_classes=self.num_classes,
                        noise_scale=self.noise_scale, P_mean=self.P_mean,
                        P_std=self.P_std, uniform_mix_prob=self.uniform_mix,
                        t_eps=self.t_eps, label_drop_prob=self.label_drop_prob,
                        mask_size=ms, use_gt_prob=self.use_gt_prob,
                        degrade_prob=self.degrade_prob,
                        degrade_std=self.degrade_std,
                        minsnr=self.minsnr)
                if self.mask_as_channel and mask is not None:
                    # the channelized mask skips b2b_training_outputs, but
                    # alg_b2b_loss_masked_region_only still applies
                    # (reference b2b_model.py:1135-1156 masks regardless)
                    lm = jnp.clip(mask.astype(v_pred.dtype), 0.0, 1.0)
                    loss_mask = lm if loss_mask is None else loss_mask * lm
                loss = self.lambda_G * self._loss(v_pred, v_target, loss_mask)
                aux = {}
                if self.perceptual:
                    # reference b2b_model.py:1175-1258: masked x-prediction
                    # vs ground truth
                    mb = (jnp.clip(mask.astype(gt.dtype), 0, 1)
                          if mask is not None else None)
                    pp = raw_x_pred * mb if mb is not None else raw_x_pred
                    tt = gt * mb if mb is not None else gt
                    terms = self.perceptual_terms(
                        pp, tt, self.perceptual, self._perc_mean,
                        self._perc_std)
                    perc = self.lambda_perceptual * sum(terms.values())
                    aux["G_perceptual"] = perc
                    loss = loss + perc
                if self.lambda_ref_copy > 0.0 and is_ref is not None:
                    # image-space copy loss on the autoregressive GT frame
                    # (per-element mean: is_ref is (B,F,1,1,1) so the count
                    # must include the broadcast H*W*C extent)
                    num = jnp.sum(jnp.abs(raw_x_pred - gt) * is_ref)
                    den = jnp.maximum(
                        jnp.sum(jnp.broadcast_to(is_ref, gt.shape)), 1.0)
                    ref_copy = num / den
                    aux["G_ref_copy"] = ref_copy
                    loss = loss + self.lambda_ref_copy * ref_copy
                return loss, aux

            if self.use_lora:
                from .lora import merge_lora
                tx_l = self.txs["G_lora"]

                def lora_loss(adapters, base, rng, *a):
                    merged = merge_lora(jax.lax.stop_gradient(base), adapters,
                                        alpha=self.lora_alpha,
                                        rank=self.lora_rank,
                                        dropout=self.lora_dropout,
                                        rng=jax.random.fold_in(rng, 77))
                    return loss_fn(merged, rng, *a)

                def step(states, rng, gt, y_cond, mask, labels, frame_step,
                         global_context):
                    (loss, aux), grads = jax.value_and_grad(
                        lora_loss, has_aux=True)(
                        states["G_lora"].params, states["G_A"].params, rng,
                        gt, y_cond, mask, labels, frame_step, global_context)
                    states = dict(states)
                    states["G_lora"] = apply_updates(states["G_lora"], grads,
                                                     tx_l)
                    return states, {"G_tot": loss, **aux}

                self._jit_step = jax.jit(step, donate_argnums=(0,))
            else:
                def step(state, rng, gt, y_cond, mask, labels, frame_step,
                         global_context):
                    (loss, aux), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(
                        state.params, rng, gt, y_cond, mask, labels,
                        frame_step, global_context)
                    losses = {"G_tot": loss, **aux}
                    return apply_updates(state, grads, tx, self.ema_beta), \
                        losses

                self._jit_step = jax.jit(step, donate_argnums=(0,))
        if self.use_lora:
            self.states, losses = self._jit_step(
                self.states, self.next_rng(), dev["gt"],
                dev.get("y_cond"), dev.get("mask"), dev.get("labels"),
                dev.get("frame_step"), dev.get("global_context"))
        else:
            self.states["G_A"], losses = self._jit_step(
                self.states["G_A"], self.next_rng(), dev["gt"],
                dev.get("y_cond"), dev.get("mask"), dev.get("labels"),
                dev.get("frame_step"), dev.get("global_context"))
        self.loss_log = losses  # device scalars, lazy host sync
        return self.loss_log

    def optimize_parameters(self, batch):
        return self.optimize_prepared(self.prepare_batch(batch))

    def merge_lora_checkpoint(self):
        """Fold the trained adapters into the base weights (reference raw->
        merged checkpoint conversion, b2b_model.py:784-833)."""
        assert self.use_lora
        from .lora import merge_lora
        merged = merge_lora(self.states["G_A"].params,
                            self.states["G_lora"].params,
                            alpha=self.lora_alpha, rank=self.lora_rank)
        self.states["G_A"] = self.states["G_A"].replace(params=merged)

    def inference(self, batch, use_ema=None, denoise_timesteps=None,
                  cfg_scale=None):
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        use_ema = self.use_ema if use_ema is None else use_ema
        steps = denoise_timesteps or self.denoise_timesteps
        cfg = self.cfg_scale if cfg_scale is None else cfg_scale
        state = self.states["G_A"]
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        if self.use_lora:
            from .lora import merge_lora
            params = merge_lora(params, self.states["G_lora"].params,
                                alpha=self.lora_alpha, rank=self.lora_rank)
        params = self.replicated(params)
        key = (steps, cfg, dev["gt"].shape)
        if key not in self._jit_sample:
            def run(p, rng, y, y_cond, mask, labels, frame_step,
                    global_context):
                apply_fn = self._make_apply(mask, frame_step, global_context)
                ms = None
                if self.mask_size_cond and mask is not None:
                    ms = mask_size_condition(mask, y.shape[-3], y.shape[-2])
                return b2b_sample(
                    apply_fn, p, rng, y, y_cond=y_cond,
                    mask=(None if self.mask_as_channel else mask),
                    labels=labels, num_classes=self.num_classes,
                    denoise_timesteps=steps, noise_scale=self.noise_scale,
                    t_eps=self.t_eps, cfg_scale=cfg,
                    clip_denoised=self.clip_denoised, mask_size=ms)
            self._jit_sample[key] = jax.jit(run)
        out = self._jit_sample[key](params, self.next_rng(), dev["gt"],
                                    dev.get("y_cond"), dev.get("mask"),
                                    dev.get("labels"), dev.get("frame_step"),
                                    dev.get("global_context"))
        return np.asarray(jax.device_get(out))
