"""B2B flow-matching trainer (reference models/b2b_model.py).

Image path of the B2B model: JiT x-prediction backbone, logistic-normal t,
mask-as-channel option, class conditioning with CFG-null dropout, loss
choices L1/MSE/pseudo-huber/multiscale with masked-region-only option.
Video (JiTViD), LoRA finetuning and ref-copy arrive with the video stack.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .train_state import apply_updates, init_net_state, make_optimizer
from .modules.b2b import b2b_sample, b2b_training_outputs
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
        size = opt.data_crop_size
        req_noise = float(getattr(opt, "alg_b2b_noise_scale", -1.0) or -1.0)
        self.noise_scale = req_noise if req_noise > 0 else (
            1.0 if size <= 256 else 2.0)
        self.t_eps = float(getattr(opt, "alg_b2b_t_eps", 5e-2))
        self.P_mean = float(getattr(opt, "alg_b2b_P_mean", -0.8))
        self.P_std = float(getattr(opt, "alg_b2b_P_std", 0.8))
        self.uniform_mix = float(getattr(opt, "alg_b2b_timestep_uniform_mix_prob",
                                         0.1))
        self.denoise_timesteps = int(getattr(opt, "alg_b2b_denoise_timesteps",
                                             50))
        self.cfg_scale = float(getattr(opt, "alg_b2b_cfg_scale", 1.0))
        self.clip_denoised = bool(getattr(opt, "alg_b2b_clip_denoised", False))
        self.conditional = (
            getattr(opt, "alg_diffusion_cond_image_creation", "y_t") != "y_t"
            or self.task == "pix2pix")

        from .modules.jit import JiT
        dtype = jnp.bfloat16 if getattr(opt, "tpu_bf16", True) else jnp.float32
        self.netG = JiT.from_opt(opt, dtype=dtype)

        cin = opt.model_output_nc + (1 if self.mask_as_channel else 0)
        if self.conditional:
            cin += opt.model_input_nc
        ex_x = jnp.zeros((1, size, size, cin), jnp.float32)
        ex_t = jnp.zeros((1,), jnp.float32)
        ex_y = jnp.zeros((1,), jnp.int32)
        tx = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
        self.txs["G_A"] = tx
        self.states["G_A"] = init_net_state(
            self.next_rng(), self.netG, (ex_x, ex_t, ex_y), tx,
            use_ema=self.use_ema)
        self._jit_step = None
        self._jit_sample = {}

    def set_input(self, batch):
        out = {"gt": batch["B"]}
        mask = batch.get("B_label_mask")
        if self.task == "inpainting" and mask is not None:
            out["mask"] = mask
        if self.conditional:
            out["y_cond"] = batch["A"]
        if self.num_classes > 1 and "B_label_cls" in batch:
            out["labels"] = np.asarray(batch["B_label_cls"], np.int32)
        return out

    def _apply(self, params, z_in, t, labels, mask_size):
        return self.netG.apply(params, z_in, t, y=labels, mask_size=mask_size)

    def _make_apply(self, mask=None):
        if not self.mask_as_channel:
            return self._apply
        mch = jnp.clip(mask.astype(jnp.float32), 0.0, 1.0) if mask is not None \
            else None

        def apply_fn(params, z_in, t, labels, mask_size):
            if mch is not None:
                z_in = jnp.concatenate([z_in, mch], axis=-1)
            else:
                z_in = jnp.concatenate(
                    [z_in, jnp.zeros(z_in.shape[:3] + (1,), z_in.dtype)], axis=-1)
            return self.netG.apply(params, z_in, t, y=labels,
                                   mask_size=mask_size)
        return apply_fn

    def _loss(self, v_pred, v_target, mask):
        if self.loss_kind == "L1":
            err = jnp.abs(v_pred - v_target)
        elif self.loss_kind == "pseudo_huber":
            err = pseudo_huber_loss(v_pred, v_target)
        elif self.loss_kind.startswith("multiscale"):
            from flax import linen as nn
            base = (jnp.abs if "L1" in self.loss_kind
                    else (lambda d: d ** 2))
            total, e = 0.0, (v_pred - v_target)
            for _ in range(3):
                total = total + jnp.mean(base(e))
                e = nn.avg_pool(e, (2, 2), strides=(2, 2))
            return total / 3.0
        else:
            err = (v_pred - v_target) ** 2
        if mask is not None and self.masked_only:
            m = jnp.clip(mask.astype(err.dtype), 0.0, 1.0)
            return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1], 1.0)
        return jnp.mean(err)

    def optimize_parameters(self, batch):
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        if self._jit_step is None:
            tx = self.txs["G_A"]

            def loss_fn(params, rng, gt, y_cond, mask, labels):
                apply_fn = self._make_apply(mask)
                v_pred, v_target = b2b_training_outputs(
                    apply_fn, params, rng, gt, y_cond=y_cond,
                    mask=(None if self.mask_as_channel else mask),
                    labels=labels, num_classes=self.num_classes,
                    noise_scale=self.noise_scale, P_mean=self.P_mean,
                    P_std=self.P_std, uniform_mix_prob=self.uniform_mix,
                    t_eps=self.t_eps, label_drop_prob=self.label_drop_prob)
                return self.lambda_G * self._loss(v_pred, v_target, mask)

            def step(state, rng, gt, y_cond, mask, labels):
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, rng, gt, y_cond, mask, labels)
                return apply_updates(state, grads, tx, self.ema_beta), \
                    {"G_tot": loss}

            self._jit_step = jax.jit(step, donate_argnums=(0,))
        self.states["G_A"], losses = self._jit_step(
            self.states["G_A"], self.next_rng(), dev["gt"],
            dev.get("y_cond"), dev.get("mask"), dev.get("labels"))
        self.loss_log = {k: float(v) for k, v in losses.items()}
        return self.loss_log

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
        key = (steps, cfg, dev["gt"].shape)
        if key not in self._jit_sample:
            def run(p, rng, y, y_cond, mask, labels):
                apply_fn = self._make_apply(mask)
                return b2b_sample(
                    apply_fn, p, rng, y, y_cond=y_cond,
                    mask=(None if self.mask_as_channel else mask),
                    labels=labels, num_classes=self.num_classes,
                    denoise_timesteps=steps, noise_scale=self.noise_scale,
                    t_eps=self.t_eps, cfg_scale=cfg,
                    clip_denoised=self.clip_denoised)
            self._jit_sample[key] = jax.jit(run)
        out = self._jit_sample[key](params, self.next_rng(), dev["gt"],
                                    dev.get("y_cond"), dev.get("mask"),
                                    dev.get("labels"))
        return np.asarray(jax.device_get(out))
