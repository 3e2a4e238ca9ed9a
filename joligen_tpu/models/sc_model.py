"""Shortcut model trainer (reference models/sc_model.py): MSE between
predicted and target velocities; few-step Euler inference at the step counts
in alg_sc_denoise_timesteps."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .train_state import apply_updates, init_net_state, make_optimizer
from .modules.sc import SCDenoiser, sc_sample, sc_training_outputs


class SCModel(BaseModel):
    def __init__(self, opt, phase="train"):
        super().__init__(opt, phase)
        self.task = getattr(opt, "alg_diffusion_task", "inpainting")
        self.lambda_G = float(getattr(opt, "alg_diffusion_lambda_G", 1.0))
        # optional perceptual terms (reference sc_model.py:41-66,214-220)
        self.perceptual = [x for x in (getattr(
            opt, "alg_sc_perceptual_loss", [""]) or [""]) if x]
        self.lambda_perceptual = float(
            getattr(opt, "alg_sc_lambda_perceptual", 1.0) or 1.0)
        self._perc_mean = getattr(opt, "alg_sc_dists_mean", None)
        self._perc_std = getattr(opt, "alg_sc_dists_std", None)
        self.use_ema = bool(getattr(opt, "train_G_ema", False))
        self.ema_beta = float(getattr(opt, "train_G_ema_beta", 0.999))
        self.denoise_timesteps = [int(x) for x in
                                  (getattr(opt, "alg_sc_denoise_timesteps", [8])
                                   or [8])]
        self.conditional = (
            getattr(opt, "alg_diffusion_cond_image_creation", "y_t") != "y_t"
            or self.task == "pix2pix")

        size = opt.data_crop_size
        from .diffusion_networks import define_inner_G
        inner = define_inner_G(opt)
        self.netG = SCDenoiser(
            inner=inner, cond_embed_dim=opt.alg_diffusion_cond_embed_dim,
            dtype=jnp.bfloat16 if getattr(opt, "tpu_bf16", True) else jnp.float32)

        ex_x = jnp.zeros((1, size, size, opt.model_output_nc), jnp.float32)
        ex_t = jnp.zeros((1,), jnp.float32)
        ex_cond = ex_x if self.conditional else None
        tx = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
        self.txs["G_A"] = tx
        self.states["G_A"] = init_net_state(
            self.next_rng(), self.netG, (ex_x, ex_t, ex_t), tx,
            use_ema=self.use_ema, init_kwargs={"x_cond": ex_cond})
        self._jit_step = None
        self._jit_sample = {}

    def set_input(self, batch):
        out = {"gt": batch["B"]}
        mask = batch.get("B_label_mask")
        if self.task == "inpainting" and mask is not None:
            out["mask"] = mask
        if self.conditional:
            out["y_cond"] = batch["A"]
        return out

    def _apply(self, params, x, t, dt_base, x_cond):
        return self.netG.apply(params, x, t, dt_base, x_cond=x_cond)

    def prepare_batch(self, batch):
        return self.put_batch(self.set_input(batch))

    def optimize_prepared(self, dev):
        if self._jit_step is None:
            tx = self.txs["G_A"]

            def loss_fn(params, rng, gt, y_cond, mask):
                if self.perceptual:
                    v_pred, v_target, x_pred = sc_training_outputs(
                        self._apply, params, rng, gt, y_cond=y_cond,
                        mask=mask, return_x=True)
                else:
                    v_pred, v_target = sc_training_outputs(
                        self._apply, params, rng, gt, y_cond=y_cond,
                        mask=mask)
                loss = self.lambda_G * jnp.mean((v_pred - v_target) ** 2)
                aux = {}
                if self.perceptual:
                    terms = self.perceptual_terms(
                        x_pred, gt, self.perceptual, self._perc_mean,
                        self._perc_std)
                    perc = self.lambda_perceptual * sum(terms.values())
                    aux["G_perceptual"] = perc
                    loss = loss + perc
                return loss, aux

            def step(state, rng, gt, y_cond, mask):
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, rng, gt, y_cond,
                                           mask)
                return apply_updates(state, grads, tx, self.ema_beta), \
                    dict({"G_tot": loss}, **aux)

            self._jit_step = jax.jit(step, donate_argnums=(0,))
        self.states["G_A"], losses = self._jit_step(
            self.states["G_A"], self.next_rng(), dev["gt"],
            dev.get("y_cond"), dev.get("mask"))
        self.loss_log = losses  # device scalars, lazy host sync
        return self.loss_log

    def optimize_parameters(self, batch):
        return self.optimize_prepared(self.prepare_batch(batch))

    def inference(self, batch, use_ema=None, denoise_timesteps=None):
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        use_ema = self.use_ema if use_ema is None else use_ema
        steps = denoise_timesteps or self.denoise_timesteps[0]
        state = self.states["G_A"]
        params = self.replicated(
            state.ema_params if (use_ema and state.ema_params is not None)
            else state.params)
        key = (steps, dev["gt"].shape)
        if key not in self._jit_sample:
            self._jit_sample[key] = jax.jit(
                lambda p, rng, y, y_cond, mask: sc_sample(
                    self._apply, p, rng, y, y_cond=y_cond, mask=mask,
                    denoise_timesteps=steps))
        out = self._jit_sample[key](params, self.next_rng(), dev["gt"],
                                    dev.get("y_cond"), dev.get("mask"))
        return np.asarray(jax.device_get(out))
