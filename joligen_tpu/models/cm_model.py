"""Consistency model training (iCT) + ECT finetune + CM-GAN hybrid.

Behavioral parity with reference models/cm_model.py and cm_gan_model.py:
pseudo-huber consistency loss with improved loss weighting, discretization
stage schedule driven by the host step counter, masked noising, few-step
sampling at the reference's (80, 24.4, 5.84, 0.9, 0.661) sigmas
(cm_model.py:521), optional adversarial D on the consistency output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .train_state import apply_updates, init_net_state, make_optimizer
from .modules.cm import (
    CMDenoiser,
    cm_sample,
    cm_training_outputs,
    ect_training_outputs,
    improved_timesteps_schedule,
    pseudo_huber_loss,
)
from .modules.cut_networks import gan_loss
from .modules.image_pool import ImagePool

SAMPLING_SIGMAS = (80.0, 24.4, 5.84, 0.9, 0.661)


class CMModel(BaseModel):
    def __init__(self, opt, phase="train"):
        super().__init__(opt, phase)
        self.task = getattr(opt, "alg_diffusion_task", "inpainting")
        self.ft_mode = getattr(opt, "alg_ddpm_ft_mode", "cm")
        self.is_ect = (self.ft_mode == "ect"
                       and getattr(opt, "alg_diffusion_ddpm_cm_ft", False))
        self.lambda_G = float(getattr(opt, "alg_diffusion_lambda_G", 1.0))
        # optional perceptual terms on the consistency output
        # (reference cm_model.py:61-82,241-255,377-401)
        self.perceptual = [x for x in (getattr(
            opt, "alg_cm_perceptual_loss", [""]) or [""]) if x]
        self.lambda_perceptual = float(
            getattr(opt, "alg_cm_lambda_perceptual", 1.0) or 1.0)
        self._perc_mean = getattr(opt, "alg_cm_dists_mean", None)
        self._perc_std = getattr(opt, "alg_cm_dists_std", None)
        self.use_ema = bool(getattr(opt, "train_G_ema", False))
        self.ema_beta = float(getattr(opt, "train_G_ema_beta", 0.999))
        self.total_steps = int(getattr(opt, "alg_cm_num_steps", 1000000))
        self.with_gan = opt.model_type == "cm_gan"
        self.gan_mode = getattr(opt, "train_gan_mode", "lsgan")
        # conditioning: y_t cond means pure generation from noise over masks
        self.conditional = (
            getattr(opt, "alg_diffusion_cond_image_creation", "y_t") != "y_t"
            or self.task == "pix2pix")

        size = opt.data_crop_size
        from .diffusion_networks import define_inner_G
        inner = define_inner_G(opt)
        self.netG = CMDenoiser(
            inner=inner, cond_embed_dim=opt.alg_diffusion_cond_embed_dim,
            ft_proj=getattr(opt, "alg_diffusion_ddpm_cm_ft", False),
            dtype=jnp.bfloat16 if getattr(opt, "tpu_bf16", True) else jnp.float32)

        ex_x = jnp.zeros((1, size, size, opt.model_output_nc), jnp.float32)
        ex_cond = ex_x if self.conditional else None
        ex_sig = jnp.ones((1,), jnp.float32)
        tx = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
        self.txs["G_A"] = tx
        self.states["G_A"] = init_net_state(
            self.next_rng(), self.netG, (ex_x, ex_sig),
            tx, use_ema=self.use_ema,
            init_kwargs={"x_cond": ex_cond, "train": True})

        if self.with_gan:
            from .gan_networks import define_D
            self.netDs = define_D(opt)
            for i, (name, netD) in enumerate(self.netDs.items()):
                txd = make_optimizer(opt, getattr(opt, "train_D_lr", 2e-4))
                self.txs[name] = txd
                self.states[name] = init_net_state(
                    jax.random.fold_in(self.next_rng(), i), netD, (ex_x,), txd)
            self.pool = ImagePool.create(
                int(getattr(opt, "train_pool_size", 50)),
                (size, size, opt.model_output_nc))

        self.step_count = 0          # host-side sample counter (iCT stage)
        self.ect_stage = 0
        self._jit_steps = {}         # keyed by discretization stage
        self._jit_sample = {}

    def set_input(self, batch):
        out = {"gt": batch["B"]}
        mask = batch.get("B_label_mask")
        if self.task == "inpainting" and mask is not None:
            out["mask"] = mask
        if self.conditional:
            cond = batch["A"]
            creation = getattr(self.opt, "alg_diffusion_cond_image_creation",
                               "y_t") or "y_t"
            if creation == "previous_frame" and np.asarray(
                    batch["B"]).ndim == 5:
                # cond frame k = gt frame k-1, blanked with prob 1-p
                # (reference cm_model.py:283-300)
                import numpy as _np
                prev = _np.concatenate(
                    [batch["B"][:, :1], batch["B"][:, :-1]], axis=1)
                p_use = float(getattr(
                    self.opt, "alg_diffusion_cond_prob_use_previous_frame",
                    0.5) or 0.0)
                if self.phase == "train" and p_use < 1.0:
                    drop = _np.random.rand(prev.shape[0],
                                           prev.shape[1]) >= p_use
                    prev = _np.where(drop[:, :, None, None, None],
                                     -_np.ones_like(prev), prev)
                cond = prev.reshape(_np.asarray(batch["A"]).shape)
            out["y_cond"] = cond
        return out

    def _apply(self, params, x, sigma, x_cond, train):
        return self.netG.apply(params, x, sigma, x_cond=x_cond, train=train)

    def _make_step(self, stage_key):
        tx = self.txs["G_A"]

        def loss_fn(params, rng, gt, y_cond, mask, d_params):
            if self.is_ect:
                pred, target, t, r = ect_training_outputs(
                    self._apply, params, rng, self.ect_stage, gt,
                    y_cond=y_cond, mask=mask)
                w = 1.0
            else:
                pred, target, w = cm_training_outputs(
                    self._apply, params, rng, self.step_count,
                    self.total_steps, gt, y_cond=y_cond, mask=mask)
            if mask is not None:
                m = jnp.clip(mask.astype(pred.dtype), 0.0, 1.0)
                pred_m, target_m = pred * m, target * m
            else:
                pred_m, target_m = pred, target
            loss = jnp.mean(pseudo_huber_loss(pred_m, target_m) * w)
            losses = {"G_tot": loss * self.lambda_G}
            if self.perceptual:
                gt_m = gt * m if mask is not None else gt
                terms = self.perceptual_terms(pred_m, gt_m, self.perceptual,
                                              self._perc_mean, self._perc_std)
                losses["G_perceptual"] = self.lambda_perceptual * sum(
                    terms.values())
            if self.with_gan:
                g_gan = 0.0
                for name, netD in self.netDs.items():
                    g_gan += gan_loss(netD.apply(d_params[name], pred), True,
                                      self.gan_mode)
                losses["G_GAN"] = g_gan
            total = sum(losses.values())
            return total, (losses, pred)

        def step(states, pool, rng, gt, y_cond, mask):
            rngs = jax.random.split(rng, 3)
            d_params = ({n: jax.lax.stop_gradient(states[n].params)
                         for n in self.netDs} if self.with_gan else None)
            (tot, (losses, pred)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(states["G_A"].params, rngs[0], gt,
                                       y_cond, mask, d_params)
            states = dict(states)
            states["G_A"] = apply_updates(states["G_A"], grads, tx,
                                          self.ema_beta)
            losses["G_tot"] = tot
            if self.with_gan:
                fake = jax.lax.stop_gradient(pred)
                pool, pooled = pool.query(rngs[1], fake)
                for name, netD in self.netDs.items():
                    def d_loss(p):
                        lr = gan_loss(netD.apply(p, gt), True, self.gan_mode)
                        lf = gan_loss(netD.apply(p, pooled), False,
                                      self.gan_mode)
                        return 0.5 * (lr + lf)
                    dl, dg = jax.value_and_grad(d_loss)(states[name].params)
                    states[name] = apply_updates(states[name], dg,
                                                 self.txs[name])
                    losses[f"D_{name}"] = dl
            return states, pool, losses

        return jax.jit(step, donate_argnums=(0, 1))

    def prepare_batch(self, batch):
        return self.put_batch(self.set_input(batch))

    def optimize_prepared(self, dev):
        b = dev["gt"].shape[0]
        # discretization stage only changes on doubling steps; key the jit
        # cache by it so array-size changes recompile exactly once per stage
        stage = (self.ect_stage if self.is_ect else
                 improved_timesteps_schedule(self.step_count, self.total_steps))
        if stage not in self._jit_steps:
            self._jit_steps[stage] = self._make_step(stage)
        pool = self.pool if self.with_gan else None
        states, pool, losses = self._jit_steps[stage](
            self.states, pool, self.next_rng(), dev["gt"],
            dev.get("y_cond"), dev.get("mask"))
        self.states = states
        if self.with_gan:
            self.pool = pool
        self.step_count += b
        if self.is_ect:
            # ECT stage doubles every 1000 ticks of 50k imgs (cm_model ECT
            # tick schedule); simplified host counter
            self.ect_stage = self.step_count // (1000 * 50)
        self.loss_log = losses  # device scalars, lazy host sync
        return self.loss_log

    def optimize_parameters(self, batch):
        return self.optimize_prepared(self.prepare_batch(batch))

    def inference(self, batch, use_ema=None, sigmas=SAMPLING_SIGMAS):
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        use_ema = self.use_ema if use_ema is None else use_ema
        state = self.states["G_A"]
        params = self.replicated(
            state.ema_params if (use_ema and state.ema_params is not None)
            else state.params)
        key = (tuple(sigmas), dev["gt"].shape)
        if key not in self._jit_sample:
            self._jit_sample[key] = jax.jit(
                lambda p, rng, y, y_cond, mask: cm_sample(
                    self._apply, p, rng, list(sigmas), y, y_cond=y_cond,
                    mask=mask))
        out = self._jit_sample[key](params, self.next_rng(), dev["gt"],
                                    dev.get("y_cond"), dev.get("mask"))
        return np.asarray(jax.device_get(out))
