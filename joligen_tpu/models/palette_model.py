"""Palette DDPM training algorithm.

Behavioral parity with reference models/palette_model.py: conditioned
inpainting/pix2pix/super-resolution diffusion with masked noise loss,
min-SNR weighting, classifier-free label dropout, EMA generator, and
DDPM/DDIM inference. The whole optimize step (q_sample -> UNet -> loss ->
grads -> adam -> EMA) is one jitted function; sampling chains are single
``lax.scan`` programs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedules import NoiseSchedule
from ..parallel.mesh import (batch_sharding, dequantize_on_device,
                             quantize_batch)
from .base import BaseModel
from .diffusion_networks import VIDEO_NETGS, define_G
from .train_state import apply_updates, init_net_state, make_optimizer
from .modules.palette_diffusion import (
    ddim_sample,
    ddpm_sample,
    masked_elementwise_loss,
    palette_training_outputs,
)


class PaletteModel(BaseModel):
    def __init__(self, opt, phase="train"):
        super().__init__(opt, phase)
        self.task = getattr(opt, "alg_diffusion_task", "inpainting")
        self.sampling_method = getattr(opt, "alg_palette_sampling_method", "ddpm")
        self.loss_kind = getattr(opt, "alg_palette_loss", "MSE")
        self.minsnr = bool(getattr(opt, "alg_palette_minsnr", False))
        self.dropout_prob = float(getattr(opt, "alg_diffusion_dropout_prob", 0.0) or 0.0)
        self.lambda_G = float(getattr(opt, "alg_diffusion_lambda_G", 1.0))
        self.ema_beta = float(getattr(opt, "train_G_ema_beta", 0.999))
        self.use_ema = bool(getattr(opt, "train_G_ema", False))
        self.conditioning = getattr(opt, "alg_diffusion_cond_embed", "") or ""
        self.autoregressive = bool(getattr(opt, "alg_palette_autoregressive",
                                           False))

        self.sched_train = NoiseSchedule.for_phase(opt, "train")
        self.sched_test = NoiseSchedule.for_phase(opt, "test")

        self.netG = define_G(opt)
        self.is_video = opt.G_netG in VIDEO_NETGS
        self.num_frames = int(getattr(opt, "data_temporal_number_frames", 1) or 1)
        size = opt.data_crop_size
        cin = opt.model_input_nc + opt.model_output_nc
        if self.is_video:
            ex_x = jnp.zeros((1, self.num_frames, size, size, cin), jnp.float32)
            ex_mask = jnp.zeros((1, self.num_frames, size, size, 1), jnp.int32)
        else:
            ex_x = jnp.zeros((1, size, size, cin), jnp.float32)
            ex_mask = jnp.zeros((1, size, size, 1), jnp.int32)
        ex_g = jnp.zeros((1,), jnp.float32)
        ex_cls = jnp.zeros((1,), jnp.int32)
        self.use_ref = ("ref" in self.conditioning
                        or opt.G_netG == "unet_mha_ref_attn")
        ex_ref = (jnp.zeros((1, size, size, opt.model_input_nc), jnp.float32)
                  if self.use_ref else None)

        tx = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
        self.txs["G_A"] = tx
        state = init_net_state(
            self.next_rng(), self.netG, (ex_x, ex_g),
            tx, use_ema=self.use_ema,
            init_kwargs={"cls": ex_cls, "mask": ex_mask, "ref": ex_ref})
        if getattr(self.netG, "ref_embed_net", "") == "clip":
            from ..utils.clip_vit import load_clip_ref_encoder
            state = state.replace(
                params=load_clip_ref_encoder(state.params),
                ema_params=(load_clip_ref_encoder(state.ema_params)
                            if state.ema_params is not None else None))
        elif getattr(self.netG, "ref_embed_net", "") == "imagebind":
            from ..utils.image_bind import load_imagebind_ref_encoder
            state = state.replace(
                params=load_imagebind_ref_encoder(state.params),
                ema_params=(load_imagebind_ref_encoder(state.ema_params)
                            if state.ema_params is not None else None))
        # params/opt-state shard over the fsdp axis, replicated over data —
        # done uniformly for all models by finalize_states (create_model)
        self.states["G_A"] = state

        self._jit_train_step = None
        self._jit_sample = {}

    # ------------------------------------------------------------------
    def set_input(self, batch):
        """Map a collated numpy batch to (y_cond, gt, mask, cls)
        (reference palette_model.py:287-556, image path)."""
        gt = batch["B"]
        cond = batch["A"]
        mask = batch.get("B_label_mask")
        cls = batch.get("B_label_cls")
        if self.task != "inpainting":
            mask = None
        if "class" not in self.conditioning:
            cls = None
        # video batches: (B,F,H,W,C). Non-video denoisers treat frames as
        # batch (reference rearrange_5dto4d, palette_model.py:471-510).
        if gt.ndim == 5 and not self.is_video:
            b, f = gt.shape[:2]
            gt = gt.reshape((b * f,) + gt.shape[2:])
            cond = cond.reshape((b * f,) + cond.shape[2:])
            if mask is not None:
                mask = mask.reshape((b * f,) + mask.shape[2:])
            if cls is not None:
                cls = np.repeat(np.asarray(cls), f)
        # conditioning-image creation modes (reference palette_model.py:
        # 375-556): y_t = dataset A (masked-noise copy); computed_sketch
        # fills the masked region with an edge map; low_res downsamples the
        # target for super-resolution; previous_frame shifts video frames.
        creation = getattr(self.opt, "alg_diffusion_cond_image_creation",
                           "y_t") or "y_t"
        EDGE_MODES = ("computed_sketch", "sketch", "canny", "depth", "hed",
                      "hough", "sam")
        if creation in EDGE_MODES and mask is not None:
            from ..utils.mask_generation import random_edge_mask
            if creation == "computed_sketch":   # randomized per-sample list
                fns = (getattr(self.opt,
                               "alg_diffusion_cond_computed_sketch_list",
                               None) or ["canny"])
            else:
                fns = [creation]
            rng_canny = getattr(self.opt,
                                "alg_diffusion_cond_sketch_canny_range",
                                [0, 765]) or [0, 765]
            flat_m = mask.reshape((-1,) + mask.shape[-3:])
            flat_g = gt.reshape((-1,) + gt.shape[-3:])
            canny_drop = getattr(self.opt, "alg_diffusion_vid_canny_dropout",
                                 [[]]) or [[]]
            drop_lo = (float(canny_drop[0][0])
                       if canny_drop and canny_drop[0] else 0.0)
            import random as _rnd
            sketches = []
            for g_i, m_i in zip(flat_g, flat_m):
                if drop_lo > 0.0 and _rnd.random() < drop_lo:
                    sketches.append(np.zeros_like(g_i))  # per-frame dropout
                    continue
                sketches.append(random_edge_mask(
                    fns, g_i, m_i, opt=self.opt,
                    low_threshold_random=int(min(rng_canny)),
                    high_threshold_random=int(max(rng_canny))))
            cond = np.stack(sketches).reshape(cond.shape)
        elif creation == "low_res":
            import cv2
            factor = max(2, int(getattr(self.opt,
                                        "alg_diffusion_super_resolution_scale",
                                        2) or 2))
            flat_g = gt.reshape((-1,) + gt.shape[-3:])
            lows = []
            for g_i in flat_g:
                small = cv2.resize(g_i, (g_i.shape[1] // factor,
                                         g_i.shape[0] // factor),
                                   interpolation=cv2.INTER_AREA)
                lows.append(cv2.resize(small, (g_i.shape[1], g_i.shape[0]),
                                       interpolation=cv2.INTER_CUBIC))
            cond = np.stack(lows).reshape(gt.shape).astype(np.float32)
            mask = None
        elif creation == "previous_frame" and gt.ndim >= 4 \
                and batch["B"].ndim == 5:
            # cond frame k = DOMAIN-A frame k-1 (reference
            # palette_model.py:293,413-428 conditions on the A stream, not
            # clean ground truth; first frame conditions on itself)
            src = np.asarray(batch["A"])
            prev = np.concatenate([src[:, :1], src[:, :-1]], axis=1)
            p_use = float(getattr(
                self.opt, "alg_diffusion_cond_prob_use_previous_frame", 0.5)
                or 0.0)
            if self.phase == "train" and p_use < 1.0:
                # classifier-free-style frame dropout: blank (-1) cond with
                # prob 1-p (reference palette_model.py:415-428)
                drop = np.random.rand(prev.shape[0], prev.shape[1]) >= p_use
                prev = np.where(drop[:, :, None, None, None],
                                -np.ones_like(prev), prev)
            cond = (prev.reshape(cond.shape) if not self.is_video
                    else prev)
        out = {"y_cond": cond, "gt": gt}
        if mask is not None:
            out["mask"] = mask
        if cls is not None:
            out["cls"] = cls.astype(np.int32)
        if self.use_ref and "ref_A" in batch:
            out["ref"] = batch["ref_A"]
        return out

    # ------------------------------------------------------------------
    def _loss_fn(self, params, rng, y_cond, gt, mask, cls, ref=None):
        # wire-compressed inputs decode on device (mesh.quantize_batch)
        y_cond = dequantize_on_device(y_cond, "image")
        gt = dequantize_on_device(gt, "image")
        mask = dequantize_on_device(mask, "label")
        ref = dequantize_on_device(ref, "image")
        rng, rng_ar = jax.random.split(rng)

        # autoregressive video training: with p=0.9 the first T//2 frames of
        # the conditioning become noisy GT context — one of 10 sigma buckets
        # up to 0.7 per sequence, noise only inside the mask
        # (reference palette_model.py:377-411)
        if self.autoregressive and self.is_video and y_cond.ndim == 5 \
                and (getattr(self.opt, "alg_diffusion_cond_image_creation",
                             "y_t") or "y_t") == "y_t":
            # reference palette_model.py:375-411 mixes noisy-GT context only
            # inside the y_t creation branch — never over sketches or
            # previous-frame conditioning
            B, T = y_cond.shape[:2]
            k = T // 2
            if k > 0:
                r1, r2, r3 = jax.random.split(rng_ar, 3)
                bucket = jax.random.randint(r1, (B,), 0, 10)
                sigma = (bucket.astype(jnp.float32) / 9.0 * 0.7).reshape(
                    B, 1, 1, 1, 1)
                eps = jax.random.normal(
                    r2, (B, 1) + y_cond.shape[2:], y_cond.dtype)
                m_ctx = (mask[:, :k] > 0.5).astype(y_cond.dtype)                     if mask is not None else 1.0
                noisy_ctx = gt[:, :k] + sigma * eps * m_ctx
                use = jax.random.uniform(r3, ()) < 0.9
                mixed = y_cond.at[:, :k].set(noisy_ctx)
                y_cond = jnp.where(use, mixed, y_cond)
        apply_fn = (lambda p, x, g, cls=None, mask=None, zero_gamma=False:
                    self.netG.apply(p, x, g, cls=cls, mask=mask, ref=ref,
                                    zero_gamma=zero_gamma))
        noise, noise_hat, weight = palette_training_outputs(
            apply_fn, params, rng, self.sched_train, gt, y_cond,
            mask=mask, cls=cls, dropout_prob=self.dropout_prob,
            minsnr=self.minsnr,
            null_class=max(
                getattr(self.opt, "f_s_semantic_nclasses", 2),
                getattr(self.opt, "cls_semantic_nclasses", 2)) - 1)
        if noise.ndim == 5:  # fold frames for the (spatial) loss pyramid
            fold = lambda a: (a.reshape((-1,) + a.shape[2:])
                              if a is not None and hasattr(a, "ndim")
                              and a.ndim == 5 else a)
            noise, noise_hat, mask = fold(noise), fold(noise_hat), fold(mask)
            if hasattr(weight, "ndim") and weight.ndim == 5:
                # (B,1,1,1,1) -> (B*F,1,1,1): one weight per sequence
                weight = jnp.repeat(weight[:, 0],
                                    noise.shape[0] // weight.shape[0], axis=0)
        loss = masked_elementwise_loss(noise, noise_hat, mask=mask,
                                       weight=weight, kind=self.loss_kind)
        return self.lambda_G * loss

    def _make_train_step(self):
        tx = self.txs["G_A"]
        bsh = batch_sharding(self.mesh)

        def step(state, rng, y_cond, gt, mask, cls, ref):
            loss, grads = jax.value_and_grad(self._loss_fn)(
                state.params, rng, y_cond, gt, mask, cls, ref)
            new_state = apply_updates(state, grads, tx, self.ema_beta)
            return new_state, {"G_tot": loss}

        donate = (0,) if getattr(self.opt, "tpu_donate", True) else ()
        return jax.jit(step, donate_argnums=donate)

    def prepare_batch(self, batch):
        """Host work + device upload, separable from the step so train.py
        can overlap the transfer of batch N+1 with the compute of batch N
        (the upload otherwise serializes with the device step)."""
        inp = self.set_input(batch)
        inp = quantize_batch(inp, float_keys=("y_cond", "gt", "ref"),
                             int_keys=("mask",))
        return self.put_batch(inp)

    def optimize_prepared(self, dev):
        if self._jit_train_step is None:
            self._jit_train_step = self._make_train_step()
        self.states["G_A"], losses = self._jit_train_step(
            self.states["G_A"], self.next_rng(),
            dev["y_cond"], dev["gt"], dev.get("mask"), dev.get("cls"),
            dev.get("ref"))
        # device scalars: the host sync happens only when a value is read
        # (print freq), not every step
        self.loss_log = losses
        return self.loss_log

    def optimize_parameters(self, batch):
        return self.optimize_prepared(self.prepare_batch(batch))

    # ------------------------------------------------------------------
    def inference(self, batch, use_ema=None, sampling_method=None,
                  num_steps=None, eta=None, guidance_scale=0.0,
                  output_uint8=False):
        """Sample fakes for a batch. Returns NHWC float32 in [-1,1], or
        uint8 when ``output_uint8`` (device-side encode — 4x less
        device->host traffic for serving paths that write PNGs anyway)."""
        inp = self.set_input(batch)
        inp = quantize_batch(inp, float_keys=("y_cond", "gt", "ref"),
                             int_keys=("mask",))
        dev = self.put_batch(inp)
        # test-time overrides (reference palette_model.py:628-646)
        method = (sampling_method
                  or getattr(self.opt, "alg_palette_sampling_method_test", "")
                  or self.sampling_method)
        steps_test = int(getattr(self.opt, "alg_palette_sampling_steps_test",
                                 0) or 0)
        steps = num_steps or (steps_test if steps_test > 0 else 0) or \
            getattr(self.opt, "alg_palette_ddim_num_steps", 10)
        eta = eta if eta is not None else getattr(self.opt, "alg_palette_ddim_eta", 0.5)
        use_ema = self.use_ema if use_ema is None else use_ema

        state = self.states["G_A"]
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        params = self.replicated(params)

        key = (method, steps, eta, guidance_scale, dev["y_cond"].shape,
               "ref" in dev, output_uint8)
        if key not in self._jit_sample:
            apply_fn = (lambda p, x, g, cls=None, mask=None, ref=None,
                        zero_gamma=False:
                        self.netG.apply(p, x, g, cls=cls, mask=mask, ref=ref,
                                        zero_gamma=zero_gamma))
            if method == "ddpm":
                fn = partial(ddpm_sample, apply_fn,
                             guidance_scale=guidance_scale,
                             out_channel=self.opt.model_output_nc)
            else:
                fn = partial(ddim_sample, apply_fn, num_steps=steps, eta=eta,
                             guidance_scale=guidance_scale,
                             out_channel=self.opt.model_output_nc)
            def run(p, rng, y_cond, y_0, mask, cls, ref, fn=fn):
                # wire-compressed inputs decode on device
                y_cond = dequantize_on_device(y_cond, "image")
                y_0 = dequantize_on_device(y_0, "image")
                mask = dequantize_on_device(mask, "label")
                ref = dequantize_on_device(ref, "image")
                out = fn(p, rng, self.sched_test, y_cond, y_0=y_0,
                         mask=mask, cls=cls, ref=ref)
                if output_uint8:
                    out = jnp.round((out + 1.0) * 127.5).clip(
                        0, 255).astype(jnp.uint8)
                return out

            self._jit_sample[key] = jax.jit(run)
        fake = self._jit_sample[key](
            params, self.next_rng(), dev["y_cond"], dev["gt"],
            dev.get("mask"), dev.get("cls"), dev.get("ref"))
        return np.asarray(jax.device_get(fake))

    def inference_per_class(self, batch, nb_classes=None, **kwargs):
        """One sampled output per semantic class: the mask/class labels are
        overridden with each class id in turn (reference palette_model.py:
        650-690, alg_diffusion_generate_per_class). Returns
        {class_id: (B,H,W,C)}."""
        nb_classes = nb_classes or max(
            getattr(self.opt, "f_s_semantic_nclasses", 2),
            getattr(self.opt, "cls_semantic_nclasses", 2)) - 1
        outs = {}
        for i in range(1, nb_classes + 1):
            b2 = dict(batch)
            if "class" in self.conditioning and "B_label_cls" in batch:
                b2["B_label_cls"] = np.full_like(
                    np.asarray(batch["B_label_cls"]), i)
            if "mask" in self.conditioning and "B_label_mask" in batch:
                m = np.clip(np.asarray(batch["B_label_mask"]), 0, 1) * i
                b2["B_label_mask"] = m.astype(np.int32)
            outs[i] = self.inference(b2, **kwargs)
        return outs
