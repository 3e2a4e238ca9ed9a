"""MAT training algorithm (reference models/mat_model.py).

StyleGAN2-style training: non-saturating softplus GAN loss on both the
refined output and the coarse first stage, VGG-features perceptual loss
(pcp_ratio), L1 logged for monitoring (not in G_tot — reference
mat_model.py:813-827), lazy R1 regularization every ``alg_mat_r1_every``
steps, w-average tracking for truncation, and EMA with a kimg ramp
(reference ema_kimg/ema_rampup).

Masks: joliGEN label masks mark the OBJECT (region to regenerate); MAT
convention is 1 = keep. set_input inverts accordingly.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .train_state import apply_updates, init_net_state, make_optimizer
from .modules.mat import MATDiscriminator, MATGenerator


def softplus(x):
    return jnp.logaddexp(x, 0.0)


class MATModel(BaseModel):
    def __init__(self, opt, phase="train"):
        super().__init__(opt, phase)
        self.z_dim = int(getattr(opt, "alg_mat_z_dim", 512) or 512)
        self.w_dim = int(getattr(opt, "alg_mat_w_dim", 512) or 512)
        self.pcp_ratio = float(getattr(opt, "alg_mat_pcp_ratio", 0.1) or 0.1)
        self.r1_gamma = float(getattr(opt, "alg_mat_r1_gamma", 10.0) or 10.0)
        self.r1_every = int(getattr(opt, "alg_mat_d_reg_every", 16) or 16)
        self.truncation_psi = float(getattr(opt, "alg_mat_truncation_psi",
                                            1.0) or 1.0)
        self.ema_kimg = float(getattr(opt, "alg_mat_ema_kimg", 10.0) or 10.0)
        self.ema_rampup = float(getattr(opt, "alg_mat_ema_rampup", 0.05)
                                or 0.0)
        # StyleGAN noise injection modes (reference mat_model.py:736,795)
        self.noise_mode_train = (getattr(opt, "alg_mat_noise_mode_train",
                                         "random") or "random")
        self.noise_mode_eval = (getattr(opt, "alg_mat_noise_mode_eval",
                                        "const") or "const")
        self.mask_class_cond = bool(
            getattr(opt, "alg_mat_mask_class_conditioning", False))
        self.motion_keep_prob = float(
            getattr(opt, "alg_mat_motion_prob_use_previous_frames", 1.0)
            if getattr(opt, "alg_mat_motion_prob_use_previous_frames", None)
            is not None else 1.0)
        base = max(16, int(getattr(opt, "G_ngf", 64)))
        size = opt.data_crop_size
        cout = opt.model_output_nc
        self.motion = bool(getattr(opt, "alg_mat_motion", False))
        self.num_frames = int(getattr(opt, "data_temporal_number_frames", 1)
                              or 1)

        # bf16 compute with fp32 params/optimizer (same policy as
        # gan_networks._dtype); logits/losses return fp32
        self.compute_dtype = (jnp.bfloat16 if getattr(opt, "tpu_bf16", True)
                              else jnp.float32)
        self.netG = MATGenerator(
            dtype=self.compute_dtype,
            base=base, out_channels=cout,
            w_dim=self.w_dim, z_dim=self.z_dim,
            frames=(self.num_frames if self.motion else 1),
            motion_heads=int(getattr(
                opt, "alg_mat_motion_num_attention_heads", 4) or 4),
            motion_blocks=int(getattr(
                opt, "alg_mat_motion_num_transformer_blocks", 1) or 1),
            motion_max_frames=int(getattr(
                opt, "alg_mat_motion_max_frames", 25) or 25),
            mask_class=self.mask_class_cond,
            style_mixing_prob=float(getattr(
                opt, "alg_mat_style_mixing_prob", 0.0) or 0.0),
            stage1_dim=int(getattr(opt, "alg_mat_first_stage_dim", 180)
                           or 180))
        self.netD = MATDiscriminator(base=max(16, int(getattr(opt, "D_ndf",
                                                              64))),
                                     dtype=self.compute_dtype)

        if self.motion:
            ex_img = jnp.zeros((1, self.num_frames, size, size, cout),
                               jnp.float32)
            ex_mask = jnp.ones((1, self.num_frames, size, size, 1),
                               jnp.float32)
        else:
            ex_img = jnp.zeros((1, size, size, cout), jnp.float32)
            ex_mask = jnp.ones((1, size, size, 1), jnp.float32)
        ex_z = jnp.zeros((1, self.z_dim), jnp.float32)

        txG = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-3))
        tf_lr = float(getattr(opt, "alg_mat_transformer_lr", 0) or 0)
        if tf_lr > 0:
            # separate LR for transformer/motion params (reference
            # mat_model.py:378-402 param groups)
            import optax
            tx_tf = make_optimizer(opt, tf_lr)

            def label(params):
                def lab(path):
                    names = "/".join(str(k) for k in path).lower()
                    return ("tf" if ("tran" in names or "motion" in names
                                     or "attn" in names) else "base")
                from flax import traverse_util
                flat = traverse_util.flatten_dict(params)
                return traverse_util.unflatten_dict(
                    {k: lab(k) for k in flat})
            txG = optax.multi_transform({"base": txG, "tf": tx_tf}, label)
        txD = make_optimizer(opt, getattr(opt, "train_D_lr", 2e-3))
        self.txs = {"G_A": txG, "D": txD}
        ex_mc = (jnp.zeros_like(ex_mask) if self.mask_class_cond else None)
        self.states["G_A"] = init_net_state(
            self.next_rng(), self.netG, (ex_img, ex_mask, ex_z), txG,
            use_ema=True,
            init_kwargs={"rng": jax.random.PRNGKey(0),
                         "mask_class": ex_mc})
        ex_d = (jnp.zeros((1, size, size, cout), jnp.float32)
                if self.motion else ex_img)
        ex_dm = (jnp.ones((1, size, size, 1), jnp.float32)
                 if self.motion else ex_mask)
        self.states["D"] = init_net_state(
            self.next_rng(), self.netD, (ex_d, ex_dm, ex_d), txD)
        # perceptual net (fixed random VGG features; weight-gated parity)
        from ..utils.metrics import _VGGish
        self._vgg = _VGGish()
        self._vgg_params = self._vgg.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, size, size, 3), jnp.float32))
        # w-average for truncation (reference MappingNet w_avg buffer)
        self.w_avg = jnp.zeros((self.w_dim,), jnp.float32)
        self._jit_step = None
        self._jit_infer = {}

    # ------------------------------------------------------------------
    def set_input(self, batch):
        real = batch["B"]
        label_mask = batch.get("B_label_mask")
        if label_mask is None:
            label_mask = batch.get("A_label_mask")
        ids = np.asarray(label_mask, np.float32)
        m = np.clip(ids, 0.0, 1.0)
        mask_keep = 1.0 - m            # MAT: 1 = known pixel
        if np.asarray(real).ndim == 5 and mask_keep.shape[1] > 1:
            # motion finetune: only the LAST frame carries the hole; earlier
            # frames are conditioning (reference mat_model.py:575-583), and
            # alg_mat_motion_prob_use_previous_frames replaces that
            # conditioning with COPIES of the current frame/mask per
            # dropped sample (reference :439-482) so the generator sees an
            # inference-plausible static history, not blanks
            real = np.asarray(real).copy()
            ids = ids.copy()
            m = m.copy()
            mask_keep = mask_keep.copy()
            mask_keep[:, :-1] = 1.0
            if self.phase == "train" and self.motion_keep_prob < 1.0:
                drop = (np.random.rand(mask_keep.shape[0])
                        >= self.motion_keep_prob)
                n_hist = real.shape[1] - 1
                real[drop, :-1] = np.repeat(real[drop, -1:], n_hist, axis=1)
                ids[drop, :-1] = np.repeat(ids[drop, -1:], n_hist, axis=1)
                m[drop, :-1] = np.repeat(m[drop, -1:], n_hist, axis=1)
                mask_keep[drop, :-1] = np.repeat(
                    1.0 - m[drop, -1:], n_hist, axis=1)
        out = {"real": real, "mask": mask_keep}
        if self.mask_class_cond:
            # class ids inside the hole, 0 elsewhere (reference :585-620)
            out["mask_class"] = ids * m
        return out

    # ------------------------------------------------------------------
    def _pcp(self, a, b):
        """VGG-features perceptual distance (reference criterionMAT uses
        downloaded VGG weights; fixed-seed random VGG features here — see
        utils/metrics.LPIPS for the rationale)."""
        def run(x):
            if x.shape[-1] == 1:
                x = jnp.tile(x, (1, 1, 1, 3))
            return self._vgg.apply(self._vgg_params, x)
        fa, fb = run(a), run(b)
        d = 0.0
        for x, y in zip(fa, fb):
            d = d + jnp.mean((x - y) ** 2)
        return d / len(fa)

    def _ema_beta(self, step, batch):
        """EMA halflife ema_kimg kimg with warmup ramp (reference
        mat_model.py ema_kimg / ema_rampup=0.05)."""
        nimg = (step.astype(jnp.float32) + 1.0) * batch
        halflife = self.ema_kimg * 1000.0
        if self.ema_rampup > 0:
            halflife = jnp.minimum(halflife, nimg * self.ema_rampup)
        return 0.5 ** (batch / jnp.maximum(halflife, 1e-8))

    def _noise_rng(self, rng, mode):
        """StyleGAN noise-injection mode -> NoiseInject rng
        (reference mat_model.py:736,795: random | const | none)."""
        if mode == "none":
            return None
        if mode == "const":
            return jax.random.PRNGKey(0)
        return rng

    def _make_step(self, batch_size):
        txG, txD = self.txs["G_A"], self.txs["D"]

        def step(states, w_avg, rng, real, mask, mask_class):
            rngs = jax.random.split(rng, 4)
            z = jax.random.normal(rngs[0], (real.shape[0], self.z_dim))

            # ---- G update. Video (motion) mode generates ONLY the last
            # frame (reference _forward_motion / mat_model losses on the
            # current frame); history frames are conditioning, so every
            # loss and both D passes see the last frame alone.
            def last(a):
                return a[:, -1] if a.ndim == 5 else a

            def g_loss(pG):
                fake, stg1, w = self.netG.apply(
                    pG, real, mask, z,
                    rng=self._noise_rng(rngs[1], self.noise_mode_train),
                    mask_class=mask_class,
                    mix_rng=rngs[3],
                    return_stg1=True,
                    return_w=True)
                lg, lg1 = self.netD.apply(
                    jax.lax.stop_gradient(states["D"].params), last(fake),
                    last(mask), last(stg1))
                adv = jnp.mean(softplus(-lg))
                adv1 = jnp.mean(softplus(-lg1))
                pcp = self._pcp(last(fake), last(real)) * self.pcp_ratio
                l1 = jnp.mean(jnp.abs(last(fake) - last(real)))
                tot = adv + adv1 + pcp
                return tot, {"G_adv": adv, "G_adv_stg1": adv1, "G_pcp": pcp,
                             "G_l1": l1, "G_tot": tot,
                             "fake": fake, "stg1": stg1, "w": w}

            (gtot, aux), grads = jax.value_and_grad(g_loss, has_aux=True)(
                states["G_A"].params)
            states = dict(states)
            beta = self._ema_beta(states["G_A"].step, batch_size)
            states["G_A"] = apply_updates(states["G_A"], grads, txG, beta)
            fake = jax.lax.stop_gradient(aux.pop("fake"))
            stg1 = jax.lax.stop_gradient(aux.pop("stg1"))
            w = jax.lax.stop_gradient(aux.pop("w"))
            losses = aux

            # track w average (for truncation at inference)
            w_avg = w_avg * 0.995 + jnp.mean(w, axis=0) * 0.005

            # ---- D update (+ lazy R1)
            real_d = last(real)
            mask_d = last(mask)
            fake_d = last(fake)
            stg1_d = last(stg1)

            def d_loss(pD):
                lf, lf1 = self.netD.apply(pD, fake_d, mask_d, stg1_d)
                lr_, lr1 = self.netD.apply(pD, real_d, mask_d, real_d)
                main = (jnp.mean(softplus(lf)) + jnp.mean(softplus(-lr_))
                        + jnp.mean(softplus(lf1)) + jnp.mean(softplus(-lr1)))

                def r1():
                    def d_real(img):
                        a, b = self.netD.apply(pD, img, mask_d, img)
                        return jnp.sum(a) + jnp.sum(b)
                    g = jax.grad(d_real)(real_d)
                    pen = jnp.mean(jnp.sum(g ** 2, axis=(1, 2, 3)))
                    return pen * (self.r1_gamma / 2) * self.r1_every

                do_r1 = (states["D"].step % self.r1_every) == 0
                reg = jax.lax.cond(do_r1, r1, lambda: jnp.zeros(()))
                return main + reg, {"D_main": main, "D_r1": reg}

            (dtot, daux), dgrads = jax.value_and_grad(d_loss, has_aux=True)(
                states["D"].params)
            states["D"] = apply_updates(states["D"], dgrads, txD)
            losses.update(daux)
            losses["D_tot"] = dtot
            return states, w_avg, losses

        return jax.jit(step, donate_argnums=(0,))

    def prepare_batch(self, batch):
        return self.put_batch(self.set_input(batch))

    def optimize_prepared(self, dev):
        if self._jit_step is None:
            self._jit_step = self._make_step(dev["real"].shape[0])
        self.states, self.w_avg, losses = self._jit_step(
            self.states, self.w_avg, self.next_rng(), dev["real"],
            dev["mask"], dev.get("mask_class"))
        self.loss_log = losses  # device scalars, lazy host sync
        return self.loss_log

    def optimize_parameters(self, batch):
        return self.optimize_prepared(self.prepare_batch(batch))

    # ------------------------------------------------------------------
    def inference(self, batch, use_ema=True, truncation_psi=None, seed=None,
                  **kwargs):
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        psi = self.truncation_psi if truncation_psi is None else truncation_psi
        state = self.states["G_A"]
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        key = ("infer", dev["real"].shape, psi)
        if key not in self._jit_infer:
            def run(p, rng, real, mask, mask_class, w_avg):
                z = jax.random.normal(rng, (real.shape[0], self.z_dim))
                fake = self.netG.apply(
                    p, real, mask, z,
                    rng=self._noise_rng(rng, self.noise_mode_eval),
                    mask_class=mask_class,
                    truncation_psi=psi, w_avg=w_avg)
                return fake
            self._jit_infer[key] = jax.jit(run)
        rng = (jax.random.PRNGKey(seed) if seed is not None
               else self.next_rng())
        fake = self._jit_infer[key](self.replicated(params), rng,
                                    dev["real"], dev["mask"],
                                    dev.get("mask_class"), self.w_avg)
        return np.asarray(jax.device_get(fake))
