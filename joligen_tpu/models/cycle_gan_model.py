"""CycleGAN (reference models/cycle_gan_model.py): G_A: A->B, G_B: B->A,
one discriminator set per domain, cycle-consistency + identity losses.
Both generator updates and both discriminator updates run in one jitted
step with device-resident fake pools."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .gan_networks import define_D, define_G
from .train_state import (apply_updates, init_net_state, scheme_from_opt,
                          make_optimizer)
from .modules.cut_networks import gan_loss
from .modules.image_pool import ImagePool


class CycleGANModel(BaseModel):
    def __init__(self, opt, phase="train"):
        super().__init__(opt, phase)
        self.gan_mode = getattr(opt, "train_gan_mode", "lsgan")
        self.lambda_A = float(getattr(opt, "alg_cyclegan_lambda_A", 10.0))
        self.lambda_B = float(getattr(opt, "alg_cyclegan_lambda_B", 10.0))
        self.lambda_idt = float(getattr(opt, "alg_cyclegan_lambda_identity", 0.5))
        self.rec_noise = float(getattr(opt, "alg_cyclegan_rec_noise", 0.0))
        self.use_ema = bool(getattr(opt, "train_G_ema", False))
        self.ema_beta = float(getattr(opt, "train_G_ema_beta", 0.999))
        # device-resident DiffAugment on D inputs (parity with CUT)
        self.diff_policy = getattr(opt, "dataaug_diff_aug_policy", "") or ""
        self.diff_prob = float(getattr(opt, "dataaug_diff_aug_proba", 0.5))
        self.d_noise = float(getattr(opt, "dataaug_D_noise", 0.0) or 0.0)
        # one-sided label smoothing (reference loss.py:277-280)
        self.d_label_smooth = (0.1 if getattr(opt, "dataaug_D_label_smooth",
                                              False) else 0.0)
        self.d_dropout = bool(getattr(opt, "D_dropout", False))

        size = opt.data_crop_size
        self.netG_A = define_G(opt)
        self.netG_B = define_G(opt)
        self.netDs_A = define_D(opt)   # judges fakes in domain A
        self.netDs_B = define_D(opt)   # judges fakes in domain B

        ex = jnp.zeros((1, size, size, opt.model_input_nc), jnp.float32)
        rngs = jax.random.split(self.next_rng(), 2 + len(self.netDs_A) * 2)
        for i, (name, net) in enumerate(
                [("G_A", self.netG_A), ("G_B", self.netG_B)]):
            tx = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
            self.txs[name] = tx
            self.states[name] = scheme_from_opt(
                init_net_state(rngs[i], net, (ex,), tx,
                               use_ema=self.use_ema), rngs[i], opt)
        self.d_names = []
        k = 2
        for dom, ds in (("A", self.netDs_A), ("B", self.netDs_B)):
            for name, netD in ds.items():
                sname = f"{name}_{dom}"
                tx = make_optimizer(opt, getattr(opt, "train_D_lr", 2e-4))
                self.txs[sname] = tx
                self.states[sname] = init_net_state(rngs[k], netD, (ex,), tx)
                if any(t in name for t in ("basic", "n_layers", "pixel",
                                           "mask")):
                    self.states[sname] = scheme_from_opt(
                        self.states[sname], rngs[k], opt)
                if "projected" in name or "temporal" in name:
                    from .modules.projected_d import load_efficientnet_trunk
                    self.states[sname] = self.states[sname].replace(
                        params=load_efficientnet_trunk(
                            self.states[sname].params))
                if "vision_aided" in name:
                    from ..utils.clip_vit import load_clip_ref_encoder
                    from ..utils.dinov2 import load_dino_into
                    self.states[sname] = self.states[sname].replace(
                        params=load_dino_into(load_clip_ref_encoder(
                            self.states[sname].params)))
                if "depth" in name:
                    from ..utils.midas import load_midas_encoder_into_projected
                    self.states[sname] = self.states[sname].replace(
                        params=load_midas_encoder_into_projected(
                            self.states[sname].params))
                if "sam" in name and "mask" not in name:
                    from .modules.vision_aided_d import load_sam_encoder
                    self.states[sname] = self.states[sname].replace(
                        params=load_sam_encoder(self.states[sname].params))
                self.d_names.append((sname, dom, name))
                k += 1

        # ---- ReCycleGAN next-frame regularization (reference
        # re_cycle_gan_semantic_mask_model.py — dead upstream, revived):
        # P_A/P_B predict frame N from the channel-stack of frames 0..N-2;
        # G gets recycle L1 terms G_B(P_B(fakes_B)) vs real_A_last (and the
        # mirror), gated on P accuracy over real sequences
        self.recycle = opt.model_type in ("re_cycle_gan",
                                          "re_cycle_gan_semantic_mask")
        if self.recycle:
            import copy
            self.nuplet = int(getattr(opt, "alg_re_nuplet_size", 3) or 3)
            self.p_threshold = float(
                getattr(opt, "alg_re_projection_threshold", 1.0) or 1.0)
            self.p_adversarial = bool(
                getattr(opt, "alg_re_adversarial_loss_p", False))
            popt = copy.copy(opt)
            popt.G_netG = (getattr(opt, "alg_re_netP", "unet_128")
                           or "unet_128")
            self.netP_A = define_G(popt)
            self.netP_B = define_G(popt)
            ex_stack = jnp.zeros(
                (1, size, size, (self.nuplet - 1) * opt.model_input_nc),
                jnp.float32)
            for pi, (pn, net) in enumerate((("P_A", self.netP_A),
                                            ("P_B", self.netP_B))):
                txP = make_optimizer(opt, float(
                    getattr(opt, "alg_re_P_lr", 2e-4) or 2e-4))
                self.txs[pn] = txP
                self.states[pn] = init_net_state(
                    jax.random.fold_in(rngs[1], 31 + pi), net,
                    (ex_stack,), txP)

        pool_size = int(getattr(opt, "train_pool_size", 50))
        shape = (size, size, opt.model_output_nc)
        self.pool_A = ImagePool.create(pool_size, shape)
        self.pool_B = ImagePool.create(pool_size, shape)
        self._jit_step = None
        self._jit_infer = None

    def set_input(self, batch):
        if getattr(self, "recycle", False):
            A = np.asarray(batch["A"])
            B = np.asarray(batch["B"])
            b, n = A.shape[:2]

            def fold(x):
                return x[:, :-1].reshape((b * (n - 1),) + x.shape[2:])

            return {"real_A": fold(A), "real_B": fold(B),
                    "real_A_last": A[:, -1], "real_B_last": B[:, -1],
                    "real_A_seq": A[:, :-1], "real_B_seq": B[:, :-1]}
        return {"real_A": batch["A"], "real_B": batch["B"]}

    def _d_apply(self, name, netD, params, x, rng):
        """PatchGAN Ds run live Dropout(0.5) when D_dropout (reference
        discriminators.py:58-101)."""
        if self.d_dropout and any(t in name for t in ("basic", "n_layers")):
            return netD.apply(params, x, deterministic=False,
                              rngs={"dropout": rng})
        return netD.apply(params, x)

    def _augment(self, rng, img):
        if not self.diff_policy:
            return img
        from ..ops.diff_aug import diff_augment
        return diff_augment(rng, img, self.diff_policy, self.diff_prob)

    def _g_loss(self, pA, pB, d_params, rng, inp):
        real_A, real_B = inp["real_A"], inp["real_B"]
        fake_B = self.netG_A.apply(pA, real_A)
        fake_A = self.netG_B.apply(pB, real_B)
        rec_in_B, rec_in_A = fake_B, fake_A
        if self.rec_noise > 0:
            r1, r2 = jax.random.split(rng)
            rec_in_B = fake_B + self.rec_noise * jax.random.normal(
                r1, fake_B.shape, fake_B.dtype)
            rec_in_A = fake_A + self.rec_noise * jax.random.normal(
                r2, fake_A.shape, fake_A.dtype)
        rec_A = self.netG_B.apply(pB, rec_in_B)
        rec_B = self.netG_A.apply(pA, rec_in_A)

        losses = {}
        g_gan = 0.0
        for di, (sname, dom, dname) in enumerate(self.d_names):
            netD = (self.netDs_B if dom == "B" else self.netDs_A)[dname]
            fake = fake_B if dom == "B" else fake_A
            pred = self._d_apply(dname, netD, d_params[sname], fake,
                                 jax.random.fold_in(rng, 400 + di))
            g_gan += gan_loss(pred, True, self.gan_mode,
                              smooth=self.d_label_smooth)
        losses["G_GAN"] = g_gan
        losses["G_cycle_A"] = self.lambda_A * jnp.mean(jnp.abs(rec_A - real_A))
        losses["G_cycle_B"] = self.lambda_B * jnp.mean(jnp.abs(rec_B - real_B))
        if self.lambda_idt > 0:
            idt_A = self.netG_A.apply(pA, real_B)
            idt_B = self.netG_B.apply(pB, real_A)
            losses["G_idt_A"] = (self.lambda_B * self.lambda_idt
                                 * jnp.mean(jnp.abs(idt_A - real_B)))
            losses["G_idt_B"] = (self.lambda_A * self.lambda_idt
                                 * jnp.mean(jnp.abs(idt_B - real_A)))
        if getattr(self, "recycle", False) and "_pA_params" in inp:
            # recycle losses (reference re_cycle_gan...py:125-175)
            n1 = self.nuplet - 1
            bn = fake_B.shape[0] // n1

            def stack(x):
                seq = x.reshape((bn, n1) + x.shape[1:])
                return jnp.concatenate([seq[:, i] for i in range(n1)],
                                       axis=-1)

            proj_fake_B = self.netP_B.apply(inp["_pB_params"], stack(fake_B))
            proj_fake_A = self.netP_A.apply(inp["_pA_params"], stack(fake_A))
            rec_proj_A = self.netG_B.apply(pB, proj_fake_B)
            rec_proj_B = self.netG_A.apply(pA, proj_fake_A)
            gate = inp.get("_p_gate", 1.0)
            losses["G_recycle_A"] = gate * self.lambda_A * jnp.mean(
                jnp.abs(rec_proj_A - inp["real_A_last"]))
            losses["G_recycle_B"] = gate * self.lambda_B * jnp.mean(
                jnp.abs(rec_proj_B - inp["real_B_last"]))
            if self.p_adversarial:
                adv = 0.0
                for sname, dom, dname in self.d_names:
                    netD = (self.netDs_B if dom == "B"
                            else self.netDs_A)[dname]
                    proj = proj_fake_B if dom == "B" else proj_fake_A
                    adv += gan_loss(netD.apply(d_params[sname], proj), True,
                                    self.gan_mode)
                losses["G_proj_adversarial"] = gate * adv
        total = sum(losses.values())
        return total, (losses, fake_A, fake_B)

    def _make_step(self):
        def step(states, pools, rng, inp):
            from ..parallel.mesh import dequantize_on_device
            inp = {k: dequantize_on_device(v, "image")
                   for k, v in inp.items()}
            pool_A, pool_B = pools
            rngs = jax.random.split(rng, 8)
            d_params = {s: jax.lax.stop_gradient(states[s].params)
                        for s, _, _ in self.d_names}
            states = dict(states)
            losses_p = {}
            if getattr(self, "recycle", False) and "real_A_seq" in inp:
                n1 = self.nuplet - 1

                def pstack(x):
                    return jnp.concatenate([x[:, i] for i in range(n1)],
                                           axis=-1)

                def pA_loss(p):
                    return self.lambda_A * jnp.mean(jnp.abs(
                        self.netP_A.apply(p, pstack(inp["real_A_seq"]))
                        - inp["real_A_last"]))

                def pB_loss(p):
                    return self.lambda_B * jnp.mean(jnp.abs(
                        self.netP_B.apply(p, pstack(inp["real_B_seq"]))
                        - inp["real_B_last"]))

                pa, pag = jax.value_and_grad(pA_loss)(states["P_A"].params)
                pb, pbg = jax.value_and_grad(pB_loss)(states["P_B"].params)
                states["P_A"] = apply_updates(states["P_A"], pag,
                                              self.txs["P_A"])
                states["P_B"] = apply_updates(states["P_B"], pbg,
                                              self.txs["P_B"])
                losses_p = {"P_proj_real_A": pa, "P_proj_real_B": pb}
                inp["_pA_params"] = jax.lax.stop_gradient(
                    states["P_A"].params)
                inp["_pB_params"] = jax.lax.stop_gradient(
                    states["P_B"].params)
                inp["_p_gate"] = ((pa + pb) / 2.0
                                  <= self.p_threshold).astype(jnp.float32)

            (gtot, (losses, fake_A, fake_B)), grads = jax.value_and_grad(
                lambda a, b: self._g_loss(a, b, d_params, rngs[0], inp),
                argnums=(0, 1), has_aux=True)(
                    states["G_A"].params, states["G_B"].params)
            states = dict(states)
            states["G_A"] = apply_updates(states["G_A"], grads[0],
                                          self.txs["G_A"], self.ema_beta)
            states["G_B"] = apply_updates(states["G_B"], grads[1],
                                          self.txs["G_B"], self.ema_beta)
            losses["G_tot"] = gtot
            losses.update(losses_p)

            pool_A, pooled_A = pool_A.query(rngs[1], jax.lax.stop_gradient(fake_A))
            pool_B, pooled_B = pool_B.query(rngs[2], jax.lax.stop_gradient(fake_B))

            for di, (sname, dom, dname) in enumerate(self.d_names):
                netD = (self.netDs_B if dom == "B" else self.netDs_A)[dname]
                real = inp["real_B"] if dom == "B" else inp["real_A"]
                pooled = pooled_B if dom == "B" else pooled_A
                if self.d_noise > 0:
                    nr = jax.random.fold_in(rngs[3], di)
                    real = real + self.d_noise * jax.random.normal(
                        nr, real.shape, real.dtype)
                real = self._augment(jax.random.fold_in(rngs[4], di), real)
                pooled_aug = self._augment(jax.random.fold_in(rngs[5], di),
                                           pooled)

                def d_loss(p, real=real, pooled=pooled_aug, di=di,
                           dname=dname, netD=netD):
                    kr = jax.random.fold_in(rngs[6], 2 * di)
                    kf = jax.random.fold_in(rngs[6], 2 * di + 1)
                    lr = gan_loss(self._d_apply(dname, netD, p, real, kr),
                                  True, self.gan_mode,
                                  smooth=self.d_label_smooth)
                    lf = gan_loss(self._d_apply(dname, netD, p, pooled, kf),
                                  False, self.gan_mode)
                    return 0.5 * (lr + lf)

                dl, dgrads = jax.value_and_grad(d_loss)(states[sname].params)
                states[sname] = apply_updates(states[sname], dgrads,
                                              self.txs[sname])
                losses[f"D_{sname}"] = dl
            return states, (pool_A, pool_B), losses

        donate = (0, 1) if getattr(self.opt, "tpu_donate", True) else ()
        return jax.jit(step, donate_argnums=donate)

    def prepare_batch(self, batch):
        from ..parallel.mesh import quantize_batch
        inp = self.set_input(batch)
        inp = quantize_batch(inp, float_keys=("real_A", "real_B"))
        return self.put_batch(inp)

    def optimize_prepared(self, dev):
        if self._jit_step is None:
            self._jit_step = self._make_step()
        self.states, (self.pool_A, self.pool_B), losses = self._jit_step(
            self.states, (self.pool_A, self.pool_B), self.next_rng(), dev)
        self.loss_log = losses  # device scalars, lazy host sync
        return self.loss_log

    def optimize_parameters(self, batch):
        return self.optimize_prepared(self.prepare_batch(batch))

    def inference(self, batch, use_ema=None, direction="AtoB"):
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        use_ema = self.use_ema if use_ema is None else use_ema
        name = "G_A" if direction == "AtoB" else "G_B"
        net = self.netG_A if direction == "AtoB" else self.netG_B
        state = self.states[name]
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        x = dev["real_A"] if direction == "AtoB" else dev["real_B"]
        return np.asarray(jax.device_get(
            jax.jit(net.apply)(self.replicated(params), x)))
