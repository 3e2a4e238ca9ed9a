"""CUT / FastCUT contrastive unpaired translation.

Behavioral parity with reference models/cut_model.py: generator +
PatchSampleF projector with patchnce/monce/SRC_hDCE losses, identity NCE,
multi-discriminator GAN losses with a historical fake pool, and optional
semantic class/mask heads with their consistency losses
(base_model.py:1442-1540). The whole G+F / D / semantic update schedule is
a single jitted step; the fake pool is device-resident
(modules/image_pool.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .gan_networks import define_D, define_F, define_G
from .train_state import apply_updates, init_net_state, make_optimizer
from .modules.cut_networks import (
    gan_loss,
    monce_loss,
    patch_nce_loss,
    sample_patch_ids,
    src_hdce_loss,
)
from .modules.image_pool import ImagePool
from .modules.semantic_networks import define_C, define_f


def _softmax_ce(logits, labels, axis=-1):
    logp = jax.nn.log_softmax(logits, axis=axis)
    onehot = jax.nn.one_hot(labels, logits.shape[axis], axis=axis,
                            dtype=logits.dtype)
    return -jnp.sum(onehot * logp, axis=axis)


class CUTModel(BaseModel):
    def __init__(self, opt, phase="train"):
        super().__init__(opt, phase)
        self.gan_mode = getattr(opt, "train_gan_mode", "lsgan")
        self.lambda_gan = float(getattr(opt, "alg_gan_lambda", 1.0))
        self.lambda_nce = float(getattr(opt, "alg_cut_lambda_NCE", 1.0))
        self.lambda_src = float(getattr(opt, "alg_cut_lambda_SRC", 0.0))
        self.nce_idt = bool(getattr(opt, "alg_cut_nce_idt", True))
        self.nce_T = float(getattr(opt, "alg_cut_nce_T", 0.07))
        self.nce_loss = getattr(opt, "alg_cut_nce_loss", "monce")
        self.num_patches = int(getattr(opt, "alg_cut_num_patches", 256))
        self.include_all_neg = bool(getattr(
            opt, "alg_cut_nce_includes_all_negatives_from_minibatch", False))
        self.use_ema = bool(getattr(opt, "train_G_ema", False))
        self.ema_beta = float(getattr(opt, "train_G_ema_beta", 0.999))
        self.semantic_cls = bool(getattr(opt, "train_semantic_cls", False))
        self.semantic_mask = bool(getattr(opt, "train_semantic_mask", False))
        self.cls_lambda = float(getattr(opt, "train_sem_cls_lambda", 1.0))
        self.mask_lambda = float(getattr(opt, "train_sem_mask_lambda", 1.0))
        self.out_mask = bool(getattr(opt, "train_mask_out_mask", False))
        self.lambda_out_mask = float(getattr(opt, "train_mask_lambda_out_mask", 10.0))
        self.nce_layers = self._select_nce_layers(opt)

        # device-resident augmentation + APA (reference base_gan_model.py:82-90,
        # loss.py:199-232, util/diff_aug.py)
        self.diff_policy = getattr(opt, "dataaug_diff_aug_policy", "") or ""
        self.diff_prob = float(getattr(opt, "dataaug_diff_aug_proba", 0.5))
        self.apa = bool(getattr(opt, "dataaug_APA", False))
        self.apa_target = float(getattr(opt, "dataaug_APA_target", 0.6))
        self.apa_every = int(getattr(opt, "dataaug_APA_every", 4) or 4)
        self.apa_nimg = float(getattr(opt, "dataaug_APA_nimg", 50) or 50)
        self.d_noise = float(getattr(opt, "dataaug_D_noise", 0.0) or 0.0)
        self.apa_p = jnp.asarray(float(getattr(opt, "dataaug_APA_p", 0.0)))

        size = opt.data_crop_size
        self.netG = define_G(opt)
        self.netF = define_F(opt)
        self.netDs = define_D(opt)

        rngs = jax.random.split(self.next_rng(), 8)
        ex_img = jnp.zeros((1, size, size, opt.model_input_nc), jnp.float32)

        txG = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
        self.txs["G_A"] = txG
        self.states["G_A"] = init_net_state(rngs[0], self.netG, (ex_img,),
                                            txG, use_ema=self.use_ema)
        if "segformer" in (opt.G_netG or ""):
            from .modules.segformer import load_mit_backbone
            st = self.states["G_A"]
            self.states["G_A"] = st.replace(
                params=load_mit_backbone(st.params),
                ema_params=(load_mit_backbone(st.ema_params)
                            if st.ema_params is not None else None))

        # data-dependent F init (reference cut_model.py:505 data_dependent_initialize)
        feats = self.netG.apply(self.states["G_A"].params, ex_img,
                                extract_layer_ids=self.nce_layers)
        ex_ids = [jnp.zeros((min(self.num_patches, f.shape[1] * f.shape[2]),),
                            jnp.int32) for f in feats]
        txF = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
        self.txs["F"] = txF
        self.states["F"] = init_net_state(rngs[1], self.netF, (feats, ex_ids), txF)

        nf = int(getattr(opt, "data_temporal_number_frames", 2) or 2)
        ex_clip = jnp.zeros((1, nf, size, size, opt.model_input_nc),
                            jnp.float32)
        self.nclasses_fs = int(getattr(opt, "f_s_semantic_nclasses", 2) or 2)
        ex_onehot = jnp.zeros((1, size, size, self.nclasses_fs), jnp.float32)
        if any("mask" in n for n in self.netDs) and not self.semantic_mask:
            raise ValueError("D_netDs 'mask' requires --train_semantic_mask "
                             "(the gumbel mask D judges f_s predictions)")
        for i, (name, netD) in enumerate(self.netDs.items()):
            tx = make_optimizer(opt, getattr(opt, "train_D_lr", 2e-4))
            self.txs[name] = tx
            ex_d = (ex_clip if "temporal" in name
                    else ex_onehot if "mask" in name else ex_img)
            self.states[name] = init_net_state(rngs[2 + i], netD, (ex_d,), tx)
            if "projected" in name or "temporal" in name:
                from .modules.projected_d import load_efficientnet_trunk
                self.states[name] = self.states[name].replace(
                    params=load_efficientnet_trunk(self.states[name].params))
            if "vision_aided" in name:
                from ..utils.clip_vit import load_clip_ref_encoder
                self.states[name] = self.states[name].replace(
                    params=load_clip_ref_encoder(self.states[name].params))
            if "depth" in name:
                from ..utils.midas import load_midas_encoder_into_projected
                self.states[name] = self.states[name].replace(
                    params=load_midas_encoder_into_projected(
                        self.states[name].params))
            if "sam" in name and "mask" not in name:
                from .modules.vision_aided_d import load_sam_encoder
                self.states[name] = self.states[name].replace(
                    params=load_sam_encoder(self.states[name].params))

        if self.semantic_cls:
            self.netCLS = define_C(opt)
            tx = make_optimizer(opt, getattr(opt, "train_sem_lr_cls", 2e-4))
            self.txs["CLS"] = tx
            self.states["CLS"] = init_net_state(rngs[6], self.netCLS,
                                                (ex_img,), tx)
            template = getattr(opt, "train_sem_cls_template", "basic")
            if template and template != "basic" and \
                    getattr(opt, "train_sem_cls_pretrained", False):
                from .modules.semantic_networks import load_resnet_template
                self.states["CLS"] = self.states["CLS"].replace(
                    params=load_resnet_template(self.states["CLS"].params,
                                                template))
        self.fs_is_sam = (getattr(opt, "f_s_net", "") == "sam")
        if self.semantic_mask:
            self.netf_s = define_f(opt)
            if self.fs_is_sam:
                # frozen SAM: no-op optimizer, ported weights swapped in
                import optax
                from ..utils.sam import load_sam_params, sam_weights_path
                tx = optax.set_to_zero()
                self.txs["f_s"] = tx
                self.states["f_s"] = init_net_state(rngs[7], self.netf_s,
                                                    (ex_img,), tx)
                loaded, _ = load_sam_params(sam_weights_path())
                params = dict(self.states["f_s"].params)
                params["params"] = {"sam": loaded["params"]}
                self.states["f_s"] = self.states["f_s"].replace(params=params)
            else:
                tx = make_optimizer(opt,
                                    getattr(opt, "train_sem_lr_f_s", 2e-4))
                self.txs["f_s"] = tx
                self.states["f_s"] = init_net_state(rngs[7], self.netf_s,
                                                    (ex_img,), tx)
                if getattr(opt, "f_s_net", "") == "segformer":
                    from .modules.segformer import load_mit_backbone
                    self.states["f_s"] = self.states["f_s"].replace(
                        params=load_mit_backbone(self.states["f_s"].params))
                elif getattr(opt, "f_s_net", "") == "vgg":
                    from .modules.semantic_networks import \
                        load_vgg_fcn8s_trunk
                    self.states["f_s"] = self.states["f_s"].replace(
                        params=load_vgg_fcn8s_trunk(
                            self.states["f_s"].params))

        pool_size = int(getattr(opt, "train_pool_size", 50))
        self.pool = ImagePool.create(
            pool_size, (size, size, opt.model_output_nc))

        self._jit_step = None
        self._jit_infer = None

    @staticmethod
    def _select_nce_layers(opt):
        """Per-arch auto-selection (reference cut_model.py:205-226)."""
        netG = opt.G_netG
        if "segformer" in netG:
            return [0, 1, 2, 3]
        if "ittr" in netG:
            return list(range(opt.G_nblocks))
        if "unet" in netG or "uvit" in netG:
            return [opt.G_nblocks * i - 1
                    for i in range(1, len(opt.G_unet_mha_channel_mults) + 1)]
        return [int(i) for i in str(opt.alg_cut_nce_layers).split(",")]

    # ------------------------------------------------------------------
    def set_input(self, batch):
        out = {"real_A": batch["A"], "real_B": batch["B"]}
        if "A_label_cls" in batch:
            out["cls_A"] = np.asarray(batch["A_label_cls"], np.int32)
        if "A_label_mask" in batch:
            out["mask_A"] = batch["A_label_mask"]
        if self.fs_is_sam and "A_ref_bbox" in batch:
            out["ref_bbox_A"] = np.asarray(batch["A_ref_bbox"], np.float32)
        return out

    @property
    def _video(self):
        """GAN video mode: temporal datasets feed (B,F,H,W,C); the G runs
        per-frame and the temporal projected D judges whole clips
        (reference base_gan_model temporal fakes + temporal D)."""
        return "temporal" in self.netDs or any(
            "temporal" in n for n in self.netDs)

    @staticmethod
    def _fold(a):
        return a.reshape((-1,) + a.shape[2:]) if a is not None and \
            getattr(a, "ndim", 0) == 5 else a

    def _temporal_criterion(self, fake_clip):
        """MSE between consecutive generated frames (reference
        compute_temporal_criterion_loss, base_gan_model.py)."""
        return jnp.mean((fake_clip[:, 1:] - fake_clip[:, :-1]) ** 2)

    # ------------------------------------------------------------------
    def _nce(self, fq, fk, batch):
        if self.nce_loss == "patchnce":
            return jnp.mean(patch_nce_loss(
                fq, fk, self.nce_T, batch, self.include_all_neg)), 0.0
        if self.nce_loss == "monce":
            return jnp.mean(monce_loss(
                fq, fk, self.nce_T, batch, self.num_patches,
                self.include_all_neg)), 0.0
        hdce, src = src_hdce_loss(fq, fk, self.nce_T, batch,
                                  self.num_patches, self.include_all_neg)
        return jnp.mean(hdce), jnp.mean(src)

    def _nce_total(self, paramsG, paramsF, src_img, tgt_img, rng):
        """calculate_NCE_loss (reference cut_model.py:889-926)."""
        b = src_img.shape[0]
        feats_k = self.netG.apply(paramsG, src_img,
                                  extract_layer_ids=self.nce_layers)
        feats_q = self.netG.apply(paramsG, tgt_img,
                                  extract_layer_ids=self.nce_layers)
        ids = sample_patch_ids(rng, feats_k, self.num_patches)
        fq = self.netF.apply(paramsF, feats_q, ids)
        fk = self.netF.apply(paramsF, feats_k, ids)
        total, total_src = 0.0, 0.0
        for q, k in zip(fq, fk):
            l, s = self._nce(q, k, b)
            total += l
            total_src += s
        n = len(fq)
        return total / n, total_src / n

    def _compose_context(self, fake, real_src):
        """With online context pixels, the generator owns only the inner
        crop; the context margin is copied from the source image before the
        discriminator sees it (reference compute_fake_with_context,
        base_model.py:609-637)."""
        c = int(getattr(self.opt, "data_online_context_pixels", 0) or 0)
        if c <= 0:
            return fake
        inner = fake[:, c:-c, c:-c, :]
        return real_src.at[:, c:-c, c:-c, :].set(inner.astype(real_src.dtype))

    def compute_D_accuracy(self, batch):
        """Precision/recall/accuracy of each D on a batch (reference
        compute_D_accuracy_pred, base_gan_model.py:222-246)."""
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        fake = self.netG.apply(self.states["G_A"].params, dev["real_A"])
        out = {}
        for name, netD in self.netDs.items():
            pr = np.asarray(jax.device_get(
                netD.apply(self.states[name].params, dev["real_B"]))).ravel()
            pf = np.asarray(jax.device_get(
                netD.apply(self.states[name].params, fake))).ravel()
            tp = float((pr > 0.5).sum())
            fn = float((pr <= 0.5).sum())
            tn = float((pf <= 0.5).sum())
            fp = float((pf > 0.5).sum())
            eps = 1e-8
            out[f"{name}_prec_real"] = tp / (tp + fp + eps)
            out[f"{name}_rec_real"] = tp / (tp + fn + eps)
            out[f"{name}_acc"] = (tp + tn) / (tp + tn + fp + fn + eps)
        return out

    def _augment(self, rng, img):
        """diff-aug policy applied to D inputs in both G and D loss paths
        (reference base_gan_model.py:437-439)."""
        if not self.diff_policy:
            return img
        from ..ops.diff_aug import diff_augment
        return diff_augment(rng, img, self.diff_policy, self.diff_prob)

    def _g_loss(self, paramsG, paramsF, d_params, rng, inp):
        real_A5, real_B5 = inp["real_A"], inp["real_B"]
        video = getattr(real_A5, "ndim", 4) == 5
        real_A, real_B = self._fold(real_A5), self._fold(real_B5)
        fake_B = self.netG.apply(paramsG, real_A)
        fake_clip = (fake_B.reshape(real_A5.shape[:2] + fake_B.shape[1:])
                     if video else None)
        losses = {}
        rng, rng_aug = jax.random.split(rng)
        fake_for_D = self._augment(rng_aug,
                                   self._compose_context(fake_B, real_A))
        # GAN term over all discriminators (base_gan_model.py:463-503)
        g_gan = 0.0
        for name, netD in self.netDs.items():
            if "mask" in name:   # mask D trains D-side only
                continue         # (reference base_gan_model.py:467)
            d_in = (fake_clip if ("temporal" in name and fake_clip
                                  is not None) else fake_for_D)
            pred = netD.apply(d_params[name], d_in)
            if self.gan_mode == "projected":
                g_gan += -jnp.mean(pred)
            elif self.gan_mode == "wgangp":
                g_gan += -jnp.mean(pred)
            else:
                g_gan += gan_loss(pred, True, self.gan_mode)
        losses["G_GAN"] = g_gan * self.lambda_gan

        if fake_clip is not None and (getattr(self.opt,
                                              "train_temporal_criterion",
                                              False) or self._video):
            lam_t = float(getattr(self.opt,
                                  "train_temporal_criterion_lambda", 1.0)
                          or 1.0)
            losses["G_temporal"] = lam_t * self._temporal_criterion(fake_clip)

        rng_nce, rng_idt = jax.random.split(rng)
        nce, src = self._nce_total(paramsG, paramsF, real_A, fake_B, rng_nce)
        losses["G_NCE"] = nce * self.lambda_nce
        if self.lambda_src > 0:
            losses["G_SRC"] = src * self.lambda_src
        idt_B = None
        if self.nce_idt:
            idt_B = self.netG.apply(paramsG, real_B)
            nce_y, _ = self._nce_total(paramsG, paramsF, real_B, idt_B, rng_idt)
            losses["G_NCE_Y"] = nce_y * self.lambda_nce
            losses["G_NCE"] = (losses["G_NCE"] + losses["G_NCE_Y"]) * 0.5
            losses.pop("G_NCE_Y")

        if self.semantic_cls and "cls_A" in inp:
            logits = self.netCLS.apply(inp["_cls_params"], fake_B)
            losses["G_sem_cls"] = self.cls_lambda * jnp.mean(
                _softmax_ce(logits, inp["cls_A"]))
        if self.semantic_mask and "mask_A" in inp:
            logits = self.netf_s.apply(inp["_fs_params"], fake_B)
            losses["G_sem_mask"] = self.mask_lambda * jnp.mean(
                _softmax_ce(logits, inp["mask_A"][..., 0]))
            if self.out_mask:
                m = jnp.clip(self._fold(inp["mask_A"]).astype(fake_B.dtype),
                             0, 1)
                losses["G_out_mask"] = self.lambda_out_mask * jnp.mean(
                    jnp.abs(fake_B * (1 - m) - real_A * (1 - m)))

        total = sum(losses.values())
        return total, (losses, fake_B, idt_B, fake_clip)

    def _make_step(self):
        txG, txF = self.txs["G_A"], self.txs["F"]
        d_names = list(self.netDs.keys())

        def step(states, pool, apa_p, rng, inp):
            from ..parallel.mesh import dequantize_on_device
            inp = dict(inp)
            for key in ("real_A", "real_B"):
                inp[key] = dequantize_on_device(inp[key], "image")
            if "mask_A" in inp:
                inp["mask_A"] = dequantize_on_device(inp["mask_A"], "label")
            rngs = jax.random.split(rng, 8)
            d_params = {n: jax.lax.stop_gradient(states[n].params)
                        for n in d_names}
            inp = dict(inp)
            if self.semantic_cls:
                inp["_cls_params"] = jax.lax.stop_gradient(states["CLS"].params)
            if self.semantic_mask:
                inp["_fs_params"] = jax.lax.stop_gradient(states["f_s"].params)
                if self.fs_is_sam:
                    # f_s_net=sam: the GT label mask is SAM's prediction on
                    # real_A, prompted by the ref bbox (reference
                    # base_model.py:1522-1534)
                    logits = self.netf_s.apply(
                        inp["_fs_params"], inp["real_A"],
                        boxes=inp.get("ref_bbox_A"))
                    inp["mask_A"] = (logits[..., 1:2] > 0).astype(jnp.int32)

            # --- G + F group
            (gtot, (losses, fake_B, idt_B, fake_clip)), grads = \
                jax.value_and_grad(
                    lambda pG, pF: self._g_loss(pG, pF, d_params, rngs[0],
                                                inp),
                    argnums=(0, 1), has_aux=True)(
                        states["G_A"].params, states["F"].params)
            states = dict(states)
            states["G_A"] = apply_updates(states["G_A"], grads[0], txG,
                                          self.ema_beta)
            states["F"] = apply_updates(states["F"], grads[1], txF)
            losses["G_tot"] = gtot

            # --- fake pool (frame-level; video frames fold into it)
            fake_sg = jax.lax.stop_gradient(
                self._compose_context(fake_B, self._fold(inp["real_A"])))
            pool, pooled_fake = pool.query(rngs[1], fake_sg)

            # --- discriminators (compute_D_loss, base_gan_model.py:382-419)
            real_B5 = inp["real_B"]
            video = getattr(real_B5, "ndim", 4) == 5
            real_B = self._fold(real_B5)
            fake_clip_sg = (jax.lax.stop_gradient(fake_clip)
                            if fake_clip is not None else None)
            fake_in = pooled_fake
            real_in = real_B
            if self.d_noise > 0:  # dataaug_D_noise
                real_in = real_in + self.d_noise * jax.random.normal(
                    rngs[4], real_in.shape, real_in.dtype)
                fake_in = fake_in + self.d_noise * jax.random.normal(
                    rngs[5], fake_in.shape, fake_in.dtype)
            real_in = self._augment(rngs[2], real_in)
            fake_in = self._augment(rngs[3], fake_in)
            if self.apa:
                # adaptive pseudo augmentation: show past fakes as "real"
                # with adaptive probability p (reference loss.py:199-232)
                b = real_in.shape[0]
                pseudo = pool.get_random(rngs[6], b)
                use = (jax.random.uniform(rngs[7], (b,)) < apa_p)
                real_in = jnp.where(use[:, None, None, None], pseudo, real_in)
            apa_logits_real = None
            for n in d_names:
                netD = self.netDs[n]
                temporal = "temporal" in n and fake_clip_sg is not None
                if "mask" in n and self.semantic_mask and "mask_A" in inp:
                    # gumbel mask D: real = one-hot label mask, fake =
                    # gumbel-softmax of f_s(fake) (reference gumbel mask D)
                    fs_params = jax.lax.stop_gradient(states["f_s"].params)
                    logits = self.netf_s.apply(fs_params, fake_sg)
                    g_noise = -jnp.log(-jnp.log(jax.random.uniform(
                        jax.random.fold_in(rngs[6], hash(n) % 1000),
                        logits.shape, minval=1e-6, maxval=1.0 - 1e-6)))
                    d_fake = jax.nn.softmax((logits + g_noise) / 1.0, -1)
                    d_real = jax.nn.one_hot(
                        jnp.clip(self._fold(inp["mask_A"])[..., 0], 0,
                                 self.nclasses_fs - 1),
                        self.nclasses_fs, dtype=fake_sg.dtype)
                else:
                    d_real = real_B5 if temporal else real_in
                    d_fake = fake_clip_sg if temporal else fake_in

                def d_loss(p, d_real=d_real, d_fake=d_fake):
                    logits_real = netD.apply(p, d_real)
                    lr = gan_loss(logits_real, True, self.gan_mode)
                    lf = gan_loss(netD.apply(p, d_fake), False,
                                  self.gan_mode)
                    return 0.5 * (lr + lf), logits_real

                (dl, logits_real), dgrads = jax.value_and_grad(
                    d_loss, has_aux=True)(states[n].params)
                if apa_logits_real is None:
                    apa_logits_real = logits_real
                states[n] = apply_updates(states[n], dgrads, self.txs[n])
                losses[f"D_{n}"] = dl

            if self.apa and apa_logits_real is not None:
                # p adaptation from the D-real logit sign heuristic
                lam = jnp.mean(jnp.sign(apa_logits_real))
                adjust = jnp.sign(lam - self.apa_target)
                step_sz = (real_B.shape[0] * self.apa_every
                           / (self.apa_nimg * 1000.0))
                apa_p = jnp.clip(apa_p + adjust * step_sz, 0.0, 1.0)
                losses["APA_p"] = apa_p

            # --- semantic heads train on real data (base_model.py:1442-1520)
            if self.semantic_cls and "cls_A" in inp:
                def cls_loss(p):
                    logits = self.netCLS.apply(p, inp["real_A"])
                    return jnp.mean(_softmax_ce(logits, inp["cls_A"]))
                cl, cgrads = jax.value_and_grad(cls_loss)(states["CLS"].params)
                states["CLS"] = apply_updates(states["CLS"], cgrads,
                                              self.txs["CLS"])
                losses["CLS"] = cl
            if self.semantic_mask and "mask_A" in inp \
                    and not self.fs_is_sam:
                def fs_loss(p):
                    logits = self.netf_s.apply(p, inp["real_A"])
                    return jnp.mean(_softmax_ce(logits, inp["mask_A"][..., 0]))
                fl, fgrads = jax.value_and_grad(fs_loss)(states["f_s"].params)
                states["f_s"] = apply_updates(states["f_s"], fgrads,
                                              self.txs["f_s"])
                losses["f_s"] = fl

            return states, pool, apa_p, losses

        donate = (0, 1) if getattr(self.opt, "tpu_donate", True) else ()
        return jax.jit(step, donate_argnums=donate)

    def prepare_batch(self, batch):
        """Host work + upload, separable so train.py overlaps transfers
        with the previous step's compute."""
        from ..parallel.mesh import quantize_batch
        inp = self.set_input(batch)
        inp = quantize_batch(inp, float_keys=("real_A", "real_B"),
                             int_keys=("mask_A",))
        return self.put_batch(inp)

    def optimize_prepared(self, dev):
        if self._jit_step is None:
            self._jit_step = self._make_step()
        self.states, self.pool, self.apa_p, losses = self._jit_step(
            self.states, self.pool, self.apa_p, self.next_rng(), dev)
        self.loss_log = losses  # device scalars, lazy host sync
        return self.loss_log

    def optimize_parameters(self, batch):
        return self.optimize_prepared(self.prepare_batch(batch))

    # ------------------------------------------------------------------
    def inference(self, batch, use_ema=None):
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        use_ema = self.use_ema if use_ema is None else use_ema
        state = self.states["G_A"]
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        if self._jit_infer is None:
            self._jit_infer = jax.jit(lambda p, x: self.netG.apply(p, x))
        return np.asarray(jax.device_get(self._jit_infer(params, dev["real_A"])))
