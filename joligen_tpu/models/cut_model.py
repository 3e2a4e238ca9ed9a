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


import zlib

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .gan_networks import define_D, define_F, define_G
from .train_state import (apply_updates, init_net_state,
                          make_optimizer, scheme_from_opt)
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
        # semantic-family controls (reference base_model.py:240-340,
        # base_gan_model.py:656-810)
        self.sem_idt = bool(getattr(opt, "train_sem_idt", False))
        self.mask_for_removal = bool(
            getattr(opt, "train_mask_for_removal", False))
        self.sem_net_output = bool(getattr(opt, "train_sem_net_output", False))
        self.fs_threshold = float(
            getattr(opt, "f_s_semantic_threshold", 1.0) or 1.0)
        self.cls_threshold = float(
            getattr(opt, "cls_semantic_threshold", 1.0) or 1.0)
        self.mask_f_s_B = bool(getattr(opt, "train_mask_f_s_B", False))
        self.no_train_f_s_A = bool(
            getattr(opt, "train_mask_no_train_f_s_A", False))
        self.disjoint_f_s = bool(
            getattr(opt, "train_mask_disjoint_f_s", False))
        if self.disjoint_f_s:   # reference base_model.py:304 forces B training
            self.mask_f_s_B = True
        self.cls_regression = bool(getattr(opt, "train_cls_regression", False))
        self.cls_l1_regression = bool(
            getattr(opt, "train_cls_l1_regression", False))
        self.sem_cls_B = bool(getattr(opt, "train_sem_cls_B", False))
        self.fs_weights = [float(w) for w in
                           (getattr(opt, "f_s_class_weights", []) or [])]
        self.cls_weights = [float(w) for w in
                            (getattr(opt, "cls_class_weights", []) or [])]
        self.out_mask_loss = (getattr(opt, "train_mask_loss_out_mask", "L1")
                              or "L1")
        self.charbonnier_eps = float(
            getattr(opt, "train_mask_charbonnier_eps", 1e-6) or 1e-6)
        self.nce_layers = self._select_nce_layers(opt)

        # supervised loss with aligned data (reference cut_model.py:141-155,
        # 779-833): pixel L1/MSE plus LPIPS/DISTS perceptual terms on
        # (fake_B, real_B)
        self.mse_idt = bool(getattr(opt, "alg_cut_MSE_idt", False))
        self.lambda_mse_idt = float(
            getattr(opt, "alg_cut_lambda_MSE_idt", 1.0) or 1.0)
        self.hdce_gamma = float(getattr(opt, "alg_cut_HDCE_gamma", 50) or 50)
        # FastCUT flip-equivariance (reference cut_model.py:133-138,619-624)
        self.flip_equivariance = bool(
            getattr(opt, "alg_cut_flip_equivariance", False))
        # one-sided label smoothing: real target 0.9 (reference loss.py:277-280)
        self.d_label_smooth = (0.1 if getattr(opt, "dataaug_D_label_smooth",
                                              False) else 0.0)
        # contrastive D objective (reference loss.py:334-394)
        self.contrastive_d = bool(
            getattr(opt, "train_use_contrastive_loss_D", False))
        # D_dropout: PatchGAN Ds run with active Dropout(0.5) during
        # training (reference discriminators.py:58-101)
        self.d_dropout = bool(getattr(opt, "D_dropout", False))
        # temporal D cadence (reference base_gan_model.py:388,469,580:
        # the expensive temporal D only computes every D_temporal_every
        # iterations, on both the D and G sides)
        self.d_temporal_every = int(getattr(opt, "D_temporal_every", 4) or 1)
        self.supervised = [s for s in (getattr(
            opt, "alg_cut_supervised_loss", [""]) or [""]) if s]
        self.lambda_supervised = float(
            getattr(opt, "alg_cut_lambda_supervised", 1.0) or 1.0)
        self.lambda_perceptual = float(
            getattr(opt, "alg_cut_lambda_perceptual", 1.0) or 1.0)
        self._perc_feats = None

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
        # adaptive diffusion-noise D augmentation (reference loss.py:315-331 +
        # projected_d/diffusion.py): intensity p adapts on the D real loss
        self.d_diffusion = bool(getattr(opt, "dataaug_D_diffusion", False))
        self.d_diffusion_every = int(
            getattr(opt, "dataaug_D_diffusion_every", 4) or 4)
        self.d_diff_p = jnp.asarray(0.0)

        size = opt.data_crop_size
        self.netG = define_G(opt)
        self.netF = define_F(opt)
        self.netDs = define_D(opt)

        rngs = jax.random.split(self.next_rng(), 8)
        ex_img = jnp.zeros((1, size, size, opt.model_input_nc), jnp.float32)

        # pix2pix-lineage weight init for every GAN net (reference
        # gan_networks.py init_net with model_init_type/model_init_gain;
        # frozen trunks are re-loaded afterwards so only heads keep it)
        def scheme(state, key):
            return scheme_from_opt(state, key, opt)

        txG = make_optimizer(opt, getattr(opt, "train_G_lr", 2e-4))
        self.txs["G_A"] = txG
        self.states["G_A"] = scheme(
            init_net_state(rngs[0], self.netG, (ex_img,), txG,
                           use_ema=self.use_ema), rngs[0])
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
        self.states["F"] = scheme(
            init_net_state(rngs[1], self.netF, (feats, ex_ids), txF), rngs[1])

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
            if any(t in name for t in ("basic", "n_layers", "pixel", "mask")):
                # only the PatchGAN-family Ds get init_net in the reference
                # (gan_networks.py:366-443); frozen-trunk Ds are excluded
                self.states[name] = scheme(self.states[name], rngs[2 + i])
            if "projected" in name or "temporal" in name:
                if getattr(opt, "D_proj_network_type",
                           "efficientnet") == "segformer" \
                        and "temporal" not in name:
                    from .modules.segformer import load_mit_backbone
                    self.states[name] = self.states[name].replace(
                        params=load_mit_backbone(
                            self.states[name].params,
                            node_name="feature_network"))
                else:
                    from .modules.projected_d import load_efficientnet_trunk
                    self.states[name] = self.states[name].replace(
                        params=load_efficientnet_trunk(
                            self.states[name].params))
            if "vision_aided" in name:
                from ..utils.clip_vit import load_clip_ref_encoder
                from ..utils.dinov2 import load_dino_into
                self.states[name] = self.states[name].replace(
                    params=load_dino_into(load_clip_ref_encoder(
                        self.states[name].params)))
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
                if self.disjoint_f_s:
                    # two segmenters: f_s (domain A) + f_s_B (domain B)
                    # (reference base_model.py:301-310)
                    self.txs["f_s_B"] = tx
                    self.states["f_s_B"] = init_net_state(
                        jax.random.fold_in(rngs[7], 1), self.netf_s,
                        (ex_img,), tx)

        # ---- ReCUT next-frame-prediction regularization (reference
        # re_cut_semantic_mask_model.py — DEAD upstream: it imports a
        # deleted module and is hidden by the registry; revived here).
        # P_B predicts frame N from the channel-stack of frames 0..N-2;
        # G gets an extra NCE(real_A_last, P(fake frames)) term gated on
        # P's real-sequence accuracy (alg_re_projection_threshold).
        self.recut = opt.model_type in ("re_cut", "re_cut_semantic_mask")
        if self.recut:
            import copy
            self.nuplet = int(getattr(opt, "alg_re_nuplet_size", 3) or 3)
            self.p_threshold = float(
                getattr(opt, "alg_re_projection_threshold", 1.0) or 1.0)
            self.p_adversarial = bool(
                getattr(opt, "alg_re_adversarial_loss_p", False))
            popt = copy.copy(opt)
            popt.G_netG = (getattr(opt, "alg_re_netP", "unet_128")
                           or "unet_128")
            self.netP = define_G(popt)
            ex_stack = jnp.zeros(
                (1, size, size, (self.nuplet - 1) * opt.model_input_nc),
                jnp.float32)
            txP = make_optimizer(opt, float(getattr(opt, "alg_re_P_lr", 2e-4)
                                            or 2e-4))
            self.txs["P_B"] = txP
            self.states["P_B"] = scheme(
                init_net_state(jax.random.fold_in(rngs[1], 5), self.netP,
                               (ex_stack,), txP),
                jax.random.fold_in(rngs[1], 5))

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
        if getattr(self, "recut", False):
            return self._set_input_recut(batch)
        out = {"real_A": batch["A"], "real_B": batch["B"]}
        if "A_label_cls" in batch:
            out["cls_A"] = np.asarray(batch["A_label_cls"], np.int32)
        if "A_label_mask" in batch:
            out["mask_A"] = batch["A_label_mask"]
        if "B_label_mask" in batch and (self.mask_f_s_B or self.sem_idt):
            out["mask_B"] = batch["B_label_mask"]
        if "B_label_cls" in batch and (self.sem_cls_B or self.sem_idt):
            out["cls_B"] = np.asarray(batch["B_label_cls"], np.int32)
        if self.fs_is_sam and "A_ref_bbox" in batch:
            out["ref_bbox_A"] = np.asarray(batch["A_ref_bbox"], np.float32)
        return out

    def _set_input_recut(self, batch):
        """Nuplet batches (B, N, H, W, C): frames 0..N-2 fold into the
        batch for the CUT losses; frame N-1 is the prediction target
        (reference re_cut_semantic_mask_model.py:95-112)."""
        A = np.asarray(batch["A"])
        B = np.asarray(batch["B"])
        b, n = A.shape[:2]

        def fold(x):
            return x[:, :-1].reshape((b * (n - 1),) + x.shape[2:])

        out = {"real_A": fold(A), "real_B": fold(B),
               "real_A_last": A[:, -1], "real_B_last": B[:, -1],
               "real_B_seq": B[:, :-1]}
        if "A_label_mask" in batch:
            m = np.asarray(batch["A_label_mask"])
            out["mask_A"] = fold(m)
        if "B_label_mask" in batch and (self.mask_f_s_B or self.sem_idt):
            out["mask_B"] = fold(np.asarray(batch["B_label_mask"]))
        return out

    @property
    def _video(self):
        """GAN video mode: temporal datasets feed (B,F,H,W,C); the G runs
        per-frame and the temporal projected D judges whole clips
        (reference base_gan_model temporal fakes + temporal D)."""
        return "temporal" in self.netDs or any(
            "temporal" in n for n in self.netDs)

    def _d_apply(self, name, netD, params, x, rng):
        """Apply a D; PatchGAN Ds get live dropout when D_dropout."""
        if self.d_dropout and any(t in name for t in ("basic", "n_layers",
                                                      "mask")):
            return netD.apply(params, x, deterministic=False,
                              rngs={"dropout": rng})
        return netD.apply(params, x)

    def _ce(self, logits, labels, weights=None):
        ce = _softmax_ce(logits, labels)
        if weights:
            # torch CrossEntropyLoss(weight=...): sum(w*ce)/sum(w)
            # (reference base_model.py:318-323)
            w = jnp.asarray(weights, ce.dtype)[
                jnp.clip(labels, 0, len(weights) - 1)]
            return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)
        return jnp.mean(ce)

    def _cls_crit(self, pred, label):
        """CE, or MSE/L1 regression when train_cls_regression
        (reference base_model.py:246-252)."""
        if self.cls_regression:
            pv = pred.reshape(pred.shape[0], -1)[:, 0]
            d = pv - label.astype(pv.dtype)
            return (jnp.mean(jnp.abs(d)) if self.cls_l1_regression
                    else jnp.mean(d * d))
        return self._ce(pred, label, self.cls_weights)

    def _out_mask_crit(self, a, b):
        """L1 / MSE / Charbonnier out-of-mask identity criterion
        (reference base_model.py:326-335)."""
        d = a - b
        if self.out_mask_loss == "MSE":
            return jnp.mean(d * d)
        if self.out_mask_loss == "Charbonnier":
            return jnp.mean(jnp.sqrt(d * d + self.charbonnier_eps ** 2))
        return jnp.mean(jnp.abs(d))

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
                                  self.num_patches, self.include_all_neg,
                                  gamma=self.hdce_gamma)
        return jnp.mean(hdce), jnp.mean(src)

    def _nce_total(self, paramsG, paramsF, src_img, tgt_img, rng,
                   flipped=None):
        """calculate_NCE_loss (reference cut_model.py:889-926). With
        flip-equivariance, feat_q is flipped back (reference :869-871 — the
        reference flips only q, matching upstream CUT)."""
        b = src_img.shape[0]
        feats_k = self.netG.apply(paramsG, src_img,
                                  extract_layer_ids=self.nce_layers)
        feats_q = self.netG.apply(paramsG, tgt_img,
                                  extract_layer_ids=self.nce_layers)
        if flipped is not None:
            feats_q = [jnp.where(flipped, f[:, :, ::-1, :], f)
                       for f in feats_q]
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
        flipped = None
        if self.flip_equivariance:
            # FastCUT: flip the whole forward with prob 0.5; NCE q-features
            # are flipped back (reference cut_model.py:619-624,869-871)
            rng, rng_flip = jax.random.split(rng)
            flipped = jax.random.bernoulli(rng_flip)
            real_A = jnp.where(flipped, real_A[:, :, ::-1, :], real_A)
            real_B = jnp.where(flipped, real_B[:, :, ::-1, :], real_B)
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
            rng, rng_d = jax.random.split(rng)

            def g_term(d_in=d_in, name=name, netD=netD, rng_d=rng_d):
                pred = self._d_apply(name, netD, d_params[name], d_in, rng_d)
                if self.contrastive_d:
                    # contrastive G objective (reference loss.py:392-394)
                    from .modules.cut_networks import contrastive_gan_loss
                    real_in = real_B5 if ("temporal" in name and fake_clip
                                          is not None) else real_B
                    pred_real = netD.apply(d_params[name], real_in)
                    return contrastive_gan_loss(-pred_real, -pred)
                if self.gan_mode in ("projected", "wgangp"):
                    return -jnp.mean(pred)
                # the reference's criterionGAN carries the smoothed real
                # target (0.9) into the G objective too (loss.py:277-285)
                return gan_loss(pred, True, self.gan_mode,
                                smooth=self.d_label_smooth)

            if "temporal" in name and self.d_temporal_every > 1 \
                    and "_niter" in inp:
                active = (inp["_niter"] % self.d_temporal_every) == 0
                g_gan += jax.lax.cond(
                    active, g_term, lambda: jnp.asarray(0.0, jnp.float32))
            else:
                g_gan += g_term()
        losses["G_GAN"] = g_gan * self.lambda_gan

        if fake_clip is not None and (getattr(self.opt,
                                              "train_temporal_criterion",
                                              False) or self._video):
            lam_t = float(getattr(self.opt,
                                  "train_temporal_criterion_lambda", 1.0)
                          or 1.0)
            losses["G_temporal"] = lam_t * self._temporal_criterion(fake_clip)

        rng_nce, rng_idt = jax.random.split(rng)
        nce, src = self._nce_total(paramsG, paramsF, real_A, fake_B, rng_nce,
                                   flipped)
        losses["G_NCE"] = nce * self.lambda_nce
        if self.lambda_src > 0:
            losses["G_SRC"] = src * self.lambda_src
        idt_B = None
        if self.nce_idt or self.mse_idt or self.sem_idt:
            idt_B = self.netG.apply(paramsG, real_B)
        if self.nce_idt:
            nce_y, _ = self._nce_total(paramsG, paramsF, real_B, idt_B,
                                       rng_idt, flipped)
            losses["G_NCE_Y"] = nce_y * self.lambda_nce
            losses["G_NCE"] = (losses["G_NCE"] + losses["G_NCE_Y"]) * 0.5
            losses.pop("G_NCE_Y")
        if self.mse_idt:
            # identity pixel loss (reference cut_model.py:309-310,771-777;
            # criterionIdt is an L1 despite the flag name)
            losses["G_MSE_idt"] = self.lambda_mse_idt * jnp.mean(
                jnp.abs(real_B - idt_B))

        if getattr(self, "recut", False) and "_p_params" in inp:
            # ReCUT regularizer (reference re_cut_semantic_mask_model.py:
            # 160-190): project the generated frames one step forward and
            # pull it toward the REAL next source frame with the NCE loss;
            # gated off while P is inaccurate on real sequences
            n1 = self.nuplet - 1
            bn = fake_B.shape[0] // n1
            seq = fake_B.reshape((bn, n1) + fake_B.shape[1:])
            stack = jnp.concatenate([seq[:, i] for i in range(n1)], axis=-1)
            proj_fake = self.netP.apply(inp["_p_params"], stack)
            gate = inp.get("_p_gate", 1.0)
            rng_rec = jax.random.fold_in(rng, 1717)  # distinct from idt/nce
            a_last = inp["real_A_last"]
            if flipped is not None:
                # fake frames live in the flipped domain on flipped steps —
                # compare against the equally flipped target frame
                a_last = jnp.where(flipped, a_last[:, :, ::-1, :], a_last)
            nce_rec, _ = self._nce_total(paramsG, paramsF, a_last, proj_fake,
                                         rng_rec)
            losses["G_recut"] = gate * nce_rec
            if self.p_adversarial:
                adv = 0.0
                for name, netD in self.netDs.items():
                    if "mask" in name or "temporal" in name:
                        continue
                    pred = netD.apply(d_params[name], proj_fake)
                    adv += (-jnp.mean(pred)
                            if self.gan_mode in ("projected", "wgangp")
                            else gan_loss(pred, True, self.gan_mode))
                losses["G_proj_fake_B_adversarial"] = gate * adv

        if self.supervised:
            # supervised loss with aligned data (reference cut_model.py:779-833)
            sup = 0.0
            if "MSE" in self.supervised:
                sup += self.lambda_supervised * jnp.mean(
                    (fake_B - real_B) ** 2)
            elif "L1" in self.supervised:
                sup += self.lambda_supervised * jnp.mean(
                    jnp.abs(fake_B - real_B))
            if "LPIPS" in self.supervised or "DISTS" in self.supervised:
                terms = self.perceptual_terms(
                    fake_B, real_B, self.supervised,
                    mean=getattr(self.opt, "alg_cut_dists_mean", None),
                    std=getattr(self.opt, "alg_cut_dists_std", None))
                sup += self.lambda_perceptual * sum(terms.values())
            losses["G_supervised"] = sup

        if self.semantic_cls and "cls_A" in inp:
            # gate: only push the G when CLS itself is good enough
            # (reference base_gan_model.py:719-729)
            gate = inp.get("_cls_gate", 1.0)
            logits = self.netCLS.apply(inp["_cls_params"], fake_B)
            losses["G_sem_cls"] = gate * self.cls_lambda * self._cls_crit(
                logits, inp["cls_A"])
            if self.sem_idt and idt_B is not None and "cls_B" in inp:
                logits_i = self.netCLS.apply(inp["_cls_params"], idt_B)
                losses["G_sem_cls_idt"] = (gate * self.cls_lambda *
                                           self._cls_crit(logits_i,
                                                          inp["cls_B"]))
        if self.semantic_mask and "mask_A" in inp:
            gate = inp.get("_fs_gate", 1.0)
            fsB = inp.get("_fs_params_B", inp["_fs_params"])
            logits = self.netf_s.apply(fsB, fake_B)
            mask_A = self._fold(inp["mask_A"])[..., 0]
            if self.mask_for_removal:
                # object removal: push fake toward "no object anywhere"
                # (reference base_gan_model.py:756-757)
                label_fake = jnp.zeros_like(mask_A)
            elif self.sem_net_output or any("mask" in n for n in self.netDs):
                # target = f_s's own prediction on the source (reference
                # base_gan_model.py:758-762)
                pred_A = self.netf_s.apply(inp["_fs_params"], real_A)
                label_fake = jax.lax.stop_gradient(
                    jnp.argmax(pred_A, axis=-1))
            else:
                label_fake = mask_A
            losses["G_sem_mask"] = gate * self.mask_lambda * self._ce(
                logits, label_fake, self.fs_weights)
            if self.sem_idt and idt_B is not None:
                if self.mask_for_removal:
                    label_idt = jnp.zeros_like(mask_A)
                elif self.sem_net_output or "mask_B" not in inp:
                    pred_B = self.netf_s.apply(fsB, real_B)
                    label_idt = jax.lax.stop_gradient(
                        jnp.argmax(pred_B, axis=-1))
                else:
                    label_idt = self._fold(inp["mask_B"])[..., 0]
                logits_i = self.netf_s.apply(fsB, idt_B)
                losses["G_sem_mask_idt"] = (gate * self.mask_lambda *
                                            self._ce(logits_i, label_idt,
                                                     self.fs_weights))
            if self.out_mask:
                m = jnp.clip(self._fold(inp["mask_A"]).astype(fake_B.dtype),
                             0, 1)
                losses["G_out_mask"] = self.lambda_out_mask * \
                    self._out_mask_crit(fake_B * (1 - m), real_A * (1 - m))

        total = sum(losses.values())
        return total, (losses, fake_B, idt_B, fake_clip)

    def _make_step(self):
        txG, txF = self.txs["G_A"], self.txs["F"]
        d_names = list(self.netDs.keys())

        def step(states, pool, apa_p, d_diff_p, rng, inp):
            from ..parallel.mesh import dequantize_on_device
            inp = dict(inp)
            for key in ("real_A", "real_B"):
                inp[key] = dequantize_on_device(inp[key], "image")
            for mkey in ("mask_A", "mask_B"):
                if mkey in inp:
                    inp[mkey] = dequantize_on_device(inp[mkey], "label")
            rngs = jax.random.split(rng, 8)
            d_params = {n: jax.lax.stop_gradient(states[n].params)
                        for n in d_names}
            inp = dict(inp)
            states = dict(states)
            if self.semantic_cls and "cls_A" in inp:
                def cls_loss(p):
                    l = self._cls_crit(self.netCLS.apply(
                        p, self._fold(inp["real_A"])), inp["cls_A"])
                    if self.sem_cls_B and "cls_B" in inp:
                        # reference base_model.py:1511-1520
                        l = l + self._cls_crit(self.netCLS.apply(
                            p, self._fold(inp["real_B"])), inp["cls_B"])
                    return l
                cl, cgrads = jax.value_and_grad(cls_loss)(states["CLS"].params)
                states["CLS"] = apply_updates(states["CLS"], cgrads,
                                              self.txs["CLS"])
                losses_heads = {"CLS": cl}
                inp["_cls_gate"] = (cl <= self.cls_threshold).astype(
                    jnp.float32)
            else:
                losses_heads = {}
            if self.semantic_mask and "mask_A" in inp and not self.fs_is_sam:
                fs_argnums = (0, 1) if self.disjoint_f_s else (0,)

                def fs_loss(p, pB):
                    l = 0.0
                    if not self.no_train_f_s_A:
                        l = l + self._ce(
                            self.netf_s.apply(p, self._fold(inp["real_A"])),
                            self._fold(inp["mask_A"])[..., 0],
                            self.fs_weights)
                    if self.mask_f_s_B and "mask_B" in inp:
                        # reference base_model.py:1479-1495
                        pb = pB if self.disjoint_f_s else p
                        l = l + self._ce(
                            self.netf_s.apply(pb, self._fold(inp["real_B"])),
                            self._fold(inp["mask_B"])[..., 0],
                            self.fs_weights)
                    return l

                pB0 = (states["f_s_B"].params if self.disjoint_f_s
                       else states["f_s"].params)
                fl, fgrads = jax.value_and_grad(fs_loss, argnums=fs_argnums)(
                    states["f_s"].params, pB0)
                states["f_s"] = apply_updates(states["f_s"], fgrads[0],
                                              self.txs["f_s"])
                if self.disjoint_f_s:
                    states["f_s_B"] = apply_updates(
                        states["f_s_B"], fgrads[1], self.txs["f_s_B"])
                losses_heads["f_s"] = fl
                inp["_fs_gate"] = (fl <= self.fs_threshold).astype(jnp.float32)
            if getattr(self, "recut", False) and "real_B_seq" in inp:
                # P trains on real sequences only (the safer
                # no_train_P_fake_images variant): 10 * L1(P(B_0..N-2),
                # B_last) (reference compute_P_loss)
                n1 = self.nuplet - 1

                def p_loss(p):
                    seq = inp["real_B_seq"]
                    stack = jnp.concatenate(
                        [seq[:, i] for i in range(n1)], axis=-1)
                    proj = self.netP.apply(p, stack)
                    return 10.0 * jnp.mean(jnp.abs(
                        proj - inp["real_B_last"]))

                plv, pgrads = jax.value_and_grad(p_loss)(
                    states["P_B"].params)
                states["P_B"] = apply_updates(states["P_B"], pgrads,
                                              self.txs["P_B"])
                losses_p = {"P_proj_real_B": plv}
                inp["_p_params"] = jax.lax.stop_gradient(
                    states["P_B"].params)
                inp["_p_gate"] = (plv <= self.p_threshold).astype(
                    jnp.float32)
            else:
                losses_p = {}
            if self.semantic_cls:
                inp["_cls_params"] = jax.lax.stop_gradient(states["CLS"].params)
            if self.semantic_mask:
                inp["_fs_params"] = jax.lax.stop_gradient(states["f_s"].params)
                if self.disjoint_f_s:
                    inp["_fs_params_B"] = jax.lax.stop_gradient(
                        states["f_s_B"].params)
                if self.fs_is_sam:
                    # f_s_net=sam: the GT label mask is SAM's prediction on
                    # real_A, prompted by the ref bbox (reference
                    # base_model.py:1522-1534)
                    logits = self.netf_s.apply(
                        inp["_fs_params"], inp["real_A"],
                        boxes=inp.get("ref_bbox_A"))
                    inp["mask_A"] = (logits[..., 1:2] > 0).astype(jnp.int32)

            inp["_niter"] = states["G_A"].step
            # --- G + F group
            (gtot, (losses, fake_B, idt_B, fake_clip)), grads = \
                jax.value_and_grad(
                    lambda pG, pF: self._g_loss(pG, pF, d_params, rngs[0],
                                                inp),
                    argnums=(0, 1), has_aux=True)(
                        states["G_A"].params, states["F"].params)
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
            if self.d_diffusion:
                # adaptive diffusion-noise augmentation of D inputs
                # (reference projected_d/diffusion.py:84-160): per-image
                # q-sample at a t whose range and probability grow with the
                # adapted intensity p
                from ..ops.schedules import make_beta_schedule
                t_min, t_max = 10, 1000
                gbar = np.sqrt(np.cumprod(
                    1.0 - make_beta_schedule("linear", t_max, 1e-4, 2e-2)))
                gbar = jnp.asarray(np.concatenate([[1.0], gbar]), jnp.float32)

                def _qsample(x, key):
                    k1, k2, k3 = jax.random.split(key, 3)
                    b = x.shape[0]
                    t_cur = t_min + d_diff_p * (t_max - t_min)
                    # weights prop. to t, masked beyond the current horizon
                    ar = jnp.arange(1, t_max + 1, dtype=jnp.float32)
                    logw = jnp.where(ar <= t_cur, jnp.log(ar), -jnp.inf)
                    t = jax.random.categorical(k1, logw[None], axis=-1,
                                               shape=(b,)) + 1
                    frac = jnp.minimum(d_diff_p * 64.0, 48.0) / 64.0
                    use = jax.random.uniform(k2, (b,)) < frac
                    t = jnp.where(use, t, 0)
                    g = jnp.take(gbar, t)[:, None, None, None].astype(x.dtype)
                    eps = jax.random.normal(k3, x.shape, x.dtype)
                    return g * x + jnp.sqrt(1.0 - g * g) * eps

                ka, kb = jax.random.split(jax.random.fold_in(rngs[4], 7))
                real_in = _qsample(real_in, ka)
                fake_in = _qsample(fake_in, kb)
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
                        jax.random.fold_in(rngs[6], zlib.crc32(n.encode()) % 1000),
                        logits.shape, minval=1e-6, maxval=1.0 - 1e-6)))
                    d_fake = jax.nn.softmax((logits + g_noise) / 1.0, -1)
                    d_real = jax.nn.one_hot(
                        jnp.clip(self._fold(inp["mask_A"])[..., 0], 0,
                                 self.nclasses_fs - 1),
                        self.nclasses_fs, dtype=fake_sg.dtype)
                else:
                    d_real = real_B5 if temporal else real_in
                    d_fake = fake_clip_sg if temporal else fake_in

                def d_loss(p, d_real=d_real, d_fake=d_fake, n=n):
                    kr = jax.random.fold_in(rngs[5], (zlib.crc32(n.encode()) % 997) * 2)
                    kf = jax.random.fold_in(rngs[5], (zlib.crc32(n.encode()) % 997) * 2 + 1)
                    logits_real = self._d_apply(n, netD, p, d_real, kr)
                    logits_fake = self._d_apply(n, netD, p, d_fake, kf)
                    if self.contrastive_d:
                        # reference loss.py:377-390
                        from .modules.cut_networks import contrastive_gan_loss
                        lr = contrastive_gan_loss(logits_real, logits_fake)
                        lf = contrastive_gan_loss(-logits_fake, -logits_real)
                    else:
                        lr = gan_loss(logits_real, True, self.gan_mode,
                                      smooth=self.d_label_smooth)
                        lf = gan_loss(logits_fake, False, self.gan_mode)
                    return 0.5 * (lr + lf), (logits_real, lr)

                def d_update():
                    (dl, (logits_real, d_loss_real)), dgrads = \
                        jax.value_and_grad(d_loss, has_aux=True)(
                            states[n].params)
                    return (apply_updates(states[n], dgrads, self.txs[n]),
                            dl, logits_real, d_loss_real)

                if "temporal" in n and self.d_temporal_every > 1:
                    # reference base_gan_model.py:388: the temporal D only
                    # trains every D_temporal_every iterations; the skipped
                    # branch does no D compute at all
                    active = (inp["_niter"] % self.d_temporal_every) == 0
                    zero = jnp.asarray(0.0, jnp.float32)

                    def d_update_slim():
                        st, dl, _, _ = d_update()
                        return st, dl

                    states[n], dl = jax.lax.cond(
                        active, d_update_slim, lambda: (states[n], zero))
                else:
                    states[n], dl, logits_real, d_loss_real = d_update()
                    if apa_logits_real is None:
                        apa_logits_real = logits_real
                        first_d_loss_real = d_loss_real
                losses[f"D_{n}"] = dl

            if self.d_diffusion and apa_logits_real is not None:
                # p adaptation by the D real-loss heuristic, applied on the
                # dataaug_D_diffusion_every cadence with the reference step
                # size (loss.py:315-331)
                active = (inp["_niter"] % self.d_diffusion_every) == 0
                adj = jnp.sign(first_d_loss_real - 0.9) * active
                step_sz = (real_B.shape[0] * self.d_diffusion_every
                           / (100.0 * 1000.0))
                d_diff_p = jnp.clip(d_diff_p + adj * step_sz, 0.0, 1.0)
                losses["D_diff_p"] = d_diff_p

            if self.apa and apa_logits_real is not None:
                # p adaptation from the D-real logit sign heuristic
                lam = jnp.mean(jnp.sign(apa_logits_real))
                adjust = jnp.sign(lam - self.apa_target)
                step_sz = (real_B.shape[0] * self.apa_every
                           / (self.apa_nimg * 1000.0))
                apa_p = jnp.clip(apa_p + adjust * step_sz, 0.0, 1.0)
                losses["APA_p"] = apa_p

            # semantic heads were updated before the G group (gates)
            losses.update(losses_heads)
            losses.update(losses_p)

            return states, pool, apa_p, d_diff_p, losses

        donate = (0, 1) if getattr(self.opt, "tpu_donate", True) else ()
        return jax.jit(step, donate_argnums=donate)

    def attention_visuals(self, batch, max_masks=5):
        """Per-mask attention maps of an attention generator
        (reference output_display_G_attention_masks); {} for plain Gs."""
        from .modules.resnet_generator import ResnetGeneratorAttn
        if not isinstance(self.netG, ResnetGeneratorAttn):
            return {}
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        real_A = self._fold(jnp.asarray(dev["real_A"]))
        _, att = self.netG.apply(self.states["G_A"].params, real_A,
                                 return_attention=True)
        att = np.asarray(jax.device_get(att))
        out = {}
        for i in range(min(att.shape[-1], max_masks)):
            # [0,1] -> [-1,1] so tensor2im renders it like an image
            out[f"attention_{i}"] = att[..., i:i + 1] * 2.0 - 1.0
        return out

    def compute_miou(self, batch):
        """Soft mIoU of f_s on the current batch (reference
        base_model.py:1379-1416; probabilities instead of the reference's
        log-probabilities, which make the soft IoU ill-defined)."""
        if not self.semantic_mask or self.fs_is_sam \
                or "A_label_mask" not in batch:
            return {}
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        fs = self.states["f_s"].params
        fsB = self.states.get("f_s_B", self.states["f_s"]).params

        def iou(logits, target):
            pred = jax.nn.softmax(logits.astype(jnp.float32), -1)
            onehot = jax.nn.one_hot(
                jnp.clip(target, 0, pred.shape[-1] - 1), pred.shape[-1])
            inter = jnp.sum(pred * onehot)
            union = jnp.sum(pred + onehot) - inter
            return float(inter / jnp.maximum(union, 1e-8))

        real_A = self._fold(jnp.asarray(dev["real_A"]))
        mask_A = self._fold(jnp.asarray(dev["mask_A"]))[..., 0]
        out = {"miou_real_A": iou(self.netf_s.apply(fs, real_A), mask_A)}
        if "B_label_mask" in batch:
            real_B = self._fold(jnp.asarray(dev["real_B"]))
            mask_B = self._fold(jnp.asarray(
                self.put_batch({"m": batch["B_label_mask"]})["m"]))[..., 0]
            out["miou_real_B"] = iou(self.netf_s.apply(fsB, real_B), mask_B)
        fake_B = self.netG.apply(self.states["G_A"].params, real_A)
        out["miou_fake_B"] = iou(self.netf_s.apply(fsB, fake_B), mask_A)
        return out

    def prepare_batch(self, batch):
        """Host work + upload, separable so train.py overlaps transfers
        with the previous step's compute."""
        from ..parallel.mesh import quantize_batch
        inp = self.set_input(batch)
        inp = quantize_batch(inp, float_keys=("real_A", "real_B"),
                             int_keys=("mask_A", "mask_B"))
        return self.put_batch(inp)

    def optimize_prepared(self, dev):
        if self._jit_step is None:
            self._jit_step = self._make_step()
        (self.states, self.pool, self.apa_p, self.d_diff_p,
         losses) = self._jit_step(
            self.states, self.pool, self.apa_p, self.d_diff_p,
            self.next_rng(), dev)
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
        return np.asarray(jax.device_get(
            self._jit_infer(self.replicated(params), dev["real_A"])))
