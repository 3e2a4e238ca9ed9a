"""Standalone semantic-segmentation trainer (reference
models/segmentation_model.py): trains only the f_s segmenter on
(image, mask) pairs with cross-entropy."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel
from .train_state import apply_updates, init_net_state, make_optimizer
from .modules.semantic_networks import define_f


class SegmentationModel(BaseModel):
    def __init__(self, opt, phase="train"):
        super().__init__(opt, phase)
        self.netf_s = define_f(opt)
        size = opt.data_crop_size
        ex = jnp.zeros((1, size, size, opt.model_input_nc), jnp.float32)
        tx = make_optimizer(opt, getattr(opt, "train_sem_lr_f_s", 2e-4))
        self.txs["f_s"] = tx
        self.states["f_s"] = init_net_state(self.next_rng(), self.netf_s,
                                            (ex,), tx)
        if getattr(opt, "f_s_net", "") == "segformer":
            from .modules.segformer import load_mit_backbone
            self.states["f_s"] = self.states["f_s"].replace(
                params=load_mit_backbone(self.states["f_s"].params))
        elif getattr(opt, "f_s_net", "") == "vgg":
            from .modules.semantic_networks import load_vgg_fcn8s_trunk
            self.states["f_s"] = self.states["f_s"].replace(
                params=load_vgg_fcn8s_trunk(self.states["f_s"].params))
        self._jit_step = None
        self._jit_infer = None

    def set_input(self, batch):
        return {"img": batch["A"], "mask": batch["A_label_mask"]}

    def optimize_parameters(self, batch):
        inp = self.set_input(batch)
        dev = self.put_batch(inp)
        if self._jit_step is None:
            tx = self.txs["f_s"]

            def loss_fn(p, img, mask):
                logits = self.netf_s.apply(p, img)
                labels = mask[..., 0]
                logp = jax.nn.log_softmax(logits, axis=-1)
                onehot = jax.nn.one_hot(labels, logits.shape[-1],
                                        dtype=logits.dtype)
                return -jnp.mean(jnp.sum(onehot * logp, axis=-1))

            def step(state, img, mask):
                loss, grads = jax.value_and_grad(loss_fn)(state.params, img,
                                                          mask)
                return apply_updates(state, grads, tx), {"f_s": loss}

            self._jit_step = jax.jit(step, donate_argnums=(0,))
        self.states["f_s"], losses = self._jit_step(
            self.states["f_s"], dev["img"], dev["mask"])
        self.loss_log = losses  # device scalars, lazy host sync
        return self.loss_log

    def inference(self, batch, **kwargs):
        """Predicted label map (B,H,W,1) int32."""
        dev = self.put_batch({"img": batch["A"]})
        if self._jit_infer is None:
            self._jit_infer = jax.jit(
                lambda p, x: jnp.argmax(self.netf_s.apply(p, x), axis=-1))
        out = self._jit_infer(self.replicated(self.states["f_s"].params),
                              dev["img"])
        return np.asarray(jax.device_get(out))[..., None]

    def compute_miou(self, batch, nclasses=None):
        """mIoU of predictions vs labels (reference base_model.py:1379-1416)."""
        nclasses = nclasses or getattr(self.opt, "f_s_semantic_nclasses", 2)
        pred = self.inference(batch)[..., 0]
        gt = np.asarray(batch["A_label_mask"])[..., 0]
        ious = []
        for c in range(nclasses):
            inter = np.logical_and(pred == c, gt == c).sum()
            union = np.logical_or(pred == c, gt == c).sum()
            if union > 0:
                ious.append(inter / union)
        return float(np.mean(ious)) if ious else 0.0
