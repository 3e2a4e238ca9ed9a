"""Vision-aided discriminator (reference models/modules/vision_aided_d.py,
which wraps the vision-aided-gan CLIP/DINO ensemble).

TPU rebuild: a FROZEN CLIP ViT-B/16 visual tower (stop_gradient) provides
patch-token features and the CLS embedding; two small trainable heads — a
patch conv head over the token grid and an MLP over the CLS embedding —
produce concatenated logits, mirroring vision-aided-gan's "multi-level
conv+linear" head on a frozen backbone. Ported CLIP weights swap in from
``$JOLIGEN_TPU_WEIGHTS_DIR/clip_vitb16.npz`` post-init (random frozen
features otherwise — usable, but parity needs the ported weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

sg = jax.lax.stop_gradient


class SamFeatureDiscriminator(nn.Module):
    """`sam` discriminator: frozen SAM vision-encoder feature grid
    (stop_gradient) + trainable patch head. The reference
    (base_gan_model.py:533-534) feeds SAM mask predictions of fakes/reals
    to a basic D; judging the frozen SAM feature grid keeps the same
    frozen-SAM signal without a prompt side-channel. Ported weights swap
    in from sam_vit.npz post-init (vision-encoder subtree)."""
    head_ch: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...utils.sam import SAM_MEAN, SAM_STD, SamConfig, \
            SamVisionEncoder
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        # [-1,1] -> SAM preprocessing at a training-friendly resolution
        h = (x.astype(jnp.float32) + 1.0) * 127.5
        h = (h - SAM_MEAN) / SAM_STD
        size = 256  # 16x16 feature grid; SAM's ViT handles any /16 size
        if h.shape[1] != size:
            h = jax.image.resize(h, (h.shape[0], size, size, 3), "bilinear")
        feats = SamVisionEncoder(SamConfig(), name="freezenet_sam")(h)
        feats = sg(feats).astype(self.dtype)
        h = nn.leaky_relu(nn.Conv(self.head_ch, (3, 3), padding=1,
                                  dtype=self.dtype, name="patch0")(feats),
                          0.2)
        h = nn.leaky_relu(nn.Conv(self.head_ch, (3, 3), strides=2, padding=1,
                                  dtype=self.dtype, name="patch1")(h), 0.2)
        logits = nn.Conv(1, (1, 1), dtype=self.dtype, name="patch_out")(h)
        return logits.reshape(x.shape[0], -1).astype(jnp.float32)


def load_sam_encoder(params, node_name="freezenet_sam"):
    """Swap every ``node_name`` subtree for the ported SAM vision-encoder
    weights when sam_vit.npz exists."""
    from ...utils.sam import load_sam_params, sam_weights_path
    path = sam_weights_path()
    if path is None:
        return params
    enc = load_sam_params(path)[0]["params"]["vision_encoder"]

    def walk(node):
        if not isinstance(node, dict):
            return node
        return {k: (enc if k == node_name else walk(v))
                for k, v in node.items()}

    return walk(params)


class VisionAidedDiscriminator(nn.Module):
    """Frozen vision towers + trainable patch/global heads per backbone
    (reference vision_aided_d.py: the vision-aided-gan CLIP/DINO/Swin
    ensemble; D_vision_aided_backbones picks the members — clip and dino
    towers are ported here, swin is not and is skipped with a notice)."""
    head_ch: int = 128
    backbones: tuple = ("clip",)
    dtype: jnp.dtype = jnp.float32

    def _head(self, emb, tokens, tag):
        h = tokens.astype(self.dtype)
        h = nn.Conv(self.head_ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"patch0{tag}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.head_ch, (3, 3), strides=2, padding=1,
                    dtype=self.dtype, name=f"patch1{tag}")(h)
        h = nn.leaky_relu(h, 0.2)
        patch_logits = nn.Conv(1, (1, 1), dtype=self.dtype,
                               name=f"patch_out{tag}")(h)
        g = nn.Dense(self.head_ch, dtype=self.dtype, name=f"glob0{tag}")(
            emb.astype(self.dtype))
        g = nn.leaky_relu(g, 0.2)
        glob_logit = nn.Dense(1, dtype=self.dtype, name=f"glob_out{tag}")(g)
        return jnp.concatenate(
            [patch_logits.reshape(tokens.shape[0], -1), glob_logit], axis=1)

    @nn.compact
    def __call__(self, x):
        """x: (B,H,W,C) in [-1,1] -> (B, P) concatenated per-backbone
        patch+global logits."""
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        outs = []
        for bk in self.backbones:
            if bk == "clip":
                from ...utils.clip_vit import CLIPVisualViT, preprocess
                emb, tokens = CLIPVisualViT(return_tokens=True,
                                            name="freezenet_clip")(
                    preprocess(x.astype(jnp.float32)))
                # legacy head names keep clip-only checkpoints loadable
                outs.append(self._head(sg(emb), sg(tokens), ""))
            elif bk in ("dino", "dinov2"):
                from ...utils.dinov2 import DINOv2ViT
                from ...utils.dinov2 import preprocess as dino_pre
                emb, tokens = DINOv2ViT(return_tokens=True,
                                        name="freezenet_dino")(
                    dino_pre(x.astype(jnp.float32)))
                outs.append(self._head(sg(emb), sg(tokens), "_dino"))
        return jnp.concatenate(outs, axis=1).astype(jnp.float32)
