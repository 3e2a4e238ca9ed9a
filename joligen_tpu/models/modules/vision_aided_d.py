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


class VisionAidedDiscriminator(nn.Module):
    head_ch: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B,H,W,C) in [-1,1] -> (B, P) patch+global logits."""
        from ...utils.clip_vit import CLIPVisualViT, preprocess
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        emb, tokens = CLIPVisualViT(return_tokens=True,
                                    name="freezenet_clip")(
            preprocess(x.astype(jnp.float32)))
        emb, tokens = sg(emb), sg(tokens)
        h = tokens.astype(self.dtype)
        h = nn.Conv(self.head_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="patch0")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.head_ch, (3, 3), strides=2, padding=1,
                    dtype=self.dtype, name="patch1")(h)
        h = nn.leaky_relu(h, 0.2)
        patch_logits = nn.Conv(1, (1, 1), dtype=self.dtype,
                               name="patch_out")(h)
        g = nn.Dense(self.head_ch, dtype=self.dtype, name="glob0")(
            emb.astype(self.dtype))
        g = nn.leaky_relu(g, 0.2)
        glob_logit = nn.Dense(1, dtype=self.dtype, name="glob_out")(g)
        return jnp.concatenate(
            [patch_logits.reshape(x.shape[0], -1), glob_logit],
            axis=1).astype(jnp.float32)
