"""OpenAI CLIP visual encoder (ViT-B/16) in flax.

Consumers (all weight-gated on ``$JOLIGEN_TPU_WEIGHTS_DIR/clip_vitb16.npz``,
porter tools/port_clip_weights.py):
- palette ref-image conditioning ``--alg_diffusion_ref_embed_net clip``
  (reference models/modules/palette_denoise_fn.py:77-80,144-145)
- the vision-aided discriminator's frozen backbone (reference
  models/modules/vision_aided_d.py uses the vision-aided-gan CLIP ensemble)

Architecture (clip.load("ViT-B/16").visual): 16px patch conv (no bias),
class embedding + learned positional embedding, ln_pre, 12 pre-norm blocks
with quickGELU MLPs, ln_post, and a 768->512 output projection.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.dim * 4, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.dim, name="c_proj")(h)
        return x + h


class CLIPVisualViT(nn.Module):
    dim: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 16
    out_dim: int = 512
    return_tokens: bool = False  # also return the patch-token grid

    @nn.compact
    def __call__(self, x):
        """x: (N,H,W,3) CLIP-normalized. Returns (N, out_dim) embeddings
        (CLS token through ln_post and the output projection); with
        return_tokens also the (N, gh, gw, dim) patch tokens."""
        n, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        h = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    use_bias=False, name="conv1")(x)
        h = h.reshape(n, -1, self.dim)
        cls = self.param("class_embedding", nn.initializers.zeros,
                         (self.dim,))
        h = jnp.concatenate(
            [jnp.tile(cls[None, None], (n, 1, 1)), h], axis=1)
        pos = self.param("positional_embedding", nn.initializers.zeros,
                         (h.shape[1], self.dim))
        h = h + pos[None]
        h = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(h)
        for i in range(self.depth):
            h = _Block(self.dim, self.heads, name=f"block{i}")(h)
        out = nn.LayerNorm(epsilon=1e-5, name="ln_post")(h[:, 0])
        proj = self.param("proj", nn.initializers.zeros,
                          (self.dim, self.out_dim))
        out = out @ proj
        if self.return_tokens:
            return out, h[:, 1:].reshape(n, gh, gw, self.dim)
        return out


def load_clip_params(npz_path, heads=None):
    """npz contract (tools/port_clip_weights.py): conv1.kernel (HWIO),
    class_embedding, positional_embedding, ln_pre/ln_post.{scale,bias},
    block{i}.{ln_1,ln_2}.{scale,bias}, block{i}.attn.{qkv_w,qkv_b,proj_w,
    proj_b} (torch (out,in)), block{i}.{c_fc,c_proj}.{kernel,bias}, proj."""
    z = np.load(npz_path)
    d = int(z["class_embedding"].shape[-1])
    heads = heads or d // 64   # 64-dim heads in every released CLIP ViT
    hd = d // heads

    def attn(i):
        qkv_w = z[f"block{i}.attn.qkv_w"]
        qkv_b = z[f"block{i}.attn.qkv_b"]
        out = {}
        for j, name in enumerate(("query", "key", "value")):
            out[name] = {
                "kernel": qkv_w[j * d:(j + 1) * d].T.reshape(d, heads, hd),
                "bias": qkv_b[j * d:(j + 1) * d].reshape(heads, hd)}
        out["out"] = {
            "kernel": z[f"block{i}.attn.proj_w"].T.reshape(heads, hd, d),
            "bias": z[f"block{i}.attn.proj_b"]}
        return out

    params = {
        "conv1": {"kernel": z["conv1.kernel"]},
        "class_embedding": z["class_embedding"],
        "positional_embedding": z["positional_embedding"],
        "ln_pre": {"scale": z["ln_pre.scale"], "bias": z["ln_pre.bias"]},
        "ln_post": {"scale": z["ln_post.scale"], "bias": z["ln_post.bias"]},
        "proj": z["proj"],
    }
    nblocks = len({k.split(".")[0] for k in z.files if k.startswith("block")})
    for i in range(nblocks):
        params[f"block{i}"] = {
            "ln_1": {"scale": z[f"block{i}.ln_1.scale"],
                     "bias": z[f"block{i}.ln_1.bias"]},
            "ln_2": {"scale": z[f"block{i}.ln_2.scale"],
                     "bias": z[f"block{i}.ln_2.bias"]},
            "attn": attn(i),
            "c_fc": {"kernel": z[f"block{i}.c_fc.kernel"],
                     "bias": z[f"block{i}.c_fc.bias"]},
            "c_proj": {"kernel": z[f"block{i}.c_proj.kernel"],
                       "bias": z[f"block{i}.c_proj.bias"]},
        }
    return {"params": jax.tree.map(jnp.asarray, params)}


def preprocess(x):
    """[-1,1] (N,H,W,C) -> 224px CLIP-normalized RGB (reference
    palette_denoise_fn.py:62-75 resize+center-crop+normalize)."""
    x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
    if x.shape[1:3] != (224, 224):
        x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear")
    return (x - CLIP_MEAN) / CLIP_STD


def clip_weights_path():
    import os
    wd = os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", "")
    path = os.path.join(wd, "clip_vitb16.npz")
    return path if (wd and os.path.exists(path)) else None


def load_clip_ref_encoder(params, node_name="freezenet_clip"):
    """Swap every ``node_name`` subtree in a params pytree for the ported
    CLIP weights when clip_vitb16.npz exists (else params are returned
    unchanged — frozen random features)."""
    path = clip_weights_path()
    if path is None:
        return params
    clip_params = load_clip_params(path)["params"]

    def walk(node):
        if not isinstance(node, dict):
            return node
        return {k: (clip_params if k == node_name else walk(v))
                for k, v in node.items()}

    return walk(params)
