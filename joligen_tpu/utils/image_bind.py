"""ImageBind vision tower (imagebind_huge) in flax.

Consumer: palette ref-image conditioning ``--alg_diffusion_ref_embed_net
imagebind`` (reference models/modules/palette_denoise_fn.py:83-85,146-148
runs the frozen imagebind_huge VISION branch and takes the 1024-d joint
embedding). Weight-gated on ``$JOLIGEN_TPU_WEIGHTS_DIR/imagebind_vision.npz``
(porter tools/port_imagebind_weights.py).

Architecture (reference models/modules/image_bind/imagebind_model.py:489-500
vision path): 14px Conv3d patch embed over a 2-frame repeat of the image
(kernel (2,14,14), no bias) -> CLS token + learned spatio-temporal pos embed
-> pre-transformer LayerNorm -> 32 pre-norm blocks (MHA 16 heads with packed
qkv, GELU MLP x4, eps 1e-6) -> head LayerNorm -> CLS -> 1280->1024 linear
(no bias) -> L2 normalize.

TPU-native simplification: the temporal conv over two IDENTICAL frames is
exactly a 2D conv with the temporally-summed kernel (w[:,0]+w[:,1]), so the
port folds the Conv3d into one MXU-friendly Conv2d — bit-identical math,
no wasted frame duplication.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm_2")(x)
        h = nn.Dense(self.dim * 4, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class ImageBindVision(nn.Module):
    dim: int = 1280
    depth: int = 32
    heads: int = 16
    patch: int = 14
    out_dim: int = 1024

    @nn.compact
    def __call__(self, x):
        """x: (N,H,W,3), the reference feeds the [-1,1] dataset image after
        Resize(224)+CenterCrop(224) with no re-normalization
        (palette_denoise_fn.py:68-75). Returns (N, out_dim) L2-normalized
        joint embeddings."""
        n = x.shape[0]
        h = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    use_bias=False, name="patch_conv")(x)
        h = h.reshape(n, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim))
        h = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), h], axis=1)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, h.shape[1], self.dim))
        h = h + pos
        h = nn.LayerNorm(epsilon=1e-6, name="pre_ln")(h)
        for i in range(self.depth):
            h = _Block(self.dim, self.heads, name=f"block{i}")(h)
        out = nn.LayerNorm(epsilon=1e-6, name="head_ln")(h[:, 0])
        proj = self.param("head_proj", nn.initializers.zeros,
                          (self.dim, self.out_dim))
        out = out @ proj
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


# governs the tower PaletteDenoiser instantiates AND the swap-in loader —
# must describe the same architecture the npz was ported from (huge by
# default, matching reference imagebind_huge); tests shrink it.
IMAGEBIND_VISION_CONFIG = {"dim": 1280, "depth": 32, "heads": 16,
                           "out_dim": 1024}


def imagebind_weights_path():
    import os
    wd = os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", "")
    path = os.path.join(wd, "imagebind_vision.npz")
    return path if (wd and os.path.exists(path)) else None


def load_imagebind_ref_encoder(params, node_name="freezenet_imagebind"):
    """Swap every ``node_name`` subtree in a params pytree for the ported
    ImageBind vision weights when imagebind_vision.npz exists (else params
    are returned unchanged — frozen random features)."""
    path = imagebind_weights_path()
    if path is None:
        return params
    ib_params = load_imagebind_vision_params(
        path, heads=IMAGEBIND_VISION_CONFIG["heads"])[0]["params"]

    def walk(node):
        if not isinstance(node, dict):
            return node
        return {k: (ib_params if k == node_name else walk(v))
                for k, v in node.items()}

    return walk(params)


def preprocess(img):
    """(N,H,W,3) [-1,1] -> bicubic 224 resize + center crop (reference
    ref_transform, palette_denoise_fn.py:68-75)."""
    import jax.image
    n, h, w, c = img.shape
    s = 224 / min(h, w)
    nh, nw = max(224, int(round(h * s))), max(224, int(round(w * s)))
    img = jax.image.resize(img, (n, nh, nw, c), "bicubic")
    top, left = (nh - 224) // 2, (nw - 224) // 2
    return img[:, top:top + 224, left:left + 224, :]


def load_imagebind_vision_params(npz_path, heads=None):
    """npz contract (tools/port_imagebind_weights.py):
    - ``patch_conv.kernel`` (H,W,3,dim) — the temporally-folded Conv3d
    - ``cls_token`` (1,1,dim), ``pos_embed`` (1,N+1,dim)
    - ``pre_ln.{scale,bias}``, ``head_ln.{scale,bias}``, ``head_proj``
    - per block i: ``block{i}.{norm_1,norm_2}.{scale,bias}``,
      ``block{i}.attn.{qkv_w,qkv_b,proj_w,proj_b}`` (torch (out,in)),
      ``block{i}.{fc1,fc2}.{kernel,bias}``
    """
    z = np.load(npz_path)
    d = int(z["cls_token"].shape[-1])
    nblocks = len({k.split(".")[0] for k in z.files if k.startswith("block")})
    heads = heads or (16 if d >= 1280 else max(1, d // 64))
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
        "patch_conv": {"kernel": z["patch_conv.kernel"]},
        "cls_token": z["cls_token"],
        "pos_embed": z["pos_embed"],
        "pre_ln": {"scale": z["pre_ln.scale"], "bias": z["pre_ln.bias"]},
        "head_ln": {"scale": z["head_ln.scale"], "bias": z["head_ln.bias"]},
        "head_proj": z["head_proj"],
    }
    for i in range(nblocks):
        params[f"block{i}"] = {
            "norm_1": {"scale": z[f"block{i}.norm_1.scale"],
                       "bias": z[f"block{i}.norm_1.bias"]},
            "norm_2": {"scale": z[f"block{i}.norm_2.scale"],
                       "bias": z[f"block{i}.norm_2.bias"]},
            "attn": attn(i),
            "fc1": {"kernel": z[f"block{i}.fc1.kernel"],
                    "bias": z[f"block{i}.fc1.bias"]},
            "fc2": {"kernel": z[f"block{i}.fc2.kernel"],
                    "bias": z[f"block{i}.fc2.bias"]},
        }
    return {"params": params}, {"dim": d, "depth": nblocks, "heads": heads,
                                "out_dim": int(z["head_proj"].shape[-1])}
