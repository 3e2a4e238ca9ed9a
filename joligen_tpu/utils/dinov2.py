"""DINOv2 ViT-B/14 image encoder in flax for the DINOv2 metric
(reference util/dino_metric.py:6-96 loads facebookresearch/dinov2 via
torch.hub; zero-egress here, so weights come from
``$JOLIGEN_TPU_WEIGHTS_DIR/dinov2_vitb14.npz`` — see
tools/port_dinov2_weights.py for the exporter and the key contract).

Architecture (dinov2_vitb14): 14px patch embed -> 768 dim, CLS token +
learned pos embed (37x37 native grid, bilinearly interpolated to the input
grid), 12 pre-norm blocks with LayerScale on both branches, GELU MLP x4,
final LayerNorm; the metric consumes the normalized CLS embedding.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="attn")(h, h)
        x = x + h * self.param("ls1", nn.initializers.ones, (self.dim,))
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.dim * 4, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h * self.param("ls2", nn.initializers.ones, (self.dim,))


class DINOv2ViT(nn.Module):
    dim: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 14
    native_grid: int = 37  # 518/14, the grid pos_embed was trained at
    return_tokens: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N,H,W,3) ImageNet-normalized. Returns L2-normalized CLS
        embeddings (N, dim); with ``return_tokens`` also the patch-token
        grid (N, gh, gw, dim) for feature discriminators."""
        n, h, w, _ = x.shape
        gh, gw = h // self.patch, w // self.patch
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    name="patch_embed")(x)
        x = x.reshape(n, gh * gw, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, self.native_grid * self.native_grid + 1, self.dim))
        patch_pos = pos[:, 1:].reshape(
            1, self.native_grid, self.native_grid, self.dim)
        patch_pos = jax.image.resize(patch_pos, (1, gh, gw, self.dim),
                                     "bilinear")
        x = x + patch_pos.reshape(1, gh * gw, self.dim)
        x = jnp.concatenate(
            [jnp.tile(cls + pos[:, :1], (n, 1, 1)), x], axis=1)
        for i in range(self.depth):
            x = _Block(self.dim, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        cls_out = x[:, 0]
        cls_out = cls_out / jnp.linalg.norm(cls_out, axis=-1, keepdims=True)
        if self.return_tokens:
            return cls_out, x[:, 1:].reshape(n, gh, gw, self.dim)
        return cls_out


def load_dinov2_params(npz_path):
    """npz key contract (produced by tools/port_dinov2_weights.py):
    cls_token (1,1,D), pos_embed (1,1370,D), patch_embed.{kernel,bias},
    block{i}.{norm1,norm2}.{scale,bias}, block{i}.attn.{qkv_w,qkv_b,proj_w,
    proj_b} (torch layout), block{i}.{ls1,ls2}, block{i}.{fc1,fc2}.{kernel,
    bias}, norm.{scale,bias}."""
    z = np.load(npz_path)
    d = int(z["cls_token"].shape[-1])
    heads = 12 if d == 768 else max(6, d // 64)
    hd = d // heads

    def attn(i):
        qkv_w = z[f"block{i}.attn.qkv_w"]  # (3D, D) torch (out,in)
        qkv_b = z[f"block{i}.attn.qkv_b"]
        out = {}
        for j, name in enumerate(("query", "key", "value")):
            w = qkv_w[j * d:(j + 1) * d].T  # (in, out)
            b = qkv_b[j * d:(j + 1) * d]
            out[name] = {"kernel": w.reshape(d, heads, hd),
                         "bias": b.reshape(heads, hd)}
        out["out"] = {
            "kernel": z[f"block{i}.attn.proj_w"].T.reshape(heads, hd, d),
            "bias": z[f"block{i}.attn.proj_b"]}
        return out

    params = {
        "cls_token": z["cls_token"],
        "pos_embed": z["pos_embed"],
        "patch_embed": {"kernel": z["patch_embed.kernel"],
                        "bias": z["patch_embed.bias"]},
        "norm": {"scale": z["norm.scale"], "bias": z["norm.bias"]},
    }
    nblocks = len({k.split(".")[0] for k in z.files if k.startswith("block")})
    for i in range(nblocks):
        params[f"block{i}"] = {
            "norm1": {"scale": z[f"block{i}.norm1.scale"],
                      "bias": z[f"block{i}.norm1.bias"]},
            "norm2": {"scale": z[f"block{i}.norm2.scale"],
                      "bias": z[f"block{i}.norm2.bias"]},
            "attn": attn(i),
            "ls1": z[f"block{i}.ls1"],
            "ls2": z[f"block{i}.ls2"],
            "fc1": {"kernel": z[f"block{i}.fc1.kernel"],
                    "bias": z[f"block{i}.fc1.bias"]},
            "fc2": {"kernel": z[f"block{i}.fc2.kernel"],
                    "bias": z[f"block{i}.fc2.bias"]},
        }
    return {"params": jax.tree.map(jnp.asarray, params)}


def preprocess(x):
    """[-1,1] (N,H,W,C) -> 224px ImageNet-normalized RGB (reference
    util/dino_metric.py:33-58)."""
    x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
    elif x.shape[-1] > 3:
        x = x[..., :3]
    if x.shape[1:3] != (224, 224):
        x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear")
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def load_dino_into(params, node_name="freezenet_dino"):
    """Swap every ``node_name`` subtree for ported DINOv2 weights when
    ``dinov2_vitb14.npz`` exists (else unchanged — frozen random
    features); used by the vision-aided discriminator's dino member."""
    import os
    path = os.path.join(
        os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", ""), "dinov2_vitb14.npz")
    if not os.path.exists(path):
        return params
    dp = load_dinov2_params(path)["params"]

    def walk(node):
        if not isinstance(node, dict):
            return node
        return {k: (dp if k == node_name else walk(v))
                for k, v in node.items()}

    return walk(params)
