"""JiT — "Just image Transformer" DiT-style x-prediction denoiser.

Behavioral parity with reference models/modules/vit/vit.py (verified by
converted-weight forward parity, tests/test_numerical_parity.py): bottleneck
patch embed (bias-free first proj, vit.py:45-49), fixed sin-cos positional
embedding with the reference's w-first half order (util/model_util.py:202-210),
axial interleaved RoPE on q/k with identity rows for prefix tokens
(util/model_util.py:97-163), register tokens AND in-context class tokens
inserted at block ``in_context_start`` (vit.py:459-476), RMSNorm + qk-norm
attention, biased SwiGLU FFN with the reference's int(2/3) hidden rounding
(vit.py:187-200), AdaLN 6-way modulation, weighted final RMSNorm, raw
fractional t fed to the 256-dim sinusoidal embedder (vit.py:73-103 — the
reference does NOT scale t by 1000), zero-initialized final layer, and the
JiT-B/L/H variant table incl. per-variant in_context_start. TPU-first design
choices: the two block phases are each stacked with ``nn.scan`` (two compiled
block programs instead of ``depth`` inlined copies), fused dot-product
attention, bf16 compute with fp32 norms, RoPE tables as baked constants.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.schedules import timestep_embedding


def sincos_2d_pos_embed(dim, grid_h, grid_w):
    """Fixed 2D sin-cos embedding (reference util/model_util.py:182-231).

    NOTE the reference's half order: meshgrid(w, h) puts the COLUMN index
    in grid[0], and get_2d_sincos_pos_embed_from_grid feeds grid[0] to the
    first half — so the first dim//2 channels encode the column (w) and
    the second half the row (h)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_h, dtype=np.float64)
    gw = np.arange(grid_w, dtype=np.float64)
    grid = np.meshgrid(gw, gh)  # grid[0]=column index, grid[1]=row index
    emb_w = _1d(dim // 2, grid[0])
    emb_h = _1d(dim // 2, grid[1])
    return np.concatenate([emb_w, emb_h], axis=1).astype(np.float32)


def axial_rope_tables(grid_h, grid_w, head_dim, prefix=0):
    """Axial interleaved RoPE cos/sin tables, (prefix + gh*gw, head_dim).

    Reference VisionRotaryEmbeddingFast (util/model_util.py:97-163):
    freqs_i = 10000^(-2i/(hd/2)) for i < hd//4, pair-repeated "(n r)" r=2;
    first hd//2 lanes rotate by the ROW angle, second hd//2 by the COLUMN
    angle; prefix (register + in-context) tokens get identity rows
    (cos=1, sin=0, model_util.py:132-147)."""
    dim = head_dim // 2
    assert dim % 2 == 0, "head_dim must be a multiple of 4 for axial RoPE"
    freqs = 1.0 / (10000 ** (np.arange(0, dim, 2)[: dim // 2]
                             .astype(np.float64) / dim))
    fh = np.repeat(np.arange(grid_h)[:, None] * freqs[None], 2, axis=-1)
    fw = np.repeat(np.arange(grid_w)[:, None] * freqs[None], 2, axis=-1)
    full = np.concatenate(
        [np.broadcast_to(fh[:, None, :], (grid_h, grid_w, dim)),
         np.broadcast_to(fw[None, :, :], (grid_h, grid_w, dim))],
        axis=-1).reshape(grid_h * grid_w, head_dim)
    cos, sin = np.cos(full), np.sin(full)
    if prefix:
        cos = np.concatenate([np.ones((prefix, head_dim)), cos], axis=0)
        sin = np.concatenate([np.zeros((prefix, head_dim)), sin], axis=0)
    return cos.astype(np.float32), sin.astype(np.float32)


def rope_rotate(t, cos, sin):
    """t * cos + rotate_half(t) * sin with interleaved pairs
    (model_util.py:34-38,156-163). t: (B, N, heads, hd); tables (N, hd)."""
    x = t.reshape(*t.shape[:-1], t.shape[-1] // 2, 2)
    rot = jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(t.shape)
    c = cos[None, :, None, :].astype(t.dtype)
    s = sin[None, :, None, :].astype(t.dtype)
    return t * c + rot * s


class RMSNorm(nn.Module):
    eps: float = 1e-6
    scale: bool = True

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        x32 = x.astype(jnp.float32)
        n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                                + self.eps)
        if self.scale:
            g = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            n = n * g
        return n.astype(orig)


class SwiGLUFFN(nn.Module):
    """Reference SwiGLUFFN (vit.py:187-200): hidden = int(2/3 * mlp_dim),
    biased projections; the reference's fused w12 maps to split w1/w3."""
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = int(self.hidden * 2 / 3)
        a = nn.Dense(h, use_bias=True, dtype=self.dtype, name="w1")(x)
        b = nn.Dense(h, use_bias=True, dtype=self.dtype, name="w3")(x)
        return nn.Dense(x.shape[-1], use_bias=True, dtype=self.dtype,
                        name="w2")(nn.silu(a) * b)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class JiTBlock(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, rope_cos, rope_sin):
        d = x.shape[-1]
        mod = nn.Dense(6 * d, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       name="adaLN")(nn.silu(c))
        (s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp) = jnp.split(mod, 6, axis=-1)

        h = modulate(RMSNorm(name="norm1")(x), s_msa, sc_msa)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = q.shape
        hd = d // self.num_heads
        q = RMSNorm(name="q_norm")(q.reshape(b, n, self.num_heads, hd))
        k = RMSNorm(name="k_norm")(k.reshape(b, n, self.num_heads, hd))
        v = v.reshape(b, n, self.num_heads, hd)
        q = rope_rotate(q, rope_cos, rope_sin)
        k = rope_rotate(k, rope_cos, rope_sin)
        from ...ops.flash_attention import flash_attention
        a = flash_attention(q, k, v).reshape(b, n, d)
        a = nn.Dense(d, dtype=self.dtype, name="proj")(a)
        x = x + g_msa[:, None, :] * a

        h = modulate(RMSNorm(name="norm2")(x), s_mlp, sc_mlp)
        x = x + g_mlp[:, None, :] * SwiGLUFFN(int(d * 4), dtype=self.dtype,
                                              name="mlp")(h)
        return x


class _ScanBlock(nn.Module):
    """Scan adapter: carry = tokens, broadcast = (c, rope tables)."""
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, rope_cos, rope_sin):
        return JiTBlock(num_heads=self.num_heads, dtype=self.dtype,
                        name="block")(x, c, rope_cos, rope_sin), None


JiT_VARIANT_CONFIGS = {
    "JiT-B/16": dict(depth=12, hidden_size=768, num_heads=12,
                     bottleneck_dim=128, patch_size=16,
                     in_context_len=32, in_context_start=4),
    "JiT-B/8": dict(depth=12, hidden_size=768, num_heads=12,
                    bottleneck_dim=128, patch_size=8,
                    in_context_len=32, in_context_start=4),
    "JiT-B/4": dict(depth=12, hidden_size=768, num_heads=12,
                    bottleneck_dim=128, patch_size=4,
                    in_context_len=32, in_context_start=4),
    "JiT-B/2": dict(depth=12, hidden_size=768, num_heads=12,
                    bottleneck_dim=128, patch_size=2,
                    in_context_len=32, in_context_start=4),
    "JiT-B/32": dict(depth=12, hidden_size=768, num_heads=12,
                     bottleneck_dim=128, patch_size=32,
                     in_context_len=32, in_context_start=4),
    "JiT-L/16": dict(depth=24, hidden_size=1024, num_heads=16,
                     bottleneck_dim=128, patch_size=16,
                     in_context_len=32, in_context_start=8),
    "JiT-L/32": dict(depth=24, hidden_size=1024, num_heads=16,
                     bottleneck_dim=128, patch_size=32,
                     in_context_len=32, in_context_start=8),
    "JiT-H/16": dict(depth=32, hidden_size=1280, num_heads=16,
                     bottleneck_dim=256, patch_size=16,
                     in_context_len=32, in_context_start=10),
    "JiT-H/32": dict(depth=32, hidden_size=1280, num_heads=16,
                     bottleneck_dim=256, patch_size=32,
                     in_context_len=32, in_context_start=10),
}


class JiT(nn.Module):
    """x-prediction ViT. call(x NHWC, t (B,) in [0,1], y (B,) int labels)."""
    patch_size: int = 16
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    bottleneck_dim: int = 128
    num_classes: int = 1
    num_register_tokens: int = 0
    in_context_len: int = 32
    in_context_start: int = 4
    out_channels: Optional[int] = None
    mask_size_conditioning: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_opt(cls, opt, dtype=jnp.float32):
        variant = getattr(opt, "G_vit_variant", "JiT-B/16") or "JiT-B/16"
        cfg = dict(JiT_VARIANT_CONFIGS.get(variant, JiT_VARIANT_CONFIGS["JiT-B/16"]))
        # explicit G_vit_* attrs override the variant table
        # (reference diffusion_networks.py:258-276)
        for key in ("depth", "hidden_size", "num_heads", "patch_size",
                    "bottleneck_dim", "in_context_len", "in_context_start"):
            v = getattr(opt, f"G_vit_{key}", None)
            if v is not None:
                cfg[key] = v
        if getattr(opt, "G_vit_disable_bottleneck", False):
            cfg["bottleneck_dim"] = cfg["hidden_size"]
        return cls(
            patch_size=cfg["patch_size"], hidden_size=cfg["hidden_size"],
            depth=cfg["depth"], num_heads=cfg["num_heads"],
            bottleneck_dim=cfg["bottleneck_dim"],
            # factory defaults mirror reference diffusion_networks.py:269-274
            in_context_len=cfg.get("in_context_len", 32),
            in_context_start=cfg.get("in_context_start", 4),
            num_classes=max(1, getattr(opt, "G_vit_num_classes", 1)),
            num_register_tokens=getattr(opt, "G_vit_num_register_tokens", 0),
            out_channels=opt.model_output_nc,
            mask_size_conditioning=getattr(opt, "alg_b2b_mask_size_conditioning",
                                           False),
            remat=getattr(opt, "tpu_remat", False),
            dtype=dtype)

    def _scan(self, length, name):
        Block = _ScanBlock
        if self.remat:
            Block = nn.remat(_ScanBlock, prevent_cse=False)
        return nn.scan(
            Block, variable_axes={"params": 0}, split_rngs={"params": True},
            length=length,
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast))(
                num_heads=self.num_heads, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, t, y=None, mask_size=None, deterministic=True):
        b, H, W, C = x.shape
        p = self.patch_size
        d = self.hidden_size
        gh, gw = H // p, W // p
        hd = d // self.num_heads
        out_c = self.out_channels or C

        # bottleneck patch embed (vit.py BottleneckPatchEmbed: proj1 has
        # no bias, proj2 does)
        patches = x.reshape(b, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh * gw, p * p * C).astype(self.dtype)
        h = nn.Dense(self.bottleneck_dim, use_bias=False, dtype=self.dtype,
                     name="patch_bneck")(patches)
        h = nn.Dense(d, dtype=self.dtype, name="patch_proj")(h)

        pos = sincos_2d_pos_embed(d, gh, gw)
        h = h + jnp.asarray(pos, self.dtype)[None]

        # conditioning vector: t + class (+ mask-size). The reference
        # embeds RAW fractional t (vit.py:73-103) — no x1000 scaling.
        t_emb = timestep_embedding(t, 256)
        t_emb = nn.Dense(d, dtype=self.dtype, name="t_0")(t_emb)
        t_emb = nn.silu(t_emb)
        c = nn.Dense(d, dtype=self.dtype, name="t_1")(t_emb)
        # class table always exists (vit.py LabelEmbedder: num_classes+1
        # rows, last = CFG null class)
        ytab = self.param("y_embed", nn.initializers.normal(0.02),
                          (self.num_classes + 1, d))
        if y is None:
            y = jnp.full((b,), self.num_classes, jnp.int32)
        y_emb = jnp.take(ytab, y, axis=0).astype(c.dtype)
        c = c + y_emb
        if self.mask_size_conditioning:
            # reference always applies the embedder in this mode (zeros
            # input when absent) with a zero-init last layer
            # (vit.py:430-441,399-401)
            if mask_size is None:
                mask_size = jnp.zeros((b, 6), jnp.float32)
            ms = nn.Dense(d, dtype=self.dtype, name="ms_0")(
                mask_size.astype(self.dtype))
            ms = nn.silu(ms)
            c = c + nn.Dense(d, dtype=self.dtype,
                             kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             name="ms_1")(ms)

        # phase 1: image tokens only (feat_rope, no prefix)
        start = max(0, min(self.in_context_start, self.depth))
        insert_prefix = self.in_context_start < self.depth and (
            self.num_register_tokens > 0 or self.in_context_len > 0)
        cos0, sin0 = axial_rope_tables(gh, gw, hd, prefix=0)
        cos0, sin0 = jnp.asarray(cos0), jnp.asarray(sin0)
        if start > 0:
            h, _ = self._scan(start, "blocks_pre")(h, c, cos0, sin0)

        # insert register + in-context class tokens at in_context_start
        # (vit.py:459-476: [registers, in_context, image])
        n_prefix = 0
        if insert_prefix:
            parts = []
            if self.num_register_tokens > 0:
                reg = self.param("register_tokens",
                                 nn.initializers.normal(0.02),
                                 (1, self.num_register_tokens, d))
                parts.append(jnp.tile(reg.astype(h.dtype), (b, 1, 1)))
                n_prefix += self.num_register_tokens
            if self.in_context_len > 0:
                icp = self.param("in_context_posemb",
                                 nn.initializers.normal(0.02),
                                 (1, self.in_context_len, d))
                ctx = (jnp.tile(y_emb[:, None, :], (1, self.in_context_len, 1))
                       + icp.astype(h.dtype))
                parts.append(ctx)
                n_prefix += self.in_context_len
            h = jnp.concatenate(parts + [h], axis=1)

        if start < self.depth:
            cos1, sin1 = axial_rope_tables(gh, gw, hd, prefix=n_prefix)
            cos1, sin1 = jnp.asarray(cos1), jnp.asarray(sin1)
            h, _ = self._scan(self.depth - start, "blocks_post")(
                h, c, cos1, sin1)

        if n_prefix:
            h = h[:, n_prefix:]

        # final layer (weighted RMSNorm + AdaLN modulate + zero-init linear)
        mod = nn.Dense(2 * d, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       name="final_adaLN")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = modulate(RMSNorm(name="final_norm")(h), shift, scale)
        h = nn.Dense(p * p * out_c, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="final_proj")(h)

        h = h.reshape(b, gh, gw, p, p, out_c).transpose(0, 1, 3, 2, 4, 5)
        return h.reshape(b, H, W, out_c).astype(jnp.float32)
