"""JiTViD — video JiT: per-frame DiT blocks + temporal motion modules in
token space.

Behavioral rebuild of reference models/modules/vit/vit_vid.py (JiTViD):
frames fold into the batch for the spatial transformer; MotionModules run
temporal attention over the frame axis of the patch tokens at configurable
insert layers (``motion_every``; 0 = one shared module after the last
block). Conditioning: per-frame timestep t, class label with CFG-null slot,
mask-bbox-size vector (6-d, zero-init embedder), temporal frame-step
(timestep-embedded, zero-init), masked global-context image (CNN encoder ->
AdaLN, or patch tokens), and object-reference images as prefix tokens.

TPU-first: blocks inside each motion segment are stacked with ``nn.scan``
(one compiled block program), attention uses the fused XLA path, and all
reshapes between (B,F,...) and (B*F,...) are layout no-ops.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.schedules import timestep_embedding
from .jit import (JiTBlock, RMSNorm, axial_rope_tables, modulate,
                  sincos_2d_pos_embed)
from .motion import TemporalTransformerBlock

zeros_init = nn.initializers.zeros


JiTVid_VARIANT_CONFIGS = {
    f"JiTVid-{k.split('-', 1)[1]}": dict(
        depth={"B": 12, "L": 24, "H": 32}[k.split("-")[1].split("/")[0]],
        hidden_size={"B": 768, "L": 1024, "H": 1280}[k.split("-")[1].split("/")[0]],
        num_heads={"B": 12, "L": 16, "H": 16}[k.split("-")[1].split("/")[0]],
        bottleneck_dim={"B": 128, "L": 128, "H": 256}[k.split("-")[1].split("/")[0]],
        patch_size=int(k.split("/")[1]),
        in_context_len=32,
        in_context_start={"B": 4, "L": 8, "H": 10}[k.split("-")[1].split("/")[0]],
    )
    for k in ("JiT-B/2", "JiT-B/4", "JiT-B/8", "JiT-B/16", "JiT-B/32",
              "JiT-L/16", "JiT-L/32", "JiT-H/16", "JiT-H/32")
}


class TokenMotionModule(nn.Module):
    """Temporal transformer over patch tokens: (B, F, T, D) -> same, with a
    zero-init output projection (identity at init)."""
    num_heads: int = 8
    num_layers: int = 2
    max_len: int = 25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, t, d = x.shape
        res = x
        # Reference TemporalTransformer3DModel normalizes the token grid
        # with GroupNorm(32) over the channel dim, stats per (b, f) sample
        # over (tokens, d/groups) (vit_vid.py:375-407) — NOT LayerNorm.
        groups = 32
        while d % groups:
            groups -= 1
        y = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(
            x.reshape(b * f, t, d).astype(self.dtype)).reshape(x.shape)
        y = nn.Dense(d, dtype=self.dtype, name="proj_in")(y)
        y = y.transpose(0, 2, 1, 3).reshape(b * t, f, d)
        for i in range(self.num_layers):
            y = TemporalTransformerBlock(self.num_heads, max_len=self.max_len,
                                         dtype=self.dtype, name=f"block{i}")(y)
        y = y.reshape(b, t, f, d).transpose(0, 2, 1, 3)
        y = nn.Dense(d, dtype=self.dtype, kernel_init=zeros_init,
                     bias_init=zeros_init, name="proj_out")(y)
        return res + y


class GlobalContextEncoder(nn.Module):
    """Small CNN over the masked global-context image -> hidden vector
    (reference vit_vid.py GlobalContextEncoder), zero-init final proj so it
    starts as a no-op on the conditioning."""
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        for i, ch in enumerate((64, 128, 256, 256)):
            h = nn.Conv(ch, (3, 3), strides=2, padding=1, dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=min(32, ch), dtype=self.dtype,
                             name=f"gn{i}")(h)
            h = nn.silu(h)
        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj0")(h)
        h = nn.silu(h)
        return nn.Dense(self.hidden_size, dtype=self.dtype,
                        kernel_init=zeros_init, bias_init=zeros_init,
                        name="proj1")(h)


class _BottleneckPatchEmbed(nn.Module):
    bottleneck_dim: int
    hidden_size: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(N, H, W, C) -> (N, T, hidden)."""
        n, H, W, C = x.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        patches = x.reshape(n, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(n, gh * gw, p * p * C).astype(self.dtype)
        # proj1 is bias-free, proj2 biased (vit_vid.py BottleneckPatchEmbed)
        h = nn.Dense(self.bottleneck_dim, use_bias=False, dtype=self.dtype,
                     name="proj1")(patches)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="proj2")(h)


class JiTViD(nn.Module):
    """call(x (B,F,H,W,C), t (B,F) or (B,) in [0,1], y (B,) labels, ...)
    -> (B,F,H,W,out_channels)."""

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
    temporal_frame_step_conditioning: bool = False
    global_context_mode: str = "none"   # none | adaln | tokens
    global_context_size: int = 128
    object_ref_num_images: int = 0
    object_ref_size: int = 64
    motion_every: int = 0               # 0 = single shared module after last block
    motion_num_heads: int = 8
    motion_num_layers: int = 2
    max_frames: int = 25
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_opt(cls, opt, dtype=jnp.float32):
        variant = getattr(opt, "G_vit_variant", "") or "JiT-B/16"
        if variant.startswith("JiT-"):
            variant = "JiTVid-" + variant[len("JiT-"):]
        cfg = dict(JiTVid_VARIANT_CONFIGS.get(variant,
                                              JiTVid_VARIANT_CONFIGS["JiTVid-B/16"]))
        # explicit G_vit_* attrs override the variant table
        # (reference diffusion_networks.py:308-330)
        for key in ("depth", "hidden_size", "num_heads", "patch_size",
                    "bottleneck_dim", "in_context_len", "in_context_start"):
            v = getattr(opt, f"G_vit_{key}", None)
            if v is not None:
                cfg[key] = v
        if getattr(opt, "G_vit_disable_bottleneck", False):
            cfg["bottleneck_dim"] = cfg["hidden_size"]
        gcm = getattr(opt, "alg_b2b_global_context_mode", "") or "none"
        return cls(
            patch_size=cfg["patch_size"], hidden_size=cfg["hidden_size"],
            depth=cfg["depth"], num_heads=cfg["num_heads"],
            bottleneck_dim=cfg["bottleneck_dim"],
            in_context_len=cfg.get("in_context_len", 32),
            in_context_start=cfg.get("in_context_start", 4),
            num_classes=max(1, getattr(opt, "G_vit_num_classes", 1)),
            num_register_tokens=getattr(opt, "G_vit_num_register_tokens", 0),
            out_channels=opt.model_output_nc,
            mask_size_conditioning=getattr(opt, "alg_b2b_mask_size_conditioning",
                                           False),
            temporal_frame_step_conditioning=getattr(
                opt, "alg_b2b_temporal_frame_step_conditioning", False),
            global_context_mode=gcm,
            global_context_size=getattr(opt, "alg_b2b_global_context_size", 128),
            object_ref_num_images=len(
                getattr(opt, "alg_b2b_object_ref_paths", []) or []),
            object_ref_size=getattr(opt, "alg_b2b_object_ref_size", 64),
            motion_every=getattr(opt, "G_vit_vid_motion_every", 0) or 0,
            max_frames=max(25, getattr(opt, "data_temporal_number_frames", 8)),
            remat=getattr(opt, "tpu_remat", False),
            dtype=dtype)

    def _segments(self, split_at):
        """Split depth into scanned segments separated by motion modules
        AND by the prefix-insertion block. Returns a list of
        (start, end, has_motion_after): blocks [start, end) run as one
        ``nn.scan``, then a motion module if has_motion_after (reference
        vit_vid.py:1040-1055 motion_insert_layers; insertion boundary
        vit_vid.py:1296-1318)."""
        if self.motion_every <= 0:
            motion_after = {self.depth - 1}
        else:
            motion_after = {i for i in range(self.depth)
                            if (i + 1) % self.motion_every == 0}
            motion_after.add(self.depth - 1)
        bounds = {0, self.depth}
        bounds |= {i + 1 for i in motion_after if i + 1 < self.depth}
        if 0 < split_at < self.depth:
            bounds.add(split_at)
        bounds = sorted(bounds)
        return [(a, b, (b - 1) in motion_after)
                for a, b in zip(bounds[:-1], bounds[1:])]

    @nn.compact
    def __call__(self, x, t, y=None, mask_size=None, temporal_frame_step=None,
                 global_context=None, object_ref=None, deterministic=True):
        B, F, H, W, C = x.shape
        p = self.patch_size
        d = self.hidden_size
        gh, gw = H // p, W // p
        out_c = self.out_channels or C
        bf = B * F

        # ---- patch embed per frame
        h = _BottleneckPatchEmbed(self.bottleneck_dim, d, p, dtype=self.dtype,
                                  name="x_embed")(x.reshape(bf, H, W, C))
        pos = sincos_2d_pos_embed(d, gh, gw)
        h = h + jnp.asarray(pos, h.dtype)[None]

        # ---- conditioning vector c per (B*F). The reference embeds RAW
        # fractional t (vit_vid.py TimestepEmbedder) — no x1000 scaling.
        t = jnp.asarray(t)
        if t.ndim == 1:                         # (B,) -> per-frame
            t = jnp.repeat(t, F)
        else:                                   # (B,F)
            t = t.reshape(bf)
        t_emb = timestep_embedding(t, 256)
        t_emb = nn.Dense(d, dtype=self.dtype, name="t_0")(t_emb)
        c = nn.Dense(d, dtype=self.dtype, name="t_1")(nn.silu(t_emb))

        # class table always exists (vit_vid.py LabelEmbedder)
        ytab = self.param("y_embed", nn.initializers.normal(0.02),
                          (self.num_classes + 1, d))
        if y is None:
            y = jnp.full((B,), self.num_classes, jnp.int32)
        yf = jnp.repeat(y, F) if y.shape[0] == B else y
        y_emb = jnp.take(ytab, yf, axis=0).astype(c.dtype)
        c = c + y_emb

        if self.mask_size_conditioning:
            if mask_size is None:
                mask_size = jnp.zeros((bf, 6), jnp.float32)
            elif mask_size.ndim == 2 and mask_size.shape[0] == B:
                mask_size = jnp.repeat(mask_size, F, axis=0)
            elif mask_size.ndim == 3:
                mask_size = mask_size.reshape(bf, -1)
            ms = nn.Dense(d, dtype=self.dtype, name="ms_0")(
                mask_size.astype(self.dtype))
            c = c + nn.Dense(d, dtype=self.dtype, kernel_init=zeros_init,
                             bias_init=zeros_init, name="ms_1")(nn.silu(ms))

        if self.temporal_frame_step_conditioning:
            if temporal_frame_step is None:
                fs = jnp.zeros((bf,), jnp.float32)
            else:
                fs = jnp.asarray(temporal_frame_step, jnp.float32).reshape(-1)
                if fs.shape[0] == B:
                    fs = jnp.repeat(fs, F)
                elif fs.shape[0] == 1:
                    fs = jnp.broadcast_to(fs, (bf,))
            fs_emb = timestep_embedding(fs, 256)
            fs_emb = nn.Dense(d, dtype=self.dtype, name="fs_0")(fs_emb)
            c = c + nn.Dense(d, dtype=self.dtype, kernel_init=zeros_init,
                             bias_init=zeros_init, name="fs_1")(nn.silu(fs_emb))

        if self.global_context_mode == "adaln" and global_context is not None:
            gc = global_context
            if gc.ndim == 4:                    # (B,h,w,3) -> per frame
                gc = jnp.repeat(gc, F, axis=0)
            else:
                gc = gc.reshape((bf,) + gc.shape[2:])
            c = c + GlobalContextEncoder(d, dtype=self.dtype, name="gc_enc")(gc)

        # ---- prefix tokens, reference order [registers, global-context,
        # object-refs, in-context] (vit_vid.py:1296-1318), inserted at
        # block ``in_context_start`` — NOT at the input
        def _build_prefix():
            n_prefix, prefix = 0, []
            if self.num_register_tokens > 0:
                reg = self.param("register_tokens",
                                 nn.initializers.normal(0.02),
                                 (1, self.num_register_tokens, d))
                prefix.append(jnp.tile(reg.astype(h.dtype), (bf, 1, 1)))
                n_prefix += self.num_register_tokens
            if self.global_context_mode == "tokens":
                # tokens are ALWAYS inserted in this mode — zero context
                # image when absent (vit_vid.py:1183-1196)
                gc = global_context
                if gc is None:
                    s = self.global_context_size
                    gc = jnp.zeros((bf, s, s, 3), jnp.float32)
                elif gc.ndim == 4:
                    gc = jnp.repeat(gc, F, axis=0)
                else:
                    gc = gc.reshape((bf,) + gc.shape[2:])
                gtok = _BottleneckPatchEmbed(self.bottleneck_dim, d, p,
                                             dtype=self.dtype, name="gc_embed")(gc)
                gpos = self.param("gc_posemb", nn.initializers.normal(0.02),
                                  (1, gtok.shape[1], d))
                gtype = self.param("gc_type", nn.initializers.normal(0.02),
                                   (1, 1, d))
                prefix.append(gtok + gpos.astype(gtok.dtype)
                              + gtype.astype(gtok.dtype))
                n_prefix += gtok.shape[1]
            if self.object_ref_num_images > 0:
                # object_ref: (B, N, s, s, 3) shared across frames; zero
                # refs when absent (vit_vid.py:1198-1232)
                if object_ref is None:
                    object_ref = jnp.zeros(
                        (B, self.object_ref_num_images, self.object_ref_size,
                         self.object_ref_size, 3), jnp.float32)
                n_ref = object_ref.shape[1]
                o = object_ref.reshape((B * n_ref,) + object_ref.shape[2:])
                otok = _BottleneckPatchEmbed(self.bottleneck_dim, d, p,
                                             dtype=self.dtype,
                                             name="oref_embed")(o)
                otok = otok.reshape(B, -1, d)
                opos = self.param("oref_posemb", nn.initializers.normal(0.02),
                                  (1, otok.shape[1], d))
                otype = self.param("oref_type", nn.initializers.normal(0.02),
                                   (1, 1, d))
                otok = otok + opos.astype(otok.dtype) + otype.astype(otok.dtype)
                prefix.append(jnp.repeat(otok, F, axis=0))
                n_prefix += otok.shape[1]
            if self.in_context_len > 0:
                icp = self.param("in_context_posemb",
                                 nn.initializers.normal(0.02),
                                 (1, self.in_context_len, d))
                ctx = (jnp.tile(y_emb[:, None, :], (1, self.in_context_len, 1))
                       + icp.astype(h.dtype))
                prefix.append(ctx)
                n_prefix += self.in_context_len
            return n_prefix, prefix

        would_insert = (self.num_register_tokens > 0
                        or self.in_context_len > 0
                        or self.global_context_mode == "tokens"
                        or self.object_ref_num_images > 0)
        split_at = self.in_context_start if would_insert else self.depth

        hd = d // self.num_heads
        cos0, sin0 = axial_rope_tables(gh, gw, hd, prefix=0)
        cos0, sin0 = jnp.asarray(cos0), jnp.asarray(sin0)
        cos1 = sin1 = None

        # ---- transformer segments (split at motion inserts and at the
        # prefix-insertion block) with motion modules between
        Block = JiTBlock
        if self.remat:
            Block = nn.remat(JiTBlock, prevent_cse=False)

        class _Scanned(nn.Module):
            num_heads: int
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x, c, rc, rs):
                return Block(num_heads=self.num_heads, dtype=self.dtype,
                             name="block")(x, c, rc, rs), None

        share_motion = self.motion_every <= 0
        n_prefix = 0
        for si, (a, b2, has_motion) in enumerate(self._segments(split_at)):
            if a == split_at and a < self.depth and would_insert:
                n_prefix, prefix = _build_prefix()
                h = jnp.concatenate(prefix + [h], axis=1)
                cs, ss = axial_rope_tables(gh, gw, hd, prefix=n_prefix)
                cos1, sin1 = jnp.asarray(cs), jnp.asarray(ss)
            rc, rs = (cos1, sin1) if (a >= split_at and n_prefix) else (cos0, sin0)
            Scan = nn.scan(_Scanned, variable_axes={"params": 0},
                           split_rngs={"params": True}, length=b2 - a,
                           in_axes=(nn.broadcast,) * 3)
            h, _ = Scan(num_heads=self.num_heads, dtype=self.dtype,
                        name=f"blocks{si}")(h, c, rc, rs)
            if has_motion:
                pre = h[:, :n_prefix] if n_prefix else None
                tok = h[:, n_prefix:].reshape(B, F, gh * gw, d)
                tok = TokenMotionModule(
                    self.motion_num_heads, self.motion_num_layers,
                    max_len=self.max_frames, dtype=self.dtype,
                    name=("motion" if share_motion else f"motion{si}"))(tok)
                tok = tok.reshape(bf, gh * gw, d)
                h = jnp.concatenate([pre, tok], axis=1) if pre is not None else tok

        if n_prefix:
            h = h[:, n_prefix:]

        # ---- final layer
        mod = nn.Dense(2 * d, dtype=self.dtype, kernel_init=zeros_init,
                       name="final_adaLN")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = modulate(RMSNorm(name="final_norm")(h), shift, scale)
        h = nn.Dense(p * p * out_c, dtype=self.dtype, kernel_init=zeros_init,
                     name="final_proj")(h)
        h = h.reshape(bf, gh, gw, p, p, out_c).transpose(0, 1, 3, 2, 4, 5)
        return h.reshape(B, F, H, W, out_c).astype(jnp.float32)
