"""UNetRefAttn — unet_mha with reference-image cross-attention
(reference models/modules/unet_generator_attn/unet_generator_attn.py:
UNetGeneratorRefAttn, :1296-1599): the conditioning reference image runs
through the same encoder, and at every attention site the main tokens
attend over [main ; reference] tokens.

TPU-first: the reference image rides the batch axis through all convs (one
fused conv over 2B samples, shared weights by construction), and the
attention concatenation is a sequence-axis concat feeding the same fused
attention kernel — no second tower, no weight tying bookkeeping.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .unet_mha import ResBlock, _norm, zeros_init


class JointRefAttention(nn.Module):
    """Self+cross attention over stacked (2B, H, W, C) features: the first
    half (main) attends to main+ref tokens; the ref half self-attends."""
    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x2):
        n2, h, w, c = x2.shape
        b = n2 // 2
        heads = (self.num_heads if self.num_head_channels == -1
                 else max(1, c // self.num_head_channels))
        hd = c // heads
        seq = x2.reshape(n2, h * w, c)
        y = _norm("groupnorm", 32)(seq.reshape(n2, h * w, 1, c)).reshape(
            n2, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        qm, qr = q[:b], q[b:]
        km, kr = k[:b], k[b:]
        vm, vr = v[:b], v[b:]
        # main: q over [main; ref] keys/values
        k_joint = jnp.concatenate([km, kr], axis=1)
        v_joint = jnp.concatenate([vm, vr], axis=1)

        def attend(q_, k_, v_):
            t = q_.shape[1]
            s = k_.shape[1]
            qh = q_.reshape(b, t, heads, hd)
            kh = k_.reshape(b, s, heads, hd)
            vh = v_.reshape(b, s, heads, hd)
            from ...ops.flash_attention import flash_attention
            return flash_attention(qh, kh, vh).reshape(b, t, c)

        a_main = attend(qm, k_joint, v_joint)
        a_ref = attend(qr, kr, vr)
        a = jnp.concatenate([a_main, a_ref], axis=0)
        a = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                     bias_init=zeros_init, name="proj_out")(a)
        return x2 + a.reshape(n2, h, w, c)


class UNetRefAttn(nn.Module):
    """call(x (B,H,W,Cin), emb (B,D), ref (B,H,W,Cref)) -> (B,H,W,out)."""
    in_channel: int
    out_channel: int
    inner_channel: int
    cond_embed_dim: int
    res_blocks: Sequence[int] = (2, 2, 2, 2)
    attn_res: Sequence[int] = (16,)
    channel_mults: Sequence[int] = (1, 2, 4, 8)
    num_heads: int = 1
    num_head_channels: int = 32
    norm: str = "groupnorm"
    group_size: int = 32
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    attn_norm: str = "group"
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def _args(self):
        return dict(norm=self.norm, group_size=self.group_size,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype)

    @nn.compact
    def __call__(self, x, emb=None, ref=None, deterministic=True):
        b = x.shape[0]
        if ref is None:
            ref = jnp.zeros_like(x)
        if ref.shape[-1] != x.shape[-1]:
            # pad/trim the ref channels to the denoiser input width
            cdiff = x.shape[-1] - ref.shape[-1]
            ref = (jnp.pad(ref, ((0, 0),) * 3 + ((0, cdiff),)) if cdiff > 0
                   else ref[..., : x.shape[-1]])
        if emb is None:
            emb = jnp.ones((b, self.cond_embed_dim), dtype=self.dtype)
        emb2 = jnp.concatenate([emb, jnp.zeros_like(emb)], axis=0) \
            .astype(self.dtype)
        h = jnp.concatenate([x, ref], axis=0).astype(self.dtype)  # (2B,...)

        # static_argnums=(3,): flax counts self as argnum 0, so
        # __call__(self, x, emb, deterministic) has `deterministic` at 3
        RematRes = (nn.remat(ResBlock, static_argnums=(3,))
                    if self.remat else ResBlock)
        # pin auto-names: nn.remat renames the class (CheckpointResBlock),
        # which would fork the param tree between remat and non-remat runs
        _res_i = [0]

        def Res(**f):
            m = RematRes(name=f"ResBlock_{_res_i[0]}", **f)
            _res_i[0] += 1
            return m

        args = self._args()
        ch = int(self.channel_mults[0] * self.inner_channel)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mults):
            for _ in range(self.res_blocks[level]):
                ch = int(mult * self.inner_channel)
                h = Res(out_channel=ch, **args)(h, emb2, deterministic)
                if ds in self.attn_res:
                    h = JointRefAttention(
                        num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype)(h)
                hs.append(h)
            if level != len(self.channel_mults) - 1:
                h = Res(out_channel=ch, down=True, **args)(h, emb2,
                                                           deterministic)
                hs.append(h)
                ds *= 2

        h = Res(out_channel=ch, dropout=self.dropout, **args)(
            h, emb2, deterministic)
        h = JointRefAttention(num_heads=self.num_heads,
                              num_head_channels=self.num_head_channels,
                              dtype=self.dtype, name="mid_attn")(h)
        h = Res(out_channel=ch, dropout=self.dropout, **args)(
            h, emb2, deterministic)

        # decoder runs on the MAIN half only; at attention sites the main
        # tokens cross-attend to the encoder's reference features at the
        # same resolution (skip[b:])
        h = h[:b]
        emb_m = emb.astype(self.dtype)
        for level, mult in reversed(list(enumerate(self.channel_mults))):
            for i in range(self.res_blocks[level] + 1):
                skip2 = hs.pop()
                skip_m, skip_r = skip2[:b], skip2[b:]
                h = jnp.concatenate([h, skip_m.astype(h.dtype)], axis=-1)
                ch = int(mult * self.inner_channel)
                h = Res(out_channel=ch, **args)(h, emb_m, deterministic)
                if ds in self.attn_res:
                    h2 = jnp.concatenate(
                        [h, skip_r[..., : h.shape[-1]].astype(h.dtype)
                         if skip_r.shape[-1] >= h.shape[-1]
                         else jnp.pad(skip_r.astype(h.dtype),
                                      ((0, 0),) * 3
                                      + ((0, h.shape[-1] - skip_r.shape[-1]),))],
                        axis=0)
                    h = JointRefAttention(
                        num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype)(h2)[:b]
                if level and i == self.res_blocks[level]:
                    h = Res(out_channel=ch, up=True, **args)(h, emb_m,
                                                             deterministic)
                    ds //= 2

        h = _norm(self.norm, self.group_size)(h)
        h = nn.silu(h)
        out = nn.Conv(self.out_channel, (3, 3), padding=1, dtype=self.dtype,
                      kernel_init=zeros_init, bias_init=zeros_init,
                      name="out_proj")(h)
        return out.astype(jnp.float32)
