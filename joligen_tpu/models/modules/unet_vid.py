"""UNetVid: the unet_mha denoiser inflated to video with AnimateDiff-style
temporal motion modules.

Behavioral rebuild of reference
models/modules/unet_generator_attn/unet_generator_attn_vid.py:1057-1407
(UNetVid): the spatial graph is identical to unet_mha (FiLM GroupNorm
ResBlocks + spatial attention at attn_res), with a MotionModule inserted
after every ResBlock(+Attention) in the encoder, middle, and decoder.

TPU-first: input is (B, F, H, W, C); all spatial ops fold frames into the
batch axis ((B*F, H, W, C) — pure reshape, free on TPU), temporal attention
reshapes to (B*H*W, F, C). The conditioning embedding is per-sequence and is
broadcast over frames.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .motion import MotionModule
from .unet_mha import (
    AttentionBlock,
    Downsample,
    ResBlock,
    Upsample,
    _norm,
    zeros_init,
)


class UNetVid(nn.Module):
    """Video unet_mha. call(x (B,F,H,W,C), emb (B,D)) -> (B,F,H,W,out)."""

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
    resblock_updown: bool = True
    max_sequence_length: int = 25
    motion_num_heads: int = 8
    motion_num_transformer_blocks: int = 2
    attn_norm: str = "group"
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def _res_args(self):
        return dict(norm=self.norm, group_size=self.group_size,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype)

    @nn.compact
    def __call__(self, x, emb=None, deterministic=True):
        b, f, H, W, C = x.shape
        if emb is None:
            emb = jnp.ones((b, self.cond_embed_dim), dtype=self.dtype)
        emb = emb.astype(self.dtype)
        # per-sequence embedding broadcast over frames for spatial blocks
        emb_bf = jnp.repeat(emb, f, axis=0)
        x = x.astype(self.dtype)

        # static arg = `deterministic` (flax counts self as argnum 0, so
        # __call__(self, x, emb, deterministic) puts it at 3; (2,)
        # would wrongly mark the traced embedding static)
        RematRes = (nn.remat(ResBlock, static_argnums=(3,))
                    if self.remat else ResBlock)
        # pin auto-names: nn.remat renames the class (CheckpointResBlock),
        # which would fork the param tree between remat and non-remat runs
        _res_i = [0]

        def Res(**f):
            m = RematRes(name=f"ResBlock_{_res_i[0]}", **f)
            _res_i[0] += 1
            return m

        args = self._res_args()
        motion_args = dict(num_heads=self.motion_num_heads,
                           num_transformer_blocks=self.motion_num_transformer_blocks,
                           max_len=self.max_sequence_length, dtype=self.dtype)

        def fold(h):      # (B,F,h,w,c) -> (B*F,h,w,c)
            return h.reshape((b * f,) + h.shape[2:])

        def unfold(h):    # (B*F,h,w,c) -> (B,F,h,w,c)
            return h.reshape((b, f) + h.shape[1:])

        ch = int(self.channel_mults[0] * self.inner_channel)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(fold(x))
        hs = [h]
        ds = 1
        mm = 0
        # encoder
        for level, mult in enumerate(self.channel_mults):
            for _ in range(self.res_blocks[level]):
                ch = int(mult * self.inner_channel)
                h = Res(out_channel=ch, **args)(h, emb_bf, deterministic)
                if ds in self.attn_res:
                    h = AttentionBlock(norm_kind=self.attn_norm,
                           num_heads=self.num_heads,
                                       num_head_channels=self.num_head_channels,
                                       dtype=self.dtype)(h)
                h = fold(MotionModule(**motion_args, name=f"motion_enc{mm}")(unfold(h)))
                mm += 1
                hs.append(h)
            if level != len(self.channel_mults) - 1:
                if self.resblock_updown:
                    h = Res(out_channel=ch, down=True, **args)(h, emb_bf, deterministic)
                else:
                    h = Downsample(ch, dtype=self.dtype)(h)
                hs.append(h)
                ds *= 2

        # middle — ResBlock, Attention, ResBlock; the reference has NO
        # motion module in the middle block (unet_generator_attn_vid.py:
        # 1234-1263)
        h = Res(out_channel=ch, dropout=self.dropout, **args)(h, emb_bf, deterministic)
        h = AttentionBlock(norm_kind=self.attn_norm,
                           num_heads=self.num_heads,
                           num_head_channels=self.num_head_channels,
                           dtype=self.dtype)(h)
        h = Res(out_channel=ch, dropout=self.dropout, **args)(h, emb_bf, deterministic)

        # decoder
        mm = 0
        for level, mult in reversed(list(enumerate(self.channel_mults))):
            for i in range(self.res_blocks[level] + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                ch = int(mult * self.inner_channel)
                h = Res(out_channel=ch, **args)(h, emb_bf, deterministic)
                if ds in self.attn_res:
                    h = AttentionBlock(norm_kind=self.attn_norm,
                           num_heads=self.num_heads,
                                       num_head_channels=self.num_head_channels,
                                       dtype=self.dtype)(h)
                h = fold(MotionModule(**motion_args, name=f"motion_dec{mm}")(unfold(h)))
                mm += 1
                if level and i == self.res_blocks[level]:
                    if self.resblock_updown:
                        h = Res(out_channel=ch, up=True, **args)(h, emb_bf, deterministic)
                    else:
                        h = Upsample(ch, dtype=self.dtype)(h)
                    ds //= 2

        h = _norm(self.norm, self.group_size)(h)
        h = nn.silu(h)
        out = nn.Conv(self.out_channel, (3, 3), padding=1, dtype=self.dtype,
                      kernel_init=zeros_init, bias_init=zeros_init,
                      name="out_proj")(h)
        return unfold(out).astype(jnp.float32)
