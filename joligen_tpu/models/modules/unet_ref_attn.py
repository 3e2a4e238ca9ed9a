"""UNetRefAttn — dual-tower unet_mha with reference-image cross-attention.

Faithful rebuild of reference models/modules/unet_generator_attn/
unet_generator_attn.py UNetGeneratorRefAttn (:1136-1660): a SECOND UNet
tower with its own weights encodes the duplicated-channel reference image;
at every attention site the ref tower self-attends and EXPORTS its qkv,
and the corresponding main-tower AttentionBlockRef (use_ref=True) runs
h = attn(q, k, v) and h_ref = attn(q, k_ref, v_ref), projecting the
channel-concat [h ; h_ref] through a zero-init 2C->C conv. The ref
decoder runs only until its terminal attention site (ds/2 not in
attn_res), whose block exports qkv without producing features
(:1420-1476).

TPU-first: NHWC layout, tokens through the fused attention path, fp32
InstanceNorm statistics; the routing (qkv export/consume per site) is
plain Python over static structure — one jitted program, no towers-in-
loops.

Checked by converted-weight forward parity
(tests/test_modern_zoo_parity.py) against the reference module executed
directly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet_mha import ResBlock, _norm, zeros_init


def _instance_norm_tokens(seq):
    """normalization1d = parameterless InstanceNorm1d on (B, C, N): per-
    channel fp32 stats over tokens (unet_attn_utils.py:60-66). ``seq`` is
    (B, N, C)."""
    f32 = seq.astype(jnp.float32)
    mu = f32.mean(axis=1, keepdims=True)
    var = f32.var(axis=1, keepdims=True)
    return ((f32 - mu) / jnp.sqrt(var + 1e-5)).astype(seq.dtype)


def _legacy_attention(qkv, heads):
    """QKVAttentionLegacy (unet_generator_attn.py:322-350): qkv rows are
    interpreted head-major [head][q|k|v][hd]. qkv: (B, 3C, N)."""
    b, w, n = qkv.shape
    ch = w // (3 * heads)
    qkv = qkv.reshape(b * heads, 3 * ch, n)
    q, k, v = jnp.split(qkv, 3, axis=1)
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, jnp.float32)))
    wgt = jnp.einsum("bct,bcs->bts", (q * scale).astype(jnp.float32),
                     (k * scale).astype(jnp.float32))
    wgt = jax.nn.softmax(wgt, axis=-1).astype(v.dtype)
    a = jnp.einsum("bts,bcs->bct", wgt, v)
    return a.reshape(b, heads * ch, n)


class AttentionBlockRef(nn.Module):
    """One attention site (reference AttentionBlockRef :1041-1131),
    reproduced in the reference's NATIVE (B, 3C, N) row layout.

    Returns (features, qkv): ``terminal`` sites return (None, qkv);
    ``use_ref`` sites consume another tower's qkv for the cross branch.
    NOTE the reference quirk reproduced here: ``chunk(3)`` slices THIRDS
    of the head-major rows (not semantic q/k/v), so the cross branch
    ``cat([q, k_ref, v_ref])`` mixes main/ref head chunks in a fixed
    scrambled pattern under the legacy attention — shipped behavior, kept
    bit-for-bit (:1108-1121)."""
    num_heads: int = 1
    num_head_channels: int = -1
    use_ref: bool = False
    terminal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, qkv_ref=None):
        n, hh, ww, c = x.shape
        heads = (self.num_heads if self.num_head_channels == -1
                 else max(1, c // self.num_head_channels))
        seq = x.reshape(n, hh * ww, c)
        y = _instance_norm_tokens(seq)
        # (B, N, 3C) -> reference row layout (B, 3C, N)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        qkv = qkv.transpose(0, 2, 1)
        if self.terminal:
            return None, qkv
        h = _legacy_attention(qkv, heads)
        if self.use_ref:
            assert qkv_ref is not None, "use_ref site needs the ref qkv"
            q_c = qkv[:, :c]
            k_ref = qkv_ref[:, c:2 * c]
            v_ref = qkv_ref[:, 2 * c:]
            h_ref = _legacy_attention(
                jnp.concatenate([q_c, k_ref, v_ref], axis=1), heads)
            h = jnp.concatenate([h, h_ref], axis=1)
        a = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                     bias_init=zeros_init,
                     name="proj_out")(h.transpose(0, 2, 1))
        return x + a.reshape(n, hh, ww, c), qkv


class UNetRefAttn(nn.Module):
    """call(x (B,H,W,Cin), emb (B,D), ref (B,H,W,Cref)) -> (B,H,W,out).
    The reference image is channel-duplicated to the denoiser input width
    (reference compute_feats :1573 ``torch.cat([ref, ref], dim=1)``)."""
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
    attn_norm: str = "instance"   # reference normalization1d
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def _args(self):
        return dict(norm=self.norm, group_size=self.group_size,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype)

    @nn.compact
    def __call__(self, x, emb=None, ref=None, deterministic=True):
        b = x.shape[0]
        if emb is None:
            emb = jnp.ones((b, self.cond_embed_dim))
        emb = emb.astype(self.dtype)
        if ref is None:
            ref = jnp.zeros(x.shape[:-1] + (self.in_channel // 2,), x.dtype)
        r = jnp.concatenate([ref, ref], axis=-1).astype(self.dtype)
        if r.shape[-1] != self.in_channel:
            cdiff = self.in_channel - r.shape[-1]
            r = (jnp.pad(r, ((0, 0),) * 3 + ((0, cdiff),)) if cdiff > 0
                 else r[..., : self.in_channel])
        x = x.astype(self.dtype)

        RematRes = (nn.remat(ResBlock, static_argnums=(3,))
                    if self.remat else ResBlock)
        counters = {"res": 0, "rres": 0, "attn": 0, "rattn": 0}

        def Res(tower, **f):
            key = "res" if tower == "main" else "rres"
            pre = "ResBlock" if tower == "main" else "RefResBlock"
            m = RematRes(name=f"{pre}_{counters[key]}", **f)
            counters[key] += 1
            return m

        def Attn(tower, **f):
            key = "attn" if tower == "main" else "rattn"
            pre = "AttnRef" if tower == "main" else "RefAttn"
            m = AttentionBlockRef(
                num_heads=self.num_heads,
                num_head_channels=self.num_head_channels,
                dtype=self.dtype, name=f"{pre}_{counters[key]}", **f)
            counters[key] += 1
            return m

        args = self._args()
        mults = list(self.channel_mults)
        last = len(mults) - 1

        # ---------------- ref tower: encoder + middle ----------------
        # reference quirk (:1330-1336): the ref in_conv is built with the
        # leftover ``ch`` from the main middle block — i.e. it outputs the
        # BOTTLENECK width, and the first ref ResBlock's skip conv maps it
        # down; its oversized skip entry is never consumed (terminal stop)
        ch = int(mults[-1] * self.inner_channel)
        hr = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                     name="ref_in_conv")(r)
        hs_ref = [hr]
        enc_qkv = []          # one qkv (or None) per encoder site
        ds = 1
        for level, mult in enumerate(mults):
            for _ in range(self.res_blocks[level]):
                ch = int(mult * self.inner_channel)
                hr = Res("ref", out_channel=ch, dropout=self.dropout,
                         **args)(hr, emb, deterministic)
                if ds in self.attn_res:
                    hr, qkv = Attn("ref")(hr)
                    enc_qkv.append(qkv)
                else:
                    enc_qkv.append(None)
                hs_ref.append(hr)
            if level != last:
                hr = Res("ref", out_channel=ch, down=True, dropout=self.dropout,
                         **args)(hr, emb, deterministic)
                hs_ref.append(hr)
                ds *= 2
        hr = Res("ref", out_channel=ch, dropout=self.dropout, **args)(
            hr, emb, deterministic)
        hr, mid_qkv = Attn("ref")(hr)
        hr = Res("ref", out_channel=ch, dropout=self.dropout, **args)(
            hr, emb, deterministic)

        # ---------------- main tower: encoder + middle ----------------
        ch = int(mults[0] * self.inner_channel)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(x)
        hs = [h]
        ds = 1
        qi = 0
        for level, mult in enumerate(mults):
            for _ in range(self.res_blocks[level]):
                ch = int(mult * self.inner_channel)
                h = Res("main", out_channel=ch, dropout=self.dropout,
                        **args)(h, emb, deterministic)
                if ds in self.attn_res:
                    h, _ = Attn("main", use_ref=True)(h, enc_qkv[qi])
                qi += 1
                hs.append(h)
            if level != last:
                h = Res("main", out_channel=ch, down=True, dropout=self.dropout,
                        **args)(h, emb, deterministic)
                hs.append(h)
                ds *= 2
        h = Res("main", out_channel=ch, dropout=self.dropout, **args)(
            h, emb, deterministic)
        h, _ = Attn("main", use_ref=True)(h, mid_qkv)
        h = Res("main", out_channel=ch, dropout=self.dropout, **args)(
            h, emb, deterministic)

        # ---------------- ref tower: decoder until terminal ----------------
        dec_qkv = []
        ds_ref = ds
        hr_run = hr
        done = False
        for level, mult in reversed(list(enumerate(mults))):
            if done:
                break
            for i in range(self.res_blocks[level] + 1):
                is_terminal = (i == self.res_blocks[level]
                               and (ds_ref // 2) not in self.attn_res)
                skip = hs_ref.pop()
                hr_run = jnp.concatenate([hr_run, skip.astype(hr_run.dtype)],
                                         axis=-1)
                ch_r = int(mult * self.inner_channel)
                hr_run = Res("ref", out_channel=ch_r, dropout=self.dropout,
                             **args)(hr_run, emb, deterministic)
                if ds_ref in self.attn_res:
                    out_feat, qkv = Attn("ref", terminal=is_terminal)(hr_run)
                    dec_qkv.append(qkv)
                    if out_feat is not None:
                        hr_run = out_feat
                else:
                    dec_qkv.append(None)
                if level and i == self.res_blocks[level]:
                    if not is_terminal:
                        hr_run = Res("ref", out_channel=ch_r, up=True,
                                     dropout=self.dropout, **args)(
                            hr_run, emb, deterministic)
                    ds_ref //= 2
            # reference breaks the LEVEL loop when the level's last module
            # was terminal (:1473-1475)
            if is_terminal:
                done = True

        # ---------------- main tower: decoder ----------------
        qi = 0
        for level, mult in reversed(list(enumerate(mults))):
            for i in range(self.res_blocks[level] + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                ch = int(mult * self.inner_channel)
                h = Res("main", out_channel=ch, dropout=self.dropout,
                        **args)(h, emb, deterministic)
                if ds in self.attn_res:
                    h, _ = Attn("main", use_ref=True)(
                        h, dec_qkv[qi] if qi < len(dec_qkv) else None)
                qi += 1
                if level and i == self.res_blocks[level]:
                    h = Res("main", out_channel=ch, up=True,
                            dropout=self.dropout, **args)(h, emb,
                                                          deterministic)
                    ds //= 2

        h = _norm(self.norm, self.group_size)(h)
        h = nn.silu(h)
        out = nn.Conv(self.out_channel, (3, 3), padding=1, dtype=self.dtype,
                      kernel_init=zeros_init, bias_init=zeros_init,
                      name="out_proj")(h)
        return out.astype(jnp.float32)
