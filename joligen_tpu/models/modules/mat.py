"""MAT — Mask-Aware Transformer inpainting generator + StyleGAN2 D.

TPU-native rebuild of reference models/modules/mat/mat.py (~1600 LoC of
StyleGAN2-lineage CUDA-backed torch): mapping network with w-average
truncation, a mask-aware first stage (partial convs + token transformer on
valid tokens + style fusion), a conv encoder with skip features, and a
StyleGAN2 decoder of modulated/demodulated convs with per-layer noise and
RGB accumulation. The reference's custom CUDA ops map as:
  - upfirdn2d       -> ops/upfirdn2d.py (lax.conv_general_dilated)
  - bias_act        -> plain XLA fusion (bias+lrelu fold into the conv)
  - modulated conv  -> einsum-scaled weights, demodulated in fp32 (MXU)
  - conv2d_gradfix  -> unnecessary (JAX grads are deterministic)

Masks follow MAT convention: 1 = known pixel, 0 = hole.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.upfirdn2d import setup_filter, upfirdn2d

lrelu = lambda x: nn.leaky_relu(x, 0.2) * math.sqrt(2.0)


def blur_up(x, factor=2):
    f = setup_filter([1, 3, 3, 1], gain=factor ** 2)
    p = f.shape[0] - factor
    pt, pb = (p + 1) // 2 + factor - 1, p // 2
    return upfirdn2d(x, f, up=factor, padding=(pt, pb, pt, pb))


def blur_down(x, factor=2):
    f = setup_filter([1, 3, 3, 1])
    p = f.shape[0] - factor
    return upfirdn2d(x, f, down=factor,
                     padding=((p + 1) // 2, p // 2, (p + 1) // 2, p // 2))


class EqualDense(nn.Module):
    """Equalized-lr dense (StyleGAN2 FullyConnectedLayer)."""
    features: int
    lr_mul: float = 1.0
    bias_init: float = 0.0
    act: bool = False

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                       (in_f, self.features))
        b = self.param("bias",
                       nn.initializers.constant(self.bias_init),
                       (self.features,))
        y = x @ (w * (self.lr_mul / math.sqrt(in_f))) + b * self.lr_mul
        return lrelu(y) if self.act else y


class MappingNet(nn.Module):
    """z (+class c) -> w, 8 equalized dense layers (reference MappingNet)."""
    w_dim: int = 512
    num_layers: int = 8
    c_dim: int = 0

    @nn.compact
    def __call__(self, z, c=None):
        x = z * jax.lax.rsqrt(jnp.mean(z ** 2, axis=-1, keepdims=True) + 1e-8)
        if self.c_dim > 0 and c is not None:
            ce = EqualDense(self.w_dim, name="c_embed")(c)
            ce = ce * jax.lax.rsqrt(jnp.mean(ce ** 2, -1, keepdims=True) + 1e-8)
            x = jnp.concatenate([x, ce], axis=-1)
        for i in range(self.num_layers):
            x = EqualDense(self.w_dim, lr_mul=0.01, act=True,
                           name=f"fc{i}")(x)
        return x


class ModulatedConv(nn.Module):
    """StyleGAN2 modulated conv (reference SynthesisLayer/Conv2dLayer)."""
    features: int
    kernel: int = 3
    demodulate: bool = True
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, style):
        n, h, w_sz, cin = x.shape
        k = self.kernel
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, cin, self.features))
        weight = weight / math.sqrt(k * k * cin)
        s = EqualDense(cin, bias_init=1.0, name="affine")(style)  # (N, cin)

        # conv(x, W * s) == conv(x * s, W): scale inputs per sample, keep ONE
        # shared kernel (no per-sample weights -> shards cleanly over the
        # batch axis and runs as a single MXU conv). Demodulation factors
        # depend only on (s, W): d_o = rsqrt(sum_ki (W_kio * s_i)^2).
        if self.up:
            x = blur_up(x)
        xs = x * s[:, None, None, :].astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            xs, weight.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.demodulate:
            wsq = jnp.sum(weight.astype(jnp.float32) ** 2, axis=(0, 1))
            d = jax.lax.rsqrt((s.astype(jnp.float32) ** 2) @ wsq + 1e-8)
            y = y * d[:, None, None, :].astype(y.dtype)
        if self.down:
            y = blur_down(y)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + b


class NoiseInject(nn.Module):
    @nn.compact
    def __call__(self, x, rng=None):
        strength = self.param("noise_strength", nn.initializers.zeros, ())
        if rng is None:
            return x
        noise = jax.random.normal(rng, x.shape[:3] + (1,), x.dtype)
        return x + noise * strength


class StyleConv(nn.Module):
    features: int
    up: bool = False

    @nn.compact
    def __call__(self, x, style, rng=None):
        y = ModulatedConv(self.features, up=self.up, name="conv")(x, style)
        y = NoiseInject(name="noise")(y, rng)
        return lrelu(y)


class ToRGB(nn.Module):
    channels: int = 3

    @nn.compact
    def __call__(self, x, style, img=None):
        y = ModulatedConv(self.channels, kernel=1, demodulate=False,
                          name="conv")(x, style)
        if img is not None:
            img = blur_up(img)
            y = y + img
        return y


class EqualConv(nn.Module):
    features: int
    kernel: int = 3
    down: bool = False
    act: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, cin, self.features)) / math.sqrt(k * k * cin)
        if self.down:
            x = blur_down(x)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = y + b
        return lrelu(y) if self.act else y


class PartialConv(nn.Module):
    """Mask-aware conv: renormalize by valid-pixel coverage and update the
    mask (reference Conv2dLayerPartial, mat.py:95-155)."""
    features: int
    kernel: int = 3
    down: bool = False

    @nn.compact
    def __call__(self, x, mask):
        k = self.kernel
        if self.down:
            x = blur_down(x)
            mask = -nn.max_pool(-mask, (2, 2), strides=(2, 2))  # min-pool
        ones = jnp.ones((k, k, 1, 1), x.dtype)
        cov = jax.lax.conv_general_dilated(
            mask.astype(x.dtype), ones, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        scale = (k * k) / jnp.maximum(cov, 1e-8)
        y = EqualConv(self.features, kernel=k, act=False, name="conv")(
            x * mask.astype(x.dtype))
        y = lrelu(y * scale * (cov > 0))
        new_mask = (cov > 0).astype(mask.dtype)
        return y, new_mask


class MaskAwareAttention(nn.Module):
    """Token transformer over the coarse grid where attention only flows
    from valid tokens (mask renormalization), and tokens become valid once
    updated (reference WindowAttention + BasicLayer token-update rule)."""
    num_heads: int = 4
    depth: int = 4

    @nn.compact
    def __call__(self, x, mask):
        """x: (N, H, W, C); mask: (N, H, W, 1) 1=known."""
        n, h, w, c = x.shape
        t = x.reshape(n, h * w, c)
        m = mask.reshape(n, h * w, 1)
        for i in range(self.depth):
            y = nn.LayerNorm(dtype=jnp.float32, name=f"norm{i}")(t)
            qkv = EqualDense(3 * c, name=f"qkv{i}")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            hd = c // self.num_heads
            q = q.reshape(n, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(n, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(n, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
            logits = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd)
            bias = jnp.where(m[:, None, :, 0][:, :, None, :] > 0, 0.0, -1e9)
            p = jax.nn.softmax((logits + bias).astype(jnp.float32),
                               axis=-1).astype(t.dtype)
            a = (p @ v).transpose(0, 2, 1, 3).reshape(n, -1, c)
            t = t + EqualDense(c, name=f"proj{i}")(a)
            y = nn.LayerNorm(dtype=jnp.float32, name=f"ffnorm{i}")(t)
            t = t + EqualDense(c, name=f"ff{i}b")(
                lrelu(EqualDense(2 * c, name=f"ff{i}a")(y)))
            m = jnp.ones_like(m)  # all tokens valid after one update pass
        return t.reshape(n, h, w, c)


class FirstStage(nn.Module):
    """Coarse inpainting stage: partial-conv encoder -> mask-aware token
    transformer -> style-modulated decoder -> coarse RGB
    (reference FirstStage, mat.py:961-1134)."""
    base: int = 64
    w_dim: int = 512

    @nn.compact
    def __call__(self, img, mask, w, rng=None):
        x = jnp.concatenate([img * mask, mask.astype(img.dtype)], axis=-1)
        feats = {}
        h, m = PartialConv(self.base, name="enc0")(x, mask)
        enc_ch = [self.base, self.base * 2, self.base * 4]
        downs = min(3, int(math.log2(img.shape[1])) - 2)
        for i in range(downs):
            h, m = PartialConv(enc_ch[min(i, 2)], down=True,
                               name=f"enc{i+1}")(h, m)
            feats[i] = h
        h = MaskAwareAttention(name="body")(h, m)
        # global style from features + w
        gs = jnp.mean(h, axis=(1, 2))
        style = EqualDense(self.w_dim, act=True, name="style")(
            jnp.concatenate([gs, w], axis=-1))
        rngs = jax.random.split(rng, downs + 1) if rng is not None \
            else [None] * (downs + 1)
        for i in range(downs):
            # channel count matches the skip feature at the target resolution
            ch = enc_ch[max(0, min(downs - 2 - i, 2))]
            h = StyleConv(ch, up=True, name=f"dec{i}")(h, style, rngs[i])
            skip = feats.get(downs - 2 - i)
            if skip is not None:
                h = h + skip
        out = ToRGB(img.shape[-1], name="to_rgb")(h, style)
        # compose: known pixels from input
        return out * (1 - mask) + img * mask


class Encoder(nn.Module):
    """Conv encoder of [stg1*(1-m)+img*m, m] to multi-scale skips
    (reference Encoder, mat.py:679-716)."""
    base: int = 64
    levels: int = 4

    @nn.compact
    def __call__(self, x):
        feats = {}
        h = EqualConv(self.base, name="from_rgb")(x)
        for i in range(self.levels):
            ch = min(self.base * (2 ** (i + 1)), 512)
            h = EqualConv(ch, down=True, name=f"down{i}")(h)
            feats[i] = h
        return h, feats


class Decoder(nn.Module):
    """StyleGAN2 decoder with skips and RGB accumulation
    (reference Decoder + DecBlock, mat.py:815-905). With ``frames > 1`` a
    temporal MotionModule follows each level (reference MAT motion
    finetuning, mat_model.py:404-520 — zero-init so image checkpoints
    finetune into video)."""
    base: int = 64
    levels: int = 4
    out_channels: int = 3
    frames: int = 1
    motion_heads: int = 4
    motion_blocks: int = 1
    motion_max_frames: int = 25

    @nn.compact
    def __call__(self, h, feats, ws, rng=None, ws2=None, mix_from=None):
        rngs = jax.random.split(rng, 2 * self.levels) if rng is not None \
            else [None] * (2 * self.levels)

        def w_at(layer_idx):
            # StyleGAN-style style mixing: layers >= the crossover index use
            # the second latent's w (reference mat_model.py:705-716)
            if ws2 is None or mix_from is None:
                return ws
            use2 = (layer_idx >= mix_from)
            return jnp.where(use2, ws2, ws)

        img = None
        for i in range(self.levels):
            ch = min(self.base * (2 ** (self.levels - 1 - i)), 512)
            h = StyleConv(ch, up=True, name=f"up{i}a")(h, w_at(3 * i),
                                                       rngs[2 * i])
            skip = feats.get(self.levels - 2 - i)
            if skip is not None:
                h = h + EqualConv(ch, kernel=1, act=False,
                                  name=f"skip{i}")(skip)
            h = StyleConv(ch, name=f"up{i}b")(h, w_at(3 * i + 1),
                                              rngs[2 * i + 1])
            if self.frames > 1:
                from .motion import MotionModule
                bf, hh, ww, c = h.shape
                h5 = h.reshape(bf // self.frames, self.frames, hh, ww, c)
                h5 = MotionModule(num_heads=self.motion_heads,
                                  num_transformer_blocks=self.motion_blocks,
                                  max_len=self.motion_max_frames,
                                  name=f"motion{i}")(h5)
                h = h5.reshape(bf, hh, ww, c)
            img = ToRGB(self.out_channels, name=f"rgb{i}")(h, w_at(3 * i + 2),
                                                           img)
        return img


class MATGenerator(nn.Module):
    """Full MAT synthesis: first stage + refinement
    (reference SynthesisNet + Generator). call(img, mask 1=known, z)."""
    base: int = 64
    w_dim: int = 512
    z_dim: int = 512
    c_dim: int = 0
    out_channels: int = 3
    frames: int = 1   # >1 = video finetuning (motion modules in the decoder)
    motion_heads: int = 4
    motion_blocks: int = 1
    motion_max_frames: int = 25
    mask_class: bool = False   # alg_mat_mask_class_conditioning
    style_mixing_prob: float = 0.0   # alg_mat_style_mixing_prob

    @nn.compact
    def __call__(self, img, mask, z, c=None, rng=None, mask_class=None,
                 mix_rng=None, truncation_psi=1.0, w_avg=None,
                 return_stg1=False, return_w=False):
        video = img.ndim == 5
        if video:
            b, f = img.shape[:2]
            img = img.reshape((b * f,) + img.shape[2:])
            mask = mask.reshape((b * f,) + mask.shape[2:])
            if mask_class is not None:
                mask_class = mask_class.reshape((b * f,)
                                                + mask_class.shape[2:])
            z = jnp.repeat(z, f, axis=0)   # one latent per sequence
        mask = jnp.clip(mask.astype(img.dtype), 0.0, 1.0)
        mapping = MappingNet(w_dim=self.w_dim, c_dim=self.c_dim,
                             name="mapping")
        w = mapping(z, c)
        if w_avg is not None and truncation_psi != 1.0:
            # truncation trick: lerp toward the tracked w average
            # (reference mat_model.py truncation_psi on MappingNet.w_avg)
            w = w_avg[None].astype(w.dtype) + truncation_psi * (
                w - w_avg[None].astype(w.dtype))
        # style mixing (training only — mix_rng given): with prob p, decoder
        # layers past a random crossover use a second latent's w (reference
        # mat_model.py:705-716; applied to the refinement decoder — the
        # first stage keeps the primary w)
        ws2 = mix_from = None
        if self.style_mixing_prob > 0 and mix_rng is not None:
            n_style_layers = 3 * 4   # decoder: 2 convs + ToRGB per level
            r_z, r_p, r_c = jax.random.split(mix_rng, 3)
            if video:
                # one second latent per sequence, shared across frames
                z2 = jnp.repeat(jax.random.normal(
                    r_z, (b, z.shape[-1]), z.dtype), f, axis=0)
            else:
                z2 = jax.random.normal(r_z, z.shape, z.dtype)
            ws2 = mapping(z2, c)
            do = jax.random.uniform(r_p, ()) < self.style_mixing_prob
            cut = jax.random.randint(r_c, (), 1, n_style_layers)
            mix_from = jnp.where(do, cut, n_style_layers)
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        stg1 = FirstStage(base=self.base, w_dim=self.w_dim,
                          name="first_stage")(img, mask, w, r1)
        parts = [stg1 * (1 - mask) + img * mask, mask.astype(img.dtype)]
        if self.mask_class:
            # per-pixel class-id channel inside the hole (reference
            # mat_model.py:585-620 mask_class_channels)
            mc = (mask_class if mask_class is not None
                  else jnp.zeros_like(mask))
            parts.append(mc.astype(img.dtype))
        x = jnp.concatenate(parts, axis=-1)
        h, feats = Encoder(base=self.base, name="encoder")(x)
        out = Decoder(base=self.base, levels=4,
                      out_channels=self.out_channels,
                      frames=(self.frames if video else 1),
                      motion_heads=self.motion_heads,
                      motion_blocks=self.motion_blocks,
                      motion_max_frames=self.motion_max_frames,
                      name="decoder")(h, feats, w, r2, ws2=ws2,
                                      mix_from=mix_from)
        out = out * (1 - mask) + img * mask
        if video:
            out = out.reshape((b, f) + out.shape[1:])
            stg1 = stg1.reshape((b, f) + stg1.shape[1:])
            w = w.reshape(b, f, -1)[:, 0]
        extra = ()
        if return_stg1:
            extra += (stg1,)
        if return_w:
            extra += (w,)
        return (out,) + extra if extra else out


class MATDiscriminator(nn.Module):
    """StyleGAN2 D over [img, mask, stg1] with minibatch stddev
    (reference Discriminator, mat.py:1472-1594). Returns
    (logits, logits_stg1)."""
    base: int = 64
    levels: int = 4

    @nn.compact
    def __call__(self, img, mask, stg1):
        def trunk(x, prefix):
            h = EqualConv(self.base, kernel=1, name=f"{prefix}_from_rgb")(x)
            for i in range(self.levels):
                ch = min(self.base * (2 ** (i + 1)), 512)
                h = EqualConv(ch, name=f"{prefix}_c{i}a")(h)
                h = EqualConv(ch, down=True, name=f"{prefix}_c{i}b")(h)
            # minibatch stddev
            sd = jnp.std(h, axis=0, keepdims=True).mean()
            sd = jnp.broadcast_to(sd, h.shape[:3] + (1,))
            h = jnp.concatenate([h, sd.astype(h.dtype)], axis=-1)
            h = EqualConv(min(self.base * 8, 512), name=f"{prefix}_final")(h)
            h = h.reshape(h.shape[0], -1)
            h = EqualDense(min(self.base * 8, 512), act=True,
                           name=f"{prefix}_fc")(h)
            return EqualDense(1, name=f"{prefix}_out")(h)

        m = jnp.clip(mask.astype(img.dtype), 0.0, 1.0)
        logits = trunk(jnp.concatenate([img, m], axis=-1), "main")
        logits_stg1 = trunk(jnp.concatenate([stg1, m], axis=-1), "stg1")
        return logits, logits_stg1
