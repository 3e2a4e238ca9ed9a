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
    up: bool = False
    act: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, cin, self.features)) / math.sqrt(k * k * cin)
        if self.up:
            x = blur_up(x)
        if self.down:
            x = blur_down(x)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = y + b
        return lrelu(y) if self.act else y


class PartialConv(nn.Module):
    """Mask-aware conv with reference semantics (Conv2dLayerPartial,
    mat.py:95-155): the input is convolved UNMASKED, the output is scaled
    by k^2/coverage * clamp01(coverage) AFTER the activation, and the new
    mask is clamp01(coverage)."""
    features: int
    kernel: int = 3
    down: bool = False
    up: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        k = self.kernel
        # EqualConv pads SAME (== k//2 for odd k) while the reference
        # Conv2dLayerPartial pads 0 for even kernels; support odd k only so
        # the two can never silently diverge (all reference MAT sites are
        # odd-kernel).
        assert k % 2 == 1, "PartialConv requires an odd kernel"
        if mask is None:
            y = EqualConv(self.features, kernel=k, down=self.down,
                          up=self.up, name="conv")(x)
            return y, None
        m = mask.astype(x.dtype)
        if self.up:
            from ...ops.resize import nearest_up2
            m = nearest_up2(m)
        ones = jnp.ones((k, k, 1, 1), x.dtype)
        # reference: update_mask = conv2d(mask, ones(k,k), stride=down,
        # padding=k//2) on the FULL-res mask — each output tap's support is
        # exactly the kxk original-resolution window under its conv tap.
        # Conv2dLayerPartial pads k//2 only for ODD kernels (0 for even) —
        # mirror that so an even-kernel PartialConv keeps reference output
        # size and mask semantics (all current call sites use k=3).
        pad = k // 2 if k % 2 else 0
        stride = (2, 2) if self.down else (1, 1)
        cov = jax.lax.conv_general_dilated(
            m, ones, stride, [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ratio = (k * k) / (cov + 1e-8)
        new_mask = jnp.clip(cov, 0.0, 1.0)
        y = EqualConv(self.features, kernel=k, down=self.down, up=self.up,
                      name="conv")(x)
        y = y * (ratio * new_mask).astype(y.dtype)
        return y, new_mask


# --------------------------------------------------------------------------
# First-stage Swin token pyramid (reference mat.py:170-640,961-1134)
# --------------------------------------------------------------------------

def window_partition(x, ws):
    """(B,H,W,C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x, ws, h, w):
    """(B*nW, ws*ws, C) -> (B,H,W,C)."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _shift_attn_bias(h, w, ws, shift):
    """(nW, N, N) 0/-100 bias for shifted windows (reference
    SwinTransformerBlock.calculate_mask, mat.py:329-359). Pure numpy —
    computed once at trace time, becomes a compile-time constant."""
    import numpy as np
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wss] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0), jnp.float32)


class WindowAttention(nn.Module):
    """Windowed MSA with q/k over L2-normalized tokens and the mask-aware
    key bias + per-window validity update (reference WindowAttention,
    mat.py:168-244): invalid keys get -100 (soft, not -inf), and after the
    pass every token of a window that contained ANY valid token becomes
    valid."""
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, xw, mask_windows=None, attn_bias=None, n_windows=1):
        bw, n, c = xw.shape
        hd = c // self.num_heads
        # L2-normalize via rsqrt(sum+eps), NOT x/||x||: hole-interior
        # tokens are EXACTLY zero (partial convs scale uncovered outputs
        # by 0) and the gradient of jnp.linalg.norm at 0 is NaN — one
        # all-invalid window would poison the whole G update
        sq = jnp.sum(xw.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        norm_x = (xw.astype(jnp.float32)
                  * jax.lax.rsqrt(sq + 1e-12)).astype(xw.dtype)
        q = EqualDense(c, name="q")(norm_x).reshape(
            bw, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = EqualDense(c, name="k")(norm_x).reshape(
            bw, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = EqualDense(c, name="v")(xw).reshape(
            bw, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        logits = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd)
        if attn_bias is not None:   # shifted-window cross-region bias
            logits = (logits.reshape(bw // n_windows, n_windows,
                                     self.num_heads, n, n)
                      + attn_bias[None, :, None].astype(logits.dtype))
            logits = logits.reshape(bw, self.num_heads, n, n)
        new_mask = None
        if mask_windows is not None:
            keyb = jnp.where(mask_windows[..., 0] > 0, 0.0, -100.0)
            logits = logits + keyb[:, None, None, :].astype(logits.dtype)
            # window validity: any valid token -> whole window valid
            new_mask = jnp.clip(jnp.sum(mask_windows, axis=1, keepdims=True),
                                0.0, 1.0) * jnp.ones_like(mask_windows)
        p = jax.nn.softmax(logits.astype(jnp.float32),
                           axis=-1).astype(xw.dtype)
        out = (p @ v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return EqualDense(c, name="proj")(out), new_mask


class SwinBlock(nn.Module):
    """MAT's Swin block (reference SwinTransformerBlock, mat.py:246-437):
    [shifted-]window attention, then fuse = FC([shortcut, attn], lrelu),
    then a 2x MLP — NO residual or norm layers (the reference drops both;
    q/k normalization replaces the pre-norm). drop_path is stored but
    never applied upstream, so it is omitted here."""
    dim: int
    num_heads: int
    h: int
    w: int
    window_size: int
    shift_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (B, H*W, C) tokens; mask: (B, H*W, 1) 1=valid or None."""
        b, L, c = x.shape
        ws = min(self.window_size, self.h, self.w)
        shift = self.shift_size if ws < min(self.h, self.w) else 0
        shortcut = x
        xg = x.reshape(b, self.h, self.w, c)
        mg = mask.reshape(b, self.h, self.w, 1) if mask is not None else None
        if shift > 0:
            xg = jnp.roll(xg, (-shift, -shift), axis=(1, 2))
            if mg is not None:
                mg = jnp.roll(mg, (-shift, -shift), axis=(1, 2))
        xw = window_partition(xg, ws)
        mw = window_partition(mg, ws) if mg is not None else None
        n_windows = (self.h // ws) * (self.w // ws)
        bias = _shift_attn_bias(self.h, self.w, ws, shift) if shift > 0 \
            else None
        aw, mw = WindowAttention(self.dim, self.num_heads, name="attn")(
            xw, mask_windows=mw, attn_bias=bias, n_windows=n_windows)
        xg = window_reverse(aw, ws, self.h, self.w)
        if mw is not None:
            mg = window_reverse(mw, ws, self.h, self.w)
        if shift > 0:
            xg = jnp.roll(xg, (shift, shift), axis=(1, 2))
            if mg is not None:
                mg = jnp.roll(mg, (shift, shift), axis=(1, 2))
        x = xg.reshape(b, L, c)
        new_mask = mg.reshape(b, L, 1) if mg is not None else None
        x = EqualDense(c, act=True, name="fuse")(
            jnp.concatenate([shortcut, x], axis=-1))
        x = EqualDense(c, name="mlp_fc2")(
            EqualDense(2 * c, act=True, name="mlp_fc1")(x))
        return x, new_mask


class BasicLayerMAT(nn.Module):
    """One pyramid stage (reference BasicLayer, mat.py:491-585): optional
    partial-conv patch merge/upsample, `depth` Swin blocks with
    alternating shift, then a partial conv with identity residual."""
    dim: int
    depth: int
    num_heads: int
    h: int
    w: int
    window_size: int
    resample: str = ""   # "" | "down" | "up"

    @nn.compact
    def __call__(self, x, mask=None):
        """tokens (B, H*W, C) at the PRE-resample resolution."""
        h, w = self.h, self.w
        b = x.shape[0]
        if self.resample:
            feat = x.reshape(b, h, w, self.dim)
            mfeat = mask.reshape(b, h, w, 1) if mask is not None else None
            feat, mfeat = PartialConv(self.dim,
                                      down=(self.resample == "down"),
                                      up=(self.resample == "up"),
                                      name="merge")(feat, mfeat)
            h, w = feat.shape[1], feat.shape[2]
            x = feat.reshape(b, h * w, self.dim)
            mask = (mfeat.reshape(b, h * w, 1) if mfeat is not None
                    else None)
        identity = x
        for i in range(self.depth):
            x, mask = SwinBlock(self.dim, self.num_heads, h, w,
                                self.window_size,
                                shift_size=(0 if i % 2 == 0
                                            else self.window_size // 2),
                                name=f"block{i}")(x, mask)
        mfeat = mask.reshape(b, h, w, 1) if mask is not None else None
        feat, mfeat = PartialConv(self.dim, name="conv")(
            x.reshape(b, h, w, self.dim), mfeat)
        x = feat.reshape(b, h * w, self.dim) + identity
        mask = mfeat.reshape(b, h * w, 1) if mfeat is not None else None
        return x, (h, w), mask


class FirstStage(nn.Module):
    """Coarse inpainting stage (reference FirstStage, mat.py:961-1134):
    partial-conv encoder to the coarse grid, a 5-stage Swin token pyramid
    (depths [2,3,4,3,2], resolutions r -> r/2 -> r/4 -> r/2 -> r with
    token skips, mask propagated through the contracting half), style
    fusion at the bottleneck (ws_style + to_square spatial code blended by
    a random binary mul_map, ToStyle global pool), and a style-modulated
    decoder back to input resolution.

    Adaptive deviation: the reference hardcodes the coarse grid at 64px
    (inputs are >=256px); here coarse = min(64, input) so miniature CI
    resolutions run the same pyramid shape."""
    base: int = 64           # kept for config plumbing; dim is the width
    w_dim: int = 512
    dim: int = 180           # token width (reference FirstStage dim=180)
    depths: tuple = (2, 3, 4, 3, 2)
    num_heads: int = 6
    window_sizes: tuple = (8, 16, 16, 16, 8)

    @nn.compact
    def __call__(self, img, mask, w, rng=None, mask_class=None):
        b, H = img.shape[0], img.shape[1]
        dim = self.dim
        parts = [mask.astype(img.dtype) - 0.5, img * mask]
        if mask_class is not None:
            parts.append(mask_class.astype(img.dtype))
        x = jnp.concatenate(parts, axis=-1)

        coarse = min(64, H)
        down_time = int(math.log2(H // coarse))
        conv_skips = []
        h, m = PartialConv(dim, name="conv_first")(x, mask)
        conv_skips.append(h)
        for i in range(down_time):
            h, m = PartialConv(dim, down=True, name=f"enc_conv{i}")(h, m)
            if i != down_time - 1:
                conv_skips.append(h)

        res = coarse
        t = h.reshape(b, res * res, dim)
        tm = m.reshape(b, res * res, 1)
        ratios = (1, 0.5, 0.5, 2, 2)
        mid = len(self.depths) // 2
        token_skips = []
        style = None
        n_rngs = 1 + 2 * max(down_time, 1)
        rngs = (jax.random.split(rng, n_rngs)
                if rng is not None else [None] * n_rngs)
        for i, depth in enumerate(self.depths):
            resample = ("down" if ratios[i] < 1
                        else "up" if ratios[i] > 1 else "")
            layer = BasicLayerMAT(dim, depth, self.num_heads, res, res,
                                  min(self.window_sizes[i], int(res * ratios[i])),
                                  resample=resample, name=f"tran{i}")
            if i < mid:
                t, (res, _), tm = layer(t, tm)
                token_skips.append(t)
            elif i == mid:
                t, (res, _), tm = layer(t, None)
                # style fusion (reference mat.py:1100-1121): random binary
                # mul_map blends tokens with a w-derived spatial code
                ws_s = EqualDense(dim, act=True, name="ws_style")(w)
                add_n = EqualDense(res * res, act=True,
                                   name="to_square")(ws_s)
                if add_n.shape[-1] != t.shape[1]:
                    add_n = jax.image.resize(
                        add_n, (b, t.shape[1]), "linear")
                add_n = add_n[:, :, None].astype(t.dtype)
                if rngs[0] is not None:
                    # F.dropout(0.5*ones, p=0.5, training=True): 0 or 1
                    mul_map = jax.random.bernoulli(
                        rngs[0], 0.5, t.shape).astype(t.dtype)
                else:
                    mul_map = jnp.full_like(t, 0.5)
                t = t * mul_map + add_n * (1 - mul_map)
                # ToStyle: conv-pool the bottleneck grid to 1x1
                g = t.reshape(b, res, res, dim)
                for j in range(int(math.log2(res))):
                    g = EqualConv(dim, down=True, name=f"down_conv{j}")(g)
                gs = EqualDense(2 * dim, act=True, name="to_style")(
                    jnp.mean(g, axis=(1, 2)))
                style = jnp.concatenate([gs, ws_s], axis=-1)  # 3*dim
            else:
                t, (res, _), tm = layer(t, None)
                t = t + token_skips[mid - i]

        h = t.reshape(b, res, res, dim)
        img_out = None
        for i in range(down_time):
            h = StyleConv(dim, up=True, name=f"dec{i}a")(h, style,
                                                         rngs[1 + 2 * i])
            h = h + conv_skips[down_time - 1 - i]
            h = StyleConv(dim, name=f"dec{i}b")(h, style, rngs[2 + 2 * i])
            img_out = ToRGB(img.shape[-1], name=f"dec{i}rgb")(h, style,
                                                              img_out)
        if img_out is None:   # coarse == input resolution (small inputs)
            img_out = ToRGB(img.shape[-1], name="to_rgb")(h, style)
        # compose: known pixels from input; clamp like the reference
        out = img_out * (1 - mask) + img * mask
        return jnp.clip(out, -1.0, 1.0)


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
    stage1_dim: int = 180   # first-stage token width (reference dim=180)

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
                          dim=self.stage1_dim, name="first_stage")(
            img, mask, w, r1,
            mask_class=(mask_class if self.mask_class else None))
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
