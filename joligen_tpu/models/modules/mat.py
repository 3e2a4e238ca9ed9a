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


def nf(stage, base=64, div=1):
    """Reference channel table (mat.py:27-29): NF[2^stage] =
    min(32768/2^stage, 512), scaled by base/64 (the G_ngf/D_ndf knob —
    base=64 reproduces the reference widths exactly) and an optional
    divisor (the reference stg1 D trunk runs at half width)."""
    return max(int(min(32768 // (2 ** stage), 512)) * base // (64 * div), 8)


def blur_up(x, factor=2):
    """Antialiased 2x upsample (reference upfirdn2d.upsample2d). Our
    upfirdn2d already multiplies by up^2, so the filter carries NO extra
    gain (a constant image stays constant)."""
    f = setup_filter([1, 3, 3, 1])
    p = f.shape[0] - factor
    pt, pb = (p + 1) // 2 + factor - 1, p // 2
    return upfirdn2d(x, f, up=factor, padding=(pt, pb, pt, pb))


def blur_down(x, factor=2):
    f = setup_filter([1, 3, 3, 1])
    p = f.shape[0] - factor
    return upfirdn2d(x, f, down=factor,
                     padding=((p + 1) // 2, p // 2, (p + 1) // 2, p // 2))


# Resampling convs follow the reference op order EXACTLY
# (torch_utils/ops/conv2d_resample.py:147-195) so converted reference
# weights reproduce outputs including the boundary pixels:
#   down=2, k>1 : FIR at FULL resolution (pad k//2 + 1 each side), then a
#                 stride-2 VALID conv — NOT decimate-then-conv.
#   up=2,  k>1 : transpose conv (lhs_dilation=2, pad k-1), then FIR with
#                 gain up^2 and pad (k//2+2-(k-1), k//2+1-(k-2)).
#   k=1        : reference fast paths — decimate-first / conv-first.

def _conv_plain(x, w, k):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME" if k > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_down2(x, w, k):
    if k == 1:
        return _conv_plain(blur_down(x), w, k)
    f = setup_filter([1, 3, 3, 1])
    p = k // 2 + 1
    x = upfirdn2d(x, f, padding=(p, p, p, p))
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_up2(x, w, k):
    if k == 1:
        return blur_up(_conv_plain(x, w, k))
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k - 1, k - 1)] * 2, lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    f = setup_filter([1, 3, 3, 1])
    p0 = k // 2 + 2 - (k - 1)
    p1 = k // 2 + 1 - (k - 2)
    return upfirdn2d(y, f, padding=(p0, p1, p0, p1), gain=4.0)


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
        # params live in fp32; compute follows the input dtype (bf16 under
        # the TPU policy) so dense chains don't silently upcast
        w = (w * (self.lr_mul / math.sqrt(in_f))).astype(x.dtype)
        y = x @ w + (b * self.lr_mul).astype(x.dtype)
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
        # depend only on (s, W): d_o = rsqrt(sum_ki (W_kio * s_i)^2); both
        # the input scaling (per in-channel) and the demod (per sample/out
        # channel) commute with the zero-stuffing and the depthwise FIR, so
        # the reference transpose-conv-then-FIR pipeline stays exact.
        xs = x * s[:, None, None, :].astype(x.dtype)
        wd = weight.astype(x.dtype)
        if self.up:
            y = _conv_up2(xs, wd, k)
        elif self.down:
            y = _conv_down2(xs, wd, k)
        else:
            y = _conv_plain(xs, wd, k)
        if self.demodulate:
            wsq = jnp.sum(weight.astype(jnp.float32) ** 2, axis=(0, 1))
            d = jax.lax.rsqrt((s.astype(jnp.float32) ** 2) @ wsq + 1e-8)
            y = y * d[:, None, None, :].astype(y.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + b.astype(y.dtype)


class NoiseInject(nn.Module):
    @nn.compact
    def __call__(self, x, rng=None):
        strength = self.param("noise_strength", nn.initializers.zeros, ())
        if rng is None:
            return x
        noise = jax.random.normal(rng, x.shape[:3] + (1,), x.dtype)
        return x + noise * strength.astype(x.dtype)


class StyleConv(nn.Module):
    """Modulated conv + optional per-pixel noise + bias + lrelu (reference
    StyleConv, basic_module.py:416-466). ``use_noise=False`` mirrors the
    reference FirstStage (use_noise=False there — no noise params)."""
    features: int
    up: bool = False
    use_noise: bool = True

    @nn.compact
    def __call__(self, x, style, rng=None):
        y = ModulatedConv(self.features, up=self.up, name="conv")(x, style)
        if self.use_noise:
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
    """Equalized-lr conv (reference Conv2dLayer, basic_module.py): optional
    blur-resample, bias+lrelu, and a post-activation gain (the reference's
    bias_act `gain` arg, used by residual D blocks at sqrt(0.5))."""
    features: int
    kernel: int = 3
    down: bool = False
    up: bool = False
    act: bool = True
    use_bias: bool = True
    gain: float = 1.0

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, cin, self.features)) / math.sqrt(k * k * cin)
        wd = w.astype(x.dtype)
        if self.up:
            y = _conv_up2(x, wd, k)
        elif self.down:
            y = _conv_down2(x, wd, k)
        else:
            y = _conv_plain(x, wd, k)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        y = lrelu(y) if self.act else y
        return y * self.gain if self.gain != 1.0 else y


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
                if rng is not None:
                    # F.dropout(0.5*ones, p=0.5, training=True): 0 or 1
                    mul_map = jax.random.bernoulli(
                        rng, 0.5, t.shape).astype(t.dtype)
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
        # reference FirstStage builds its DecStyleBlocks with
        # use_noise=False (mat.py:1056 via FirstStage use_noise arg) —
        # no noise params, no noise injection
        for i in range(down_time):
            h = StyleConv(dim, up=True, use_noise=False,
                          name=f"dec{i}a")(h, style)
            h = h + conv_skips[down_time - 1 - i]
            h = StyleConv(dim, use_noise=False, name=f"dec{i}b")(h, style)
            img_out = ToRGB(img.shape[-1], name=f"dec{i}rgb")(h, style,
                                                              img_out)
        if img_out is None:   # coarse == input resolution (small inputs)
            img_out = ToRGB(img.shape[-1], name="to_rgb")(h, style)
        # compose: known pixels from input; clamp like the reference
        out = img_out * (1 - mask) + img * mask
        return jnp.clip(out, -1.0, 1.0)


class Encoder(nn.Module):
    """Second-stage conv encoder (reference Encoder, mat.py:679-714):
    EncFromRGB (1x1 + 3x3) at input resolution, then ConvBlockDown
    (3x3-down + 3x3) per octave to the 16x16 bottleneck, reference nf
    widths. Returns (bottleneck, {res_log2: feature}). Inputs below 32px
    (CI miniatures) stop at their own bottom octave >= 4px."""
    base: int = 64

    @nn.compact
    def __call__(self, x):
        res_log2 = int(math.log2(x.shape[1]))
        bottom = min(4, res_log2)
        feats = {}
        h = x
        for i in range(res_log2, bottom - 1, -1):
            ch = nf(i, self.base)
            if i == res_log2:
                h = EqualConv(ch, kernel=1, name=f"enc{i}_c0")(h)
            else:
                h = EqualConv(ch, down=True, name=f"enc{i}_c0")(h)
            h = EqualConv(ch, name=f"enc{i}_c1")(h)
            feats[i] = h
        return h, feats


class ToStyle(nn.Module):
    """Global style code from the encoder bottleneck (reference ToStyle,
    mat.py:717-757): three 3x3 down convs, global average pool, dense."""
    features: int

    @nn.compact
    def __call__(self, x):
        for j in range(3):
            if x.shape[1] > 1:
                x = EqualConv(x.shape[-1], down=True, name=f"down{j}")(x)
        x = jnp.mean(x, axis=(1, 2))
        return EqualDense(self.features, act=True, name="fc")(x)


class DecBlockFirst(nn.Module):
    """Bottleneck decoder block (reference DecBlockFirstV2, mat.py:760-813):
    plain 3x3 conv, + encoder skip at the same resolution, StyleConv,
    ToRGB — styles are per-layer [w, gs] codes."""
    features: int
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, skip, style0, style1, rng=None):
        h = EqualConv(x.shape[-1], name="conv0")(x)
        h = h + skip
        h = StyleConv(self.features, name="conv1")(h, style0, rng)
        img = ToRGB(self.out_channels, name="rgb")(h, style1)
        return h, img


class DecBlockRef(nn.Module):
    """Upsampling decoder block (reference DecBlock, mat.py:818-877):
    StyleConv up, + encoder skip, StyleConv, RGB accumulation."""
    features: int
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, img, skip, styles, rngs):
        h = StyleConv(self.features, up=True, name="conv0")(x, styles[0],
                                                            rngs[0])
        h = h + skip
        h = StyleConv(self.features, name="conv1")(h, styles[1], rngs[1])
        img = ToRGB(self.out_channels, name="rgb")(h, styles[2], img)
        return h, img


class Decoder(nn.Module):
    """Refinement decoder (reference Decoder, mat.py:880-905): bottleneck
    block at 16x16 then one DecBlock per octave with encoder skips and RGB
    accumulation; every style is concat(per-layer w, global gs) (reference
    get_style_code)."""
    base: int = 64
    out_channels: int = 3

    @nn.compact
    def __call__(self, h, feats, w_at, gs, rng=None):
        res_log2 = max(feats)
        bottom = min(feats)
        n_up = res_log2 - bottom
        rngs = (jax.random.split(rng, 1 + 2 * n_up) if rng is not None
                else [None] * (1 + 2 * n_up))

        def style(i):
            return jnp.concatenate([w_at(i), gs.astype(w_at(i).dtype)],
                                   axis=-1)

        # reference per-layer w indices (mat.py Decoder): the bottleneck
        # block uses ws[:, 0] / ws[:, 1]; the block at res uses
        # ws[:, 2d-1], ws[:, 2d], ws[:, 2d+1] with d = res - bottom
        # (res*2-9/-8/-7 when bottom=4) — consecutive blocks SHARE the
        # boundary index. num_ws = 2*(res_log2-bottom) + 2.
        h, img = DecBlockFirst(nf(bottom, self.base), self.out_channels,
                               name=f"dec{bottom}")(
            h, feats[bottom], style(0), style(1), rngs[0])
        for j, res in enumerate(range(bottom + 1, res_log2 + 1)):
            d = res - bottom
            h, img = DecBlockRef(nf(res, self.base), self.out_channels,
                                 name=f"dec{res}")(
                h, img, feats[res],
                (style(2 * d - 1), style(2 * d), style(2 * d + 1)),
                (rngs[1 + 2 * j], rngs[2 + 2 * j]))
        return img


class MATGenerator(nn.Module):
    """Full MAT synthesis: first stage + refinement
    (reference SynthesisNet + Generator, mat.py:1136-1470).
    call(img, mask 1=known, z). The refinement stage follows the reference
    exactly: encoder over [mask-0.5, composed, img*mask], latent injection
    at the 16x16 bottleneck (to_square + random mul_map blend), gs =
    ToStyle(bottleneck) concatenated into every decoder style, skip-adds
    per octave. With ``frames > 1`` and 5D input, a single MotionModule
    runs over the frame axis at the encoder bottleneck and ONLY THE LAST
    frame is decoded (reference _forward_motion, mat.py:1286-1366);
    history frames pass through unchanged in the returned clip."""
    base: int = 64
    w_dim: int = 512
    z_dim: int = 512
    c_dim: int = 0
    out_channels: int = 3
    frames: int = 1   # >1 = video finetuning (bottleneck motion module)
    motion_heads: int = 4
    motion_blocks: int = 1
    motion_max_frames: int = 25
    mask_class: bool = False   # alg_mat_mask_class_conditioning
    style_mixing_prob: float = 0.0   # alg_mat_style_mixing_prob
    stage1_dim: int = 180   # first-stage token width (reference dim=180)
    dtype: jnp.dtype = jnp.float32   # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, img, mask, z, c=None, rng=None, mask_class=None,
                 mix_rng=None, truncation_psi=1.0, w_avg=None,
                 return_stg1=False, return_w=False):
        video = img.ndim == 5
        if video and self.frames <= 1:
            raise ValueError("5D input requires frames > 1 (motion mode)")
        img_raw = img.astype(jnp.float32)   # original precision, for the
        # final known-pixel composition (bf16 compute must not round the
        # pass-through pixels)
        img_full = img = img.astype(self.dtype)
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
        w = mapping(z.astype(jnp.float32), c)   # mapping stays fp32
        if w_avg is not None and truncation_psi != 1.0:
            # truncation trick: lerp toward the tracked w average
            # (reference mat_model.py truncation_psi on MappingNet.w_avg)
            w = w_avg[None].astype(w.dtype) + truncation_psi * (
                w - w_avg[None].astype(w.dtype))
        r1, r2, r_inj = (jax.random.split(rng, 3) if rng is not None
                         else (None, None, None))
        stg1 = FirstStage(base=self.base, w_dim=self.w_dim,
                          dim=self.stage1_dim, name="first_stage")(
            img, mask, w, r1,
            mask_class=(mask_class if self.mask_class else None))
        # second-stage input (reference _forward_single_frame,
        # mat.py:1270-1273): [mask-0.5, composed, img*mask (, mask_class)]
        parts = [mask - 0.5, img * mask + stg1 * (1 - mask), img * mask]
        if self.mask_class:
            mc = (mask_class if mask_class is not None
                  else jnp.zeros_like(mask))
            parts.append(mc.astype(img.dtype))
        x = jnp.concatenate(parts, axis=-1)
        h, feats = Encoder(base=self.base, name="encoder")(x)
        bottom = min(feats)

        if video and self.frames > 1:
            # temporal mixing at the bottleneck, then decode the LAST
            # frame only (reference _forward_motion: fea_16 =
            # motion_module(seq)[:, -1])
            from .motion import MotionModule
            bf, hh, ww, cch = h.shape
            h5 = h.reshape(b, f, hh, ww, cch)
            h5 = MotionModule(num_heads=self.motion_heads,
                              num_transformer_blocks=self.motion_blocks,
                              max_len=self.motion_max_frames,
                              dtype=self.dtype,
                              name="motion")(h5)
            h = h5[:, -1]
            feats = {k: v.reshape((b, f) + v.shape[1:])[:, -1]
                     for k, v in feats.items()}
            img = img_full[:, -1]
            mask = mask.reshape((b, f) + mask.shape[1:])[:, -1]
            stg1_last = stg1.reshape((b, f) + stg1.shape[1:])[:, -1]
            w = w.reshape(b, f, -1)[:, 0]
        else:
            stg1_last = stg1

        # latent injection at the bottleneck (reference
        # _inject_latent_into_bottleneck, mat.py:1237-1244): blend the
        # feature map with a w-derived 16x16 spatial code under a random
        # binary mul_map (F.dropout(0.5*ones, 0.5) -> exactly 0 or 1)
        add_n = EqualDense(16 * 16, act=True, name="to_square")(w)
        add_n = add_n.reshape(-1, 16, 16, 1)
        if add_n.shape[1] != h.shape[1]:
            add_n = jax.image.resize(
                add_n, (add_n.shape[0], h.shape[1], h.shape[2], 1),
                "bilinear")
        add_n = add_n.astype(h.dtype)
        if r_inj is not None:
            mul_map = jax.random.bernoulli(r_inj, 0.5,
                                           h.shape).astype(h.dtype)
        else:
            mul_map = jnp.full_like(h, 0.5)
        h = h * mul_map + add_n * (1 - mul_map)
        feats = dict(feats)
        feats[bottom] = h

        # global style (reference: gs = to_style(fea_16), style_dim =
        # w_dim + nf(2)*2)
        gs = ToStyle(nf(2, self.base) * 2, name="to_style")(h)

        # style mixing (training only — mix_rng given): with prob p,
        # decoder layers past a random crossover use a second latent's w
        # (reference mat_model.py:705-743)
        res_log2 = max(feats)
        # reference SynthesisNet.num_layers = 2*res_log2 - 6 at bottom=4
        n_style_layers = 2 * (res_log2 - bottom) + 2
        ws2 = mix_from = None
        if self.style_mixing_prob > 0 and mix_rng is not None:
            r_z, r_p, r_c = jax.random.split(mix_rng, 3)
            z2 = jax.random.normal(r_z, (w.shape[0], self.z_dim),
                                   jnp.float32)
            ws2 = mapping(z2, c)
            do = jax.random.uniform(r_p, ()) < self.style_mixing_prob
            cut = jax.random.randint(r_c, (), 1, n_style_layers)
            mix_from = jnp.where(do, cut, n_style_layers)

        def w_at(layer_idx):
            if ws2 is None or mix_from is None:
                return w
            return jnp.where(layer_idx >= mix_from, ws2, w)

        out = Decoder(base=self.base, out_channels=self.out_channels,
                      name="decoder")(h, feats, w_at, gs, r2)
        # compose + clamp in fp32 against the ORIGINAL input so known
        # pixels pass through exactly (reference clamp(-1,1))
        mask_f = mask.astype(jnp.float32)
        img_keep = img_raw[:, -1] if video else img_raw
        out = out.astype(jnp.float32) * (1 - mask_f) + img_keep * mask_f
        out = jnp.clip(out, -1.0, 1.0)
        # stg1 is returned AS COMPOSED by FirstStage (reference
        # _forward_single_frame returns out_stg1 untouched) — no second
        # recomposition, which would diverge for fractional masks
        stg1_last = stg1_last.astype(jnp.float32)
        if video:
            # reassemble the clip: history frames are pure conditioning
            # (mask all-known) and pass through unchanged
            hist = img_raw[:, :-1]
            out = jnp.concatenate([hist, out[:, None]], axis=1)
            stg1_last = jnp.concatenate([hist, stg1_last[:, None]], axis=1)
        extra = ()
        if return_stg1:
            extra += (stg1_last,)
        if return_w:
            extra += (w,)
        return (out,) + extra if extra else out


class DisBlock(nn.Module):
    """Residual StyleGAN2 D block (reference DisBlock,
    basic_module.py:596-629): 3x3 conv at width, 3x3 down conv with
    post-activation gain sqrt(0.5), biasless 1x1 down skip at the same
    gain."""
    features: int

    @nn.compact
    def __call__(self, x):
        skip = EqualConv(self.features, kernel=1, down=True, act=False,
                         use_bias=False, gain=math.sqrt(0.5),
                         name="skip")(x)
        h = EqualConv(x.shape[-1], name="conv0")(x)
        h = EqualConv(self.features, down=True, gain=math.sqrt(0.5),
                      name="conv1")(h)
        return skip + h


def minibatch_std(x, group_size=4):
    """Grouped minibatch-stddev channel (reference MinibatchStdLayer,
    basic_module.py:635-662): per-group stddev averaged over channels and
    pixels, broadcast back as one extra channel. Stats in fp32."""
    n, h, w, c = x.shape
    g = min(group_size, n)
    while n % g:
        g -= 1
    y = x.astype(jnp.float32).reshape(g, n // g, h, w, c)
    y = y - y.mean(axis=0)
    y = jnp.sqrt(jnp.mean(y * y, axis=0) + 1e-8)   # (n/g, h, w, c)
    y = y.mean(axis=(1, 2, 3))                     # (n/g,)
    y = jnp.tile(y, (g,))                          # batch idx = gi*(n/g)+k
    sd = jnp.broadcast_to(y[:, None, None, None], (n, h, w, 1))
    return jnp.concatenate([x, sd.astype(x.dtype)], axis=-1)


class MATDiscriminator(nn.Module):
    """StyleGAN2 D over ([mask-0.5, img], [mask-0.5, stg1]) (reference
    Discriminator, mat.py:1472-1594 + basic_module.py:576-662): two
    residual trunks of DisBlocks downsampling to 4x4 (the stg1 trunk at
    half width), grouped minibatch stddev, a 3x3 conv, then
    fc0(nf(2)*16 -> nf(2)) and fc1 -> 1. base=64 reproduces the reference
    nf table exactly. Returns fp32 (logits, logits_stg1)."""
    base: int = 64
    dtype: jnp.dtype = jnp.float32
    mbstd_group: int = 4

    @nn.compact
    def __call__(self, img, mask, stg1):
        res_log2 = int(math.log2(img.shape[1]))
        bottom = min(2, res_log2 - 1)

        def trunk(x, prefix, div):
            h = EqualConv(nf(res_log2, self.base, div), kernel=1,
                          name=f"{prefix}_from_rgb")(x)
            for res in range(res_log2, bottom, -1):
                h = DisBlock(nf(res - 1, self.base, div),
                             name=f"{prefix}_b{res}")(h)
            h = minibatch_std(h, self.mbstd_group)
            h = EqualConv(nf(bottom, self.base, div),
                          name=f"{prefix}_final")(h)
            h = h.reshape(h.shape[0], -1)
            h = EqualDense(nf(bottom, self.base, div), act=True,
                           name=f"{prefix}_fc0")(h)
            return EqualDense(1, name=f"{prefix}_fc1")(h)

        dt = self.dtype
        m = jnp.clip(mask, 0.0, 1.0).astype(dt) - 0.5
        img = img.astype(dt)
        stg1 = stg1.astype(dt)
        logits = trunk(jnp.concatenate([m, img], axis=-1), "main", 1)
        logits_stg1 = trunk(jnp.concatenate([m, stg1], axis=-1), "stg1", 2)
        return logits.astype(jnp.float32), logits_stg1.astype(jnp.float32)
