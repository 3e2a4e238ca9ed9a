"""ResNet generators (CycleGAN/CUT family), NHWC flax.

Behavioral parity with reference
models/modules/resnet_architecture/resnet_generator.py: c7s1-ngf stem, two
stride-2 downs, n residual blocks, two ups, c7s1-out + tanh; plus
``ResnetGeneratorAttn`` (attention decoder mixing nb_mask_attn masks,
reference attn_network.py:6-55 + resnet_generator.py:388-558) and mobile
(separable conv) variants. Upsampling is resize+conv (TPU-friendly,
checkerboard-free) instead of ConvTranspose.

Encoder feature taps for CUT NCE are exposed via ``extract_layer_ids``
indexed over the flat sub-layer list, matching the reference convention of
indices into the torch Sequential encoder (cut_model.py:226).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pad(x, p, mode="reflect"):
    """Spatial pad with a hand-written transpose.

    jnp.pad(mode="reflect") forward lowers fine, but its autodiff
    transpose (differentiating through concat+flip+slice) emitted ~19
    unfused full-tensor slice/pad/add instructions per ResnetBlock in the
    CUT train step's HLO (BASELINE.md GAN-step audit). The custom VJP
    folds each border back in one fused pad+add pass per axis and keeps
    the cotangent in the input dtype."""
    if p == 0:
        return x
    m = {"reflect": "reflect", "replicate": "edge", "zeros": "constant"}[mode]
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=m)


def _pad_fwd(x, p, mode):
    # zero-sized residual only carries the input dtype for the cotangent
    return _pad(x, p, mode), jnp.zeros((0,), x.dtype)


def _fold_axis(ct, p, n, axis, mode):
    """Fold the two p-wide borders of `ct` back onto the interior along
    `axis` (length n interior). Returns the interior-sized array."""
    sl = [slice(None)] * ct.ndim
    sl[axis] = slice(p, n + p)
    t = ct[tuple(sl)]
    lo = [slice(None)] * ct.ndim
    lo[axis] = slice(0, p)
    hi = [slice(None)] * ct.ndim
    hi[axis] = slice(n + p, n + 2 * p)
    pad_cfg = [(0, 0)] * ct.ndim
    if mode == "reflect":
        # out row j (j<p) reads in row p-j; out row n+p+j reads n-2-j
        a = jnp.flip(ct[tuple(lo)], axis)
        pad_cfg[axis] = (1, n - p - 1)
        t = t + jnp.pad(a, pad_cfg)
        b = jnp.flip(ct[tuple(hi)], axis)
        pad_cfg[axis] = (n - p - 1, 1)
        t = t + jnp.pad(b, pad_cfg)
    elif mode == "edge":
        a = ct[tuple(lo)].sum(axis, keepdims=True)
        pad_cfg[axis] = (0, n - 1)
        t = t + jnp.pad(a, pad_cfg)
        b = ct[tuple(hi)].sum(axis, keepdims=True)
        pad_cfg[axis] = (n - 1, 0)
        t = t + jnp.pad(b, pad_cfg)
    return t


def _pad_bwd(p, mode, res, ct):
    ct = ct.astype(res.dtype)
    if p == 0:
        return (ct,)
    m = {"reflect": "reflect", "replicate": "edge", "zeros": "constant"}[mode]
    t = _fold_axis(ct, p, ct.shape[1] - 2 * p, 1, m)
    dx = _fold_axis(t, p, ct.shape[2] - 2 * p, 2, m)
    return (dx,)


_pad.defvjp(_pad_fwd, _pad_bwd)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization (torch InstanceNorm2d
    affine=False default in the reference norm helper).

    fp32 STATISTICS with compute-dtype IO: the mean/var reductions
    accumulate in float32 (the upcast fuses into the reduction — nothing
    fp32 is materialized), while the normalize itself runs in the input
    dtype. Same policy as the UNet's GroupNorm32 — the fp32-elementwise
    version materialized f32 tensors at full resolution in forward AND
    backward and dominated the CUT train step's HBM traffic (BASELINE.md
    roofline audit)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # E[x^2] - E[x]^2 so both stats are pure reductions over the bf16
        # input (jnp.var's (x - mean) subtract materializes a full fp32
        # tensor; this form keeps fp32 to the accumulators only)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(1, 2), keepdims=True)
        mean2 = (x32 * x32).mean(axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        scale = jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return (x - mean.astype(x.dtype)) * scale


def make_norm(kind, dtype=None):
    if kind == "instance":
        return InstanceNorm()
    if kind == "batch":
        # batch stats are replaced by group stats on TPU (no SyncBN needed;
        # SURVEY.md §2.7 — prefer group/instance norm over cross-device BN).
        # dtype: stats stay fp32 inside flax; IO in the compute dtype.
        return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)
    return lambda x: x


class SeparableConv(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(x.shape[-1], (self.kernel, self.kernel),
                    strides=self.strides, feature_group_count=x.shape[-1],
                    padding="VALID", dtype=self.dtype, name="depthwise")(x)
        x = InstanceNorm()(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="pointwise")(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with torch-exact tap alignment (reference
    ResnetDecoder, resnet_generator.py:313-330: k=3, s=2, p=1,
    output_padding=1): a stride-1 conv over the lhs-dilated input padded
    (k-1-p) low / (k-1-p+output_padding) high. Only used with
    up_mode='convtranspose' so checkpoints converted from the reference
    reproduce its outputs exactly; the training default stays resize+conv
    (checkerboard-free and cheaper on TPU). The kernel is stored HWIO
    already-flipped — tools/convert_reference_checkpoint.py does the
    flip+transpose from torch's (in, out, kh, kw)."""
    features: int
    kernel: int = 3
    stride: int = 2
    pad: int = 1
    output_padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        lo = k - 1 - self.pad
        hi = lo + self.output_padding
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features))
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1), padding=((lo, hi), (lo, hi)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return out + b.astype(self.dtype)


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "instance"
    padding_type: str = "reflect"
    dropout: float = 0.0
    mobile: bool = False
    use_spectral: bool = False
    dtype: jnp.dtype = jnp.float32

    def _conv(self, name):
        if self.mobile:
            # the reference's SeparableConv2d blocks are not spectral-normed
            return SeparableConv(self.dim, dtype=self.dtype, name=name)
        if self.use_spectral:
            from .spectral import SNConv
            return SNConv(self.dim, (3, 3), strides=1, padding=0,
                          dtype=self.dtype, name=name)
        return nn.Conv(self.dim, (3, 3), padding="VALID", dtype=self.dtype,
                       name=name)

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = _pad(x, 1, self.padding_type)
        h = self._conv("conv1")(h)
        h = make_norm(self.norm, self.dtype)(h)
        h = nn.relu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _pad(h, 1, self.padding_type)
        h = self._conv("conv2")(h)
        h = make_norm(self.norm, self.dtype)(h)
        return x + h


class ResnetEncoder(nn.Module):
    ngf: int = 64
    n_blocks: int = 6
    n_downsampling: int = 2
    norm: str = "instance"
    padding_type: str = "reflect"
    dropout: float = 0.0
    mobile: bool = False
    use_spectral: bool = False   # G_spectral (reference :427-486)
    spectral_blocks: bool = True  # the attn G's reference blocks stay plain
    dtype: jnp.dtype = jnp.float32

    def _conv(self, feat, kernel, strides, padding, name):
        if self.use_spectral:
            from .spectral import SNConv
            return SNConv(feat, (kernel, kernel), strides=strides,
                          padding=(0 if padding == "VALID" else padding),
                          dtype=self.dtype, name=name)
        return nn.Conv(feat, (kernel, kernel), strides=strides,
                       padding=padding, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, extract_layer_ids=None, deterministic=True):
        feats = []

        def tap(h):
            feats.append(h)
            return h

        h = tap(x)  # layer id 0 = input (reference Sequential index 0 is pad)
        h = _pad(x, 3, self.padding_type)
        h = self._conv(self.ngf, 7, 1, "VALID", "stem")(h)
        h = make_norm(self.norm, self.dtype)(h)
        h = tap(nn.relu(h))
        mult = 1
        for i in range(self.n_downsampling):
            mult *= 2
            h = self._conv(self.ngf * mult, 3, 2, 1, f"down{i}")(h)
            h = make_norm(self.norm, self.dtype)(h)
            h = tap(nn.relu(h))
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult, self.norm, self.padding_type,
                            self.dropout, self.mobile,
                            use_spectral=(self.use_spectral
                                          and self.spectral_blocks),
                            dtype=self.dtype,
                            name=f"res{i}")(h, deterministic)
            tap(h)
        if extract_layer_ids is not None:
            ids = [min(i, len(feats) - 1) for i in extract_layer_ids]
            return h, [feats[i] for i in ids]
        return h, feats


class ResnetDecoder(nn.Module):
    out_channels: int = 3
    ngf: int = 64
    n_downsampling: int = 2
    norm: str = "instance"
    padding_type: str = "reflect"
    tanh: bool = True
    freq_space: bool = False
    use_spectral: bool = False
    up_mode: str = "resize"   # resize | convtranspose (reference-exact)
    dtype: jnp.dtype = jnp.float32

    def _conv(self, feat, kernel, padding, name):
        if self.use_spectral:
            from .spectral import SNConv
            return SNConv(feat, (kernel, kernel), strides=1,
                          padding=(0 if padding == "VALID" else padding),
                          dtype=self.dtype, name=name)
        return nn.Conv(feat, (kernel, kernel), padding=padding,
                       dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, h):
        mult = 2 ** self.n_downsampling
        for i in range(self.n_downsampling):
            feat = self.ngf * mult // (2 ** (i + 1))
            if self.up_mode == "convtranspose":
                h = TorchConvTranspose(feat, dtype=self.dtype,
                                       name=f"up{i}")(h)
            else:
                from ...ops.resize import nearest_up2
                h = nearest_up2(h)
                h = self._conv(feat, 3, 1, f"up{i}")(h)
            h = make_norm(self.norm, self.dtype)(h)
            h = nn.relu(h)
        if self.freq_space:
            # back to pixel space before the full-resolution head conv
            # (reference resnet_generator.py:526-532 iwt placement)
            from ...ops.upfirdn2d import inverse_haar_transform
            h = inverse_haar_transform(h.astype(jnp.float32)).astype(h.dtype)
        h = _pad(h, 3, self.padding_type)
        h = self._conv(self.out_channels, 7, "VALID", "head")(h)
        if self.tanh:
            h = jnp.tanh(h)
        return h.astype(jnp.float32)


class ResnetGenerator(nn.Module):
    """resnet / mobile_resnet G."""
    out_channels: int = 3
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"
    padding_type: str = "reflect"
    dropout: float = 0.0
    mobile: bool = False
    freq_space: bool = False
    use_spectral: bool = False
    up_mode: str = "resize"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ResnetEncoder(
            self.ngf, self.n_blocks, 2, self.norm, self.padding_type,
            self.dropout, self.mobile, use_spectral=self.use_spectral,
            dtype=self.dtype)
        self.decoder = ResnetDecoder(
            self.out_channels, self.ngf, 2, self.norm, self.padding_type,
            tanh=True, freq_space=self.freq_space,
            use_spectral=self.use_spectral, up_mode=self.up_mode,
            dtype=self.dtype)

    def __call__(self, x, deterministic=True, extract_layer_ids=None):
        if self.freq_space:
            # train_feat_wavelet: the trunk runs in Haar frequency space
            # (reference resnet_generator.py:419-426,497-501)
            from ...ops.upfirdn2d import haar_transform
            x = haar_transform(x)
        if extract_layer_ids is not None:
            _, feats = self.encoder(x, extract_layer_ids, deterministic)
            return feats
        h, _ = self.encoder(x, None, deterministic)
        return self.decoder(h)


class ResnetGeneratorAttn(nn.Module):
    """resnet_attn: attention decoder blending content images and input
    (reference attn_network.py:13-46). Softmax over nb_mask_attn masks;
    the last nb_mask_input masks re-use the input image."""
    out_channels: int = 3
    nb_mask_attn: int = 10
    nb_mask_input: int = 1
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"
    padding_type: str = "reflect"
    mobile: bool = False
    freq_space: bool = False
    use_spectral: bool = False
    up_mode: str = "resize"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ResnetEncoder(
            self.ngf, self.n_blocks, 2, self.norm, self.padding_type, 0.0,
            self.mobile, use_spectral=self.use_spectral,
            spectral_blocks=False, dtype=self.dtype)
        n_content = self.nb_mask_attn - self.nb_mask_input
        self.content_decoder = ResnetDecoder(
            self.out_channels * n_content, self.ngf, 2, self.norm,
            self.padding_type, tanh=True, freq_space=self.freq_space,
            use_spectral=self.use_spectral, up_mode=self.up_mode,
            dtype=self.dtype)
        self.attn_decoder = ResnetDecoder(
            self.nb_mask_attn, self.ngf, 2, self.norm, self.padding_type,
            tanh=False, freq_space=self.freq_space,
            use_spectral=self.use_spectral, up_mode=self.up_mode,
            dtype=self.dtype)

    def __call__(self, x, deterministic=True, extract_layer_ids=None,
                 return_attention=False):
        x_pix = x
        if self.freq_space:
            # train_feat_wavelet (reference resnet_generator.py:421-426):
            # trunk in Haar space; attention blending stays in pixel space
            from ...ops.upfirdn2d import haar_transform
            x = haar_transform(x)
        if extract_layer_ids is not None:
            _, feats = self.encoder(x, extract_layer_ids, deterministic)
            return feats
        h, _ = self.encoder(x, None, deterministic)
        n_content = self.nb_mask_attn - self.nb_mask_input
        contents = self.content_decoder(h)
        att = jax.nn.softmax(self.attn_decoder(h), axis=-1)
        inp = x_pix[..., :3]
        out = 0.0
        for i in range(n_content):
            ci = contents[..., i * self.out_channels:(i + 1) * self.out_channels]
            out = out + ci * att[..., i:i + 1]
        for i in range(n_content, self.nb_mask_attn):
            out = out + inp * att[..., i:i + 1]
        if return_attention:
            # per-mask attention maps for display
            # (reference output_display_G_attention_masks)
            return out.astype(jnp.float32), att.astype(jnp.float32)
        return out.astype(jnp.float32)


class ResnetGeneratorAttnDiff(nn.Module):
    """Diffusion-conditioned resnet_attn (reference
    models/modules/resnet_architecture/resnet_generator_diff.py,
    ResnetGenerator_attn_diff used at diffusion_networks.py:219): the
    attention generator with a timestep/gamma embedding FiLM-injected at the
    bottleneck. Output is the blended content (no tanh clamp — the denoiser
    predicts noise)."""
    out_channels: int = 3
    nb_mask_attn: int = 10
    nb_mask_input: int = 1
    ngf: int = 64
    n_blocks: int = 9
    cond_embed_dim: int = 256
    norm: str = "instance"
    padding_type: str = "reflect"
    freq_space: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb=None, deterministic=True,
                 extract_layer_ids=None):
        x_pix = x
        if self.freq_space:
            # train_feat_wavelet (reference resnet_generator_diff.py mirrors
            # resnet_generator.py:421-426)
            from ...ops.upfirdn2d import haar_transform
            x = haar_transform(x)
        enc = ResnetEncoder(self.ngf, self.n_blocks, 2, self.norm,
                            self.padding_type, 0.0, False, dtype=self.dtype,
                            name="encoder")
        if extract_layer_ids is not None:
            _, feats = enc(x, extract_layer_ids, deterministic)
            return feats
        h, _ = enc(x, None, deterministic)
        if emb is None:
            emb = jnp.ones((x.shape[0], self.cond_embed_dim),
                           dtype=self.dtype)
        # FiLM at the bottleneck (scale-shift from the gamma embedding)
        c = h.shape[-1]
        film = nn.Dense(2 * c, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name="film")(nn.silu(emb.astype(self.dtype)))
        scale, shift = jnp.split(film[:, None, None, :], 2, axis=-1)
        h = h * (1 + scale) + shift

        n_content = self.nb_mask_attn - self.nb_mask_input
        contents = ResnetDecoder(
            self.out_channels * n_content, self.ngf, 2, self.norm,
            self.padding_type, tanh=False, freq_space=self.freq_space,
            dtype=self.dtype,
            name="content_decoder")(h)
        att = jax.nn.softmax(
            ResnetDecoder(self.nb_mask_attn, self.ngf, 2, self.norm,
                          self.padding_type, tanh=False,
                          freq_space=self.freq_space, dtype=self.dtype,
                          name="attn_decoder")(h).astype(jnp.float32),
            axis=-1).astype(x.dtype)
        inp = x_pix[..., : self.out_channels]
        out = 0.0
        for i in range(n_content):
            ci = contents[..., i * self.out_channels:(i + 1) * self.out_channels]
            out = out + ci * att[..., i:i + 1]
        for i in range(n_content, self.nb_mask_attn):
            out = out + inp * att[..., i:i + 1]
        return out.astype(jnp.float32)
