"""Semantic auxiliary nets: classifier C and segmenter f_s
(reference models/semantic_networks.py:19-105, models/modules/classifiers.py,
models/modules/UNet_classification.py). Compact NHWC flax versions; the
heavy pretrained options (VGG16-FCN8s, Segformer, SAM) are follow-ups —
'vgg'/'basic' map to these trainable-from-scratch nets as the reference's
CI-tested path does."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class Classifier(nn.Module):
    """Downsampling CNN classifier (reference classifiers.py Classifier)."""
    nclasses: int
    nf: int = 64
    img_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math
        h = x.astype(self.dtype)
        n_levels = max(2, int(math.log2(max(1, self.img_size // 8))))
        f = self.nf
        for i in range(n_levels):
            h = nn.Conv(f, (3, 3), strides=2, padding=1, dtype=self.dtype)(h)
            h = nn.LayerNorm(dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
            f = min(f * 2, self.nf * 8)
        h = h.mean(axis=(1, 2))
        return nn.Dense(self.nclasses, dtype=self.dtype)(h).astype(jnp.float32)


class UNetSegmenter(nn.Module):
    """Small UNet per-pixel classifier (reference UNet_classification.py)."""
    nclasses: int
    nf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax
        h = x.astype(self.dtype)
        skips = []
        f = self.nf
        for i in range(3):
            h = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype)(h)
            # stats stay fp32 inside flax; IO in the compute dtype
            h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
            h = nn.relu(h)
            skips.append(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            f *= 2
        h = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.relu(h)
        for i in range(3):
            f //= 2
            from ...ops.resize import nearest_up2
            h = nearest_up2(h)
            h = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = jnp.concatenate([h, skips.pop()], axis=-1)
        return nn.Conv(self.nclasses, (1, 1), dtype=self.dtype)(h).astype(jnp.float32)


class VGG16FCN8s(nn.Module):
    """FCN-8s segmenter on a VGG16 trunk (reference classifiers.py:57-175
    VGG16_FCN8s: 99px zero pad, pool3/pool4 skip fusions scaled by 1e-4/1e-2
    through zero-init score convs, fixed-bilinear transpose-conv upsampling
    with the reference crop offsets 5/9/31). The trunk loads ImageNet
    weights from vgg16_lpips.npz when present (tools/port_vgg16_weights.py),
    fc6/fc7 head weights from the same file when ported with --with-head.

    ``pad`` selects the padding scheme; both share ONE param tree, so
    ported weights and checkpoints are interchangeable between them:

    - "fcn": reference-exact (classifiers.py:123 ``F.pad(x, 99...)``,
      VALID fc6, crop offsets 5/9/31) — the Caffe-era construction that
      makes the crop arithmetic work for arbitrary sizes. At 256px input
      the whole VGG trunk runs at 454x454 = 3.15x the pixels; the GAN-step
      HLO audit showed those 454x454 buffers dominating HBM traffic.
    - "same" (the ``--f_s_vgg_pad`` default): TPU-native — no outer pad,
      SAME-padded fc6, SAME transpose-conv upsamples initialized from the
      same bilinear kernels, skips fused by cropping the upsample to the
      skip's size (ceil-mode pools guarantee upsample >= skip). Interior
      math is identical; only border handling differs, which the trained
      score convs absorb."""
    nclasses: int
    dtype: jnp.dtype = jnp.float32
    pad: str = "fcn"

    @staticmethod
    def _bilinear_kernel(factor, channels):
        import numpy as np
        size = 2 * factor
        f = (size + 1) // 2
        center = f - 1 if size % 2 == 1 else f - 0.5
        og = np.ogrid[:size, :size]
        filt = ((1 - abs(og[0] - center) / f)
                * (1 - abs(og[1] - center) / f)).astype(np.float32)
        w = np.zeros((size, size, channels, channels), np.float32)
        for i in range(channels):
            w[:, :, i, i] = filt
        return jnp.asarray(w)

    def _upscore(self, x, factor):
        import jax
        w = self._bilinear_kernel(factor, x.shape[-1])
        return jax.lax.conv_transpose(
            x, w.astype(x.dtype), strides=(factor, factor),
            padding="VALID" if self.pad == "fcn" else "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @staticmethod
    def _crop(a, ref_h, ref_w, offset):
        return a[:, offset:offset + ref_h, offset:offset + ref_w, :]

    @nn.compact
    def __call__(self, x):
        import jax
        n, H, W, _ = x.shape
        h = x.astype(self.dtype)
        if self.pad == "fcn":
            h = jnp.pad(h, ((0, 0), (99, 99), (99, 99), (0, 0)))
        widths = (64, 128, 256, 512, 512)
        pool3 = pool4 = None

        def ceil_pool(v):  # reference pools use ceil_mode=True
            ph, pw = v.shape[1] % 2, v.shape[2] % 2
            if ph or pw:
                v = jnp.pad(v, ((0, 0), (0, ph), (0, pw), (0, 0)),
                            constant_values=-jnp.inf)
            return nn.max_pool(v, (2, 2), strides=(2, 2))

        for bi, wdt in enumerate(widths):
            for ci in range(2 if bi < 2 else 3):
                h = nn.Conv(wdt, (3, 3), padding=1, dtype=self.dtype,
                            name=f"b{bi}c{ci}")(h)
                h = nn.relu(h)
            h = ceil_pool(h)
            if bi == 2:
                pool3 = h
            elif bi == 3:
                pool4 = h
        h = nn.Conv(4096, (7, 7),
                    padding="VALID" if self.pad == "fcn" else "SAME",
                    dtype=self.dtype, name="fc6")(h)
        h = nn.relu(h)
        h = nn.Conv(4096, (1, 1), dtype=self.dtype, name="fc7")(h)
        h = nn.relu(h)
        h = nn.Conv(self.nclasses, (1, 1), dtype=self.dtype, name="score")(h)

        up2 = self._upscore(h, 2)
        sp4 = nn.Conv(self.nclasses, (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="score_pool4")(0.01 * pool4)
        if self.pad == "fcn":
            fuse4 = up2 + self._crop(sp4, up2.shape[1], up2.shape[2], 5)
        else:
            fuse4 = self._crop(up2, sp4.shape[1], sp4.shape[2], 0) + sp4
        up4 = self._upscore(fuse4, 2)
        sp3 = nn.Conv(self.nclasses, (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="score_pool3")(0.0001 * pool3)
        if self.pad == "fcn":
            fuse3 = up4 + self._crop(sp3, up4.shape[1], up4.shape[2], 9)
        else:
            fuse3 = self._crop(up4, sp3.shape[1], sp3.shape[2], 0) + sp3
        up8 = self._upscore(fuse3, 8)
        return self._crop(up8, H, W, 31 if self.pad == "fcn" else 0) \
            .astype(jnp.float32)


class _Affine(nn.Module):
    """Folded BatchNorm: per-channel scale/shift. The porter folds the
    torchvision running stats into these (FrozenBN) — the TPU-native
    stand-in for BN that keeps training steps pure and avoids SyncBN."""
    features: int

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * s + b


class ResNetTemplate(nn.Module):
    """torchvision-style ResNet classifier template (reference
    classifiers.py:249-260 torch_model wraps TORCH_MODEL_CLASSES[template]
    and replaces .fc with an nclasses head). Supports the templates whose
    512-wide fc the reference actually rewires (resnet18/34) plus resnet50.
    ImageNet weights drop in from ``resnet{18,34,50}_tv.npz`` (porter
    tools/port_torchvision_resnet_weights.py, BN folded)."""
    nclasses: int
    variant: str = "resnet18"
    dtype: jnp.dtype = jnp.float32

    _CFG = {"resnet18": ((2, 2, 2, 2), False),
            "resnet34": ((3, 4, 6, 3), False),
            "resnet50": ((3, 4, 6, 3), True)}

    @nn.compact
    def __call__(self, x):
        import jax
        blocks, bottleneck = self._CFG[self.variant]
        h = x.astype(self.dtype)
        if h.shape[-1] == 1:
            h = jnp.tile(h, (1, 1, 1, 3))
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = _Affine(64, name="bn1")(h)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        width = 64
        for si, n in enumerate(blocks):
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                out_w = width * (4 if bottleneck else 1)
                name = f"layer{si + 1}_{bi}"
                identity = h
                if stride != 1 or h.shape[-1] != out_w:
                    identity = nn.Conv(out_w, (1, 1), strides=stride,
                                       use_bias=False, dtype=self.dtype,
                                       name=f"{name}_down")(h)
                    identity = _Affine(out_w, name=f"{name}_downbn")(identity)
                if bottleneck:
                    y = nn.Conv(width, (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"{name}_conv1")(h)
                    y = nn.relu(_Affine(width, name=f"{name}_bn1")(y))
                    y = nn.Conv(width, (3, 3), strides=stride, padding=1,
                                use_bias=False, dtype=self.dtype,
                                name=f"{name}_conv2")(y)
                    y = nn.relu(_Affine(width, name=f"{name}_bn2")(y))
                    y = nn.Conv(out_w, (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"{name}_conv3")(y)
                    y = _Affine(out_w, name=f"{name}_bn3")(y)
                else:
                    y = nn.Conv(width, (3, 3), strides=stride, padding=1,
                                use_bias=False, dtype=self.dtype,
                                name=f"{name}_conv1")(h)
                    y = nn.relu(_Affine(width, name=f"{name}_bn1")(y))
                    y = nn.Conv(width, (3, 3), padding=1, use_bias=False,
                                dtype=self.dtype, name=f"{name}_conv2")(y)
                    y = _Affine(width, name=f"{name}_bn2")(y)
                h = nn.relu(y + identity)
            width *= 2
        h = h.mean(axis=(1, 2))
        return nn.Dense(self.nclasses, dtype=self.dtype,
                        name="fc")(h).astype(jnp.float32)


def load_resnet_template(params, variant, node_name="CLS"):
    """Swap ResNetTemplate leaves for ImageNet weights from
    resnet{variant}_tv.npz when present (fc head keeps its fresh init —
    the reference replaces it with a new nclasses Linear)."""
    import os

    import jax.numpy as _jnp
    import numpy as _np
    wd = os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", "")
    path = os.path.join(wd, f"{variant}_tv.npz")
    if not (wd and os.path.exists(path)):
        return params
    raw = _np.load(path)

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and all(
                    not isinstance(x, dict) for x in v.values()) \
                    and k != "fc":
                keys = {f"{k}/{leaf}" for leaf in v}
                if keys <= set(raw.files):
                    out[k] = {leaf: _jnp.asarray(raw[f"{k}/{leaf}"])
                              for leaf in v}
                    continue
            out[k] = walk(v)
        return out

    return walk(params)


def load_vgg_fcn8s_trunk(params, node_name="f_s"):
    """Swap the VGG16 trunk convs (b{bi}c{ci}) — and fc6/fc7 when ported —
    for ImageNet weights from vgg16_lpips.npz; unchanged when absent."""
    import os

    import jax.numpy as _jnp
    import numpy as _np
    wd = os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", "")
    path = os.path.join(wd, "vgg16_lpips.npz")
    if not (wd and os.path.exists(path)):
        return params
    raw = _np.load(path)

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and "kernel" in v \
                    and f"{k}/kernel" in raw.files \
                    and raw[f"{k}/kernel"].shape == tuple(
                        _np.shape(v["kernel"])):
                out[k] = {"kernel": _jnp.asarray(raw[f"{k}/kernel"]),
                          "bias": _jnp.asarray(raw[f"{k}/bias"])}
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def _dtype(opt):
    import jax.numpy as jnp
    return jnp.bfloat16 if getattr(opt, "tpu_bf16", True) else jnp.float32


def define_C(opt):
    """C factory (reference semantic_networks.py:19-43): 'basic' CNN or a
    torchvision-template ResNet classifier."""
    template = getattr(opt, "train_sem_cls_template", "basic") or "basic"
    if template != "basic":
        if template not in ResNetTemplate._CFG:
            raise NotImplementedError(
                f"cls template '{template}' — supported: basic, "
                f"{', '.join(sorted(ResNetTemplate._CFG))} (the reference's "
                "torch_model rewires a 512-wide fc, i.e. resnet18/34)")
        return ResNetTemplate(nclasses=opt.cls_semantic_nclasses,
                              variant=template)
    return Classifier(nclasses=opt.cls_semantic_nclasses, nf=opt.cls_nf,
                      img_size=opt.data_crop_size, dtype=_dtype(opt))


def define_f(opt):
    """f_s factory (reference semantic_networks.py:45): unet / vgg /
    segformer (from-scratch MiT; pretrained weights are weight-gated) /
    sam (needs downloaded SAM weights — unavailable in this image)."""
    net = getattr(opt, "f_s_net", "unet") or "unet"
    if net == "segformer":
        from .segformer import SegformerSegmenter
        return SegformerSegmenter(num_classes=opt.f_s_semantic_nclasses,
                                  dtype=_dtype(opt))
    if net == "sam":
        # frozen SAM as the segmenter: replaces the GT label mask with its
        # box-prompted prediction (reference base_model.py:1522-1560); the
        # f_s optimizer is a no-op for it
        from ...utils.sam import (SamSegmenter, load_sam_params,
                                  sam_weights_path)
        path = sam_weights_path()
        if path is None:
            raise NotImplementedError(
                "f_s_net=sam needs ported SAM weights: run "
                "tools/port_sam_weights.py and drop sam_vit.npz into "
                "JOLIGEN_TPU_WEIGHTS_DIR (zero-egress environment)")
        _, cfg = load_sam_params(path)
        return SamSegmenter(cfg)
    if net == "vgg":
        return VGG16FCN8s(nclasses=opt.f_s_semantic_nclasses,
                          dtype=_dtype(opt),
                          pad=getattr(opt, "f_s_vgg_pad", "same") or "same")
    return UNetSegmenter(nclasses=opt.f_s_semantic_nclasses, nf=opt.f_s_nf,
                         dtype=_dtype(opt))
