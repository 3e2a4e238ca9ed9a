"""Projected-GAN discriminator (reference models/modules/projected_d/).

Structure: a FROZEN multi-scale feature network (EfficientNet-lite trunk),
frozen random cross-channel (CCM) and cross-scale (CSM) projections, and a
trainable MultiScaleD — one small patch discriminator per feature scale
whose logits are concatenated (reference projected_d/discriminator.py:233,
projector.py:490).

Freezing is expressed functionally: every frozen submodule's OUTPUT passes
through ``stop_gradient``, so its parameters receive exactly zero gradient
and never move — no requires_grad bookkeeping needed. Pretrained
EfficientNet weights load from ``$JOLIGEN_TPU_WEIGHTS_DIR/efficientnet_lite.
npz`` when present; otherwise the trunk stays at its (fixed-seed) random
init — random frozen features + random projections remain a usable
projected-GAN signal, while parity with the reference's ImageNet features
requires dropping in the ported weights.

The temporal variant (reference TemporalProjectedDiscriminator,
discriminator.py:289-422) runs the frozen trunk per frame and aggregates
frame features with a per-location LSTM cell (same recurrence type as the
reference's MultiScaleLSTM) before MultiScaleD.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

sg = jax.lax.stop_gradient


class MBConv(nn.Module):
    """Mobile inverted bottleneck, EfficientNet-lite flavor: no SE, relu6,
    TF SAME padding. BatchNorm is folded into each conv's bias (the trunk is
    frozen/inference-only), so params are plain conv kernel+bias — exactly
    what tools/port_efficientnet_lite_weights.py produces."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(c * self.expand, (1, 1), dtype=self.dtype,
                        name="expand")(h)
            h = nn.relu(jnp.minimum(h, 6.0))  # relu6
        h = nn.Conv(h.shape[-1], (self.kernel, self.kernel),
                    strides=self.stride, padding="SAME",
                    feature_group_count=h.shape[-1], dtype=self.dtype,
                    name="dw")(h)
        h = nn.relu(jnp.minimum(h, 6.0))
        h = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="project")(h)
        if self.stride == 1 and c == self.out_ch:
            h = h + x
        return h


# tf_efficientnet_lite stages: (out_ch, kernel, stride, repeats, expand)
_LITE0_STAGES = ((16, 3, 1, 1, 1), (24, 3, 2, 2, 6), (40, 5, 2, 2, 6),
                 (80, 3, 2, 3, 6), (112, 5, 1, 3, 6), (192, 5, 2, 4, 6),
                 (320, 3, 1, 1, 6))
# lite3 = width x1.2 / depth x1.4 with first/last stage repeats unscaled
# (the MiDaS v2.1 small encoder)
_LITE3_STAGES = ((24, 3, 1, 1, 1), (32, 3, 2, 3, 6), (48, 5, 2, 3, 6),
                 (96, 3, 2, 5, 6), (136, 5, 1, 5, 6), (232, 5, 2, 6, 6),
                 (384, 3, 1, 1, 6))
# feature taps after these stages -> strides 4, 8, 16, 32
_LITE_TAPS = (1, 2, 4, 6)


class EfficientNetLiteTrunk(nn.Module):
    """Exact tf_efficientnet_lite topology (timm), BN folded into conv
    biases. Returns features at strides 4, 8, 16, 32 (lite0:
    (24, 40, 112, 320); lite3: (32, 48, 136, 384)). Ported ImageNet weights
    drop in via load_efficientnet_trunk (else fixed-seed random features)."""
    stages: tuple = _LITE0_STAGES
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(32, (3, 3), strides=2, padding="SAME", dtype=self.dtype,
                    name="stem")(x)
        h = nn.relu(jnp.minimum(h, 6.0))
        feats = []
        for si, (out_ch, k, s, reps, e) in enumerate(self.stages):
            for ri in range(reps):
                h = MBConv(out_ch, kernel=k, stride=(s if ri == 0 else 1),
                           expand=e, dtype=self.dtype,
                           name=f"b{si}_{ri}")(h)
            if si in _LITE_TAPS:
                feats.append(h)
        return feats


def load_efficientnet_trunk(params, net_name="feature_network"):
    """Swap the frozen trunk's params for ported tf_efficientnet_lite0
    weights when ``$JOLIGEN_TPU_WEIGHTS_DIR/efficientnet_lite0.npz`` exists
    (produced by tools/port_efficientnet_lite_weights.py). Returns the
    (possibly updated) params pytree."""
    import os

    import numpy as np

    path = os.path.join(os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", ""),
                        "efficientnet_lite0.npz")
    if not os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR") \
            or not os.path.exists(path):
        return params
    if net_name not in params.get("params", {}):
        return params
    z = np.load(path)
    tree = {}
    for key in z.files:  # "stem.kernel", "b1_0.expand.bias", ...
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])
    new_params = dict(params)
    new_params["params"] = dict(params["params"])
    new_params["params"][net_name] = tree
    return new_params


class FRandomProj(nn.Module):
    """Frozen random projections: CCM 1x1 per scale + CSM top-down mixing
    (reference projector.py CCM/CSM blocks). All outputs stop_gradient'd."""
    out_ch: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        # CCM: random 1x1 channel mixing
        ccm = [nn.Conv(self.out_ch * (2 ** i), (1, 1), use_bias=False,
                       dtype=self.dtype, name=f"ccm{i}")(f)
               for i, f in enumerate(feats)]
        # CSM: top-down upsample + 3x3 conv, deepest to shallowest
        out = [None] * len(ccm)
        prev = ccm[-1]
        out[-1] = prev
        for i in range(len(ccm) - 2, -1, -1):
            n, h, w, c = prev.shape
            up = jax.image.resize(prev, (n, ccm[i].shape[1], ccm[i].shape[2], c),
                                  "nearest")
            up = nn.Conv(ccm[i].shape[-1], (3, 3), padding=1, use_bias=False,
                         dtype=self.dtype, name=f"csm{i}")(up)
            prev = ccm[i] + up
            out[i] = prev
        return [sg(o) for o in out]


class DownBlockPatch(nn.Module):
    """Per-scale patch discriminator head (reference SingleDisc)."""
    channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        ch = self.channels
        # downsample to ~4px grid
        steps = 0
        while min(h.shape[1], h.shape[2]) > 4 and steps < 4:
            h = nn.Conv(ch, (4, 4), strides=2, padding=1, use_bias=False,
                        dtype=self.dtype, name=f"down{steps}")(h)
            h = nn.GroupNorm(num_groups=min(8, ch), dtype=jnp.float32)(
                h.astype(jnp.float32)).astype(h.dtype)
            h = nn.leaky_relu(h, 0.2)
            ch = min(ch * 2, 512)
            steps += 1
        return nn.Conv(1, (4, 4), padding=1, dtype=self.dtype,
                       name="out")(h)


class ProjectedDiscriminator(nn.Module):
    """Frozen trunk + frozen projections + trainable MultiScaleD.
    call(x (B,H,W,C) in [-1,1]) -> (B, total_patches) logits.

    trunk_stages selects the frozen backbone: lite0 (default projector) or
    lite3 (the MiDaS depth encoder — reference projected_d projector type
    ``depth``; ported depth weights load via
    utils/midas.load_midas_encoder_into_projected)."""
    interp: int = -1        # resize input to this size first (224 typical)
    proj_ch: int = 64
    trunk_stages: tuple = _LITE0_STAGES
    network_type: str = "efficientnet"   # D_proj_network_type
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        if self.interp and self.interp > 0 and x.shape[1] != self.interp:
            x = jax.image.resize(
                x, (x.shape[0], self.interp, self.interp, x.shape[-1]),
                "bilinear")
        if self.network_type == "segformer":
            # Segformer MiT feature pyramid as the frozen projector trunk
            # (reference gan_networks.py:396-416 D_proj_network_type)
            from .segformer import MiTBackbone
            feats = MiTBackbone(dtype=self.dtype, name="feature_network")(x)
        else:
            feats = EfficientNetLiteTrunk(stages=self.trunk_stages,
                                          dtype=self.dtype,
                                          name="feature_network")(x)
        feats = [sg(f) for f in feats]      # frozen trunk
        projs = FRandomProj(self.proj_ch, dtype=self.dtype, name="proj")(feats)
        logits = []
        for i, p in enumerate(projs):
            li = DownBlockPatch(self.proj_ch, dtype=self.dtype,
                                name=f"disc{i}")(p)
            logits.append(li.reshape(li.shape[0], -1))
        return jnp.concatenate(logits, axis=1).astype(jnp.float32)


class TemporalProjectedDiscriminator(nn.Module):
    """Video D: per-frame frozen features -> recurrent temporal mixing ->
    MultiScaleD.

    The recurrence is an LSTM cell per spatial location, matching the
    reference's recurrence type (MultiScaleLSTM, discriminator.py:289-422).
    Deliberate structural deviation: the reference flattens each scale to
    (B, F, c*r*r) and runs torch.nn.LSTM(hidden_size=16), then
    Unflatten(dim=2, (c, r, r)) — which only typechecks when c*r*r == 16,
    so the flattened form cannot be reproduced literally; the
    per-location cell keeps the temporal-mixing intent with shapes that
    hold at every scale."""
    interp: int = -1
    proj_ch: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, F, H, W, C)."""
        b, f = x.shape[:2]
        flat = x.reshape((b * f,) + x.shape[2:])
        if flat.shape[-1] == 1:
            flat = jnp.tile(flat, (1, 1, 1, 3))
        if self.interp and self.interp > 0 and flat.shape[1] != self.interp:
            flat = jax.image.resize(
                flat, (flat.shape[0], self.interp, self.interp,
                       flat.shape[-1]), "bilinear")
        feats = EfficientNetLiteTrunk(dtype=self.dtype,
                                      name="feature_network")(flat)
        feats = [sg(ft) for ft in feats]
        projs = FRandomProj(self.proj_ch, dtype=self.dtype, name="proj")(feats)
        logits = []
        for i, p in enumerate(projs):
            c = p.shape[-1]
            seq = p.reshape((b, f) + p.shape[1:])          # (B,F,h,w,c)
            # GRU over frames at each spatial location (explicit params so
            # the recurrence can live in one lax.scan)
            seq = seq.transpose(1, 0, 2, 3, 4)             # (F,B,h,w,c)
            # LSTM cell over frames at each spatial location (explicit
            # params so the recurrence lives in one lax.scan; gate layout
            # [i, f, g, o] like torch.nn.LSTM)
            init = nn.initializers.lecun_normal()
            w_g = self.param(f"lstm_w{i}", init, (2 * c, 4 * c))
            b_g = self.param(f"lstm_b{i}", nn.initializers.zeros, (4 * c,))

            def step(carry, xt):
                hprev, cprev = carry
                hx = jnp.concatenate([hprev, xt], -1)
                gates = hx @ w_g.astype(hx.dtype) + b_g.astype(hx.dtype)
                ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
                cnew = (jax.nn.sigmoid(fg) * cprev
                        + jax.nn.sigmoid(ig) * jnp.tanh(gg))
                hnew = jax.nn.sigmoid(og) * jnp.tanh(cnew)
                return (hnew, cnew), None

            h0 = jnp.zeros_like(seq[0])
            (hT, _), _ = jax.lax.scan(step, (h0, h0), seq)
            li = DownBlockPatch(self.proj_ch, dtype=self.dtype,
                                name=f"disc{i}")(hT)
            logits.append(li.reshape(b, -1))
        return jnp.concatenate(logits, axis=1).astype(jnp.float32)
