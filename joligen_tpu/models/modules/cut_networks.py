"""CUT machinery: patch feature sampler + contrastive losses + GAN losses.

Parity targets:
- PatchSampleF (reference models/modules/cut_networks.py:1-189): random
  spatial patch sampling + per-layer 2-layer MLP + L2 norm. Patch ids are
  drawn on the host and passed in so shapes stay static under jit.
- patchnce / monce (sinkhorn OT) / SRC+hDCE losses (reference
  models/modules/NCE/: base_NCE.py, monce.py, sinkhorn.py, SRC.py).
- GANLoss modes lsgan/vanilla/wgangp/projected (reference
  models/modules/loss.py:11-197).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class PatchSampleF(nn.Module):
    """mlp_sample projector. call with a list of (B,H,W,C) features and a
    list of (num_patches,) int32 patch ids per layer."""
    nc: int = 256
    use_mlp: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, patch_ids):
        out = []
        for i, (feat, ids) in enumerate(zip(feats, patch_ids)):
            b, h, w, c = feat.shape
            flat = feat.reshape(b, h * w, c)
            sampled = jnp.take(flat, ids, axis=1)       # (B, P, C)
            x = sampled.reshape(b * ids.shape[0], c)
            if self.use_mlp:
                x = nn.Dense(self.nc, dtype=self.dtype, name=f"mlp_{i}_0")(x)
                x = nn.relu(x)
                x = nn.Dense(self.nc, dtype=self.dtype, name=f"mlp_{i}_1")(x)
            x = x * jax.lax.rsqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-10)
            out.append(x.astype(jnp.float32))
        return out


def sample_patch_ids(rng, feats, num_patches):
    """Host/jit-side helper: one id set per layer (shared across batch,
    like the reference)."""
    ids = []
    for i, f in enumerate(feats):
        hw = f.shape[1] * f.shape[2]
        rng, sub = jax.random.split(rng)
        n = min(num_patches, hw)
        ids.append(jax.random.choice(sub, hw, shape=(n,), replace=False))
    return ids


# ----------------------------- NCE losses ---------------------------------

def _neg_logits(feat_q, feat_k, batch_dim):
    dim = feat_q.shape[1]
    q = feat_q.reshape(batch_dim, -1, dim)
    k = feat_k.reshape(batch_dim, -1, dim)
    npatches = q.shape[1]
    l_neg = jnp.einsum("bid,bjd->bij", q, k)
    eye = jnp.eye(npatches, dtype=bool)[None]
    l_neg = jnp.where(eye, -10.0, l_neg)
    return l_neg, npatches


def _nce_from_logits(l_pos, l_neg, nce_T):
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / nce_T
    # cross entropy with target index 0
    return jax.nn.logsumexp(logits, axis=1) - logits[:, 0]


def patch_nce_loss(feat_q, feat_k, nce_T=0.07, batch=1,
                   include_all_negatives=False):
    """(reference base_NCE.py). feat_q/feat_k: (B*P, C), k is stop-gradiented."""
    feat_k = jax.lax.stop_gradient(feat_k)
    bdim = 1 if include_all_negatives else batch
    l_pos = jnp.sum(feat_q * feat_k, axis=1, keepdims=True)
    l_neg, npatches = _neg_logits(feat_q, feat_k, bdim)
    return _nce_from_logits(l_pos, l_neg.reshape(-1, npatches), nce_T)


def _sinkhorn(K, max_iter=50):
    n, in_size, out_size = K.shape
    a = out_size / in_size

    def body(_, uv):
        u, v = uv
        u = a / (jnp.einsum("bio,bo->bi", K, v) + 1e-12)
        v = 1.0 / (jnp.einsum("bi,bio->bo", u, K) + 1e-12)
        return u, v

    u = jnp.ones((n, in_size), K.dtype)
    v = jnp.ones((n, out_size), K.dtype)
    u, v = jax.lax.fori_loop(0, max_iter, body, (u, v))
    return u[:, :, None] * K * v[:, None, :]


def monce_loss(feat_q, feat_k, nce_T=0.07, batch=1, num_patches=256,
               include_all_negatives=False, eps=1.0, max_iter=50):
    """MoNCE: negatives reweighted by sinkhorn optimal transport
    (reference NCE/monce.py:16-33 + sinkhorn.py)."""
    feat_k = jax.lax.stop_gradient(feat_k)
    bdim = 1 if include_all_negatives else batch
    dim = feat_q.shape[1]
    q = feat_q.reshape(bdim, -1, dim)
    k = feat_k.reshape(bdim, -1, dim)
    C = jnp.einsum("bid,bod->bio", q, k)
    npatches = q.shape[1]
    eye = jnp.eye(npatches, dtype=bool)[None]
    K = jnp.where(eye, -10.0, C)          # cost_type "hard"
    K = jnp.exp(K / eps)
    f = _sinkhorn(K, max_iter)
    f = jnp.transpose(f, (0, 2, 1)) * (num_patches - 1) + 1e-8

    l_pos = jnp.sum(feat_q * feat_k, axis=1, keepdims=True)
    l_neg, _ = _neg_logits(feat_q, feat_k, bdim)
    l_neg = l_neg + jnp.log(f) * nce_T
    return _nce_from_logits(l_pos, l_neg.reshape(-1, npatches), nce_T)


def src_hdce_loss(feat_q, feat_k, nce_T=0.07, batch=1, num_patches=256,
                  include_all_negatives=False, gamma=50.0,
                  lambda_src=0.0):
    """SRC (semantic relation consistency) + hardness-weighted DCE
    (reference NCE/SRC.py:17+). Returns (hDCE_loss, SRC_loss)."""
    feat_k_sg = jax.lax.stop_gradient(feat_k)
    bdim = 1 if include_all_negatives else batch
    dim = feat_q.shape[1]
    q = feat_q.reshape(bdim, -1, dim)
    k = feat_k_sg.reshape(bdim, -1, dim)
    npatches = q.shape[1]
    sim_q = jnp.einsum("bid,bjd->bij", q, q)
    sim_k = jnp.einsum("bid,bjd->bij", k, k)
    eye = jnp.eye(npatches, dtype=bool)[None]

    # SRC: match the two relation (self-similarity) softmax distributions
    p_q = jax.nn.softmax(jnp.where(eye, -1e4, sim_q) / nce_T, axis=-1)
    p_k = jax.nn.softmax(jnp.where(eye, -1e4, sim_k) / nce_T, axis=-1)
    src = jnp.sum(p_k * (jnp.log(p_k + 1e-8) - jnp.log(p_q + 1e-8)), axis=-1)

    # hDCE: negatives weighted by hardness (exp of similarity)
    l_neg = jnp.einsum("bid,bjd->bij", q, k)
    weights = jax.nn.softmax(jnp.where(eye, -1e4, l_neg) * gamma / dim, axis=-1)
    l_neg = jnp.where(eye, -10.0, l_neg) + nce_T * jnp.log(
        weights * (npatches - 1) + 1e-8)
    l_pos = jnp.sum(feat_q * feat_k_sg, axis=1, keepdims=True)
    hdce = _nce_from_logits(l_pos, l_neg.reshape(-1, npatches), nce_T)
    return hdce, src.reshape(-1)


def contrastive_gan_loss(pred_true, pred_false):
    """Contrastive GAN objective (reference loss.py:142-169
    ContrastiveLoss): each `true` logit is classified against the pool of
    every `false` logit with cross-entropy, i.e.
    mean_i [logsumexp(t_i, f_0..f_M) - t_i]."""
    t = pred_true.reshape(-1).astype(jnp.float32)
    f = pred_false.reshape(-1).astype(jnp.float32)
    lse_f = jax.scipy.special.logsumexp(f)
    return jnp.mean(jnp.logaddexp(t, lse_f) - t)


# ----------------------------- GAN losses ---------------------------------

def gan_loss(pred, target_is_real, mode="lsgan", smooth=0.0):
    """Criterion value for one prediction map (reference loss.py:11-114).
    ``smooth``: one-sided label smoothing for real targets on D."""
    if mode == "lsgan":
        target = (1.0 - smooth) if target_is_real else 0.0
        return jnp.mean((pred - target) ** 2)
    if mode == "vanilla":
        target = jnp.ones_like(pred) * (1.0 - smooth) if target_is_real \
            else jnp.zeros_like(pred)
        return jnp.mean(optax_sigmoid_ce(pred, target))
    if mode in ("wgangp",):
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    if mode == "projected":
        # hinge-style used with projected discriminators
        return jnp.mean(nn.relu(1.0 - pred)) if target_is_real \
            else jnp.mean(nn.relu(1.0 + pred))
    raise NotImplementedError(mode)


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def wgangp_gradient_penalty(d_apply, params, real, fake, rng, constant=1.0):
    """Mixed-interpolate gradient penalty (reference loss.py:117-170)."""
    alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), real.dtype)
    interp = alpha * real + (1 - alpha) * fake

    def d_sum(x):
        return jnp.sum(d_apply(params, x))

    grads = jax.grad(d_sum)(interp)
    gnorm = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1)
                     + 1e-16)
    return jnp.mean((gnorm - constant) ** 2)
