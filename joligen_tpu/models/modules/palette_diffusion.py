"""Palette DDPM core: conditioning wrapper, training forward, DDPM/DDIM samplers.

Behavioral parity with reference models/modules/diffusion_generator.py and
palette_denoise_fn.py, redesigned for XLA:
- the whole sampling chain is a single ``lax.scan`` compiled once (the
  reference runs a Python loop of T cuda launches);
- continuous-gamma q_sample, masked noise blending, min-SNR weights match
  diffusion_generator.py:457-521;
- class/mask conditioning matches palette_denoise_fn.py:95-159 (class
  embedding concatenated to the gamma embedding; mask embedded per-pixel and
  concatenated as channels).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.schedules import NoiseSchedule, extract, gamma_embedding


class LabelEmbedder(nn.Module):
    """Class/mask-label embedding table (palette_denoise_fn.py:14-32)."""
    num_classes: int
    hidden_size: int

    @nn.compact
    def __call__(self, labels):
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_classes, self.hidden_size),
        )
        return jnp.take(table, labels, axis=0)


class PaletteDenoiser(nn.Module):
    """Wraps an inner denoiser with gamma/class/mask conditioning.

    inner: a flax module mapping ((B,H,W,Cin), (B,emb_dim)) -> (B,H,W,Cout).
    conditioning: "" | "mask" | "class" | "mask_and_class".
    """

    inner: nn.Module
    cond_embed_dim: int
    conditioning: str = ""
    nclasses: int = 2
    raw_t: bool = False   # inner takes raw t in [0,1] (JiT/HDiT style)
    ref_embed_net: str = ""   # "" (conv encoder) | "clip" (frozen ViT-B/16)
    #                         # | "imagebind" (frozen ImageBind vision tower)
    dtype: jnp.dtype = jnp.float32

    @property
    def gamma_dim(self):
        # class/ref conditioning halves the gamma share of the embedding
        # (diffusion_generator.py:66-75)
        if "class" in self.conditioning or "ref" in self.conditioning:
            return self.cond_embed_dim // 2
        return self.cond_embed_dim

    @nn.compact
    def __call__(self, x, gammas, cls=None, mask=None, ref=None,
                 zero_gamma=False, deterministic=True):
        """x: (B,H,W,C) concatenated [y_cond, y_noisy]. gammas: (B,) noise
        levels. ref: optional reference image for ref-attention denoisers /
        ref embedding conditioning (reference palette_denoise_fn.py ref
        encoders are CLIP/ImageBind — weight-gated here; a small conv
        encoder provides the embedding instead)."""
        if self.raw_t:
            # DiT-style denoisers embed the timestep themselves; gamma in
            # [0,1] plays the role of t (class label forwarded as y)
            if "mask" in self.conditioning and mask is not None:
                m = jnp.clip(mask.astype(x.dtype), 0.0, 1.0)
                x = jnp.concatenate([x, m], axis=-1)
            return self.inner(x, gammas,
                              y=(cls if "class" in self.conditioning else None))
        g = self.gamma_dim
        emb = gamma_embedding(gammas, g)
        emb = nn.Dense(g, dtype=self.dtype, name="cond_embed_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(g, dtype=self.dtype, name="cond_embed_1")(emb)
        if zero_gamma:
            # CFG unconditional branch: the reference feeds a literal zero
            # embedding (diffusion_generator.py:217-229
            # torch.zeros_like(embed_noise_level))
            emb = jnp.zeros_like(emb)

        if "class" in self.conditioning:
            cls_embed = (
                LabelEmbedder(self.nclasses, self.cond_embed_dim // 2,
                              name="embedder_class")(cls)
                if cls is not None else
                # cls=None (CFG uncond): zero class vector, NOT class 0
                jnp.zeros((x.shape[0], self.cond_embed_dim // 2), emb.dtype))
            emb = jnp.concatenate([emb, cls_embed.astype(emb.dtype)], axis=1)

        if "ref" in self.conditioning and "class" not in self.conditioning:
            # ref-image embedding concatenated to the gamma embedding
            # (palette_denoise_fn.py ref branch; conv encoder replaces the
            # downloaded CLIP/ImageBind in this zero-egress environment)
            if ref is None:
                ref_embed = jnp.zeros(
                    (x.shape[0], self.cond_embed_dim - g), emb.dtype)
            elif self.ref_embed_net == "clip":
                # frozen CLIP ViT-B/16 image embedding -> SiLU -> Dense
                # (reference palette_denoise_fn.py:77-92,144-155); ported
                # weights swap in post-init via load_clip_ref_encoder
                from ...utils.clip_vit import CLIPVisualViT, preprocess
                feats = CLIPVisualViT(name="freezenet_clip")(
                    preprocess(ref.astype(jnp.float32)))
                feats = jax.lax.stop_gradient(feats)
                ref_embed = nn.Dense(self.cond_embed_dim - g,
                                     dtype=self.dtype, name="ref_proj")(
                    nn.silu(feats).astype(self.dtype))
            elif self.ref_embed_net == "imagebind":
                # frozen ImageBind vision joint embedding -> SiLU -> Dense
                # (reference palette_denoise_fn.py:83-85,146-148); ported
                # weights swap in via load_imagebind_ref_encoder
                from ...utils.image_bind import (IMAGEBIND_VISION_CONFIG,
                                                 ImageBindVision, preprocess)
                feats = ImageBindVision(name="freezenet_imagebind",
                                        **IMAGEBIND_VISION_CONFIG)(
                    preprocess(ref.astype(jnp.float32)))
                feats = jax.lax.stop_gradient(feats)
                ref_embed = nn.Dense(self.cond_embed_dim - g,
                                     dtype=self.dtype, name="ref_proj")(
                    nn.silu(feats).astype(self.dtype))
            else:
                h = ref.astype(self.dtype)
                for i, chn in enumerate((64, 128, 256)):
                    h = nn.Conv(chn, (3, 3), strides=2, padding=1,
                                dtype=self.dtype, name=f"ref_enc{i}")(h)
                    h = nn.silu(h)
                h = jnp.mean(h, axis=(1, 2))
                ref_embed = nn.Dense(self.cond_embed_dim - g,
                                     dtype=self.dtype, name="ref_proj")(h)
            emb = jnp.concatenate([emb, ref_embed.astype(emb.dtype)], axis=1)

        if "mask" in self.conditioning:
            if mask is None:
                mask = jnp.zeros(x.shape[:-1] + (1,), dtype=jnp.int32)
            m = jnp.clip(mask[..., 0].astype(jnp.int32), 0, self.nclasses - 1)
            mask_embed = LabelEmbedder(self.nclasses, self.cond_embed_dim,
                                       name="embedder_mask")(m)
            x = jnp.concatenate([x, mask_embed.astype(x.dtype)], axis=-1)

        from .unet_ref_attn import UNetRefAttn
        if isinstance(self.inner, UNetRefAttn):
            return self.inner(x, emb, ref=ref, deterministic=deterministic)
        return self.inner(x, emb, deterministic=deterministic)


# --------------------------------------------------------------------------
# Pure training / sampling math
# --------------------------------------------------------------------------

def q_sample(y0, sample_gammas, noise):
    """y_noisy = sqrt(g)*y0 + sqrt(1-g)*eps (diffusion_generator.py:410-412)."""
    return jnp.sqrt(sample_gammas) * y0 + jnp.sqrt(1.0 - sample_gammas) * noise


def sample_continuous_gammas(rng, schedule: NoiseSchedule, batch):
    """t ~ U{1..T-1}, gamma ~ U[gamma_{t-1}, gamma_t]
    (diffusion_generator.py:464-478)."""
    rng_t, rng_u = jax.random.split(rng)
    t = jax.random.randint(rng_t, (batch,), 1, schedule.num_timesteps)
    g_lo = extract(schedule.gammas, t - 1, 1)
    g_hi = extract(schedule.gammas, t, 1)
    u = jax.random.uniform(rng_u, (batch,))
    return t, (g_hi - g_lo) * u + g_lo


def min_snr_weight(schedule: NoiseSchedule, t, ksnr=5.0):
    """min(SNR, k)/SNR per-sample weight (diffusion_generator.py:498-519)."""
    snr1 = extract(schedule.sqrt_recip_gammas, t, 1)
    snr2 = extract(schedule.sqrt_recipm1_gammas, t, 1)
    snr = (snr1 / snr2) ** 2
    return jnp.minimum(snr, ksnr) / snr


def palette_training_outputs(apply_fn, params, rng, schedule: NoiseSchedule,
                             y0, y_cond, mask=None, cls=None,
                             dropout_prob=0.0, minsnr=True, null_class=0):
    """One training forward: returns (noise, noise_hat, weight) exactly as
    the reference DiffusionGenerator.forward (diffusion_generator.py:457-521).

    y0/y_cond: (B,H,W,C) NHWC in [-1,1]. mask: (B,H,W,1) int labels or None.
    """
    b = y0.shape[0]
    bshape = (b,) + (1,) * (y0.ndim - 1)
    rng_g, rng_n, rng_drop = jax.random.split(rng, 3)
    t, gammas = sample_continuous_gammas(rng_g, schedule, b)
    noise = jax.random.normal(rng_n, y0.shape, dtype=y0.dtype)

    g4 = gammas.reshape(bshape)
    y_noisy = q_sample(y0, g4, noise)

    if mask is not None:
        m = jnp.clip(mask.astype(y0.dtype), 0.0, 1.0)
        y_noisy = y_noisy * m + (1.0 - m) * y0

    # classifier-free dropout of conditioning labels
    # (palette_model.py:565-584: "the highest class is the unconditionned
    # one" — dropped samples get the reserved null class, not class 0)
    if dropout_prob > 0.0:
        keep = jax.random.uniform(rng_drop, (b,)) >= dropout_prob
        if cls is not None:
            cls = jnp.where(keep, cls, null_class)
        if mask is not None:
            mask = jnp.where(keep.reshape(bshape), mask,
                             jnp.full_like(mask, null_class))

    x_in = jnp.concatenate([y_cond, y_noisy], axis=-1)
    noise_hat = apply_fn(params, x_in, gammas, cls=cls, mask=mask)

    weight = min_snr_weight(schedule, t).reshape(bshape) if minsnr else 1.0
    return noise, noise_hat, weight


def masked_elementwise_loss(noise, noise_hat, mask=None, weight=1.0, kind="MSE"):
    """Masked MSE/L1(+multiscale) over the noised region with reference
    semantics (palette_model.py:586-609): the min-SNR weight and the mask
    multiply the INPUTS — so the squared loss carries weight^2 like
    MSE(w*m*noise, w*m*noise_hat) — and the reduction is a plain mean over
    all elements (no masked-pixel renormalization)."""
    m = (jnp.clip(mask.astype(noise.dtype), 0.0, 1.0)
         if mask is not None else 1.0)
    d = (noise_hat - noise) * weight * m

    def base(e):
        return jnp.abs(e) if "L1" in kind else e ** 2

    if kind.startswith("multiscale"):
        # pyramid of the (linear) scaled diff; pooling commutes with the
        # reference's per-input pooling (loss.py:397-466), the nonlinearity
        # applies per scale
        total = 0.0
        e = d
        for _ in range(3):
            total = total + jnp.mean(base(e))
            e = nn.avg_pool(e, (2, 2), strides=(2, 2))
        return total / 3.0
    return jnp.mean(base(d))


def predict_start_from_noise(schedule: NoiseSchedule, y_t, t, noise):
    """(diffusion_utils.py:122-127)."""
    return (extract(schedule.sqrt_recip_gammas, t, y_t.ndim) * y_t
            - extract(schedule.sqrt_recipm1_gammas, t, y_t.ndim) * noise)


def q_posterior(schedule: NoiseSchedule, y0_hat, y_t, t):
    """(diffusion_utils.py:130-139)."""
    mean = (extract(schedule.posterior_mean_coef1, t, y_t.ndim) * y0_hat
            + extract(schedule.posterior_mean_coef2, t, y_t.ndim) * y_t)
    logvar = extract(schedule.posterior_log_variance_clipped, t, y_t.ndim)
    return mean, logvar


def _denoise(apply_fn, params, schedule, y_t, y_cond, t, cls, mask,
             guidance_scale, ref=None):
    gammas = jnp.take(jnp.asarray(schedule.gammas), t)
    x_in = jnp.concatenate([y_cond, y_t], axis=-1)
    noise_hat = apply_fn(params, x_in, gammas, cls=cls, mask=mask, ref=ref)
    y0_hat = predict_start_from_noise(schedule, y_t, t, noise_hat)
    if guidance_scale > 0.0:
        noise_uncond = apply_fn(params, x_in, gammas,
                                cls=None, mask=None, ref=ref,
                                zero_gamma=True)
        y0_uncond = predict_start_from_noise(schedule, y_t, t, noise_uncond)
        y0_hat = (1 + guidance_scale) * y0_hat - guidance_scale * y0_uncond
    return jnp.clip(y0_hat, -1.0, 1.0)


def ddpm_sample(apply_fn, params, rng, schedule: NoiseSchedule, y_cond,
                y_t=None, y_0=None, mask=None, cls=None, ref=None,
                guidance_scale=0.0, out_channel=None, noise_seq=None):
    """Full ancestral DDPM chain as one lax.scan
    (reference restoration_ddpm, diffusion_generator.py:119-177).

    ``noise_seq``: optional (T, B, H, W, C) array of per-step transition
    noises (step k is the noise added at t = T-1-k). Used by the
    full-chain equivalence tests to drive this sampler and the reference
    torch loop with the identical noise sequence; production callers leave
    it None and the noise is drawn from ``rng`` inside the scan."""
    b = y_cond.shape[0]
    c = out_channel or y_cond.shape[-1]
    rng, rng_init = jax.random.split(rng)
    if y_t is None:
        y_t = jax.random.normal(rng_init, y_cond.shape[:-1] + (c,),
                                dtype=y_cond.dtype)

    tmask = None if mask is None else jnp.clip(mask.astype(y_cond.dtype), 0.0, 1.0)

    def step(carry, scan_in):
        i = scan_in[0] if noise_seq is not None else scan_in
        y, key = carry
        key, sub = jax.random.split(key)
        t = jnp.full((b,), i, dtype=jnp.int32)
        y0_hat = _denoise(apply_fn, params, schedule, y, y_cond, t, cls, mask,
                          guidance_scale, ref=ref)
        mean, logvar = q_posterior(schedule, y0_hat, y, t)
        noise = (scan_in[1] if noise_seq is not None
                 else jax.random.normal(sub, y.shape, dtype=y.dtype))
        y = mean + jnp.where(i > 0, 1.0, 0.0) * noise * jnp.exp(0.5 * logvar)
        if tmask is not None and y_0 is not None:
            y = y_0 * (1.0 - tmask) + tmask * y
        return (y, key), None

    ts = jnp.arange(schedule.num_timesteps - 1, -1, -1)
    xs = (ts, jnp.asarray(noise_seq)) if noise_seq is not None else ts
    (y_t, _), _ = jax.lax.scan(step, (y_t, rng), xs)
    return y_t


def ddim_sample(apply_fn, params, rng, schedule: NoiseSchedule, y_cond,
                y_t=None, y_0=None, mask=None, cls=None, ref=None,
                guidance_scale=0.0, num_steps=10, eta=0.5, out_channel=None):
    """DDIM sampling as one lax.scan (reference restoration_ddim,
    diffusion_generator.py:286-455). Note the reference predicts y0 directly
    from the net output in its ddim path (no eps->x0 conversion) — matched."""
    import numpy as np

    b = y_cond.shape[0]
    c = out_channel or y_cond.shape[-1]
    rng, rng_init = jax.random.split(rng)
    if y_t is None:
        y_t = jax.random.normal(rng_init, y_cond.shape[:-1] + (c,),
                                dtype=y_cond.dtype)

    tmask = None if mask is None else jnp.clip(mask.astype(y_cond.dtype), 0.0, 1.0)
    tseq = np.linspace(0, schedule.num_timesteps - 1, num_steps).astype(np.int32)
    t_list = tseq[::-1].copy()                      # current t per step
    prev_list = np.concatenate([tseq[::-1][1:], [-1]]).astype(np.int32)

    def step(y, scan_in):
        ti, prevti = scan_in
        t = jnp.full((b,), ti, dtype=jnp.int32)
        gammas = jnp.take(jnp.asarray(schedule.gammas), t)
        x_in = jnp.concatenate([y_cond, y], axis=-1)
        y0_hat = apply_fn(params, x_in, gammas, cls=cls, mask=mask, ref=ref)
        if guidance_scale > 0.0:
            y0_unc = apply_fn(params, x_in, gammas, cls=None, mask=None,
                              ref=ref, zero_gamma=True)
            y0_hat = (1 + guidance_scale) * y0_hat - guidance_scale * y0_unc
        y0_hat = jnp.clip(y0_hat, -1.0, 1.0)

        gamma_t = extract(schedule.gammas, t, y.ndim)
        gamma_prevt = extract(schedule.gammas_prev, jnp.full((b,), prevti + 1,
                                                             dtype=jnp.int32), y.ndim)
        sigma = eta * jnp.sqrt(
            (1 - gamma_prevt) / (1 - gamma_t) * (1 - gamma_t / gamma_prevt))
        coef_eps = jnp.sqrt(jnp.maximum(1 - gamma_prevt - sigma ** 2, 0.0))
        mean = (jnp.sqrt(gamma_prevt) * (y - jnp.sqrt(1.0 - gamma_t) * y0_hat)
                / jnp.sqrt(gamma_t) + coef_eps * y0_hat)
        y = jnp.clip(mean, -1.0, 1.0)
        if tmask is not None and y_0 is not None:
            y = y_0 * (1.0 - tmask) + tmask * y
        return y, None

    y_t, _ = jax.lax.scan(step, y_t, (jnp.asarray(t_list), jnp.asarray(prev_list)))
    return y_t
