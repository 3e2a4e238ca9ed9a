"""Independent-training convergence A/B vs the reference — the final rung
of the zero-egress quality-parity ladder (VERDICT r1 "missing #1").

The converted-weight parity tests (forward / sampling chain / gradients /
12-step trajectory, tests/test_numerical_parity.py) prove the two
frameworks compute the SAME function. This tool measures what they cannot:
that a full training run from an INDEPENDENT initialization converges to
the same quality. Both sides train the same masked-inpainting task:

- data: deterministic procedural "blob" images (sums of Gaussian bumps,
  tanh-squashed) with rectangular hole masks — learnable structure, no
  external downloads;
- reference side: the ACTUAL reference UNet + DiffusionGenerator
  (models/modules/unet_generator_attn/unet_generator_attn.py,
  models/modules/diffusion_generator.py:457-533 loss semantics: q_sample,
  mask mixing, min-SNR-weighted masked MSE) trained with torch.optim.Adam
  from torch's own default init;
- tpu side: our UNetMHA/PaletteDenoiser + the identical loss in jax,
  trained with optax.adam from our flax init;
- shared across sides: dataset, minibatch index schedule, per-step
  (t, u, eps) draws (variance reduction — the weights differ, the task
  noise does not);
- eval: each framework reconstructs HELD-OUT images with its OWN DDIM
  sampler (reference restoration_ddim diffusion_generator.py:286-455 vs
  our lax.scan ddim_sample), both from the same y_t init; masked-region
  PSNR vs ground truth is the quality score.

Prints one JSON line:
  {"psnr_masked_ref": .., "psnr_masked_tpu": .., "tail_loss_ref": ..,
   "tail_loss_tpu": .., "steps": N}

Run on CPU:  JAX_PLATFORMS=cpu python tools/convergence_ab.py --steps 400
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# architecture shared by both sides (small enough for CPU)
NGF = 16
COND_DIM = 64
RES_BLOCKS = [1, 1]
MULTS = (1, 2)
ATTN_RES = [2]
IMG = 16
T_TRAIN = 10
T_TEST = 5
LR, BETAS, EPS = 2e-4, (0.9, 0.999), 1e-8


def reference_unet_importable():
    """Install the stub packages needed to import the reference UNet
    directly (positional_encodings is absent from this image; the module
    only uses it behind an untaken branch)."""
    import torch  # noqa: F401

    if "positional_encodings" not in sys.modules:
        pe = types.ModuleType("positional_encodings")
        pet = types.ModuleType("positional_encodings.torch_encodings")

        class _P:
            def __init__(self, *a, **k):
                pass

        pet.PositionalEncoding1D = pet.Summer = _P
        pe.torch_encodings = pet
        sys.modules.update({"positional_encodings": pe,
                            "positional_encodings.torch_encodings": pet})
    for name, path in [
            ("models", "/root/reference/models"),
            ("models.modules", "/root/reference/models/modules"),
            ("models.modules.unet_generator_attn",
             "/root/reference/models/modules/unet_generator_attn")]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = [path]
            sys.modules[name] = m
    from models.modules.unet_generator_attn.unet_generator_attn import UNet
    return UNet


def build_reference_generator(torch, seed):
    """Reference UNet (torch default init, seeded) wrapped in the actual
    reference DiffusionGenerator with a conditioning="" denoise_fn shim
    (palette_denoise_fn.py:95-117 reduces to model(input, embedding))."""
    import importlib.util as ilu

    UNet = reference_unet_importable()
    torch.manual_seed(seed)
    unet = UNet(image_size=IMG, in_channel=6, inner_channel=NGF,
                out_channel=3, res_blocks=RES_BLOCKS, attn_res=ATTN_RES,
                channel_mults=MULTS, num_head_channels=8, tanh=False,
                n_timestep_train=T_TRAIN, n_timestep_test=T_TEST,
                norm="groupnorm", group_norm_size=8,
                cond_embed_dim=COND_DIM)
    sys.path.insert(0, "/root/reference")
    try:
        spec = ilu.spec_from_file_location(
            "models.modules.diffusion_generator",
            "/root/reference/models/modules/diffusion_generator.py")
        dg = ilu.module_from_spec(spec)
        sys.modules["models.modules.diffusion_generator"] = dg
        spec.loader.exec_module(dg)
    finally:
        sys.path.pop(0)

    class _DenoiseFn(torch.nn.Module):
        def __init__(self, model):
            super().__init__()
            self.model = model
            self.cond_embed_dim = COND_DIM
            self.conditioning = ""

        def forward(self, input, embed_noise_level, cls=None, mask=None,
                    ref=None):
            return self.model(input, embed_noise_level)

    gen = dg.DiffusionGenerator(
        denoise_fn=_DenoiseFn(unet), sampling_method="ddim",
        image_size=IMG, G_ngf=NGF, loading_backward_compatibility=False)
    return gen


def make_dataset(n, seed):
    """(images, masks): tanh-squashed sums of Gaussian bumps + one
    rectangular hole mask per image. Deterministic in ``seed``."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    imgs = np.zeros((n, IMG, IMG, 3), np.float32)
    masks = np.zeros((n, IMG, IMG, 1), np.float32)
    for i in range(n):
        acc = np.zeros((IMG, IMG, 3), np.float32)
        for _ in range(4):
            cy, cx = rng.uniform(2, IMG - 2, 2)
            s = rng.uniform(1.5, 4.0)
            amp = rng.uniform(-2.0, 2.0, 3).astype(np.float32)
            bump = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
            acc += bump[..., None] * amp
        imgs[i] = np.tanh(acc)
        h = rng.randint(5, 9)
        w = rng.randint(5, 9)
        y0 = rng.randint(1, IMG - h - 1)
        x0 = rng.randint(1, IMG - w - 1)
        masks[i, y0:y0 + h, x0:x0 + w, 0] = 1.0
    return imgs, masks


def draw_schedule(steps, batch, n_train, g_train, sr, srm1, seed):
    """Per-step shared draws: minibatch indices, t, u, eps, and the
    min-SNR weights (diffusion_generator.py:457-533 min_snr_loss_weight,
    gamma=5)."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(steps):
        idx = rng.randint(0, n_train, size=(batch,))
        t = rng.randint(1, T_TRAIN, size=(batch,)).astype(np.int64)
        u = rng.rand(batch).astype(np.float32)
        eps = rng.randn(batch, IMG, IMG, 3).astype(np.float32)
        sg = ((g_train[t] - g_train[t - 1]) * u + g_train[t - 1]).astype(
            np.float32)
        snr = (sr[t] / srm1[t]) ** 2
        w = (np.minimum(snr, 5.0) / snr).astype(np.float32)
        out.append((idx, sg, eps, w))
    return out


def train_reference(torch, gen, imgs, masks, sched_draws):
    def nchw(x):
        return torch.tensor(np.transpose(x, (0, 3, 1, 2)))

    gen.train()
    opt = torch.optim.Adam(gen.parameters(), lr=LR, betas=BETAS, eps=EPS)
    mse = torch.nn.MSELoss()
    losses = []
    for idx, sg, eps, w in sched_draws:
        b = len(idx)
        y0 = nchw(imgs[idx])
        m = nchw(masks[idx])
        y_cond = y0 * (1.0 - m)
        opt.zero_grad()
        eps_t = nchw(eps)
        sg4 = torch.tensor(sg.reshape(b, 1, 1, 1))
        y_noisy = gen.q_sample(y0, sg4, noise=eps_t)
        y_noisy = y_noisy * m + (1.0 - m) * y0
        inp = torch.cat([y_cond, y_noisy], dim=1)
        emb = gen.compute_gammas(torch.tensor(sg.reshape(b, 1)))
        noise_hat = gen.denoise_fn(inp, emb)
        w_t = torch.tensor(w.reshape(b, 1, 1, 1))
        loss = mse(w_t * m * eps_t, w_t * m * noise_hat)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def train_tpu(imgs, masks, sched_draws):
    import jax
    import jax.numpy as jnp
    import optax

    from joligen_tpu.models.modules.palette_diffusion import PaletteDenoiser
    from joligen_tpu.models.modules.unet_mha import UNetMHA

    net = PaletteDenoiser(
        inner=UNetMHA(in_channel=6, out_channel=3, inner_channel=NGF,
                      cond_embed_dim=COND_DIM,
                      res_blocks=tuple(RES_BLOCKS),
                      attn_res=tuple(ATTN_RES), channel_mults=MULTS,
                      num_head_channels=8, group_size=8,
                      attn_norm="instance"),
        cond_embed_dim=COND_DIM, conditioning="", nclasses=2)
    b = len(sched_draws[0][0])
    params = net.init(jax.random.PRNGKey(7),
                      jnp.zeros((b, IMG, IMG, 6), jnp.float32),
                      jnp.ones((b,), jnp.float32))
    tx = optax.adam(LR, b1=BETAS[0], b2=BETAS[1], eps=EPS)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, y0, m, sg, eps, w):
        def loss_fn(p):
            sg4 = sg.reshape(-1, 1, 1, 1)
            y_noisy = jnp.sqrt(sg4) * y0 + jnp.sqrt(1.0 - sg4) * eps
            y_noisy = y_noisy * m + (1.0 - m) * y0
            x = jnp.concatenate([y0 * (1.0 - m), y_noisy], axis=-1)
            noise_hat = net.apply(p, x, sg)
            w4 = w.reshape(-1, 1, 1, 1)
            d = w4 * m * (noise_hat - eps)
            return jnp.mean(d ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for idx, sg, eps, w in sched_draws:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(imgs[idx]),
            jnp.asarray(masks[idx]), jnp.asarray(sg), jnp.asarray(eps),
            jnp.asarray(w))
        losses.append(float(loss))
    return net, params, losses


def masked_psnr(out, gt, m):
    """PSNR over the hole region only; signal range [-1, 1] (peak 2)."""
    se = ((out - gt) ** 2 * m).sum()
    n = m.sum() * gt.shape[-1]
    mse = se / max(n, 1.0)
    return 10.0 * math.log10(4.0 / max(mse, 1e-12))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_train", type=int, default=32)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--ddim_steps", type=int, default=T_TEST)
    args = ap.parse_args(argv)

    import torch

    import jax
    import jax.numpy as jnp

    from joligen_tpu.models.modules.palette_diffusion import ddim_sample
    from joligen_tpu.ops.schedules import NoiseSchedule

    torch.manual_seed(0)
    sched_train = NoiseSchedule.for_phase(T_TRAIN, "train")
    g_train = np.asarray(sched_train.gammas)
    sr = np.asarray(sched_train.sqrt_recip_gammas)
    srm1 = np.asarray(sched_train.sqrt_recipm1_gammas)

    imgs, masks = make_dataset(args.n_train + args.n_test, seed=3)
    tr_i, tr_m = imgs[:args.n_train], masks[:args.n_train]
    te_i, te_m = imgs[args.n_train:], masks[args.n_train:]
    draws = draw_schedule(args.steps, args.batch, args.n_train,
                          g_train, sr, srm1, seed=5)

    gen = build_reference_generator(torch, seed=17)
    # schedule sanity: the reference's registered test buffers must equal
    # our test-phase schedule (set_new_noise_schedule parity)
    sched_test = NoiseSchedule.for_phase(T_TEST, "test")
    np.testing.assert_allclose(
        np.asarray(sched_test.gammas),
        gen.denoise_fn.model.gammas_test.numpy(), rtol=1e-6)

    losses_ref = train_reference(torch, gen, tr_i, tr_m, draws)
    net, params, losses_tpu = train_tpu(tr_i, tr_m, draws)

    # ----- eval: held-out DDIM reconstruction, shared y_t init -----
    rng = np.random.RandomState(11)
    y_init = rng.randn(*te_i.shape).astype(np.float32)

    def nchw(x):
        return torch.tensor(np.transpose(x, (0, 3, 1, 2)))

    gen.eval()
    with torch.no_grad():
        ref_out, _ = gen.restoration(
            nchw(te_i * (1.0 - te_m)), y_t=nchw(y_init), y_0=nchw(te_i),
            mask=nchw(te_m), sample_num=2,
            ddim_num_steps=args.ddim_steps, ddim_eta=0.0)
    ref_img = np.transpose(ref_out.numpy(), (0, 2, 3, 1))

    def apply_fn(p, x, g, cls=None, mask=None, ref=None, zero_gamma=False):
        return net.apply(p, jnp.asarray(x), jnp.asarray(g), cls=cls,
                         mask=mask, zero_gamma=zero_gamma)

    tpu_img = np.asarray(ddim_sample(
        apply_fn, params, jax.random.PRNGKey(0), sched_test,
        jnp.asarray(te_i * (1.0 - te_m)), y_t=jnp.asarray(y_init),
        y_0=jnp.asarray(te_i), mask=jnp.asarray(te_m),
        num_steps=args.ddim_steps, eta=0.0))

    tail = max(1, args.steps // 10)
    result = {
        "psnr_masked_ref": round(masked_psnr(ref_img, te_i, te_m), 3),
        "psnr_masked_tpu": round(masked_psnr(tpu_img, te_i, te_m), 3),
        "tail_loss_ref": round(float(np.mean(losses_ref[-tail:])), 6),
        "tail_loss_tpu": round(float(np.mean(losses_tpu[-tail:])), 6),
        "steps": args.steps,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
