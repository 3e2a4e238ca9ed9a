"""Numerical parity of the diffusion/CM math against the reference formulas
(recomputed independently in numpy from the published equations — the
pieces FID parity with pretrained reference weights depends on)."""

import numpy as np
import pytest


def test_linear_and_quad_beta_schedules():
    """reference diffusion_utils.py:45-76: 'linear' is a plain linspace,
    'quad' interpolates in sqrt space."""
    from joligen_tpu.ops.schedules import make_beta_schedule
    lin = np.asarray(make_beta_schedule("linear", 100, 1e-6, 0.01))
    np.testing.assert_allclose(lin, np.linspace(1e-6, 0.01, 100), rtol=1e-9)
    quad = np.asarray(make_beta_schedule("quad", 100, 1e-6, 0.01))
    np.testing.assert_allclose(
        quad, np.linspace(1e-6 ** 0.5, 0.01 ** 0.5, 100) ** 2, rtol=1e-9)


def test_cosine_beta_schedule_formula():
    from joligen_tpu.ops.schedules import make_beta_schedule
    betas = np.asarray(make_beta_schedule("cosine", 100))
    # Nichol & Dhariwal cosine: alpha_bar(t) = cos((t/T+s)/(1+s) * pi/2)^2
    s = 8e-3
    ts = np.arange(101, dtype=np.float64) / 100
    f = np.cos((ts + s) / (1 + s) * np.pi / 2) ** 2
    expect = np.clip(1 - f[1:] / f[:-1], 0, 0.999)
    np.testing.assert_allclose(betas, expect, rtol=1e-4, atol=1e-6)


def test_gamma_buffers_consistency():
    """gammas = cumprod(alphas); posterior coefficients satisfy the DDPM
    identities (diffusion_utils.py:79-139)."""
    from joligen_tpu.ops.schedules import NoiseSchedule
    sched = NoiseSchedule.create("linear", 50)
    g = np.asarray(sched.gammas)
    betas = np.asarray(make := __import__(
        "joligen_tpu.ops.schedules", fromlist=["make_beta_schedule"]
    ).make_beta_schedule("linear", 50))
    alphas = 1.0 - betas
    g64_chk = np.cumprod(1.0 - betas.astype(np.float64))
    np.testing.assert_allclose(g, g64_chk.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_recip_gammas),
        np.sqrt(1.0 / g64_chk).astype(np.float32), rtol=1e-6)
    # 1/g - 1 cancels catastrophically near g=1; compare the float64
    # computation cast to fp32 (how the buffers are built)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_recipm1_gammas),
        np.sqrt(1.0 / g64_chk - 1.0).astype(np.float32), rtol=1e-5)
    # posterior coefficients: compute in float64 like the schedule does,
    # then cast — at early t the (1-gamma)~1e-6 denominators cancel
    # catastrophically in fp32, so compare the float64->fp32 castings
    # (the reference stores fp32 buffers the same way)
    g64 = np.cumprod(1.0 - betas.astype(np.float64))
    g_prev = np.concatenate([[1.0], g64[:-1]])
    coef1 = (betas * np.sqrt(g_prev) / (1.0 - g64)).astype(np.float32)
    coef2 = ((1.0 - g_prev) * np.sqrt(1.0 - betas) / (1.0 - g64)).astype(
        np.float32)
    np.testing.assert_allclose(np.asarray(sched.posterior_mean_coef1), coef1,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.posterior_mean_coef2), coef2,
                               rtol=1e-5)


def test_q_sample_snr_identity():
    """q_sample variance: Var[y_t] = g*Var[y0] + (1-g) for unit-variance
    inputs -> 1 at every t."""
    import jax
    import jax.numpy as jnp
    from joligen_tpu.models.modules.palette_diffusion import q_sample
    rng = np.random.RandomState(0)
    y0 = rng.randn(4096).astype(np.float32)
    eps = rng.randn(4096).astype(np.float32)
    for g in (0.01, 0.5, 0.99):
        y_t = np.asarray(q_sample(jnp.asarray(y0), g, jnp.asarray(eps)))
        assert abs(y_t.var() - 1.0) < 0.06, (g, y_t.var())


def test_karras_sigma_schedule():
    """Karras rho=7 sigma ladder: ascending sigma_min -> sigma_max with the
    rho-space interpolation law (cm_generator.py:72-106)."""
    from joligen_tpu.models.modules.cm import karras_schedule
    sig = np.asarray(karras_schedule(10, sigma_min=0.002, sigma_max=80.0))
    assert abs(sig[0] - 0.002) < 1e-6
    assert abs(sig[-1] - 80.0) < 1e-3
    assert (np.diff(sig) > 0).all()
    rho = 7.0
    i = 5
    expect = (0.002 ** (1 / rho) + i / 9 * (80.0 ** (1 / rho)
                                            - 0.002 ** (1 / rho))) ** rho
    assert abs(sig[i] - expect) / expect < 1e-4


def test_cm_boundary_condition():
    """Consistency-model skip/out scalings: at sigma_min the model output is
    exactly the input (c_skip=1, c_out=0) — the CM boundary condition
    (cm_generator.py skip/output scalings, eval mode)."""
    from joligen_tpu.models.modules.cm import (SIGMA_MIN, output_scaling,
                                               skip_scaling)
    assert abs(float(skip_scaling(np.asarray(SIGMA_MIN))) - 1.0) < 1e-6
    assert abs(float(output_scaling(np.asarray(SIGMA_MIN)))) < 1e-6


def test_madgrad_matches_reference():
    """Our optax MADGRAD tracks the reference torch implementation
    (reference util/madgrad.py) step for step."""
    import importlib.util
    import numpy as np
    import jax.numpy as jnp
    import optax
    torch = pytest.importorskip("torch")

    spec = importlib.util.spec_from_file_location(
        "ref_madgrad", "/root/reference/util/madgrad.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.RandomState(0)
    p0 = rng.randn(5, 3).astype(np.float32)
    grads = [rng.randn(5, 3).astype(np.float32) for _ in range(6)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = ref.MADGRAD([tp], lr=1e-2, momentum=0.9, weight_decay=0.01,
                      eps=1e-6)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()

    from joligen_tpu.models.train_state import madgrad
    tx = madgrad(1e-2, momentum=0.9, weight_decay=0.01, eps=1e-6)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params),
                               tp.detach().numpy(), rtol=2e-5, atol=2e-6)


def test_dinov2_encoder_matches_torch_math():
    """The flax DINOv2 encoder + npz key mapping reproduce the reference
    torch block math (util/dino_metric.py consumes dinov2_vitb14; here a
    1-block tiny config with a random state dict run through both stacks)."""
    import tempfile
    import jax
    import jax.numpy as jnp
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    d, heads, depth, patch, grid = 96, 6, 1, 14, 2
    rng = np.random.RandomState(3)

    def t(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    sd = {
        "cls_token": t(1, 1, d),
        "pos_embed": t(1, grid * grid + 1, d),
        "patch_embed.proj.weight": t(d, 3, patch, patch),
        "patch_embed.proj.bias": t(d),
        "norm.weight": 1 + t(d), "norm.bias": t(d),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1 + t(d), p + "norm1.bias": t(d),
            p + "norm2.weight": 1 + t(d), p + "norm2.bias": t(d),
            p + "attn.qkv.weight": t(3 * d, d), p + "attn.qkv.bias": t(3 * d),
            p + "attn.proj.weight": t(d, d), p + "attn.proj.bias": t(d),
            p + "ls1.gamma": t(d), p + "ls2.gamma": t(d),
            p + "mlp.fc1.weight": t(4 * d, d), p + "mlp.fc1.bias": t(4 * d),
            p + "mlp.fc2.weight": t(d, 4 * d), p + "mlp.fc2.bias": t(d),
        })

    x_np = rng.randn(2, grid * patch, grid * patch, 3).astype(np.float32)

    # --- torch forward (DINOv2 semantics, written out)
    xt = torch.tensor(x_np).permute(0, 3, 1, 2)
    h = F.conv2d(xt, torch.tensor(sd["patch_embed.proj.weight"]),
                 torch.tensor(sd["patch_embed.proj.bias"]), stride=patch)
    h = h.flatten(2).transpose(1, 2)  # (n, t, d)
    cls = torch.tensor(sd["cls_token"]).expand(2, -1, -1)
    h = torch.cat([cls, h], dim=1) + torch.tensor(sd["pos_embed"])
    for i in range(depth):
        p = f"blocks.{i}."
        y = F.layer_norm(h, (d,), torch.tensor(sd[p + "norm1.weight"]),
                         torch.tensor(sd[p + "norm1.bias"]), eps=1e-6)
        qkv = y @ torch.tensor(sd[p + "attn.qkv.weight"]).T + \
            torch.tensor(sd[p + "attn.qkv.bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        hd = d // heads
        def heads_split(z):
            return z.reshape(2, -1, heads, hd).transpose(1, 2)
        a = torch.softmax(heads_split(q) @ heads_split(k).transpose(-1, -2)
                          / hd ** 0.5, dim=-1)
        o = (a @ heads_split(v)).transpose(1, 2).reshape(2, -1, d)
        o = o @ torch.tensor(sd[p + "attn.proj.weight"]).T + \
            torch.tensor(sd[p + "attn.proj.bias"])
        h = h + o * torch.tensor(sd[p + "ls1.gamma"])
        y = F.layer_norm(h, (d,), torch.tensor(sd[p + "norm2.weight"]),
                         torch.tensor(sd[p + "norm2.bias"]), eps=1e-6)
        y = F.gelu(y @ torch.tensor(sd[p + "mlp.fc1.weight"]).T +
                   torch.tensor(sd[p + "mlp.fc1.bias"]))
        y = y @ torch.tensor(sd[p + "mlp.fc2.weight"]).T + \
            torch.tensor(sd[p + "mlp.fc2.bias"])
        h = h + y * torch.tensor(sd[p + "ls2.gamma"])
    h = F.layer_norm(h, (d,), torch.tensor(sd["norm.weight"]),
                     torch.tensor(sd["norm.bias"]), eps=1e-6)
    ref = F.normalize(h[:, 0], dim=1).numpy()

    # --- flax forward, keys written with the porter's mapping
    out = {
        "cls_token": sd["cls_token"], "pos_embed": sd["pos_embed"],
        "patch_embed.kernel": sd["patch_embed.proj.weight"].transpose(
            2, 3, 1, 0),
        "patch_embed.bias": sd["patch_embed.proj.bias"],
        "norm.scale": sd["norm.weight"], "norm.bias": sd["norm.bias"],
    }
    for i in range(depth):
        p, q = f"blocks.{i}.", f"block{i}."
        out.update({
            q + "norm1.scale": sd[p + "norm1.weight"],
            q + "norm1.bias": sd[p + "norm1.bias"],
            q + "norm2.scale": sd[p + "norm2.weight"],
            q + "norm2.bias": sd[p + "norm2.bias"],
            q + "attn.qkv_w": sd[p + "attn.qkv.weight"],
            q + "attn.qkv_b": sd[p + "attn.qkv.bias"],
            q + "attn.proj_w": sd[p + "attn.proj.weight"],
            q + "attn.proj_b": sd[p + "attn.proj.bias"],
            q + "ls1": sd[p + "ls1.gamma"], q + "ls2": sd[p + "ls2.gamma"],
            q + "fc1.kernel": sd[p + "mlp.fc1.weight"].T,
            q + "fc1.bias": sd[p + "mlp.fc1.bias"],
            q + "fc2.kernel": sd[p + "mlp.fc2.weight"].T,
            q + "fc2.bias": sd[p + "mlp.fc2.bias"],
        })
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **out)
        from joligen_tpu.utils.dinov2 import DINOv2ViT, load_dinov2_params
        params = load_dinov2_params(f.name)
    net = DINOv2ViT(dim=d, depth=depth, heads=heads, native_grid=grid)
    got = np.asarray(net.apply(params, jnp.asarray(x_np)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_dinov2_metric_fallback():
    """Weight-gated fallback: identical batches give distance ~0."""
    from joligen_tpu.utils.metrics import dinov2_distance
    x = np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32) * 2 - 1
    assert abs(dinov2_distance(x, x)) < 1e-5
    y = -x
    assert dinov2_distance(x, y) > 1e-3
