"""Numerical parity of the diffusion/CM math against the reference formulas
(recomputed independently in numpy from the published equations — the
pieces FID parity with pretrained reference weights depends on)."""

import numpy as np


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
