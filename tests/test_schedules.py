"""Numerical unit tests for noise schedules and embeddings — coverage the
reference lacks (SURVEY.md §4 implication)."""

import numpy as np

from joligen_tpu.ops.schedules import (
    NoiseSchedule,
    gamma_embedding,
    make_beta_schedule,
)


def test_beta_schedules_shapes_and_ranges():
    for kind in ("linear", "quad", "warmup10", "warmup50", "const", "jsd", "cosine"):
        betas = make_beta_schedule(kind, 100)
        assert betas.shape == (100,)
        assert (betas > 0).all() and (betas <= 1.0).all(), kind


def test_noise_schedule_identities():
    s = NoiseSchedule.create("linear", 200, 1e-6, 0.01)
    # gammas decreasing cumulative product of alphas
    assert s.gammas[0] > s.gammas[-1]
    np.testing.assert_allclose(s.gammas_prev[1:], s.gammas[:-1])
    np.testing.assert_allclose(s.sqrt_recip_gammas, np.sqrt(1.0 / s.gammas), rtol=1e-5)
    # posterior mean coefs sum to ~1 at small t (a DDPM identity:
    # coef1*sqrt(g_prev->x0 scale) consistency)
    # recompute in fp32 from the stored tables; skip t<2 where (1-gamma) is
    # catastrophically small in fp32 (the implementation computes in fp64)
    betas = s.betas
    c1 = betas * np.sqrt(s.gammas_prev) / (1 - s.gammas)
    np.testing.assert_allclose(s.posterior_mean_coef1[2:], c1[2:], rtol=1e-3)


def test_phase_schedules_differ():
    class O:
        G_diff_n_timestep_train = 100
        G_diff_n_timestep_test = 50

    tr = NoiseSchedule.for_phase(O(), "train")
    te = NoiseSchedule.for_phase(O(), "test")
    assert tr.num_timesteps == 100
    assert te.num_timesteps == 50
    # test phase ends much noisier (linear_end 0.09 vs 0.01)
    assert te.betas[-1] > tr.betas[-1]


def test_gamma_embedding():
    import jax.numpy as jnp
    g = jnp.asarray([0.0, 0.5, 1.0])
    emb = gamma_embedding(g, 32)
    assert emb.shape == (3, 32)
    # gamma=0 -> cos part all ones, sin part all zeros
    np.testing.assert_allclose(np.asarray(emb[0, :16]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 16:]), 0.0, atol=1e-6)
