"""End-to-end mini-trainings for the consistency/flow family: CM, ECT
schedule math, SC shortcut, B2B flow matching with JiT."""

import numpy as np
import pytest

from joligen_tpu.options import TrainOptions


def _opt(model, tmpdir, **over):
    args = [
        "--dataroot", "/tmp/none", "--model_type", model,
        "--data_dataset_mode", "self_supervised_labeled_mask",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--G_netG", "unet_mha", "--G_ngf", "8",
        "--G_unet_mha_channel_mults", "1", "2",
        "--G_unet_mha_res_blocks", "1", "1",
        "--G_unet_mha_attn_res", "4",
        "--G_unet_mha_num_head_channels", "8",
        "--train_batch_size", "2", "--train_G_ema",
        "--checkpoints_dir", str(tmpdir), "--name", "t",
    ]
    for k, v in over.items():
        args += ["--" + k] + ([str(x) for x in v] if isinstance(v, list) else [str(v)])
    opt = TrainOptions().parse_cli(args)
    opt.steps_per_epoch = 3
    return opt


def _batch(b=8, size=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "A": rng.randn(b, size, size, 3).astype(np.float32).clip(-1, 1),
        "B": rng.randn(b, size, size, 3).astype(np.float32).clip(-1, 1),
        "B_label_mask": rng.randint(0, 2, (b, size, size, 1)).astype(np.int32),
        "B_label_cls": rng.randint(0, 2, (b,)).astype(np.int32),
    }


@pytest.mark.slow
def test_cm_train_and_fewstep_sample(tmp_path):
    from joligen_tpu.models import create_model
    m = create_model(_opt("cm", tmp_path))
    batch = _batch()
    for _ in range(2):
        losses = m.optimize_parameters(batch)
    assert np.isfinite(losses["G_tot"])
    out = m.inference(batch, sigmas=(80.0, 0.661))
    assert out.shape == batch["B"].shape
    assert np.isfinite(out).all()
    # unmasked region preserved
    outside = batch["B_label_mask"][..., 0] == 0
    assert np.abs(out - batch["B"]).max(axis=-1)[outside].max() < 1e-3


def test_cm_schedules():
    from joligen_tpu.models.modules.cm import (
        improved_timesteps_schedule, karras_schedule,
        lognormal_timestep_probs, improved_loss_weighting)
    assert improved_timesteps_schedule(0, 80000) == 11
    assert improved_timesteps_schedule(79999, 80000) == 1281
    s = karras_schedule(11)
    assert s[0] == pytest.approx(0.002) and s[-1] == pytest.approx(80.0)
    assert (np.diff(s) > 0).all()
    p = lognormal_timestep_probs(s)
    assert p.shape == (10,) and p.sum() == pytest.approx(1.0, abs=1e-5)
    w = improved_loss_weighting(s)
    assert (w > 0).all()


@pytest.mark.slow
def test_sc_train_sample(tmp_path):
    from joligen_tpu.models import create_model
    m = create_model(_opt("sc", tmp_path))
    batch = _batch()
    for _ in range(2):
        losses = m.optimize_parameters(batch)
    assert np.isfinite(losses["G_tot"])
    out = m.inference(batch, denoise_timesteps=2)
    assert out.shape == batch["B"].shape and np.isfinite(out).all()


def test_b2b_train_sample_cfg(tmp_path):
    from joligen_tpu.models import create_model
    opt = _opt("b2b", tmp_path, G_netG="vit", G_vit_variant="JiT-B/4",
               alg_b2b_denoise_timesteps=3, alg_b2b_mask_as_channel=True,
               G_vit_num_classes=2, alg_diffusion_dropout_prob=0.2,
               alg_b2b_cfg_scale=2.0)
    # shrink the ViT for test speed
    m = None
    import joligen_tpu.models.modules.jit as jit_mod
    orig = dict(jit_mod.JiT_VARIANT_CONFIGS["JiT-B/4"])
    jit_mod.JiT_VARIANT_CONFIGS["JiT-B/4"] = dict(
        depth=2, hidden_size=64, num_heads=2, bottleneck_dim=16, patch_size=4)
    try:
        m = create_model(opt)
        batch = _batch()
        for _ in range(2):
            losses = m.optimize_parameters(batch)
        assert np.isfinite(losses["G_tot"])
        out = m.inference(batch)
        assert out.shape == batch["B"].shape and np.isfinite(out).all()
        assert out.min() >= -1.0001 and out.max() <= 1.0001
    finally:
        jit_mod.JiT_VARIANT_CONFIGS["JiT-B/4"] = orig


def test_b2b_t_sampling():
    import jax
    from joligen_tpu.models.modules.b2b import sample_t
    t = np.asarray(sample_t(jax.random.PRNGKey(0), 10000))
    assert t.shape == (10000,)
    assert (t >= 0).all() and (t <= 1).all()
    # logistic-normal with mean -0.8 concentrates below 0.5
    assert 0.25 < t.mean() < 0.45


@pytest.mark.slow
def test_cm_perceptual_loss(tmp_path):
    """alg_cm_perceptual_loss LPIPS/DISTS terms (reference
    cm_model.py:61-82,377-401)."""
    from joligen_tpu.models import create_model
    m = create_model(_opt("cm", tmp_path,
                          alg_cm_perceptual_loss=["LPIPS", "DISTS"],
                          alg_cm_lambda_perceptual=0.3))
    losses = m.optimize_parameters(_batch())
    assert "G_perceptual" in losses and np.isfinite(losses["G_perceptual"])
    assert losses["G_perceptual"] != 0.0


@pytest.mark.slow
def test_sc_perceptual_loss(tmp_path):
    from joligen_tpu.models import create_model
    m = create_model(_opt("sc", tmp_path,
                          alg_sc_perceptual_loss=["LPIPS"],
                          alg_sc_lambda_perceptual=0.3))
    losses = m.optimize_parameters(_batch())
    assert "G_perceptual" in losses and np.isfinite(losses["G_perceptual"])


@pytest.mark.slow
def test_b2b_minsnr_and_perceptual(tmp_path):
    """alg_b2b_minsnr weighting (sound implementation of the
    upstream-broken flag) and b2b perceptual terms."""
    from joligen_tpu.models import create_model
    m = create_model(_opt("b2b", tmp_path, alg_b2b_minsnr=True,
                          alg_b2b_perceptual_loss=["DISTS"],
                          alg_b2b_lambda_perceptual=0.2))
    losses = m.optimize_parameters(_batch())
    assert np.isfinite(losses["G_tot"])
    assert "G_perceptual" in losses and np.isfinite(losses["G_perceptual"])


def test_lora_dropout_changes_merge():
    import jax
    import jax.numpy as jnp

    from joligen_tpu.models.lora import init_lora, merge_lora

    params = {"params": {"blk": {"q": {"kernel": jnp.zeros((8, 8))}}}}
    ad = init_lora(jax.random.PRNGKey(0), params, rank=4, targets=("q",))
    # give b nonzero values so the delta is visible
    path = list(ad.keys())[0]
    ad[path]["b"] = jnp.ones_like(ad[path]["b"])
    m0 = merge_lora(params, ad, rank=4)["params"]["blk"]["q"]["kernel"]
    m1 = merge_lora(params, ad, rank=4, dropout=0.5,
                    rng=jax.random.PRNGKey(1))["params"]["blk"]["q"]["kernel"]
    m2 = merge_lora(params, ad, rank=4, dropout=0.5,
                    rng=jax.random.PRNGKey(2))["params"]["blk"]["q"]["kernel"]
    assert not np.allclose(np.asarray(m1), np.asarray(m2))
    assert not np.allclose(np.asarray(m0), np.asarray(m1))
    # expectation preserved within sampling noise
    ms = [merge_lora(params, ad, rank=4, dropout=0.5,
                     rng=jax.random.PRNGKey(s))["params"]["blk"]["q"]["kernel"]
          for s in range(64)]
    np.testing.assert_allclose(np.mean([np.asarray(m) for m in ms], axis=0),
                               np.asarray(m0), atol=np.abs(m0).mean())
