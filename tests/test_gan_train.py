"""End-to-end mini-trainings for the GAN family (CUT, CycleGAN) plus unit
tests for the NCE losses and the device image pool."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.make_fake_dataset import make as make_fake  # noqa: E402

from joligen_tpu.options import TrainOptions  # noqa: E402


@pytest.fixture(scope="module")
def fakeds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    make_fake(root, n=24, size=32)
    return root


def _opt(fakeds, tmpdir, model="cut", **over):
    args = [
        "--dataroot", fakeds, "--model_type", model,
        "--data_dataset_mode", "unaligned_labeled_cls",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--data_relative_paths",
        "--G_netG", "resnet", "--G_nblocks", "2", "--G_ngf", "8",
        "--D_netDs", "basic", "--D_ndf", "8", "--D_n_layers", "2",
        "--train_batch_size", "1", "--train_pool_size", "4",
        "--alg_cut_num_patches", "16",
        "--checkpoints_dir", str(tmpdir), "--name", "t",
        "--data_num_threads", "2",
    ]
    for k, v in over.items():
        args += ["--" + k] + ([str(x) for x in v] if isinstance(v, list) else [str(v)])
    opt = TrainOptions().parse_cli(args)
    opt.steps_per_epoch = 3
    return opt


@pytest.mark.slow
@pytest.mark.parametrize("nce", ["patchnce", "monce", "SRC_hDCE"])
def test_cut_train(fakeds, tmp_path, nce):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    over = {"alg_cut_nce_loss": nce}
    if nce == "SRC_hDCE":
        over["alg_cut_lambda_SRC"] = 0.1
    opt = _opt(fakeds, tmp_path, **over)
    ds = create_dataset(opt, "train")
    dl = create_dataloader(opt, ds)
    batch = next(iter(dl))
    m = create_model(opt)
    l0 = m.optimize_parameters(batch)
    l1 = m.optimize_parameters(batch)
    assert np.isfinite(l1["G_tot"]) and np.isfinite(l1["D_D_B_basic"])
    fake = m.inference(batch)
    assert fake.shape == batch["A"].shape
    assert np.isfinite(fake).all()


def test_cut_semantic_cls(fakeds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path, train_semantic_cls=True,
               cls_semantic_nclasses=4, cls_nf=8)
    ds = create_dataset(opt, "train")
    dl = create_dataloader(opt, ds)
    batch = next(iter(dl))
    m = create_model(opt)
    losses = m.optimize_parameters(batch)
    assert "CLS" in losses and "G_sem_cls" in losses
    assert np.isfinite(losses["CLS"])


def test_cycle_gan_train(fakeds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path, model="cycle_gan",
               data_dataset_mode="unaligned")
    ds = create_dataset(opt, "train")
    dl = create_dataloader(opt, ds)
    batch = next(iter(dl))
    m = create_model(opt)
    losses = m.optimize_parameters(batch)
    for k in ("G_cycle_A", "G_cycle_B", "G_idt_A", "G_tot"):
        assert k in losses and np.isfinite(losses[k]), k
    fake = m.inference(batch)
    assert fake.shape == batch["A"].shape


def test_image_pool_semantics():
    import jax
    import jax.numpy as jnp

    from joligen_tpu.models.modules.image_pool import ImagePool

    pool = ImagePool.create(4, (2, 2, 1))
    rng = jax.random.PRNGKey(0)
    # filling phase: returns current fakes verbatim
    fakes = jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2, 1)
    pool, out = pool.query(rng, fakes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fakes))
    assert int(pool.count) == 2
    pool, out = pool.query(rng, fakes + 10)
    assert int(pool.count) == 4
    # full phase: returned entries are either current or pool entries
    pool2, out2 = pool.query(jax.random.PRNGKey(1), fakes + 100)
    vals = set(np.asarray(out2).flatten().tolist())
    allowed = set(np.asarray(pool.buffer).flatten().tolist()) | set(
        np.asarray(fakes + 100).flatten().tolist())
    assert vals <= allowed


def test_nce_losses_sane():
    import jax
    import jax.numpy as jnp

    from joligen_tpu.models.modules.cut_networks import (
        monce_loss, patch_nce_loss)

    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2 * 16, 8))
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    # identical q/k -> near-minimal loss; random k -> larger loss
    l_same = float(jnp.mean(patch_nce_loss(q, q, 0.07, 2)))
    k = jax.random.normal(jax.random.PRNGKey(1), (2 * 16, 8))
    k = k / jnp.linalg.norm(k, axis=1, keepdims=True)
    l_rand = float(jnp.mean(patch_nce_loss(q, k, 0.07, 2)))
    assert l_same < l_rand
    assert np.isfinite(float(jnp.mean(monce_loss(q, k, 0.07, 2, 16))))


@pytest.mark.slow  # re-laned r5: each family keeps ONE fast e2e
# representative (pytest.ini); this variant runs in the full lane
def test_cut_pix2pix_aligned_supervised(fakeds, tmp_path):
    """pix2pix-style CUT on the aligned dataset with the supervised
    L1+LPIPS+DISTS loss (reference tests/test_run_pix2pix_gan.py,
    cut_model.py:141-155,779-833)."""
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path, data_dataset_mode="aligned",
               alg_cut_supervised_loss=["L1", "LPIPS", "DISTS"],
               alg_cut_lambda_supervised=2.0,
               alg_cut_lambda_perceptual=0.5)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    losses = m.optimize_parameters(batch)
    assert "G_supervised" in losses and np.isfinite(losses["G_supervised"])
    assert losses["G_supervised"] > 0
    assert np.isfinite(losses["G_tot"])


@pytest.mark.slow
def test_cut_extras_flip_idt_smooth_contrastive(fakeds, tmp_path):
    """FastCUT flip-equivariance, MSE identity loss, HDCE gamma, D label
    smoothing, adaptive D diffusion aug, and the contrastive D objective
    (reference cut_model.py:51-155,619-624; loss.py:142-169,277-331)."""
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path,
               alg_cut_nce_loss="SRC_hDCE", alg_cut_lambda_SRC=0.05,
               alg_cut_HDCE_gamma=10, alg_cut_HDCE_gamma_min=10,
               alg_cut_MSE_idt=True, alg_cut_lambda_MSE_idt=0.5,
               alg_cut_flip_equivariance=True,
               dataaug_D_label_smooth=True,
               dataaug_D_diffusion=True)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    losses = m.optimize_parameters(batch)
    assert "G_MSE_idt" in losses and np.isfinite(losses["G_MSE_idt"])
    assert "D_diff_p" in losses
    assert np.isfinite(losses["G_tot"])

    opt2 = _opt(fakeds, tmp_path, train_use_contrastive_loss_D=True)
    ds2 = create_dataset(opt2, "train")
    batch2 = next(iter(create_dataloader(opt2, ds2)))
    m2 = create_model(opt2)
    losses2 = m2.optimize_parameters(batch2)
    assert np.isfinite(losses2["G_tot"])
    assert np.isfinite(losses2["D_D_B_basic"])


def test_contrastive_gan_loss_math():
    import jax.numpy as jnp

    from joligen_tpu.models.modules.cut_networks import contrastive_gan_loss

    # separable logits -> small loss; inverted -> large
    good = contrastive_gan_loss(jnp.full((4,), 8.0), jnp.full((4,), -8.0))
    bad = contrastive_gan_loss(jnp.full((4,), -8.0), jnp.full((4,), 8.0))
    assert float(good) < 0.01 < float(bad)


@pytest.mark.slow
def test_cut_semantic_mask_extras(fakeds, tmp_path):
    """Semantic-family controls: disjoint f_s (A/B nets), f_s on B, sem idt,
    mask-for-removal targets, class weights, Charbonnier out-mask, gating
    thresholds (reference base_model.py:240-340, base_gan_model.py:656-810)."""
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path,
               data_dataset_mode="unaligned_labeled_mask",
               train_semantic_mask=True, f_s_semantic_nclasses=2,
               f_s_net="unet",
               train_mask_disjoint_f_s=True, train_sem_idt=True,
               train_mask_out_mask=True,
               train_mask_loss_out_mask="Charbonnier",
               f_s_class_weights=[1, 3],
               f_s_semantic_threshold=100.0)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    assert "f_s_B" in m.states
    losses = m.optimize_parameters(batch)
    for k in ("f_s", "G_sem_mask", "G_sem_mask_idt", "G_out_mask"):
        assert k in losses and np.isfinite(losses[k]), k

    # removal mode: G pushed toward empty masks; tight gate zeroes sem loss
    opt2 = _opt(fakeds, tmp_path,
                data_dataset_mode="unaligned_labeled_mask",
                train_semantic_mask=True, f_s_semantic_nclasses=2,
                train_mask_for_removal=True,
                train_mask_no_train_f_s_A=True, train_mask_f_s_B=True,
                f_s_semantic_threshold=1e-9)
    ds2 = create_dataset(opt2, "train")
    batch2 = next(iter(create_dataloader(opt2, ds2)))
    m2 = create_model(opt2)
    losses2 = m2.optimize_parameters(batch2)
    assert losses2["G_sem_mask"] == 0.0  # gated off by the tight threshold


@pytest.mark.slow  # re-laned r5: each family keeps ONE fast e2e
# representative (pytest.ini); this variant runs in the full lane
def test_cut_cls_regression_and_B(fakeds, tmp_path):
    """CLS as a regressor (MSE / L1) and B-side CLS training
    (reference base_model.py:246-252,1511-1520)."""
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path, train_semantic_cls=True,
               cls_semantic_nclasses=1, cls_nf=8,
               train_cls_regression=True, train_cls_l1_regression=True,
               train_sem_cls_B=True, cls_semantic_threshold=100.0)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    losses = m.optimize_parameters(batch)
    assert "CLS" in losses and np.isfinite(losses["CLS"])
    assert "G_sem_cls" in losses and np.isfinite(losses["G_sem_cls"])


def test_all_classes_as_one(tmp_path):
    """f_s_all_classes_as_one collapses every category to foreground=1
    (reference unaligned_labeled_mask_dataset.py:104-105)."""
    from joligen_tpu.data import create_dataset

    root = str(tmp_path / "ds")
    make_fake(root, n=4, size=32, nclasses=3)
    opt = _opt(root, tmp_path, data_dataset_mode="unaligned_labeled_mask",
               f_s_all_classes_as_one=True)
    ds = create_dataset(opt, "train")
    s = ds[0]
    assert set(np.unique(s["A_label_mask"])) <= {0, 1}


@pytest.mark.slow
def test_recut_and_recycle_gan(tmp_path):
    """ReCUT / ReCycleGAN next-frame-prediction regularization over the
    nuplet dataset (reference re_*_semantic_mask_model.py — dead upstream,
    revived here): P nets train on real sequences, G gets gated
    recut/recycle terms."""
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    root = str(tmp_path / "ds")
    make_fake(root, n=12, size=32)
    base = dict(data_dataset_mode="nuplet_unaligned_labeled_mask",
                alg_re_nuplet_size=3, alg_re_netP="resnet_6blocks",
                alg_re_projection_threshold=100.0,
                train_semantic_mask=True, f_s_semantic_nclasses=2)

    opt = _opt(root, tmp_path, model="re_cut_semantic_mask", **base)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    assert batch["A"].ndim == 5 and batch["B"].ndim == 5
    m = create_model(opt)
    assert "P_B" in m.states
    losses = m.optimize_parameters(batch)
    for k in ("P_proj_real_B", "G_recut"):
        assert k in losses and np.isfinite(losses[k]), k

    opt2 = _opt(root, tmp_path, model="re_cycle_gan", **{
        k: v for k, v in base.items() if not k.startswith(("train_sem",
                                                           "f_s"))})
    ds2 = create_dataset(opt2, "train")
    batch2 = next(iter(create_dataloader(opt2, ds2)))
    m2 = create_model(opt2)
    assert "P_A" in m2.states and "P_B" in m2.states
    losses2 = m2.optimize_parameters(batch2)
    for k in ("P_proj_real_A", "P_proj_real_B", "G_recycle_A",
              "G_recycle_B"):
        assert k in losses2 and np.isfinite(losses2[k]), k
