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
