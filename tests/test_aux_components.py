"""Auxiliary components: ref/prompt/colorization/nuplet/multi datasets,
segmentation model + mIoU, test model, StableHLO export, train-time
metric evaluation and continue_from provenance."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.make_fake_dataset import make as make_fake  # noqa: E402

from joligen_tpu.options import TrainOptions  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fakeds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    make_fake(root, n=8, size=32)
    return root


def _opt(root, tmpdir, **over):
    args = ["--dataroot", root, "--model_type", "palette",
            "--data_crop_size", "16", "--data_load_size", "16",
            "--data_relative_paths", "--checkpoints_dir", str(tmpdir),
            "--name", "t", "--data_num_threads", "2",
            "--train_batch_size", "2"]
    for k, v in over.items():
        args += ["--" + k] + ([str(x) for x in v] if isinstance(v, list)
                              else ([] if v is True else [str(v)]))
    opt = TrainOptions().parse_cli(args)
    opt.steps_per_epoch = 2
    return opt


def test_ref_dataset(fakeds, tmp_path):
    from joligen_tpu.data import create_dataset
    opt = _opt(fakeds, tmp_path,
               data_dataset_mode="unaligned_labeled_mask_ref")
    ds = create_dataset(opt, "train")
    s = ds[0]
    assert "ref_A" in s and s["ref_A"].shape == (16, 16, 3)


def test_prompt_dataset(tmp_path_factory, tmp_path):
    from joligen_tpu.data import create_dataset
    root = str(tmp_path_factory.mktemp("ods"))
    make_fake(root, n=8, size=32, online=True)
    opt = _opt(root, tmp_path,
               data_dataset_mode="unaligned_labeled_mask_online_prompt",
               data_online_creation_crop_size_A=24,
               data_online_creation_crop_size_B=24)
    ds = create_dataset(opt, "train")
    s = ds[0]
    assert s is not None and isinstance(s["real_B_prompt"], str)
    assert s["real_B_prompt"].startswith("a photo")


def test_colorization_dataset(fakeds, tmp_path):
    from joligen_tpu.data import create_dataset
    opt = _opt(fakeds, tmp_path, data_dataset_mode="colorization")
    ds = create_dataset(opt, "train")
    s = ds[0]
    assert s["A"].shape == (16, 16, 1)   # L
    assert s["B"].shape == (16, 16, 2)   # ab


def test_nuplet_dataset(fakeds, tmp_path):
    from joligen_tpu.data import create_dataset
    opt = _opt(fakeds, tmp_path,
               data_dataset_mode="nuplet_unaligned_labeled_mask")
    ds = create_dataset(opt, "train")
    s = ds[0]
    assert s["A"].shape == (3, 16, 16, 3)


def test_multi_dataset(fakeds, tmp_path):
    from joligen_tpu.data import create_dataset
    cfg = {"datasets": {
        "a": {"dataroot": fakeds, "weight": 1.0,
              "data_dataset_mode": "unaligned"},
        "b": {"dataroot": fakeds, "weight": 2.0,
              "data_dataset_mode": "self_supervised_labeled_mask"},
    }}
    cfg_path = str(tmp_path / "multi.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    opt = _opt(fakeds, tmp_path, data_dataset_mode="multi_dataset",
               data_multi_dataset_config=cfg_path)
    ds = create_dataset(opt, "train")
    assert len(ds) > 0 and len(ds.children) == 2
    samples = [ds[i] for i in range(6)]
    assert all(s is not None and "A" in s for s in samples)


def test_segmentation_model_and_miou(fakeds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    opt = _opt(fakeds, tmp_path, model_type="segmentation",
               data_dataset_mode="unaligned_labeled_mask",
               f_s_semantic_nclasses=2)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    l0 = m.optimize_parameters(batch)["f_s"]
    for _ in range(10):
        l1 = m.optimize_parameters(batch)["f_s"]
    assert np.isfinite(l1) and l1 < l0    # learns the fake dataset
    miou = m.compute_miou(batch)
    assert 0.0 <= miou <= 1.0
    pred = m.inference(batch)
    assert pred.shape == batch["A_label_mask"].shape


def test_export_stablehlo(fakeds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    opt = _opt(fakeds, tmp_path, model_type="cut",
               data_dataset_mode="unaligned",
               G_netG="resnet", G_ngf=8, G_nblocks=2,
               D_netDs=["basic"], D_ndf=8, D_n_layers=2)
    m = create_model(opt)
    from joligen_tpu.utils.export import export_generator
    written = export_generator(m, out_dir=str(tmp_path / "exp"), size=16)
    assert "params" in written
    assert "stablehlo" in written, written
    assert os.path.getsize(written["stablehlo"]) > 1000

    # the artifact round-trips: deserialize + execute == live forward
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    with open(written["stablehlo"], "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3),
                           minval=-1, maxval=1)
    out = np.asarray(exported.call(x))
    live = np.asarray(m.netG.apply(m.states["G_A"].params, x))
    # AOT and JIT pipelines fuse bf16 convs differently; agreement is at
    # bf16 accumulation noise, not fp32 exactness
    assert np.abs(out - live).max() < 0.15
    corr = np.corrcoef(out.ravel(), live.ravel())[0, 1]
    assert corr > 0.999, corr


def test_train_metrics_and_continue_from(fakeds, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    ckpt = str(tmp_path / "ck")
    base = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataroot", fakeds, "--model_type", "palette",
        "--data_dataset_mode", "self_supervised_labeled_mask",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--data_relative_paths",
        "--G_netG", "unet_mha", "--G_ngf", "8",
        "--G_unet_mha_channel_mults", "1", "2",
        "--G_unet_mha_res_blocks", "1", "1", "--G_unet_mha_attn_res", "4",
        "--G_diff_n_timestep_train", "20", "--G_diff_n_timestep_test", "5",
        "--train_batch_size", "2", "--train_n_epochs", "1",
        "--train_n_epochs_decay", "0", "--data_max_dataset_size", "8",
        "--output_print_freq", "8",
    ]
    r = subprocess.run(base + [
        "--checkpoints_dir", ckpt, "--name", "a",
        "--train_compute_metrics_test", "--train_metrics_every", "8",
        "--train_metrics_list", "PSNR", "SSIM",
    ], env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(ckpt, "a", "eval_results.json"))
    data = json.load(open(os.path.join(ckpt, "a", "eval_results.json")))
    assert any("PSNR_test" in v for v in data.values()), data

    # finetune from the first run
    r = subprocess.run(base + [
        "--checkpoints_dir", ckpt, "--name", "b",
        "--train_continue_from", os.path.join(ckpt, "a"),
    ], env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    prov = json.load(open(os.path.join(ckpt, "b", "finetune_source.json")))
    assert prov["files"], prov
