"""End-to-end mini-training of the palette DDPM (tiny synthetic dataset),
mirroring the reference test strategy (SURVEY.md §4: tiny-dataset train +
real inference) on an 8-device CPU mesh."""

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


def _opt(fakeds, tmpdir, **over):
    args = [
        "--dataroot", fakeds, "--model_type", "palette",
        "--data_dataset_mode", "self_supervised_labeled_mask",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--data_relative_paths",
        "--G_netG", "unet_mha", "--G_ngf", "8",
        "--G_unet_mha_channel_mults", "1", "2",
        "--G_unet_mha_res_blocks", "1", "1",
        "--G_unet_mha_attn_res", "4",
        "--G_unet_mha_num_head_channels", "8",
        "--G_diff_n_timestep_train", "50", "--G_diff_n_timestep_test", "10",
        "--train_batch_size", "2", "--train_G_ema",
        "--checkpoints_dir", str(tmpdir), "--name", "t",
        "--data_num_threads", "2",
    ]
    for k, v in over.items():
        args += ["--" + k] + ([str(x) for x in v] if isinstance(v, list) else [str(v)])
    opt = TrainOptions().parse_cli(args)
    opt.steps_per_epoch = 3
    return opt


@pytest.mark.slow
def test_palette_train_infer_checkpoint(fakeds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path)
    ds = create_dataset(opt, "train")
    dl = create_dataloader(opt, ds)
    batch = next(iter(dl))
    import jax
    gb = 2 * jax.device_count()  # per-device batch x 8-device CPU mesh
    assert batch["A"].shape == (gb, 16, 16, 3)
    assert batch["B_label_mask"].shape == (gb, 16, 16, 1)

    m = create_model(opt)
    l0 = m.optimize_parameters(batch)["G_tot"]
    l1 = m.optimize_parameters(batch)["G_tot"]
    assert np.isfinite(l0) and np.isfinite(l1)

    fake = m.inference(batch, sampling_method="ddim", num_steps=4)
    assert fake.shape == (gb, 16, 16, 3)
    assert np.isfinite(fake).all()
    assert fake.min() >= -1.0001 and fake.max() <= 1.0001
    # unmasked region must be preserved by mask re-projection
    mask = batch["B_label_mask"][..., 0] > 0
    outside = ~mask
    diff = np.abs(fake - batch["B"]).max(axis=-1)[outside]
    assert diff.max() < 1e-3

    m.save_networks("latest")
    files = os.listdir(os.path.join(str(tmp_path), "t"))
    assert "latest_net_G_A.pth" in files and "latest_net_G_A_ema.pth" in files

    m2 = create_model(opt)
    m2.load_networks("latest")
    import jax
    p1 = jax.device_get(m.states["G_A"].params)
    p2 = jax.device_get(m2.states["G_A"].params)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b)


@pytest.mark.slow
def test_palette_class_mask_conditioning(fakeds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(
        fakeds, tmp_path,
        data_dataset_mode="self_supervised_labeled_mask_cls",
        alg_diffusion_cond_embed="mask_and_class",
        alg_diffusion_dropout_prob=0.5,
        alg_palette_minsnr=True,
        cls_semantic_nclasses=4,
    )
    ds = create_dataset(opt, "train")
    dl = create_dataloader(opt, ds)
    batch = next(iter(dl))
    m = create_model(opt)
    loss = m.optimize_parameters(batch)["G_tot"]
    assert np.isfinite(loss)


@pytest.mark.slow
def test_palette_clip_ref_conditioning(fakeds, tmp_path, monkeypatch):
    """ref conditioning through the frozen CLIP encoder path
    (reference palette_denoise_fn.py:77-80,144-155): a step runs, the CLIP
    tower takes zero gradient, and ported weights swap in when present."""
    import functools
    import jax
    import jax.numpy as jnp
    import joligen_tpu.utils.clip_vit as clip_vit

    # full ViT-B/16 is too heavy for the CPU CI mesh; shrink the tower
    # (the real-size tower is covered by the porter parity test)
    monkeypatch.setattr(
        clip_vit, "CLIPVisualViT",
        functools.partial(clip_vit.CLIPVisualViT, dim=32, depth=1, heads=2,
                          patch=16, out_dim=16))

    opt = _opt(
        fakeds, tmp_path,
        data_dataset_mode="unaligned_labeled_mask_ref",
        alg_diffusion_cond_embed="ref",
        alg_diffusion_ref_embed_net="clip",
    )
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    ds = create_dataset(opt, "train")
    dl = create_dataloader(opt, ds)
    batch = next(iter(dl))
    m = create_model(opt)
    assert "freezenet_clip" in m.states["G_A"].params["params"]
    loss = m.optimize_parameters(batch)["G_tot"]
    assert np.isfinite(loss)
    # frozen: CLIP params unchanged after the step (snapshot to host —
    # the jitted step donates the old param buffers)
    before = jax.device_get(m.states["G_A"].params["params"]["freezenet_clip"])
    loss2 = m.optimize_parameters(batch)["G_tot"]
    after = jax.device_get(m.states["G_A"].params["params"]["freezenet_clip"])
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), before, after)
    assert max(jax.tree.leaves(diffs)) == 0.0
    assert np.isfinite(loss2)


@pytest.mark.slow
def test_palette_imagebind_ref_conditioning(fakeds, tmp_path, monkeypatch):
    """ref conditioning through the frozen ImageBind vision tower
    (reference palette_denoise_fn.py:83-85,146-148): a step runs, the tower
    takes zero gradient, and a ported npz swaps into the state."""
    import jax
    import jax.numpy as jnp
    import joligen_tpu.utils.image_bind as ib

    tiny = {"dim": 32, "depth": 1, "heads": 2, "out_dim": 16}
    monkeypatch.setattr(ib, "IMAGEBIND_VISION_CONFIG", tiny)

    opt = _opt(
        fakeds, tmp_path,
        data_dataset_mode="unaligned_labeled_mask_ref",
        alg_diffusion_cond_embed="ref",
        alg_diffusion_ref_embed_net="imagebind",
    )
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    ds = create_dataset(opt, "train")
    dl = create_dataloader(opt, ds)
    batch = next(iter(dl))
    m = create_model(opt)
    assert "freezenet_imagebind" in m.states["G_A"].params["params"]
    loss = m.optimize_parameters(batch)["G_tot"]
    assert np.isfinite(loss)
    before = jax.device_get(
        m.states["G_A"].params["params"]["freezenet_imagebind"])
    loss2 = m.optimize_parameters(batch)["G_tot"]
    after = jax.device_get(
        m.states["G_A"].params["params"]["freezenet_imagebind"])
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), before, after)
    assert max(jax.tree.leaves(diffs)) == 0.0
    assert np.isfinite(loss2)

    # ported-weights swap: write a matching tiny npz and rebuild
    net = ib.ImageBindVision(**tiny)
    ref_params = net.init(jax.random.PRNGKey(7),
                          jnp.zeros((1, 224, 224, 3)))["params"]
    flat = {}

    def emit(prefix, node):
        for k, v in node.items():
            if isinstance(v, dict):
                emit(prefix + k + ".", v)
            else:
                flat[prefix + k] = np.asarray(v)
    # serialize in the porter's npz contract
    d, hd = tiny["dim"], tiny["dim"] // tiny["heads"]
    flat["patch_conv.kernel"] = np.asarray(
        ref_params["patch_conv"]["kernel"])
    flat["cls_token"] = np.asarray(ref_params["cls_token"]) + 0.5
    flat["pos_embed"] = np.asarray(ref_params["pos_embed"])
    for ln in ("pre_ln", "head_ln"):
        flat[f"{ln}.scale"] = np.asarray(ref_params[ln]["scale"])
        flat[f"{ln}.bias"] = np.asarray(ref_params[ln]["bias"])
    flat["head_proj"] = np.asarray(ref_params["head_proj"])
    for i in range(tiny["depth"]):
        b = ref_params[f"block{i}"]
        qkv_w = np.concatenate([
            np.asarray(b["attn"][n]["kernel"]).reshape(d, d).T
            for n in ("query", "key", "value")], axis=0)
        qkv_b = np.concatenate([
            np.asarray(b["attn"][n]["bias"]).reshape(d)
            for n in ("query", "key", "value")], axis=0)
        flat[f"block{i}.attn.qkv_w"] = qkv_w
        flat[f"block{i}.attn.qkv_b"] = qkv_b
        flat[f"block{i}.attn.proj_w"] = np.asarray(
            b["attn"]["out"]["kernel"]).reshape(d, d).T
        flat[f"block{i}.attn.proj_b"] = np.asarray(b["attn"]["out"]["bias"])
        for fc in ("fc1", "fc2"):
            flat[f"block{i}.{fc}.kernel"] = np.asarray(b[fc]["kernel"])
            flat[f"block{i}.{fc}.bias"] = np.asarray(b[fc]["bias"])
        for nrm in ("norm_1", "norm_2"):
            flat[f"block{i}.{nrm}.scale"] = np.asarray(b[nrm]["scale"])
            flat[f"block{i}.{nrm}.bias"] = np.asarray(b[nrm]["bias"])
    np.savez(os.path.join(str(tmp_path), "imagebind_vision.npz"), **flat)
    monkeypatch.setenv("JOLIGEN_TPU_WEIGHTS_DIR", str(tmp_path))
    m2 = create_model(opt)
    got = np.asarray(jax.device_get(
        m2.states["G_A"].params["params"]["freezenet_imagebind"]
        ["cls_token"]))
    np.testing.assert_allclose(got, flat["cls_token"], rtol=1e-6)


@pytest.mark.slow
def test_palette_pix2pix_aligned(tmp_path):
    """Palette with task=pix2pix on the aligned dataset: no mask, the
    conditioning image is domain A (reference
    tests/test_run_pix2pix_diffusion.py)."""
    import numpy as np

    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    from joligen_tpu.options import TrainOptions
    from tools.make_fake_dataset import make as make_fake

    root = str(tmp_path / "ds")
    make_fake(root, n=4, size=32)
    opt = TrainOptions().parse_cli([
        "--dataroot", root, "--model_type", "palette",
        "--data_dataset_mode", "aligned", "--data_relative_paths",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--G_netG", "unet_mha", "--G_ngf", "8",
        "--G_unet_mha_channel_mults", "1", "2",
        "--G_unet_mha_res_blocks", "1", "1", "--G_unet_mha_attn_res", "4",
        "--G_diff_n_timestep_train", "20", "--G_diff_n_timestep_test", "5",
        "--alg_diffusion_task", "pix2pix",
        "--train_batch_size", "2",
        "--checkpoints_dir", str(tmp_path), "--name", "p2p",
        "--data_num_threads", "2"])
    opt.steps_per_epoch = 2
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    loss = m.optimize_parameters(batch)["G_tot"]
    assert np.isfinite(loss)
    out = m.inference(batch)
    assert out.shape == batch["B"].shape


def test_palette_previous_frame_dropout_and_test_overrides(fakeds, tmp_path):
    """alg_diffusion_cond_prob_use_previous_frame blanks conditioning
    frames (reference palette_model.py:415-428) and
    alg_palette_sampling_{method,steps}_test override inference defaults
    (reference :628-646)."""
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path,
               alg_diffusion_cond_image_creation="previous_frame",
               alg_diffusion_cond_prob_use_previous_frame=0.0,
               alg_palette_sampling_method_test="ddim",
               alg_palette_sampling_steps_test=3)
    m = create_model(opt)
    b, f, s = 2, 3, 16
    rng = np.random.RandomState(0)
    batch = {
        "A": rng.randn(b, f, s, s, 3).astype(np.float32).clip(-1, 1),
        "B": rng.randn(b, f, s, s, 3).astype(np.float32).clip(-1, 1),
        "B_label_mask": rng.randint(0, 2, (b, f, s, s, 1)).astype(np.int32),
    }
    inp = m.set_input(batch)
    # p_use=0 -> every conditioning frame blanked to -1
    assert np.allclose(np.asarray(inp["y_cond"]), -1.0)
    out = m.inference(batch)
    assert out.shape[-3:] == (s, s, 3) and np.isfinite(out).all()


@pytest.mark.slow  # re-laned r5: each family keeps ONE fast e2e
# representative (pytest.ini); this variant runs in the full lane
def test_metrics_save_images(fakeds, tmp_path):
    """train_metrics_save_images writes evaluated fake/real pairs
    (reference train.py:379,491)."""
    import os

    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path, train_metrics_save_images=True,
               train_metrics_list=["PSNR"])
    m = create_model(opt)
    ds = create_dataset(opt, "test")
    dl = create_dataloader(opt, ds, shuffle=False, batch_size=2)
    m.compute_metrics_test(dl, test_name="tA")
    d = os.path.join(m.save_dir, "metrics_imgs_tA")
    assert os.path.isdir(d) and any(
        f.endswith("_fake.png") for f in os.listdir(d))
