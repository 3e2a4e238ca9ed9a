"""Video stack end-to-end: temporal datasets -> UNetVid / JiTViD training +
sampling on a tiny synthetic video dataset, on the 8-device CPU mesh
(mirrors reference tests test_run_vid_diffusion_online.py /
test_run_b2b_vid_diffusion_online.py at miniature scale)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.make_fake_dataset import make_video  # noqa: E402

from joligen_tpu.options import TrainOptions  # noqa: E402

FRAMES = 3


@pytest.fixture(scope="module")
def vidds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vds"))
    make_video(root, n_series=2, frames=10, size=48)
    return root


def _opt(vidds, tmpdir, **over):
    args = [
        "--dataroot", vidds, "--model_type", "palette",
        "--data_dataset_mode", "self_supervised_vid_mask_online",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--data_relative_paths",
        "--data_temporal_number_frames", str(FRAMES),
        "--data_temporal_frame_step", "2",
        "--data_online_creation_crop_size_A", "32",
        "--data_online_creation_crop_delta_A", "4",
        "--G_netG", "unet_vid", "--G_ngf", "8",
        "--G_unet_mha_channel_mults", "1", "2",
        "--G_unet_mha_res_blocks", "1", "1",
        "--G_unet_mha_attn_res", "4",
        "--G_unet_mha_num_head_channels", "8",
        "--G_unet_vid_num_attention_heads", "2",
        "--G_unet_vid_num_transformer_blocks", "1",
        "--G_diff_n_timestep_train", "50", "--G_diff_n_timestep_test", "10",
        "--train_batch_size", "1",
        "--checkpoints_dir", str(tmpdir), "--name", "t",
        "--data_num_threads", "2",
    ]
    for k, v in over.items():
        flag = "--" + k
        if isinstance(v, bool):
            args += [flag, str(v)]
        elif isinstance(v, list):
            args += [flag] + [str(x) for x in v]
        else:
            args += [flag, str(v)]
    opt = TrainOptions().parse_cli(args)
    opt.steps_per_epoch = 3
    return opt


def test_temporal_dataset_shapes(vidds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset

    opt = _opt(vidds, tmp_path)
    ds = create_dataset(opt, "train")
    dl = create_dataloader(opt, ds)
    batch = next(iter(dl))
    import jax
    gb = jax.device_count()
    assert batch["A"].shape == (gb, FRAMES, 16, 16, 3)
    assert batch["B"].shape == (gb, FRAMES, 16, 16, 3)
    assert batch["B_label_mask"].shape == (gb, FRAMES, 16, 16, 1)
    assert batch["temporal_frame_step"].shape == (gb,)
    # masked region of A is randomized, outside preserved
    m = batch["B_label_mask"] > 0
    outside = ~m[..., 0]
    np.testing.assert_allclose(batch["A"][outside], batch["B"][outside],
                               atol=1e-6)
    inside = m[..., 0]
    assert np.abs(batch["A"][inside] - batch["B"][inside]).max() > 0.01


@pytest.mark.slow
def test_palette_unet_vid_train_sample(vidds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(vidds, tmp_path)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    l0 = m.optimize_parameters(batch)["G_tot"]
    assert np.isfinite(l0)

    fake = m.inference(batch, sampling_method="ddim", num_steps=3)
    import jax
    gb = jax.device_count()
    assert fake.shape == (gb, FRAMES, 16, 16, 3)
    assert np.isfinite(fake).all()
    # unmasked pixels preserved by the per-frame mask re-projection
    outside = ~(batch["B_label_mask"][..., 0] > 0)
    assert np.abs(fake - batch["B"]).max(axis=-1)[outside].max() < 1e-3


def test_b2b_vit_vid_autoregressive_train_sample(vidds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(
        vidds, tmp_path,
        model_type="b2b", G_netG="vit_vid",
        G_vit_depth=2, G_vit_hidden_size=64, G_vit_num_heads=2,
        G_vit_patch_size=4, G_vit_bottleneck_dim=16,
        alg_b2b_mask_size_conditioning=True,
        alg_b2b_temporal_frame_step_conditioning=True,
        alg_b2b_autoregressive=True,
        alg_b2b_use_gt_prob=0.5,
        alg_b2b_lambda_ref_copy=0.1,
        alg_b2b_denoise_timesteps=3,
    )
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    losses = m.optimize_parameters(batch)
    assert np.isfinite(losses["G_tot"])
    assert "G_ref_copy" in losses and np.isfinite(losses["G_ref_copy"])

    fake = m.inference(batch, denoise_timesteps=2)
    import jax
    gb = jax.device_count()
    assert fake.shape == (gb, FRAMES, 16, 16, 3)
    assert np.isfinite(fake).all()


def test_temporal_unpaired_and_selfsup_temporal(tmp_path_factory, tmp_path):
    """temporal_labeled_mask_online (unpaired A/B clips, same crop window
    per clip) and self_supervised_temporal (A=[f0, masked(f1)], B=frames)."""
    from joligen_tpu.data import create_dataset
    root = str(tmp_path_factory.mktemp("v2"))
    make_video(root, n_series=2, frames=8, size=48, domains=("A", "B"))

    opt = _opt(root, tmp_path,
               data_dataset_mode="temporal_labeled_mask_online",
               data_temporal_number_frames=2)
    ds = create_dataset(opt, "train")
    s = ds[0]
    assert s["A"].shape == (2, 16, 16, 3) and s["B"].shape == (2, 16, 16, 3)
    assert s["A_label_mask"].shape == (2, 16, 16, 1)

    opt2 = _opt(root, tmp_path, data_dataset_mode="self_supervised_temporal",
                data_temporal_number_frames=2)
    ds2 = create_dataset(opt2, "train")
    s2 = ds2[0]
    assert s2["A"].shape == (2, 16, 16, 3)
    # frame 0 of A is the clean frame; frame 1 is mask-randomized
    np.testing.assert_allclose(s2["A"][0], s2["B"][0], atol=1e-6)
    m1 = s2["B_label_mask"][1][..., 0] > 0
    if m1.any():
        assert np.abs(s2["A"][1][m1] - s2["B"][1][m1]).max() > 0.01


@pytest.mark.slow  # re-laned r5: each family keeps ONE fast e2e
# representative (pytest.ini); this variant runs in the full lane
def test_b2b_global_context_and_object_ref(vidds, tmp_path):
    """Masked global-context conditioning (adaln) + fixed object-ref token
    conditioning through JiTViD (reference b2b global context / object refs)."""
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    ref_img = os.path.join(vidds, "trainA", "vid0", "frame_000.png")
    opt = _opt(
        vidds, tmp_path,
        model_type="b2b", G_netG="vit_vid",
        alg_b2b_global_context_mode="adaln",
        alg_b2b_global_context_size=32,
        alg_b2b_object_ref_paths=[ref_img],
        alg_b2b_object_ref_size=16,
        alg_b2b_denoise_timesteps=2)
    opt.G_vit_depth = 2
    opt.G_vit_hidden_size = 32
    opt.G_vit_num_heads = 2
    opt.G_vit_patch_size = 4
    opt.G_vit_bottleneck_dim = 8
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    assert "B_global_context" in batch
    assert batch["B_global_context"].shape[-3:] == (32, 32, 3)
    m = create_model(opt)
    assert m.object_refs is not None
    loss = m.optimize_parameters(batch)["G_tot"]
    assert np.isfinite(loss)


@pytest.mark.slow
def test_gan_video_temporal_d(vidds, tmp_path):
    """CUT on a temporal dataset: per-frame G, temporal projected D on
    clips, temporal MSE criterion."""
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(
        vidds, tmp_path,
        model_type="cut", G_netG="resnet", G_ngf=8, G_nblocks=2,
        D_netDs=["temporal", "basic"], D_ndf=8, D_n_layers=2,
        D_proj_interp=32, train_temporal_criterion=True,
        data_temporal_number_frames=2)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    assert batch["A"].ndim == 5
    m = create_model(opt)
    losses = m.optimize_parameters(batch)
    for k in ("G_GAN", "G_temporal", "D_D_B_temporal", "D_D_B_basic"):
        assert k in losses and np.isfinite(losses[k]), (k, losses)


def test_motion_module_identity_at_init():
    """Zero-init proj_out makes a fresh MotionModule the identity — the
    property that lets image checkpoints finetune into video models."""
    import jax
    import jax.numpy as jnp
    from joligen_tpu.models.modules.motion import MotionModule

    mm = MotionModule(num_heads=2, num_transformer_blocks=1, max_len=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4, 8))
    params = mm.init(jax.random.PRNGKey(1), x)
    y = mm.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


@pytest.mark.slow
def test_sequence_parallel_video_train(vidds, tmp_path):
    """Frame-axis (sequence) parallelism: clips shard (B,F,H,W,C) frames
    over the mesh seq axis; the temporal-attention all-gathers are inserted
    by XLA and a full train step + sampling run (the reference has no
    distributed sequence story at all, SURVEY.md §5)."""
    import jax

    if jax.device_count() % 2:
        import pytest as _pytest
        _pytest.skip("needs an even device count for seq=2")
    from jax.sharding import NamedSharding

    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(vidds, tmp_path, data_temporal_number_frames=4,
               tpu_mesh_seq=2, tpu_mesh_data=jax.device_count() // 2)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    dev = m.put_batch(m.set_input(batch))
    gt = dev["gt"]
    assert isinstance(gt.sharding, NamedSharding)
    assert gt.sharding.spec[1] == "seq"  # frames sharded over seq
    l0 = m.optimize_parameters(batch)["G_tot"]
    assert np.isfinite(l0)
    fake = m.inference(batch, sampling_method="ddim", num_steps=2)
    assert fake.shape[1] == 4 and np.isfinite(fake).all()


@pytest.mark.slow
def test_temporal_d_cadence(tmp_path):
    """D_temporal_every: the temporal projected D trains (and contributes
    to G) only every N iterations (reference base_gan_model.py:388,469,580).
    Off-cadence steps report a zero temporal-D loss."""
    import numpy as np

    from joligen_tpu.models import create_model
    from joligen_tpu.options import TrainOptions

    opt = TrainOptions().parse_cli([
        "--dataroot", "/tmp/none", "--model_type", "cut",
        "--data_dataset_mode", "temporal_labeled_mask_online",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--data_temporal_number_frames", "2",
        "--G_netG", "resnet", "--G_nblocks", "2", "--G_ngf", "8",
        "--D_netDs", "temporal", "basic", "--D_ndf", "8",
        "--D_n_layers", "2", "--D_temporal_every", "2",
        "--train_batch_size", "1",
        "--checkpoints_dir", str(tmp_path), "--name", "t"])
    opt.steps_per_epoch = 4
    m = create_model(opt)
    rng = np.random.RandomState(0)
    b, f, s = 1, 2, 16
    batch = {
        "A": rng.randn(b, f, s, s, 3).astype(np.float32).clip(-1, 1),
        "B": rng.randn(b, f, s, s, 3).astype(np.float32).clip(-1, 1),
        "A_label_mask": rng.randint(0, 2, (b, f, s, s, 1)).astype(np.int32),
    }
    dvals = []
    for _ in range(4):
        losses = m.optimize_parameters(batch)
        dvals.append(float(losses["D_D_B_temporal"]))
    assert any(v == 0.0 for v in dvals), dvals   # skipped iterations
    assert any(v != 0.0 for v in dvals), dvals   # active iterations
