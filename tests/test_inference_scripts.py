"""Standalone inference scripts: train a tiny checkpoint once, then drive
gen_single_image / gen_single_image_diffusion / gen_vid_diffusion through
their CLI contract (reference server/API tests pattern)."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.make_fake_dataset import make as make_fake  # noqa: E402
from tools.make_fake_dataset import make_video  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable] + args, env=env, capture_output=True,
                       text=True, timeout=timeout, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    return r


@pytest.fixture(scope="module")
def diffusion_ckpt(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    ckpt = str(tmp_path_factory.mktemp("ck"))
    make_fake(root, n=6, size=32)
    _run([
        "train.py", "--dataroot", root, "--model_type", "palette",
        "--data_dataset_mode", "self_supervised_labeled_mask",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--data_relative_paths",
        "--G_netG", "unet_mha", "--G_ngf", "8",
        "--G_unet_mha_channel_mults", "1", "2",
        "--G_unet_mha_res_blocks", "1", "1", "--G_unet_mha_attn_res", "4",
        "--G_diff_n_timestep_train", "20", "--G_diff_n_timestep_test", "5",
        "--train_batch_size", "2", "--train_n_epochs", "1",
        "--train_n_epochs_decay", "0", "--data_max_dataset_size", "6",
        "--checkpoints_dir", ckpt, "--name", "d", "--output_print_freq", "8",
    ])
    return root, os.path.join(ckpt, "d", "latest_net_G_A.pth")


@pytest.fixture(scope="module")
def gan_ckpt(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gds"))
    ckpt = str(tmp_path_factory.mktemp("gck"))
    make_fake(root, n=6, size=32)
    _run([
        "train.py", "--dataroot", root, "--model_type", "cut",
        "--data_dataset_mode", "unaligned",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--G_netG", "resnet", "--G_ngf", "8", "--G_nblocks", "2",
        "--D_netDs", "basic", "--D_ndf", "8", "--D_n_layers", "2",
        "--train_batch_size", "2", "--train_n_epochs", "1",
        "--train_n_epochs_decay", "0", "--data_max_dataset_size", "6",
        "--checkpoints_dir", ckpt, "--name", "g", "--output_print_freq", "8",
    ])
    return root, os.path.join(ckpt, "g", "latest_net_G_A.pth")


@pytest.mark.slow
def test_gen_single_image(gan_ckpt, tmp_path):
    root, model_file = gan_ckpt
    img_in = os.path.join(root, "testA", "imgs", "000.png")
    out = str(tmp_path / "out.png")
    _run(["scripts/gen_single_image.py", "--model_in_file", model_file,
          "--img_in", img_in, "--img_out", out, "--cpu"])
    from PIL import Image
    assert Image.open(out).size == Image.open(img_in).size


def test_gen_single_image_diffusion_bbox(diffusion_ckpt, tmp_path):
    root, model_file = diffusion_ckpt
    img_in = os.path.join(root, "testA", "imgs", "000.png")
    bbox_in = os.path.join(root, "testA", "bbox", "000.txt")
    _run(["scripts/gen_single_image_diffusion.py",
          "--model_in_file", model_file, "--img_in", img_in,
          "--bbox_in", bbox_in, "--dir_out", str(tmp_path),
          "--sampling_method", "ddim", "--sampling_steps", "3",
          "--seed", "42", "--cpu"])
    files = os.listdir(tmp_path)
    for suffix in ("_generated.png", "_generated_crop.png", "_cond.png",
                   "_mask.png", "_orig.png", "_orig_bbox.json"):
        assert any(f.endswith(suffix) for f in files), (suffix, files)
    from PIL import Image
    gen = np.asarray(Image.open(tmp_path / "000_generated.png"))
    orig = np.asarray(Image.open(img_in))
    assert gen.shape == orig.shape
    assert (gen != orig).any()  # masked region was regenerated


def test_gen_video_diffusion_frame_by_frame(diffusion_ckpt, tmp_path):
    """Per-frame single-image diffusion over a paths file with autoregressive
    previous-frame threading (reference scripts/gen_video_diffusion.py)."""
    root, model_file = diffusion_ckpt
    paths = tmp_path / "frames.txt"
    lines = []
    for i in range(2):
        img = os.path.join(root, "testA", "imgs", f"{i:03d}.png")
        bbox = os.path.join(root, "testA", "bbox", f"{i:03d}.txt")
        lines.append(f"{img} {bbox}")
    paths.write_text("\n".join(lines) + "\n")
    _run(["scripts/gen_video_diffusion.py", "--model_in_file", model_file,
          "--dataroot", str(paths), "--dir_out", str(tmp_path),
          "--name", "fbf", "--cond", "generated", "--sv_frames",
          "--sampling_method", "ddim", "--sampling_steps", "3",
          "--seed", "1", "--fps", "4", "--cpu"])
    assert os.path.exists(tmp_path / "fbf_generated_video.mp4")
    gen = [f for f in os.listdir(tmp_path) if f.endswith("_generated.png")]
    assert len(gen) == 2


@pytest.mark.slow
def test_b2b_stablehlo_serving_roundtrip(tmp_path, tmp_path_factory):
    """Train tiny video B2B -> export sampler+denoiser StableHLO ->
    autoregressive inference from the artifact (+ live-backend parity and
    the context corruption grid)."""
    root = str(tmp_path_factory.mktemp("b2bds"))
    ckpt = str(tmp_path_factory.mktemp("b2bck"))
    make_video(root, n_series=1, frames=6, size=96)
    _run([
        "train.py", "--dataroot", root, "--model_type", "b2b",
        "--data_dataset_mode", "self_supervised_vid_mask_online",
        "--data_relative_paths", "--data_crop_size", "32",
        "--data_load_size", "32", "--data_temporal_number_frames", "2",
        "--data_temporal_frame_step", "1",
        "--data_online_creation_crop_size_A", "48",
        "--G_netG", "vit_vid", "--G_vit_depth", "1",
        "--G_vit_hidden_size", "32", "--G_vit_num_heads", "2",
        "--G_vit_patch_size", "8", "--G_vit_bottleneck_dim", "16",
        "--alg_b2b_mask_as_channel", "--alg_b2b_denoise_timesteps", "2",
        "--train_batch_size", "1", "--train_n_epochs", "1",
        "--train_n_epochs_decay", "0", "--data_max_dataset_size", "4",
        "--checkpoints_dir", ckpt, "--name", "bv",
        "--output_print_freq", "4",
    ])
    model_file = os.path.join(ckpt, "bv", "latest_net_G_A.pth")
    exp = str(tmp_path / "exp")
    r = _run(["scripts/b2b_export_stablehlo.py", "--model_in_file",
              model_file, "--dir_out", exp, "--cpu"])
    for suffix in ("b2b.denoiser.stablehlo", "b2b.sampler.stablehlo",
                   "b2b.meta.json"):
        assert os.path.exists(os.path.join(exp, suffix))
    import json
    meta = json.load(open(os.path.join(exp, "b2b.meta.json")))
    assert meta["flags"]["is_video"] and meta["flags"]["mask_as_channel"]

    paths = os.path.join(root, "trainA", "paths.txt")
    out_hlo = str(tmp_path / "hlo")
    _run(["scripts/b2b_stablehlo_denoiser_infer_autoregressive_"
          "progress_bbox.py", "--model_in_file",
          os.path.join(exp, "b2b.meta.json"), "--paths_in_file", paths,
          "--dataset_root", root, "--dir_out", out_hlo, "--nb_frames", "4",
          "--video_out", os.path.join(out_hlo, "out.mp4"), "--cpu"])
    frames = [f for f in os.listdir(out_hlo) if f.endswith("_generated.png")]
    assert len(frames) == 4
    assert os.path.exists(os.path.join(out_hlo, "out.mp4"))

    out_live = str(tmp_path / "live")
    _run(["scripts/b2b_stablehlo_denoiser_infer_autoregressive_"
          "progress_bbox.py", "--backend", "live", "--model_in_file",
          model_file, "--paths_in_file", paths, "--dataset_root", root,
          "--dir_out", out_live, "--nb_frames", "2",
          "--denoise_timesteps", "2", "--cpu"])
    assert len([f for f in os.listdir(out_live)
                if f.endswith("_generated.png")]) == 2

    out_grid = str(tmp_path / "grid")
    _run(["scripts/b2b_context_corruption_grid.py", "--model_in_file",
          model_file, "--paths_in_file", paths, "--dataset_root", root,
          "--dir_out", out_grid, "--study_mode", "mask",
          "--denoise_timesteps", "2", "--cpu"])
    metrics = json.load(open(os.path.join(out_grid,
                                          "corruption_metrics.json")))
    assert len(metrics) >= 7 and "mask_jitter" in metrics
    assert os.path.exists(os.path.join(out_grid, "corruption_grid.png"))


@pytest.mark.slow
def test_gen_vid_diffusion(tmp_path, tmp_path_factory):
    """Video inference over a tiny unet_vid checkpoint, autoregressive."""
    root = str(tmp_path_factory.mktemp("vds"))
    ckpt = str(tmp_path_factory.mktemp("vck"))
    make_video(root, n_series=1, frames=8, size=48)
    _run([
        "train.py", "--dataroot", root, "--model_type", "palette",
        "--data_dataset_mode", "self_supervised_vid_mask_online",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--data_relative_paths",
        "--data_temporal_number_frames", "2", "--data_temporal_frame_step", "2",
        "--data_online_creation_crop_size_A", "32",
        "--G_netG", "unet_vid", "--G_ngf", "8",
        "--G_unet_mha_channel_mults", "1", "2",
        "--G_unet_mha_res_blocks", "1", "1", "--G_unet_mha_attn_res", "4",
        "--G_unet_vid_num_transformer_blocks", "1",
        "--G_diff_n_timestep_train", "20", "--G_diff_n_timestep_test", "5",
        "--train_batch_size", "1", "--train_n_epochs", "1",
        "--train_n_epochs_decay", "0", "--data_max_dataset_size", "8",
        "--checkpoints_dir", ckpt, "--name", "v", "--output_print_freq", "8",
    ])
    _run(["scripts/gen_vid_diffusion.py",
          "--model_in_file", os.path.join(ckpt, "v", "latest_net_G_A.pth"),
          "--dir_in", os.path.join(root, "testA", "vid0"),
          "--dir_out", str(tmp_path), "--max_frames", "4",
          "--sampling_steps", "3", "--autoregressive",
          "--video_out", str(tmp_path / "out.mp4"), "--cpu"])
    frames = [f for f in os.listdir(tmp_path) if f.endswith("_generated.png")]
    assert len(frames) == 4
    assert os.path.exists(tmp_path / "out.mp4")

    # autoregressive-variant features (reference gen_vid_autoregressive_*):
    # backward direction, per-frame canny conditioning, noisy context
    out2 = tmp_path / "bwd"
    _run(["scripts/gen_vid_diffusion.py",
          "--model_in_file", os.path.join(ckpt, "v", "latest_net_G_A.pth"),
          "--dir_in", os.path.join(root, "testA", "vid0"),
          "--dir_out", str(out2), "--max_frames", "4",
          "--sampling_steps", "3", "--autoregressive",
          "--direction", "backward", "--cond_canny",
          "--context_noise_sigma", "0.3", "--seed", "7", "--cpu"])
    frames = [f for f in os.listdir(out2) if f.endswith("_generated.png")]
    assert len(frames) == 4
