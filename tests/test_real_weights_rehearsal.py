"""Real-weights dress rehearsal (VERDICT r3 next #8): prove the ENTIRE
real-weights path — porters -> $JOLIGEN_TPU_WEIGHTS_DIR npz files ->
loaders -> extractors -> test.py metrics JSON — executes end-to-end
BEFORE real pretrained weights ever arrive, by running every metric-path
porter against randomly-initialized torch modules constructed in-image
and asserting the persisted metrics carry NO "(random-features)" label.
"""

import importlib.util as ilu
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

pytestmark = [pytest.mark.parity, pytest.mark.slow]


def _tool(name):
    spec = ilu.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_weights_dir(torch, wdir):
    """Run the four metric-path porters against random in-image sources."""
    os.makedirs(wdir, exist_ok=True)

    # --- vgg16_lpips.npz (torchvision-shaped random features stack;
    # torchvision itself is not in the image) ---
    rng0 = np.random.RandomState(1)
    vggp = _tool("port_vgg16_weights")
    widths = (64, 128, 256, 512, 512)
    sd = {}
    in_c = 3
    for bi, convs in enumerate(vggp._CONV_IDX):
        for li in convs:
            sd[f"features.{li}.weight"] = torch.tensor(
                (rng0.randn(widths[bi], in_c, 3, 3) * 0.05).astype(
                    np.float32))
            sd[f"features.{li}.bias"] = torch.tensor(
                (rng0.randn(widths[bi]) * 0.05).astype(np.float32))
            in_c = widths[bi]
    src = os.path.join(wdir, "_vgg16.pth")
    torch.save(sd, src)
    vggp.main([src, os.path.join(wdir, "vgg16_lpips.npz")])

    # --- inception_v3_fid.npz: build a torchvision-NAMED random source by
    # walking the flax FID trunk's own param tree (identity BN so the
    # porter's fold is exact) ---
    import jax

    from joligen_tpu.utils.inception import InceptionV3FID
    net = InceptionV3FID()
    params = net.init(jax.random.PRNGKey(0),
                      np.zeros((1, 299, 299, 3), np.float32))["params"]
    sd = {}

    def walk(node, path):
        if "conv" in node and "kernel" in node["conv"]:
            mod = ".".join(path)
            k = np.asarray(node["conv"]["kernel"])      # HWIO
            b = np.asarray(node["conv"]["bias"])
            out_c = k.shape[-1]
            sd[f"{mod}.conv.weight"] = torch.tensor(
                k.transpose(3, 2, 0, 1).copy())
            sd[f"{mod}.bn.weight"] = torch.ones(out_c)
            sd[f"{mod}.bn.bias"] = torch.tensor(b)
            sd[f"{mod}.bn.running_mean"] = torch.zeros(out_c)
            # fold_bn eps=1e-3: var = 1 - eps -> scale exactly 1
            sd[f"{mod}.bn.running_var"] = torch.full((out_c,), 1.0 - 1e-3)
            return
        for name, sub in node.items():
            if isinstance(sub, dict):
                walk(sub, path + [name])

    walk(params, [])
    src = os.path.join(wdir, "_inc.pth")
    torch.save(sd, src)
    _tool("port_inception_weights").main(
        src, os.path.join(wdir, "inception_v3_fid.npz"))

    # --- dinov2_vitb14.npz (full ViT-B/14-shaped random hub state dict) ---
    rng = np.random.RandomState(0)

    def t(*shape):
        return (rng.randn(*shape) * 0.02).astype(np.float32)

    d, depth, patch, grid = 768, 12, 14, 37   # 518/14
    sd = {
        "cls_token": torch.tensor(t(1, 1, d)),
        "pos_embed": torch.tensor(t(1, grid * grid + 1, d)),
        "patch_embed.proj.weight": torch.tensor(t(d, 3, patch, patch)),
        "patch_embed.proj.bias": torch.tensor(t(d)),
        "norm.weight": torch.tensor(1 + t(d)),
        "norm.bias": torch.tensor(t(d)),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": torch.tensor(1 + t(d)),
            p + "norm1.bias": torch.tensor(t(d)),
            p + "norm2.weight": torch.tensor(1 + t(d)),
            p + "norm2.bias": torch.tensor(t(d)),
            p + "attn.qkv.weight": torch.tensor(t(3 * d, d)),
            p + "attn.qkv.bias": torch.tensor(t(3 * d)),
            p + "attn.proj.weight": torch.tensor(t(d, d)),
            p + "attn.proj.bias": torch.tensor(t(d)),
            p + "ls1.gamma": torch.tensor(1 + t(d)),
            p + "ls2.gamma": torch.tensor(1 + t(d)),
            p + "mlp.fc1.weight": torch.tensor(t(4 * d, d)),
            p + "mlp.fc1.bias": torch.tensor(t(4 * d)),
            p + "mlp.fc2.weight": torch.tensor(t(d, 4 * d)),
            p + "mlp.fc2.bias": torch.tensor(t(d)),
        })
    src = os.path.join(wdir, "_dinov2.pth")
    torch.save(sd, src)
    _tool("port_dinov2_weights").main(
        [src, os.path.join(wdir, "dinov2_vitb14.npz")])

    # --- i3d_fvd.npz (full I3D-shaped random state dict) ---
    from joligen_tpu.utils.i3d import _MIXED
    sd = {}

    def add_unit(name, in_c, out_c, k):
        sd[f"{name}.conv3d.weight"] = torch.tensor(
            (rng.randn(out_c, in_c, k, k, k) * 0.03).astype(np.float32))
        sd[f"{name}.bn.weight"] = torch.tensor(
            (1 + rng.randn(out_c) * 0.05).astype(np.float32))
        sd[f"{name}.bn.bias"] = torch.tensor(
            (rng.randn(out_c) * 0.05).astype(np.float32))
        sd[f"{name}.bn.running_mean"] = torch.tensor(
            (rng.randn(out_c) * 0.05).astype(np.float32))
        sd[f"{name}.bn.running_var"] = torch.tensor(
            (1 + rng.rand(out_c) * 0.1).astype(np.float32))

    add_unit("Conv3d_1a_7x7", 3, 64, 7)
    add_unit("Conv3d_2b_1x1", 64, 64, 1)
    add_unit("Conv3d_2c_3x3", 64, 192, 3)
    in_c = 192
    for name, (b0, b1a, b1b, b2a, b2b, b3b) in _MIXED.items():
        add_unit(f"{name}.b0", in_c, b0, 1)
        add_unit(f"{name}.b1a", in_c, b1a, 1)
        add_unit(f"{name}.b1b", b1a, b1b, 3)
        add_unit(f"{name}.b2a", in_c, b2a, 1)
        add_unit(f"{name}.b2b", b2a, b2b, 3)
        add_unit(f"{name}.b3b", in_c, b3b, 1)
        in_c = b0 + b1b + b2b + b3b
    sd["logits.conv3d.weight"] = torch.tensor(
        (rng.randn(400, in_c, 1, 1, 1) * 0.03).astype(np.float32))
    sd["logits.conv3d.bias"] = torch.tensor(
        (rng.randn(400) * 0.03).astype(np.float32))
    src = os.path.join(wdir, "_i3d.pth")
    torch.save(sd, src)
    _tool("port_i3d_weights").main(src, os.path.join(wdir, "i3d_fvd.npz"))


def test_real_weights_dress_rehearsal(tmp_path):
    """Port random in-image torch models into a weights dir, run train.py
    + test.py with it, and assert every metric appears WITHOUT the
    (random-features) fallback label — the full real-weights path runs
    before real weights exist."""
    torch = pytest.importorskip("torch")
    from tools.make_fake_dataset import make as make_fake

    wdir = str(tmp_path / "weights")
    _build_weights_dir(torch, wdir)
    for f in ("vgg16_lpips.npz", "inception_v3_fid.npz",
              "dinov2_vitb14.npz", "i3d_fvd.npz"):
        assert os.path.exists(os.path.join(wdir, f)), f

    root = str(tmp_path / "ds")
    ckpt = str(tmp_path / "ckpt")
    make_fake(root, n=6, size=32)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JOLIGEN_TPU_WEIGHTS_DIR"] = wdir
    r = subprocess.run([
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataroot", root, "--model_type", "palette",
        "--data_dataset_mode", "self_supervised_labeled_mask",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--data_relative_paths",
        "--G_netG", "unet_mha", "--G_ngf", "8",
        "--G_unet_mha_channel_mults", "1", "2",
        "--G_unet_mha_res_blocks", "1", "1",
        "--G_unet_mha_attn_res", "4",
        "--G_diff_n_timestep_train", "20", "--G_diff_n_timestep_test", "5",
        "--train_batch_size", "2", "--train_n_epochs", "1",
        "--train_n_epochs_decay", "0", "--data_max_dataset_size", "6",
        "--checkpoints_dir", ckpt, "--name", "m", "--output_print_freq", "4",
    ], env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run([
        sys.executable, os.path.join(REPO, "test.py"),
        "--test_model_dir", os.path.join(ckpt, "m"),
        "--test_metrics_list", "FID", "KID", "PSNR", "SSIM", "LPIPS", "DINOv2",
        "--test_nb_img", "4", "--test_batch_size", "2",
    ], env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]

    mdir = os.path.join(ckpt, "m", "metrics")
    data = json.load(open(os.path.join(mdir, os.listdir(mdir)[0])))
    key = next(iter(data))
    names = set(data[key])
    assert not any("(random-features)" in n for n in names), names
    for want in ("FID_test", "KID_test", "PSNR_test", "SSIM_test",
                 "LPIPS_test", "DINOv2_test"):
        assert any(n.startswith(want.split("_")[0]) for n in names), \
            (want, names)
        val = [v for n, v in data[key].items()
               if n.startswith(want.split("_")[0])][0]
        assert np.isfinite(val), (want, val)

    # FVD extractor consumes i3d_fvd.npz without the fallback trunk.
    # WEIGHTS_DIR is captured at import time in this process (the
    # subprocesses above read the env), so point it at the rehearsal dir.
    from joligen_tpu.utils import metrics as M
    old_wd = M.WEIGHTS_DIR
    M.WEIGHTS_DIR = wdir
    try:
        ex = M.VideoFeatures()
        assert not ex.is_fallback
        vids = np.random.RandomState(0).rand(2, 6, 32, 32, 3).astype(
            np.float32)
        acts = ex(vids)
        assert np.isfinite(np.asarray(acts)).all()
    finally:
        M.WEIGHTS_DIR = old_wd
