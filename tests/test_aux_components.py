"""Auxiliary components: ref/prompt/colorization/nuplet/multi datasets,
segmentation model + mIoU, test model, StableHLO export, train-time
metric evaluation and continue_from provenance."""

import glob
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


@pytest.mark.slow
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


@pytest.mark.slow
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

    # artifact-only inference script (gen_jit_single_image analog)
    from PIL import Image
    img_in = str(tmp_path / "in.png")
    img_out = str(tmp_path / "out.png")
    Image.fromarray((np.random.RandomState(0).rand(24, 24, 3) * 255)
                    .astype(np.uint8)).save(img_in)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "gen_stablehlo_single_image.py"),
         "--model_in_file", written["stablehlo"],
         "--img_in", img_in, "--img_out", img_out],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert Image.open(img_out).size == (24, 24)


@pytest.mark.slow
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


def test_online_pre_crop_rotation(tmp_path):
    """Pre-crop rotation with bbox reboxing (reference
    online_creation.py:128-199,616-723): the object's pixels must stay
    covered by the reboxed mask after rotating the frame."""
    from PIL import Image
    from joligen_tpu.data.online_creation import crop_image

    size = 200
    img = np.zeros((size, size, 3), dtype=np.uint8)
    x1, y1, x2, y2 = 80, 90, 124, 112
    img[y1:y2, x1:x2] = 255
    ipath = str(tmp_path / "img.png")
    Image.fromarray(img).save(ipath)
    bpath = str(tmp_path / "bbox.txt")
    with open(bpath, "w") as f:
        f.write(f"1 {x1} {y1} {x2} {y2}\n")

    for rebox in (True, False):
        crop, mask, ref_bbox, cat = crop_image(
            ipath, bpath, crop_dim=128, output_dim=128, crop_delta=0,
            rotation_state={"angle": 27.0,
                            "rebox_mask_after_rotation": rebox})
        assert crop.shape == (128, 128, 3) and mask.shape == (128, 128, 1)
        bright = crop[:, :, 0] > 0.5  # object pixels (white on black)
        assert bright.sum() > 0, "object lost by rotation/crop"
        covered = (mask[:, :, 0] > 0)[bright]
        assert covered.mean() > 0.98, f"rebox={rebox}: mask misses object"

    # dataset-level: rotation flags flow through the online dataset
    from joligen_tpu.data import create_dataset
    root = str(tmp_path / "ds")
    make_fake(root, n=4, size=64, online=True)
    opt = _opt(root, tmp_path,
               data_dataset_mode="unaligned_labeled_mask_online",
               data_online_creation_crop_size_A=32,
               data_online_creation_crop_size_B=32,
               data_online_creation_rotate_before_crop=True,
               data_online_creation_rotate_max_angle=10.0,
               data_online_creation_rotate_rebox_mask_after_rotation=True)
    ds = create_dataset(opt, "train")
    got = [s for s in (ds[i] for i in range(4)) if s is not None]
    assert got, "every rotated sample was rejected"
    for s in got:
        assert s["A"].shape == (16, 16, 3)
        assert s["A_label_mask"].max() >= 1


def test_visdom_adapter(fakeds, tmp_path):
    """The stdlib visdom client posts well-formed /events payloads
    (reference util/visualizer.py:86,478,547 via the visdom package)."""
    import http.server
    import threading

    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append((self.path, json.loads(body)))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"win")

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from joligen_tpu.utils.visualizer import Visualizer
        opt = _opt(fakeds, tmp_path,
                   output_display_type=["visdom"],
                   output_display_visdom_server="http://127.0.0.1",
                   output_display_visdom_port=srv.server_address[1])
        vis = Visualizer(opt)
        vis.log_losses(1, 10, {"G_tot": 0.5, "D_tot": 0.2})
        vis.save_images({"fake_B": np.zeros((1, 8, 8, 3), np.float32)}, 1)
        assert len(received) >= 2
        paths = {p for p, _ in received}
        assert paths == {"/events"}
        line = next(b for _, b in received if b["data"][0]["type"] == "scatter")
        assert {t["name"] for t in line["data"]} == {"G_tot", "D_tot"}
        img = next(b for _, b in received if b["data"][0]["type"] == "image")
        assert img["data"][0]["content"]["src"].startswith(
            "data:image/png;base64,")
    finally:
        srv.shutdown()


def test_gen_multi_dataset_b2b_config(tmp_path):
    """Config generator (reference scripts/gen_multi_dataset_b2b_config.py):
    bbox-derived crop sizes, holdout test sets, and a config consumable by
    the multi_dataset mode in both phases."""
    roots = []
    for nm in ("dsa", "dsb"):
        root = str(tmp_path / nm)
        make_fake(root, n=6, size=64, online=True)
        roots.append(root)
    # dsa keeps its predefined testA; dsb loses it so the tool must carve an
    # automatic holdout out of trainA (both reference paths exercised)
    os.remove(os.path.join(roots[1], "testA", "paths.txt"))
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable,
           os.path.join(REPO, "scripts", "gen_multi_dataset_b2b_config.py"),
           "--dataset-dirs", *roots, "--output-dir", out,
           "--child-dataset-mode", "self_supervised_labeled_mask_online",
           "--auto-test-samples", "2", "--auto-test-min-images", "1",
           "--data-crop-size", "16", "--data-load-size", "16",
           "--preview-samples", "2"]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    multi = json.load(open(os.path.join(out, "multi_dataset_config.json")))
    assert len(multi["datasets"]) == 2
    for e in multi["datasets"]:
        crop = e["overrides"]["data_online_creation_crop_size_A"]
        assert crop % 16 == 0 and crop > 0
    by_id = {t["id"]: t for t in multi["test_sets"]}
    assert set(by_id) == {"dsa", "dsb"}
    # dsa: predefined testA discovered, source root untouched
    assert not by_id["dsa"]["generated"]
    assert multi["datasets"][0]["dataroot"] == roots[0]
    # dsb: automatic holdout carved under the output dir, entry repointed
    assert by_id["dsb"]["generated"]
    gen_root = multi["datasets"][1]["dataroot"]
    assert gen_root.startswith(os.path.join(out, "generated_test_sets"))
    assert os.path.exists(os.path.join(gen_root, "trainA", "paths.txt"))
    assert os.path.exists(os.path.join(gen_root, "testA", "paths.txt"))
    cfg = json.load(open(os.path.join(out, "train_config.json")))
    assert cfg["data_dataset_mode"] == "multi_dataset"
    assert cfg["train_optim"] == "muon"
    # previews rendered through the real pipeline
    assert glob.glob(os.path.join(out, "previews", "*", "sample_*.png"))

    # the generated config drives the dataset in both phases
    from joligen_tpu.data import create_dataset
    opt = _opt(roots[0], tmp_path, model_type="b2b",
               data_dataset_mode="multi_dataset",
               data_multi_dataset_config=os.path.join(
                   out, "multi_dataset_config.json"))
    opt.data_relative_paths = False
    ds = create_dataset(opt, "train")
    s = ds[0]
    assert s is not None and s["A"].shape[-1] == 3
    test_ds = create_dataset(opt, "test", name="dsb")
    assert len(test_ds) > 0 and test_ds[0] is not None

    # resume: second run reuses the per-dataset cache (no re-derivation)
    r2 = subprocess.run(cmd + ["--resume", "--skip-preview"], env=env,
                        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed from cache" in r2.stdout


def test_gen_multi_dataset_b2b_config_video_holdout(tmp_path):
    """Video child mode: the automatic holdout samples whole temporal
    windows and must leave at least one intact train window."""
    from tools.make_fake_dataset import make_video
    root = str(tmp_path / "vid")
    make_video(root, n_series=2, frames=6, size=64)
    os.remove(os.path.join(root, "testA", "paths.txt"))
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "gen_multi_dataset_b2b_config.py"),
         "--dataset-dirs", root, "--output-dir", out,
         "--auto-test-samples", "2", "--auto-test-min-images", "1",
         "--step", "8",  # tiny synthetic bboxes floor to 0 at step 16
         "--data-temporal-number-frames", "2",
         "--data-temporal-frame-step", "1", "--skip-preview"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    multi = json.load(open(os.path.join(out, "multi_dataset_config.json")))
    gen_root = multi["datasets"][0]["dataroot"]
    train_lines = open(os.path.join(gen_root, "trainA", "paths.txt")
                       ).read().splitlines()
    test_lines = open(os.path.join(gen_root, "testA", "paths.txt")
                      ).read().splitlines()
    assert len(test_lines) >= 2  # whole windows, not single rows
    assert len(train_lines) + len(test_lines) == 12
    # remaining train list still contains a consecutive same-series window
    import scripts.gen_multi_dataset_b2b_config as tool
    assert tool.temporal_windows(train_lines, 2, 1)
    cfg = json.load(open(os.path.join(out, "train_config.json")))
    assert cfg["G_netG"] == "vit_vid"
    assert cfg["data_temporal_number_frames"] == 2


def test_profile_step_hlo_ranking_parser():
    """tools/profile_step.py --hlo ranks ENTRY-level outputs only —
    fusion-body values never touch HBM and must be excluded (the audit
    methodology recorded in BASELINE.md)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "profile_step", os.path.join(REPO, "tools", "profile_step.py"))
    ps = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ps)

    assert ps._shape_bytes("bf16[16,256,256,64]") == 16 * 256 * 256 * 64 * 2
    assert ps._shape_bytes("(bf16[2,2], f32[4])") == 2 * 2 * 2 + 4 * 4
    assert ps._shape_bytes("f32[]") == 4  # scalar

    fake = """
HloModule m
%fused_computation {
  %big = f32[999,999,999]{2,1,0} add(...)
}
ENTRY %main.1 {
  %p0 = bf16[16,256,256,64]{3,2,1,0} parameter(0)
  %conv.1 = bf16[16,256,256,64]{3,2,1,0} convolution(%p0, %p0)
  ROOT %tup = (bf16[16,128,128,128], f32[32]) tuple(%conv.1, %conv.1)
}
"""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        ps._rank_entry_outputs(fake)
    out = buf.getvalue()
    assert "convolution" in out and "999" not in out


def test_make_optimizer_all_names_smoke():
    """Every optimizer name the factory advertises must init+update, with
    and without tpu_optim_moment_dtype=bfloat16 (optax 0.2.6 radam has no
    mu_dtype kwarg — regression guard for the _cast_mu fallback)."""
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from joligen_tpu.models.train_state import make_optimizer

    params = {"w": jnp.ones((4, 4), jnp.float32), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 0.1, jnp.float32),
             "b": jnp.full((4,), 0.1, jnp.float32)}
    for name in ("adam", "radam", "adamw", "adam8bit", "lion",
                 "madgrad", "muon"):
        for moment_dtype in ("", "bfloat16"):
            opt = SimpleNamespace(train_optim=name, steps_per_epoch=1,
                                  tpu_optim_moment_dtype=moment_dtype)
            tx = make_optimizer(opt, 1e-3)
            state = tx.init(params)
            upd, state = tx.update(grads, state, params)
            upd, state = tx.update(grads, state, params)
            assert jnp.isfinite(upd["w"]).all()
            if moment_dtype == "bfloat16" and name in ("adam", "radam",
                                                       "adamw", "lion"):
                leaves = [x for x in jax.tree.leaves(state)
                          if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
                assert leaves, f"{name}: no bf16 moment stored"
