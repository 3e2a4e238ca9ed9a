"""Wider GAN zoo: projected discriminator (frozen trunk + random
projections), temporal projected D, ITTR generator, UViT middle stack,
DiffAugment kernels, APA adaptation."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.make_fake_dataset import make as make_fake  # noqa: E402

from joligen_tpu.options import TrainOptions  # noqa: E402


def _opt(root, tmpdir, **over):
    args = [
        "--dataroot", root, "--model_type", "cut",
        "--data_dataset_mode", "unaligned",
        "--data_crop_size", "32", "--data_load_size", "32",
        "--G_netG", "resnet", "--G_ngf", "8", "--G_nblocks", "2",
        "--D_netDs", "basic", "--D_ndf", "8", "--D_n_layers", "2",
        "--train_batch_size", "2",
        "--checkpoints_dir", str(tmpdir), "--name", "t",
        "--data_num_threads", "2",
    ]
    for k, v in over.items():
        args += ["--" + k] + ([str(x) for x in v] if isinstance(v, list)
                              else ([] if v is True else [str(v)]))
    opt = TrainOptions().parse_cli(args)
    opt.steps_per_epoch = 3
    return opt


@pytest.fixture(scope="module")
def fakeds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    make_fake(root, n=12, size=32)
    return root


@pytest.mark.slow  # re-laned r5: each family keeps ONE fast e2e
# representative (pytest.ini); this variant runs in the full lane
def test_projected_d_frozen_trunk():
    """The frozen feature trunk must receive exactly zero gradient."""
    import jax
    import jax.numpy as jnp
    from joligen_tpu.models.modules.projected_d import ProjectedDiscriminator

    d = ProjectedDiscriminator(interp=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    out = d.apply(params, x)
    assert out.ndim == 2 and out.shape[0] == 2 and np.isfinite(out).all()

    grads = jax.grad(lambda p: jnp.mean(d.apply(p, x) ** 2))(params)
    gp = grads["params"]
    feat_leaves = jax.tree.leaves(gp["feature_network"])
    proj_leaves = jax.tree.leaves(gp["proj"])
    disc_leaves = [leaf for k in gp if k.startswith("disc")
                   for leaf in jax.tree.leaves(gp[k])]
    assert all(float(jnp.abs(g).max()) == 0.0 for g in feat_leaves)
    assert all(float(jnp.abs(g).max()) == 0.0 for g in proj_leaves)
    assert any(float(jnp.abs(g).max()) > 0.0 for g in disc_leaves)


def test_temporal_projected_d():
    import jax
    from joligen_tpu.models.modules.projected_d import (
        TemporalProjectedDiscriminator)

    d = TemporalProjectedDiscriminator(interp=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    out = d.apply(params, x)
    assert out.shape[0] == 2 and np.isfinite(out).all()


def test_ittr_generator_and_feats():
    import jax
    from joligen_tpu.models.modules.ittr import ITTRGenerator

    g = ITTRGenerator(out_channels=3, ngf=8, n_blocks=2, img_size=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = g.init(jax.random.PRNGKey(1), x)
    y = g.apply(params, x)
    assert y.shape == (1, 32, 32, 3)
    assert float(np.abs(y).max()) <= 1.0
    feats = g.apply(params, x, extract_layer_ids=[0, 1])
    assert len(feats) == 2


def test_uvit_transformer_middle():
    import jax
    from joligen_tpu.models.modules.unet_mha import UNetMHA

    net = UNetMHA(in_channel=3, out_channel=3, inner_channel=8,
                  cond_embed_dim=16, res_blocks=(1, 1), attn_res=(4,),
                  channel_mults=(1, 2), transformer_blocks=2, tanh=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    params = net.init(jax.random.PRNGKey(1), x)
    y = net.apply(params, x)
    assert y.shape == (1, 16, 16, 3)
    # param structure must contain the transformer middle
    names = list(params["params"].keys())
    assert any(n.startswith("mid_t") for n in names), names


def test_diff_augment_shapes_and_gate():
    import jax
    from joligen_tpu.ops.diff_aug import diff_augment

    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3),
                           minval=-1, maxval=1)
    for policy in ("color", "translation", "cutout", "noise", "resize",
                   "color,translation,cutout"):
        y = diff_augment(jax.random.PRNGKey(1), x, policy, prob=1.0)
        assert y.shape == x.shape and np.isfinite(y).all(), policy
        assert float(np.abs(np.asarray(y - x)).max()) > 0.0, policy
    # prob=0 -> identity
    y = diff_augment(jax.random.PRNGKey(2), x, "color", prob=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


@pytest.mark.slow
def test_cut_with_projected_d_diffaug_apa(fakeds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path,
               D_netDs=["projected_d", "basic"],
               D_proj_interp=32,
               dataaug_diff_aug_policy="color,cutout",
               dataaug_APA=True, dataaug_APA_p=0.3)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    l0 = m.optimize_parameters(batch)
    assert np.isfinite(l0["G_tot"]) and "D_D_B_projected_d" in l0
    assert "APA_p" in l0
    l1 = m.optimize_parameters(batch)
    assert np.isfinite(l1["G_tot"])


@pytest.mark.slow
def test_cut_with_ittr(fakeds, tmp_path):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model

    opt = _opt(fakeds, tmp_path, G_netG="ittr", G_nblocks=2)
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    losses = m.optimize_parameters(batch)
    assert np.isfinite(losses["G_tot"])
    fake = m.inference(batch)
    assert fake.shape[1:] == (32, 32, 3)


@pytest.mark.slow
def test_vision_aided_d(fakeds, tmp_path):
    """Vision-aided D (reference modules/vision_aided_d.py): frozen CLIP
    backbone gets zero gradient, trainable heads learn, and a CUT step
    runs end to end."""
    import jax
    import jax.numpy as jnp
    from joligen_tpu.models.modules.vision_aided_d import (
        VisionAidedDiscriminator)

    d = VisionAidedDiscriminator(head_ch=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    out = d.apply(params, x)
    assert out.ndim == 2 and np.isfinite(out).all()
    grads = jax.grad(lambda p: jnp.mean(d.apply(p, x) ** 2))(params)
    gp = grads["params"]
    clip_leaves = jax.tree.leaves(gp["freezenet_clip"])
    head_leaves = [leaf for k in gp if k != "freezenet_clip"
                   for leaf in jax.tree.leaves(gp[k])]
    assert all(float(jnp.abs(leaf).max()) == 0.0 for leaf in clip_leaves)
    assert any(float(jnp.abs(leaf).max()) > 0.0 for leaf in head_leaves)

    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    opt = _opt(fakeds, tmp_path, D_netDs=["vision_aided"],
               data_crop_size=16, data_load_size=16)
    m = create_model(opt)
    batch = next(iter(create_dataloader(opt, create_dataset(opt, "train"))))
    losses = m.optimize_parameters(batch)
    d_keys = [k for k in losses if k.startswith("D_")]
    assert d_keys and np.isfinite(losses["G_tot"])
    assert all(np.isfinite(losses[k]) for k in d_keys)


def test_depth_projected_d():
    """Depth projected D: frozen lite3 (MiDaS-encoder) trunk variant
    (reference projected_d projector type depth)."""
    import jax
    from joligen_tpu.models.modules.projected_d import (
        ProjectedDiscriminator, _LITE3_STAGES)

    d = ProjectedDiscriminator(interp=32, trunk_stages=_LITE3_STAGES)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    out = d.apply(params, x)
    assert out.ndim == 2 and out.shape[0] == 2 and np.isfinite(out).all()

    # the MiDaS-encoder loader swaps the trunk subtree when weights exist
    import tempfile
    from joligen_tpu.utils.midas import load_midas_encoder_into_projected
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "port_midas", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools/port_midas_weights.py"))
    assert spec is not None  # porter exists for the depth trunk


@pytest.mark.slow
def test_fs_sam_segmenter(fakeds, tmp_path, monkeypatch):
    """f_s_net=sam: frozen SAM replaces the GT label mask in the CUT
    semantic-mask path (reference base_model.py:1522-1560); weight-gated on
    sam_vit.npz (a tiny random SAM here)."""
    import importlib.util as ilu
    import jax
    torch = pytest.importorskip("torch")
    from transformers import SamConfig as HFSamConfig
    from transformers import SamModel as HFSamModel

    hf_cfg = HFSamConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=2, image_size=64,
                           patch_size=16, window_size=2,
                           global_attn_indexes=[1], output_channels=16,
                           mlp_dim=64, num_pos_feats=8),
        prompt_encoder_config=dict(hidden_size=16, image_size=64,
                                   patch_size=16, image_embedding_size=4),
        mask_decoder_config=dict(hidden_size=16, num_attention_heads=2,
                                 mlp_dim=32, iou_head_hidden_dim=16),
    )
    torch.manual_seed(1)
    hf = HFSamModel(hf_cfg).eval()
    REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = ilu.spec_from_file_location(
        "port_sam", os.path.join(REPO_DIR, "tools/port_sam_weights.py"))
    porter = ilu.module_from_spec(spec)
    spec.loader.exec_module(porter)
    sd = {k: np.asarray(v) for k, v in hf.state_dict().items()}
    np.savez(str(tmp_path / "sam_vit.npz"),
             **porter.flatten(porter.map_state_dict(sd)),
             **porter.config_entries(hf.config))
    monkeypatch.setenv("JOLIGEN_TPU_WEIGHTS_DIR", str(tmp_path))

    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    opt = _opt(fakeds, tmp_path,
               data_dataset_mode="unaligned_labeled_mask",
               data_crop_size=16, data_load_size=16,
               train_semantic_mask=True, f_s_net="sam",
               f_s_semantic_nclasses=2)
    m = create_model(opt)
    batch = next(iter(create_dataloader(opt, create_dataset(opt, "train"))))
    losses = m.optimize_parameters(batch)
    assert "f_s" not in losses            # frozen: no f_s training loss
    assert np.isfinite(losses["G_tot"])
    assert np.isfinite(losses["G_sem_mask"])


@pytest.mark.slow
def test_segformer_generator_and_fs(fakeds, tmp_path):
    """Segformer G (attn decoder) trains a CUT step and the segformer f_s
    head trains in the semantic-mask path (reference segformer_generator.py
    + semantic_networks define_f segformer)."""
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    opt = _opt(fakeds, tmp_path, model_type="cut",
               data_dataset_mode="unaligned_labeled_mask",
               data_crop_size=16, data_load_size=16,
               G_netG="segformer_attn_conv",
               train_semantic_mask=True, f_s_net="segformer",
               f_s_semantic_nclasses=2)
    m = create_model(opt)
    batch = next(iter(create_dataloader(opt, create_dataset(opt, "train"))))
    losses = m.optimize_parameters(batch)
    assert np.isfinite(losses["G_tot"]) and np.isfinite(losses["f_s"])
    out = m.inference(batch)
    assert out.shape == batch["A"].shape


def test_vgg_fcn8s_same_pad_mode():
    """TPU-native f_s_vgg_pad=same: no 99px outer pad (reference
    classifiers.py:123), SAME fc6, crop-to-skip fusion. Must share the
    exact param tree with the reference-exact 'fcn' mode (ported weights
    and checkpoints interchangeable), produce input-sized logits at
    non-power-of-two sizes, and carry gradients."""
    import types

    import jax
    import jax.numpy as jnp

    from joligen_tpu.models.modules.semantic_networks import (VGG16FCN8s,
                                                              define_f)

    # define_f default is the TPU-native mode
    opt = types.SimpleNamespace(f_s_net="vgg", f_s_semantic_nclasses=3,
                                f_s_nf=8)
    net = define_f(opt)
    assert net.pad == "same"

    same = VGG16FCN8s(nclasses=2, pad="same")
    fcn = VGG16FCN8s(nclasses=2, pad="fcn")
    x32 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    p_same = same.init(jax.random.PRNGKey(0), x32)
    p_fcn = fcn.init(jax.random.PRNGKey(0), x32)
    assert (jax.tree.map(jnp.shape, p_same)
            == jax.tree.map(jnp.shape, p_fcn))

    # odd, non-pow2 size: ceil pools (7 -> 4), upsample always >= skip
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 50, 50, 3))
    out = same.apply(p_same, x)
    assert out.shape == (2, 50, 50, 2)
    assert out.dtype == jnp.float32

    g = jax.grad(lambda p: jnp.sum(same.apply(p, x) ** 2))(p_same)
    leaf = g["params"]["b0c0"]["kernel"]
    assert bool(jnp.any(leaf != 0))


@pytest.mark.slow  # re-laned r5: each family keeps ONE fast e2e
# representative (pytest.ini); this variant runs in the full lane
def test_train_feat_wavelet_generators():
    """train_feat_wavelet runs the G trunk in Haar frequency space
    (reference freq_utils.py:33-57, resnet_generator.py:421-426,
    unet_generator_attn.py:465-472): shapes preserved, haar round-trip
    exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from joligen_tpu.ops.upfirdn2d import (haar_transform,
                                           inverse_haar_transform)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3),
                    jnp.float32)
    w = haar_transform(x)
    assert w.shape == (2, 8, 8, 12)
    np.testing.assert_allclose(np.asarray(inverse_haar_transform(w)),
                               np.asarray(x), atol=1e-5)

    from joligen_tpu.models.gan_networks import define_G
    from joligen_tpu.options import TrainOptions

    for netG in ("resnet", "resnet_attn", "unet_mha"):
        args = [
            "--dataroot", "/tmp/none", "--model_type", "cut",
            "--data_crop_size", "16", "--data_load_size", "16",
            "--G_netG", netG, "--G_ngf", "8", "--G_nblocks", "2",
            "--G_unet_mha_channel_mults", "1", "2",
            "--G_unet_mha_res_blocks", "1", "1",
            "--G_unet_mha_attn_res", "4",
            "--train_feat_wavelet",
            "--checkpoints_dir", "/tmp/wv", "--name", "wv",
        ]
        opt = TrainOptions().parse_cli(args)
        net = define_G(opt)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (2, 16, 16, 3), (netG, y.shape)
        assert np.isfinite(np.asarray(y)).all()


def test_model_init_type_schemes():
    """model_init_type re-draws GAN kernels with the pix2pix-lineage
    schemes (reference models/modules/utils.py:33-76)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from joligen_tpu.models.train_state import apply_init_scheme

    params = {"params": {"conv": {"kernel": jnp.ones((3, 3, 8, 16)),
                                  "bias": jnp.ones((16,))},
                         "norm": {"scale": jnp.ones((16,))}}}
    rng = jax.random.PRNGKey(0)
    for scheme, tol in (("normal", 0.02), ("xavier", None),
                        ("kaiming", None), ("orthogonal", None)):
        out = apply_init_scheme(rng, params, scheme, 0.02)
        k = np.asarray(out["params"]["conv"]["kernel"])
        assert k.std() > 0 and not np.allclose(k, 1.0), scheme
        assert np.allclose(out["params"]["conv"]["bias"], 0.0), scheme
        assert np.allclose(out["params"]["norm"]["scale"], 1.0), scheme
        if tol:
            assert abs(k.std() - tol) < tol * 0.25
    ortho = np.asarray(apply_init_scheme(
        rng, params, "orthogonal", 1.0)["params"]["conv"]["kernel"])
    m = ortho.reshape(-1, 16)
    np.testing.assert_allclose(m.T @ m, np.eye(16), atol=1e-4)


def test_nlayer_d_dropout_and_freq():
    """D_dropout adds live Dropout(0.5); train_feat_wavelet Ds judge Haar
    bands (reference discriminators.py:19-113)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from joligen_tpu.models.modules.discriminators import NLayerDiscriminator

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    d = NLayerDiscriminator(ndf=8, n_layers=2, use_dropout=True,
                            freq_space=True)
    v = d.init({"params": jax.random.PRNGKey(0)}, x)
    y_det = d.apply(v, x)
    assert np.isfinite(np.asarray(y_det)).all()
    y1 = d.apply(v, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = d.apply(v, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2)), \
        "dropout had no effect"


def test_projected_d_segformer_backbone():
    """D_proj_network_type=segformer swaps the frozen projector trunk for
    the MiT pyramid (reference gan_networks.py:396-416)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from joligen_tpu.models.modules.projected_d import ProjectedDiscriminator

    d = ProjectedDiscriminator(network_type="segformer", interp=-1)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = d.init(jax.random.PRNGKey(0), x)
    y = d.apply(v, x)
    assert y.ndim == 2 and np.isfinite(np.asarray(y)).all()
    flat = jax.tree_util.tree_leaves_with_path(v)
    assert any("feature_network" in jax.tree_util.keystr(p) and
               "embed0" in jax.tree_util.keystr(p) for p, _ in flat)


def test_spectral_norm_d_and_g(tmp_path):
    """G_spectral / D_spectral: stateless power-iteration spectral norm
    (reference models/modules/utils.py spectral_norm wrapper)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from joligen_tpu.models.modules.spectral import spectral_normalize

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 16, 32) * 4.0, jnp.float32)
    wn = spectral_normalize(w, iters=8)
    sigma = np.linalg.svd(np.asarray(wn).reshape(-1, 32),
                          compute_uv=False)[0]
    assert abs(sigma - 1.0) < 0.05, sigma

    from joligen_tpu.models.gan_networks import define_D, define_G
    from joligen_tpu.options import TrainOptions
    opt = TrainOptions().parse_cli([
        "--dataroot", "/tmp/none", "--model_type", "cut",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--G_netG", "resnet", "--G_ngf", "8", "--G_nblocks", "2",
        "--G_spectral", "--D_spectral",
        "--D_netDs", "basic", "--D_ndf", "8", "--D_n_layers", "2",
        "--checkpoints_dir", str(tmp_path), "--name", "sn"])
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    g = define_G(opt)
    vg = g.init(jax.random.PRNGKey(0), x)
    assert np.isfinite(np.asarray(g.apply(vg, x))).all()
    flat = jax.tree_util.tree_leaves_with_path(vg)
    assert any("SNConv" in jax.tree_util.keystr(p) or
               "stem" in jax.tree_util.keystr(p) for p, _ in flat)
    d = list(define_D(opt).values())[0]
    vd = d.init(jax.random.PRNGKey(0), x)
    assert np.isfinite(np.asarray(d.apply(vd, x))).all()


@pytest.mark.slow  # re-laned r5: each family keeps ONE fast e2e
# representative (pytest.ini); this variant runs in the full lane
def test_vision_aided_multi_backbone():
    """D_vision_aided_backbones clip+dino ensemble: per-backbone frozen
    tower + trainable heads, concatenated logits (reference
    vision_aided_d.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from joligen_tpu.models.gan_networks import define_D
    from joligen_tpu.options import TrainOptions

    opt = TrainOptions().parse_cli([
        "--dataroot", "/tmp/none", "--model_type", "cut",
        "--data_crop_size", "32", "--data_load_size", "32",
        "--G_netG", "resnet", "--D_netDs", "vision_aided",
        "--D_vision_aided_backbones", "clip+dino+swin",
        "--checkpoints_dir", "/tmp/va", "--name", "va"])
    d = list(define_D(opt).values())[0]
    assert d.backbones == ("clip", "dino")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = d.init(jax.random.PRNGKey(0), x)
    y = d.apply(v, x)
    assert y.ndim == 2 and np.isfinite(np.asarray(y)).all()
    names = {jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(v)}
    assert any("freezenet_clip" in n for n in names)
    assert any("freezenet_dino" in n for n in names)
    assert any("glob_out_dino" in n for n in names)


def test_attention_mask_visuals(tmp_path):
    """output_display_G_attention_masks: attention-G mask maps exposed as
    visuals (reference base_model.py --output_display_networks path)."""
    import numpy as np

    from joligen_tpu.models import create_model
    from joligen_tpu.options import TrainOptions

    opt = TrainOptions().parse_cli([
        "--dataroot", "/tmp/none", "--model_type", "cut",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--G_netG", "resnet_attn", "--G_ngf", "8", "--G_nblocks", "2",
        "--G_attn_nb_mask_attn", "4", "--G_attn_nb_mask_input", "1",
        "--D_netDs", "basic", "--D_ndf", "8", "--D_n_layers", "2",
        "--train_batch_size", "1",
        "--checkpoints_dir", str(tmp_path), "--name", "att"])
    opt.steps_per_epoch = 2
    m = create_model(opt)
    rng = np.random.RandomState(0)
    batch = {"A": rng.randn(1, 16, 16, 3).astype(np.float32).clip(-1, 1),
             "B": rng.randn(1, 16, 16, 3).astype(np.float32).clip(-1, 1)}
    vis = m.attention_visuals(batch)
    assert "attention_0" in vis and len(vis) == 4
    a = (vis["attention_0"] + 1.0) / 2.0
    assert a.min() >= 0.0 and a.max() <= 1.0
