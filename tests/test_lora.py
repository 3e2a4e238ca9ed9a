"""B2B LoRA finetuning: adapters start as identity, base weights stay
frozen, only adapters update, merge folds them in (reference
tests/test_b2b_lora.py pattern)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.make_fake_dataset import make as make_fake  # noqa: E402

from joligen_tpu.options import TrainOptions  # noqa: E402


def test_lora_identity_and_merge():
    import jax
    import jax.numpy as jnp
    from joligen_tpu.models.lora import init_lora, merge_lora
    from joligen_tpu.models.modules.jit import JiT

    net = JiT(patch_size=4, hidden_size=32, depth=2, num_heads=2,
              bottleneck_dim=8, out_channels=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    t = jnp.full((1,), 0.4)
    params = net.init(jax.random.PRNGKey(1), x, t)
    adapters = init_lora(jax.random.PRNGKey(2), params, rank=4)
    assert adapters
    merged = merge_lora(params, adapters, alpha=16, rank=4)
    # B zero-init -> merged == base
    y0 = net.apply(params, x, t)
    y1 = net.apply(merged, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


@pytest.mark.slow
def test_b2b_lora_train(tmp_path, tmp_path_factory):
    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    import jax

    root = str(tmp_path_factory.mktemp("ds"))
    make_fake(root, n=6, size=32)
    args = [
        "--dataroot", root, "--model_type", "b2b",
        "--data_dataset_mode", "self_supervised_labeled_mask",
        "--data_crop_size", "16", "--data_load_size", "16",
        "--data_relative_paths",
        "--G_netG", "vit", "--alg_b2b_lora", "--alg_b2b_lora_rank", "2",
        # include the output head: a freshly-initialized JiT has a zero-init
        # final layer, so interior adapters see zero gradient until the head
        # is nonzero (LoRA presumes a pretrained base; the head target makes
        # the 1-step movement check meaningful)
        "--alg_b2b_lora_target_modules", "attn.qkv", "attn.proj", "mlp.w12",
        "mlp.w3", "final_proj",
        "--alg_b2b_denoise_timesteps", "2",
        "--train_batch_size", "2",
        "--checkpoints_dir", str(tmp_path), "--name", "l",
        "--data_num_threads", "2",
    ]
    opt = TrainOptions().parse_cli(args)
    opt.G_vit_depth = 2
    opt.G_vit_hidden_size = 32
    opt.G_vit_num_heads = 2
    opt.G_vit_patch_size = 4
    opt.G_vit_bottleneck_dim = 8
    opt.steps_per_epoch = 2
    ds = create_dataset(opt, "train")
    batch = next(iter(create_dataloader(opt, ds)))
    m = create_model(opt)
    assert m.use_lora and "G_lora" in m.states

    base_before = jax.device_get(m.states["G_A"].params)
    lora_before = jax.device_get(m.states["G_lora"].params)
    l0 = m.optimize_parameters(batch)["G_tot"]
    assert np.isfinite(l0)
    base_after = jax.device_get(m.states["G_A"].params)
    lora_after = jax.device_get(m.states["G_lora"].params)

    # base frozen
    for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(base_after)):
        np.testing.assert_array_equal(a, b)
    # adapters moved
    moved = any(np.abs(a - b).max() > 0
                for a, b in zip(jax.tree.leaves(lora_before),
                                jax.tree.leaves(lora_after)))
    assert moved

    fake = m.inference(batch, denoise_timesteps=2)
    assert np.isfinite(fake).all()

    m.merge_lora_checkpoint()
    m.save_networks("latest")
    assert os.path.exists(os.path.join(str(tmp_path), "l",
                                       "latest_net_G_A.pth"))
