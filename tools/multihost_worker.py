"""One process of a multi-host training job, for the CPU validation test.

Runs the REAL ``train.launch_training`` path — ``initialize_distributed``
from JOLIGEN_DIST_* env, process-sharded dataloader, global-array batches,
collective checkpoint gather — on a virtual CPU device mesh. The parent
(tests/test_multihost.py) launches two of these (4 devices each) plus one
single-process 8-device run and compares the trained checkpoints:
identical-sample data makes the global batch order-invariant, so the runs
must converge to the same parameters up to collective reduction-order
float noise.

Usage (all config via env; see tests/test_multihost.py):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  JOLIGEN_DIST_COORDINATOR=localhost:9911 JOLIGEN_DIST_NUM_PROCESSES=2 \
  JOLIGEN_DIST_PROCESS_ID=0 \
  python tools/multihost_worker.py <dataroot> <ckpt_dir> <name> <out.json>

This doubles as the documented multi-host launch recipe: on a real pod
the same env (or the --tpu_dist_* flags) wraps ``python train.py`` with
one process per host (parallel/dist.py docstring).
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    dataroot, ckpt_dir, name, out_json = sys.argv[1:5]
    epochs = int(os.environ.get("MH_EPOCHS", "3"))

    from joligen_tpu.options import TrainOptions
    args = [
        "--dataroot", dataroot, "--model_type", "palette",
        "--data_dataset_mode", "self_supervised_labeled_mask",
        "--data_crop_size", "32", "--data_load_size", "32",
        "--data_relative_paths",
        # determinism: no flips, deterministic color fill instead of
        # random-noise mask fill (sample order then cannot change the loss)
        "--dataaug_flip", "none", "--dataaug_no_rotate", "True",
        "--data_online_creation_rand_mask_A", "False",
        "--G_netG", "unet_mha", "--G_ngf", "8",
        "--G_unet_mha_channel_mults", "1", "2",
        "--G_unet_mha_res_blocks", "1", "1",
        "--G_unet_mha_attn_res", "4",
        "--G_unet_mha_num_head_channels", "8",
        "--G_diff_n_timestep_train", "50", "--G_diff_n_timestep_test", "10",
        "--train_batch_size", "1", "--train_G_ema",
        # fp32 end-to-end: bf16 compute amplifies collective
        # reduction-order noise past the exactness tolerances
        "--tpu_bf16", "False",
        "--train_n_epochs", str(epochs), "--train_n_epochs_decay", "0",
        "--train_save_latest_freq", "100000",
        "--train_save_epoch_freq", "100000",
        "--output_print_freq", "1",
        "--data_num_threads", "2", "--seed", "7",
        "--checkpoints_dir", ckpt_dir, "--name", name,
    ]
    opt = TrainOptions().parse_cli(args)

    from train import launch_training
    model = launch_training(opt)

    import jax
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "steps_per_epoch": opt.steps_per_epoch,
        "final_losses": {k: float(v) for k, v in
                         model.get_current_losses().items()},
    }
    with open(out_json, "w") as f:
        json.dump(info, f)
    print("worker done:", info, flush=True)


if __name__ == "__main__":
    main()
