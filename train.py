"""Train CLI (reference train.py contract: --config_json + flat flag overrides).

Single-process design: JAX owns all local devices through one mesh
(reference forks one process per GPU via mp.spawn, train.py:540-549; on TPU
the mesh + pjit replaces the process group). Multi-host pods call
``jax.distributed.initialize`` before anything else.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from joligen_tpu.options import TrainOptions  # noqa: E402


def launch_training(opt):
    import jax

    from joligen_tpu.data import create_dataloader, create_dataset
    from joligen_tpu.models import create_model
    from joligen_tpu.utils.visualizer import Visualizer

    dataset = create_dataset(opt, "train")
    dataloader = create_dataloader(opt, dataset)
    steps_per_epoch = max(1, len(dataloader))
    opt.steps_per_epoch = steps_per_epoch

    print(f"dataset [{opt.data_dataset_mode}] of size {len(dataset)} created, "
          f"{steps_per_epoch} steps/epoch, devices={jax.device_count()}")

    model = create_model(opt, phase="train")
    print("model [%s] created; params: %s" %
          (opt.model_type, {k: f"{v/1e6:.2f}M" for k, v in model.param_count().items()}))

    visualizer = Visualizer(opt)

    expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
    TrainOptions().save_config(opt, expr_dir)

    if getattr(opt, "train_continue", False):
        try:
            model.load_networks(opt.train_epoch or "latest")
            print("resumed from checkpoint", opt.train_epoch)
        except FileNotFoundError:
            print("no checkpoint to resume from; starting fresh")

    total_iters = 0
    batch = opt.train_batch_size
    t_data, t_compute = 0.0, 0.0
    epoch_start = getattr(opt, "train_epoch_count", 1)

    for epoch in range(epoch_start, opt.train_n_epochs + opt.train_n_epochs_decay + 1):
        epoch_t0 = time.time()
        t_prev = time.time()
        for data in dataloader:
            t0 = time.time()
            t_data += t0 - t_prev
            losses = model.optimize_parameters(data)
            t1 = time.time()
            t_compute += t1 - t0
            t_prev = t1
            total_iters += batch

            if total_iters % max(batch, (opt.output_print_freq // batch) * batch) == 0:
                msg = " ".join(f"{k}: {v:.4f}" for k, v in losses.items())
                per_img = t_compute / max(total_iters, 1)
                print(f"(epoch: {epoch}, iters: {total_iters}, "
                      f"compute: {per_img:.4f}s/img, data: {t_data / max(total_iters,1):.4f}s/img) {msg}",
                      flush=True)
                visualizer.log_losses(epoch, total_iters, losses)

            if total_iters % max(batch, (opt.train_save_latest_freq // batch) * batch) == 0:
                model.save_networks("latest")

        model.save_networks("latest")
        if epoch % max(1, opt.train_save_epoch_freq) == 0:
            model.save_networks(str(epoch))
        model.update_learning_rate()
        print(f"end of epoch {epoch} \t time: {time.time() - epoch_t0:.1f}s")

    model.save_networks("latest")
    return model


if __name__ == "__main__":
    opt = TrainOptions().parse_cli()
    launch_training(opt)
