"""Train CLI (reference train.py contract: --config_json + flat flag overrides).

Single-process design: JAX owns all local devices through one mesh
(reference forks one process per GPU via mp.spawn, train.py:540-549; on TPU
the mesh + pjit replaces the process group). Multi-host pods call
``jax.distributed.initialize`` before anything else.

Features mirrored from reference train.py: periodic loss printing with
per-image timing (train.py:273-301), latest/epoch checkpointing, train-time
metric evaluation on test sets every ``train_metrics_every`` iterations
(train.py:359-413), HTML visuals, resume (--train_continue) incl. loss
history, finetune-from (--train_continue_from) with provenance metadata
(train.py:98-120), final eval_results.json (train.py:474-512), and
SIGINT/SIGTERM checkpoint-on-exit.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from joligen_tpu.options import TrainOptions  # noqa: E402


def _maybe_continue_from(opt):
    """Copy checkpoints from another run dir and record provenance
    (reference train.py:98-120)."""
    src = getattr(opt, "train_continue_from", "") or ""
    if not src:
        return
    dst = os.path.join(opt.checkpoints_dir, opt.name)
    os.makedirs(dst, exist_ok=True)
    copied = []
    for fn in os.listdir(src):
        if "_net_" in fn and fn.startswith("latest"):
            shutil.copy2(os.path.join(src, fn), os.path.join(dst, fn))
            copied.append(fn)
    with open(os.path.join(dst, "finetune_source.json"), "w") as f:
        json.dump({"source": os.path.abspath(src), "files": copied,
                   "date": time.strftime("%c")}, f, indent=2)
    print(f"continuing from {src}: copied {len(copied)} nets")


def launch_training(opt):
    import random

    import numpy as np

    # multi-host bring-up MUST precede the first backend touch (device
    # queries below); no-op unless --tpu_dist_* / JOLIGEN_DIST_* are set
    # (reference equivalent: NCCL init_process_group, train.py:38-48)
    from joligen_tpu.parallel import initialize_distributed, is_main_process
    initialize_distributed(opt)

    import jax

    seed = getattr(opt, "seed", None)
    if seed:
        random.seed(seed)
        np.random.seed(seed)

    from joligen_tpu.data import (create_dataloader, create_dataset,
                                  list_test_sets)
    from joligen_tpu.models import create_model
    from joligen_tpu.utils.visualizer import Visualizer

    if getattr(opt, "tpu_cache_dir", ""):
        jax.config.update("jax_compilation_cache_dir", opt.tpu_cache_dir)

    main = is_main_process()
    single = jax.process_count() == 1

    dataset = create_dataset(opt, "train")
    dataloader = create_dataloader(opt, dataset)
    steps_per_epoch = max(1, len(dataloader))
    opt.steps_per_epoch = steps_per_epoch

    print(f"dataset [{opt.data_dataset_mode}] of size {len(dataset)} created, "
          f"{steps_per_epoch} steps/epoch, devices={jax.device_count()}")

    if main:
        _maybe_continue_from(opt)
    if not single:
        # checkpoint files must exist before every process loads them
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("continue_from")
    model = create_model(opt, phase="train")
    if main:
        print("model [%s] created; params: %s" %
              (opt.model_type,
               {k: f"{v/1e6:.2f}M" for k, v in model.param_count().items()}))

    visualizer = Visualizer(opt) if main else None

    expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
    if main:
        TrainOptions().save_config(opt, expr_dir)

    if getattr(opt, "train_continue", False):
        try:
            load_prefix = ("iter_%d" % opt.train_load_iter
                           if getattr(opt, "train_load_iter", 0) > 0
                           else getattr(opt, "train_epoch", "latest") or "latest")
            model.load_networks(load_prefix)
            print("resumed from checkpoint")
        except FileNotFoundError:
            print("no checkpoint to resume from; starting fresh")
    elif getattr(opt, "train_continue_from", ""):
        model.load_networks("latest", load_optim=False, strict=False)

    # test dataloaders for train-time metric evaluation (reference gates on
    # rank 0, train.py:147-174; here metric inference is a collective over
    # the global mesh, so in MULTI-process runs it is disabled — run
    # test.py on the checkpoints instead, same as the reference's offline
    # path)
    metric_loaders = []
    compute_metrics = (getattr(opt, "train_compute_metrics_test", False)
                       and single)
    if getattr(opt, "train_compute_metrics_test", False) and not single:
        print("multi-host: train-time metric eval disabled (collective "
              "inference from one rank would deadlock); use test.py")
    if compute_metrics:
        for name in (list_test_sets(opt.dataroot) or [""]):
            try:
                tds = create_dataset(opt, "test", name=name)
                metric_loaders.append(
                    (name, create_dataloader(opt, tds, shuffle=False,
                                             batch_size=opt.test_batch_size)))
            except (AssertionError, FileNotFoundError) as e:
                print(f"no test set '{name}': {e}")
        if metric_loaders:
            model.init_metrics(metric_loaders[0][1])
    metrics_every = int(getattr(opt, "train_metrics_every", 1000) or 1000)

    # graceful shutdown: save latest on SIGINT/SIGTERM (reference
    # train.py:88-90 destroys the process group; here we checkpoint)
    stop = {"now": False}

    def _sig(signum, frame):
        stop["now"] = True
    for s in (signal.SIGINT, signal.SIGTERM):
        signal.signal(s, _sig)

    profile_dir = getattr(opt, "tpu_profile_dir", "") or ""

    total_iters = 0
    batch = opt.train_batch_size
    t_data, t_compute = 0.0, 0.0
    epoch_start = getattr(opt, "train_epoch_count", 1)
    last_metrics = {}

    # device-side double buffering: when the model separates host->device
    # upload (prepare_batch) from the jitted step (optimize_prepared), a
    # worker thread uploads batch N+1 while the device computes batch N
    # (reference has no analog — DDP hides this behind CUDA streams)
    prefetch_depth = int(getattr(opt, "tpu_prefetch", 2) or 0)
    can_overlap = (hasattr(model, "prepare_batch")
                   and hasattr(model, "optimize_prepared")
                   and prefetch_depth > 0)

    def iterate(loader):
        """Yields (run_step, host_batch) pairs; host_batch feeds the
        display/metric paths that want raw numpy."""
        if not can_overlap:
            for data in loader:
                yield (lambda d=data: model.optimize_parameters(d)), data
            return
        import queue as _q
        import threading
        q = _q.Queue(maxsize=max(1, prefetch_depth))
        DONE = object()

        def feed():
            try:
                for data in loader:
                    q.put((model.prepare_batch(data), data))
            finally:
                q.put(DONE)

        threading.Thread(target=feed, daemon=True).start()
        while True:
            item = q.get()
            if item is DONE:
                return
            dev, data = item
            yield (lambda d=dev: model.optimize_prepared(d)), data

    for epoch in range(epoch_start, opt.train_n_epochs + opt.train_n_epochs_decay + 1):
        epoch_t0 = time.time()
        t_prev = time.time()
        for run_step, data in iterate(dataloader):
            if profile_dir and total_iters == 3 * batch:
                import jax.profiler
                jax.profiler.start_trace(profile_dir)
            t0 = time.time()
            t_data += t0 - t_prev
            losses = run_step()
            t1 = time.time()
            t_compute += t1 - t0
            t_prev = t1
            total_iters += batch
            if profile_dir and total_iters == 6 * batch:
                import jax.profiler
                jax.profiler.stop_trace()

            if main and total_iters % max(
                    batch, (opt.output_print_freq // batch) * batch) == 0:
                msg = " ".join(f"{k}: {float(v):.4f}" for k, v in losses.items())
                per_img = t_compute / max(total_iters, 1)
                print(f"(epoch: {epoch}, iters: {total_iters}, "
                      f"compute: {per_img:.4f}s/img, data: {t_data / max(total_iters,1):.4f}s/img) {msg}",
                      flush=True)
                visualizer.log_losses(epoch, total_iters, losses)

            if (single and getattr(opt, "output_display_freq", 0)
                    and total_iters %
                    max(batch, (opt.output_display_freq // batch) * batch) == 0):
                try:
                    fake = model.inference(data)
                    vis = {"real_A": data["A"], "fake_B": fake,
                           "real_B": data["B"]}
                    if getattr(opt, "output_display_G_attention_masks",
                               False) and hasattr(model,
                                                  "attention_visuals"):
                        vis.update(model.attention_visuals(data))
                    if getattr(opt, "output_display_diff_fake_real", False):
                        # reference visualizer: |fake - real| panel
                        import numpy as _np
                        vis["diff_real_fake"] = _np.abs(
                            _np.asarray(fake, _np.float32)
                            - _np.asarray(data["B"], _np.float32)) - 1.0
                    visualizer.save_images(vis, epoch)
                except Exception as e:  # visuals must never kill training
                    print(f"visuals failed: {e}")

            if (single and getattr(opt, "train_compute_D_accuracy", False)
                    and hasattr(model, "compute_D_accuracy")
                    and total_iters % max(
                        batch, (getattr(opt, "train_D_accuracy_every", 1000)
                                // batch) * batch) == 0):
                acc = model.compute_D_accuracy(data)
                print("D accuracy: " + " ".join(
                    f"{k}: {v:.3f}" for k, v in acc.items()), flush=True)
                visualizer.log_metrics(epoch, total_iters, acc)

            if (single and getattr(opt, "train_mask_compute_miou", False)
                    and hasattr(model, "compute_miou")
                    and total_iters % max(
                        batch, (getattr(opt, "train_mask_miou_every", 1000)
                                // batch) * batch) == 0):
                # reference train.py:437-444; diagnostic only — never
                # kills training
                try:
                    miou = model.compute_miou(data)
                    if miou:
                        print("mIoU: " + " ".join(
                            f"{k}: {v:.3f}" for k, v in miou.items()),
                            flush=True)
                        visualizer.log_metrics(epoch, total_iters, miou)
                except Exception as e:
                    print(f"mIoU failed: {e}")

            if compute_metrics and metric_loaders and total_iters % max(
                    batch, (metrics_every // batch) * batch) == 0:
                for name, ml in metric_loaders:
                    m = model.compute_metrics_test(ml)
                    last_metrics[f"test{name}" if name else "test"] = m
                    print(f"metrics[test{name}] " + " ".join(
                        f"{k}: {v:.4f}" for k, v in m.items()), flush=True)
                    visualizer.log_metrics(epoch, total_iters, m)

            if total_iters % max(batch, (opt.train_save_latest_freq // batch) * batch) == 0:
                # reference train.py:350-356: save_by_iter keeps per-iter
                # snapshots instead of overwriting latest
                model.save_networks("iter_%d" % total_iters
                                    if getattr(opt, "train_save_by_iter",
                                               False) else "latest")

            if stop["now"]:
                print("signal received: saving latest and exiting")
                model.save_networks("latest")
                return model

        if total_iters == 0:
            raise RuntimeError(
                "epoch produced 0 training steps — every sample failed to "
                "load (check dataroot/paths.txt; use --data_relative_paths "
                "for dataroot-relative paths)")
        model.save_networks("latest")
        if epoch % max(1, opt.train_save_epoch_freq) == 0:
            model.save_networks(str(epoch))
        if getattr(opt, "train_export_jit", False) and opt.model_type not in (
                "palette", "cm", "cm_gan", "sc", "b2b"):
            # export the compiled-forward artifact next to the checkpoint
            # (reference base_model.py:870-938 exports on save for GAN Gs)
            try:
                from joligen_tpu.utils.export import export_generator
                export_generator(model)
            except Exception as e:
                print(f"export on save failed: {e}")
        model.update_learning_rate()
        print(f"end of epoch {epoch} \t time: {time.time() - epoch_t0:.1f}s")

    model.save_networks("latest")
    # final eval (reference train.py:474-512 writes eval_results.json)
    if compute_metrics and metric_loaders:
        for name, ml in metric_loaders:
            last_metrics[f"test{name}" if name else "test"] = \
                model.compute_metrics_test(ml)
        with open(os.path.join(expr_dir, "eval_results.json"), "w") as f:
            json.dump(last_metrics, f, indent=2)
    return model


if __name__ == "__main__":
    # topic help: `train.py --help [topic]` (reference options/helpers.py)
    if "--help" in sys.argv:
        i = sys.argv.index("--help")
        topic = sys.argv[i + 1] if len(sys.argv) > i + 1 else None
        if topic and not topic.startswith("-"):
            TrainOptions().print_topic_help(topic)
            sys.exit(0)
        elif topic is None:
            TrainOptions().print_topic_help(None)
            sys.exit(0)
    opt = TrainOptions().parse_cli()
    launch_training(opt)
