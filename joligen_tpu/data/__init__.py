"""Host-side data pipeline.

All randomness, PIL decoding and ragged bbox math stay on the host (CPU);
the device only ever sees fixed-shape NHWC float32 batches
(SURVEY.md §7 design stance). Registry mirrors reference data/__init__.py.
"""

from __future__ import annotations

import glob
import os

from .loader import DataLoader


def find_dataset_class(mode):
    from . import datasets as D
    table = {
        "unaligned": D.UnalignedDataset,
        "unaligned_labeled_cls": D.UnalignedLabeledClsDataset,
        "unaligned_labeled_mask": D.UnalignedLabeledMaskDataset,
        "unaligned_labeled_mask_cls": D.UnalignedLabeledMaskClsDataset,
        "unaligned_labeled_mask_online": D.UnalignedLabeledMaskOnlineDataset,
        "unaligned_labeled_mask_cls_online": D.UnalignedLabeledMaskClsOnlineDataset,
        "self_supervised_labeled_mask": D.SelfSupervisedLabeledMaskDataset,
        "self_supervised_labeled_mask_cls": D.SelfSupervisedLabeledMaskClsDataset,
        "self_supervised_labeled_mask_online": D.SelfSupervisedLabeledMaskOnlineDataset,
        "self_supervised_labeled_mask_cls_online": D.SelfSupervisedLabeledMaskClsOnlineDataset,
        "aligned": D.AlignedDataset,
        "single": D.SingleDataset,
        "colorization": D.ColorizationDataset,
        "unaligned_labeled_mask_ref": D.UnalignedLabeledMaskRefDataset,
        "unaligned_labeled_mask_online_ref":
            D.UnalignedLabeledMaskOnlineRefDataset,
        "unaligned_labeled_mask_online_prompt":
            D.UnalignedLabeledMaskOnlinePromptDataset,
        "self_supervised_labeled_mask_ref":
            D.SelfSupervisedLabeledMaskRefDataset,
        "self_supervised_labeled_mask_online_ref":
            D.SelfSupervisedLabeledMaskOnlineRefDataset,
        "nuplet_unaligned_labeled_mask": D.NupletUnalignedLabeledMaskDataset,
        "multi_dataset": D.MultiDataset,
        "temporal_labeled_mask_online": D.TemporalLabeledMaskOnlineDataset,
        "self_supervised_vid_mask_online": D.SelfSupervisedVidMaskOnlineDataset,
        "self_supervised_vid_labeled_mask_cls_online":
            D.SelfSupervisedVidLabeledMaskClsOnlineDataset,
        "self_supervised_temporal": D.SelfSupervisedTemporalDataset,
    }
    if mode not in table:
        raise NotImplementedError(f"dataset mode {mode}")
    return table[mode]


def create_dataset(opt, phase="train", name=""):
    cls = find_dataset_class(opt.data_dataset_mode)
    return cls(opt, phase, name=name)


def create_dataloader(opt, dataset, shuffle=None, batch_size=None,
                      drop_last=None):
    """batch_size option is PER-DEVICE (reference semantics: per-GPU rank,
    data/__init__.py:124-129); the loader emits the global batch, which the
    mesh shards over its data-parallel extent. Global batches are capped at
    the dataset size so tiny eval sets still yield full batches."""
    if batch_size is None:
        batch_size = (opt.train_batch_size if getattr(opt, "isTrain", True)
                      else opt.test_batch_size)
    import jax
    dp = jax.device_count() // max(1, getattr(opt, "tpu_mesh_tensor", 1))
    if shuffle is None:
        shuffle = not getattr(opt, "data_serial_batches", False)
    if drop_last is None:
        drop_last = shuffle  # eval loaders keep the remainder
    global_batch = max(1, min(batch_size * dp, len(dataset)))
    # multi-process: each process loads only ITS slice of the global batch
    # (reference DistributedSampler(num_replicas, rank),
    # data/__init__.py:124-129); mesh.shard_batch reassembles the global
    # array via jax.make_array_from_process_local_data
    pc, pidx = jax.process_count(), jax.process_index()
    seed = getattr(opt, "seed", None)
    if pc > 1:
        global_batch = max(pc, (global_batch // pc) * pc)
        local_batch = global_batch // pc
        # the shuffle permutation MUST match across processes (shards are
        # strides of ONE shared permutation) -> a common seed is required
        seed = seed or 12345
    else:
        local_batch = global_batch
    return DataLoader(dataset, batch_size=local_batch, shuffle=shuffle,
                      drop_last=drop_last,
                      prefetch=max(1, getattr(opt, "tpu_prefetch", 2) or 2),
                      num_workers=getattr(opt, "data_num_threads", 4),
                      shard_index=pidx, num_shards=pc, seed=seed)


def list_test_sets(dataroot):
    """Glob test{A,B}* pairs (reference data/__init__.py:89-106)."""
    names = set()
    for d in glob.glob(os.path.join(dataroot, "test*")):
        base = os.path.basename(d)
        if base.startswith("testA"):
            names.add(base[len("testA"):])
        elif base.startswith("testB"):
            names.add(base[len("testB"):])
    return sorted(names)
