"""Shared model-loading helpers for the standalone inference scripts
(reference scripts/gen_single_image_diffusion.py:53-125 load_model)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def load_model_from_file(model_in_file, cpu=False, overrides=None):
    """model_in_file: path to a ``<prefix>_net_<name>.pth`` checkpoint.
    Rebuilds the model from the directory's ``train_config.json`` and loads
    that prefix (EMA weights are used automatically at inference when
    present). Returns (model, opt)."""
    if cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from joligen_tpu.options import TrainOptions
    from joligen_tpu.models import create_model

    model_dir = os.path.dirname(os.path.abspath(model_in_file))
    with open(os.path.join(model_dir, "train_config.json")) as f:
        cfg = json.load(f)
    opt = TrainOptions().parse_json(cfg, verbose=False)
    for k, v in (overrides or {}).items():
        setattr(opt, k, v)
    opt.steps_per_epoch = 1
    base = os.path.basename(model_in_file)
    prefix = base.split("_net_")[0] if "_net_" in base else "latest"
    model = create_model(opt, phase="test")
    model.save_dir = model_dir
    model.load_networks(prefix, load_optim=False)
    return model, opt


def load_image_rgb(path):
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def save_image_rgb(path, arr_uint8):
    from PIL import Image
    Image.fromarray(arr_uint8).save(path)


def to_uint8(img):
    return ((np.asarray(img, np.float32) + 1.0) * 127.5).clip(0, 255) \
        .astype(np.uint8)


def to_m1p1(img_uint8):
    return np.asarray(img_uint8, np.float32) / 127.5 - 1.0
