import glob
import json

import pytest

from joligen_tpu.options import TrainOptions, flatten_json, unflatten_json
from joligen_tpu.options.registry import split_key

EXAMPLES = sorted(glob.glob("/root/reference/examples/*.json"))


def _valid_examples():
    out = []
    for p in EXAMPLES:
        try:
            with open(p) as f:
                json.load(f)
            out.append(p)
        except json.JSONDecodeError:
            pass  # two upstream examples have trailing commas
    return out


@pytest.mark.parametrize("path", _valid_examples() or ["none"])
def test_reference_examples_load(path):
    if path == "none":
        pytest.skip("reference examples not available")
    with open(path) as f:
        cfg = json.load(f)
    to = TrainOptions()
    opt = to.parse_json(cfg, verbose=False)
    assert opt.model_type in ("cut", "cycle_gan", "palette", "cm", "cm_gan", "sc", "b2b", "mat")
    assert isinstance(opt.train_batch_size, int)
    # round-trip: to_json -> parse_json must be the identity
    j = to.to_json(opt)
    opt2 = to.parse_json(j, verbose=False)
    for k in vars(opt):
        assert getattr(opt, k) == getattr(opt2, k), k


def test_split_key():
    assert split_key("data_online_creation_crop_delta_A") == (
        "data", "online_creation", "crop_delta_A")
    assert split_key("train_sem_cls_lambda") == ("train", "sem", "cls_lambda")
    assert split_key("model_type") == ("model_type",)
    assert split_key("dataroot") == ("dataroot",)
    assert split_key("alg_palette_loss") == ("alg", "palette", "loss")
    assert split_key("train_optim") == ("train", "optim")


def test_flatten_unflatten():
    nested = {"data": {"crop_size": 4, "online_creation": {"rand_mask_A": True}},
              "dataroot": "/x"}
    flat = flatten_json(nested)
    assert flat == {"data_crop_size": 4,
                    "data_online_creation_rand_mask_A": True,
                    "dataroot": "/x"}
    assert unflatten_json(flat) == nested


def test_defaults_and_cli():
    to = TrainOptions()
    opt = to.parse_cli(["--model_type", "palette", "--train_batch_size", "3",
                        "--dataroot", "/tmp/x"])
    assert opt.model_type == "palette"
    assert opt.train_batch_size == 3
    assert opt.G_netG  # has a default
    assert opt.isTrain


def test_unknown_json_keys_tolerated():
    to = TrainOptions()
    opt = to.parse_json({"bogus_key": 1, "model_type": "cut"}, verbose=False)
    assert opt.model_type == "cut"
