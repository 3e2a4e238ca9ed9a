"""REST server end-to-end: start the stdlib server in-process, drive the
train/predict/status/delete routes via client.py and raw HTTP (reference
tests test_client_server.py + test_api_predict_*)."""

import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.make_fake_dataset import make as make_fake  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer
    from server.joligen_api import Handler
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _get(addr, path):
    with urllib.request.urlopen(f"http://{addr[0]}:{addr[1]}{path}") as r:
        return r.status, json.loads(r.read().decode())


def test_info_schema(server):
    code, body = _get(server, "/info")
    assert code == 200 and body["status"] == "running"
    code, schema = _get(server, "/schema")
    assert code == 200
    assert "G" in schema["properties"] and "data" in schema["properties"]


@pytest.mark.slow
def test_train_predict_lifecycle(server, tmp_path):
    import client

    root = str(tmp_path / "ds")
    ckpt = str(tmp_path / "ck")
    make_fake(root, n=6, size=32)
    train_options = {
        "dataroot": root, "model_type": "palette",
        "checkpoints_dir": ckpt, "name": "srv",
        "data": {
            "dataset_mode": "self_supervised_labeled_mask",
            "crop_size": 16, "load_size": 16, "relative_paths": True,
            "max_dataset_size": 6, "num_threads": 2,
        },
        "G": {"netG": "unet_mha", "ngf": 8,
              "unet_mha": {"channel_mults": [1, 2], "res_blocks": [1, 1],
                           "attn_res": [4]},
              "diff_n_timestep_train": 20, "diff_n_timestep_test": 5},
        "train": {"batch_size": 2, "n_epochs": 1, "n_epochs_decay": 0},
        "output": {"print_freq": 8},
    }
    host, port = server
    code, body = client.train(host, port, "srv", train_options)
    assert code == 201 and body["status"] == "running"

    code, body = client.get_status(host, port)
    assert code == 200
    assert any(p["name"] == "srv" for p in body["processes"])

    # wait for training to finish (tiny run; XLA compile under CI
    # contention can take minutes, so the deadline is generous)
    for _ in range(600):
        code, body = _get(server, "/train/srv")
        if body["status"] == "stopped":
            break
        time.sleep(1)
    assert body["status"] == "stopped", body
    assert os.path.exists(os.path.join(ckpt, "srv", "latest_net_G_A.pth"))

    # predict route
    img_in = os.path.join(root, "testA", "imgs", "000.png")
    bbox_in = os.path.join(root, "testA", "bbox", "000.txt")
    payload = {
        "predict_options": {
            "model_in_file": os.path.join(ckpt, "srv", "latest_net_G_A.pth"),
            "img_in": img_in, "bbox_in": bbox_in,
            "dir_out": str(tmp_path / "out"),
            "sampling_method": "ddim", "sampling_steps": 3, "cpu": True,
        },
        "server": {"sync": True},
    }
    req = urllib.request.Request(
        f"http://{host}:{port}/predict", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        body = json.loads(r.read().decode())
    assert body["status"] == "stopped"
    outs = os.listdir(tmp_path / "out")
    assert any(f.endswith("_generated.png") for f in outs), outs

    # delete route
    code, body = client.delete(host, port, "srv")
    assert code == 200 and body["status"] == "stopped"
    code, body = client.get_status(host, port)
    assert not any(p["name"] == "srv" for p in body["processes"])
