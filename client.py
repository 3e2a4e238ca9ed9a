"""HTTP client for the training server (reference client.py contract):
start / stop / list trainings. stdlib urllib (requests not in the image)."""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request


def _call(method, url, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read().decode() or "{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode() or "{}")


def train(host, port, name, train_options):
    """POST /train/{name} (reference client.py:43-55)."""
    url = f"http://{host}:{port}/train/{name}"
    code, body = _call("POST", url, {"train_options": train_options,
                                     "server": {"sync": False}})
    print(json.dumps(body))
    return code, body


def delete(host, port, name):
    url = f"http://{host}:{port}/train/{name}"
    code, body = _call("DELETE", url)
    print(json.dumps(body))
    return code, body


def get_status(host, port):
    code, body = _call("GET", f"http://{host}:{port}/train")
    print(json.dumps(body))
    return code, body


def main_client(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--method", required=True,
                   choices=["train", "delete", "training_status"])
    p.add_argument("--name", default="")
    p.add_argument("--config_json", default="",
                   help="path of the nested json training config")
    a = p.parse_args(argv)
    if a.method == "train":
        assert a.name and a.config_json, "--name and --config_json required"
        with open(a.config_json) as f:
            opts = json.load(f)
        code, _ = train(a.host, a.port, a.name, opts)
    elif a.method == "delete":
        assert a.name, "--name required"
        code, _ = delete(a.host, a.port, a.name)
    else:
        code, _ = get_status(a.host, a.port)
    return 0 if code < 400 else 1


if __name__ == "__main__":
    sys.exit(main_client())
