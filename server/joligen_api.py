"""REST training/inference server (reference server/joligen_api.py).

Same route contract as the reference FastAPI app, rebuilt on the stdlib
(``http.server`` + ``multiprocessing``) because fastapi/uvicorn are not in
this image:

- POST   /train/{name}     body {"train_options": {...}, "server": {"sync": bool}}
- GET    /train            status of all training processes
- GET    /train/{name}     status of one
- DELETE /train/{name}     stop + remove
- POST   /predict          body {"predict_options": {...}, "server": {...}}
- GET    /info             server status + commit hash
- GET    /schema           full option JSON schema (OpenAPI component)
- DELETE /fs?path=...      delete a file/dir under the allowed roots
- WS     /ws/predict/{name}  log streaming (minimal RFC6455 server-side
  implementation, text frames of new log lines)

Each job runs in its own ``multiprocessing.Process`` exactly like the
reference (server/joligen_api.py:144,320); logs go to ``<checkpoints>/
<name>/log`` and stream over the websocket.
"""

from __future__ import annotations

import base64
import hashlib
import json
import multiprocessing as mp
import os
import shutil
import struct
import subprocess
import sys
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from joligen_tpu.options import TrainOptions  # noqa: E402

ctx: dict = {}           # name -> Process
log_paths: dict = {}     # name -> log file
fs_roots: set = set()    # checkpoint dirs of jobs this server launched

WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

# fork() of a thread-carrying JAX process deadlocks on held allocator
# locks; spawn starts jobs in a clean interpreter (reference uses fork on
# torch, which tolerates it — JAX does not)
_mp = mp.get_context("spawn")


def _train_target(opt, log_path):
    sys.stdout = sys.stderr = open(log_path, "a", buffering=1)
    from train import launch_training
    launch_training(opt)


def _predict_target(predict_options, log_path):
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    sys.stdout = sys.stderr = open(log_path, "a", buffering=1)
    model_dir = os.path.dirname(predict_options["model_in_file"])
    with open(os.path.join(model_dir, "train_config.json")) as f:
        model_type = json.load(f).get("model_type",
                                      predict_options.get("model_type"))
    import argparse
    if model_type in ("palette", "cm", "sc", "b2b"):
        from scripts.gen_single_image_diffusion import build_parser, inference
        ns = argparse.Namespace(**{a.dest: a.default
                                   for a in build_parser()._actions
                                   if a.dest != "help"})
    else:
        from scripts.gen_single_image import inference  # type: ignore
        ns = argparse.Namespace(img_width=0, img_height=0, cpu=False,
                                img_out="")
    for k, v in predict_options.items():
        setattr(ns, k, v)
    inference(ns)


def is_alive(p):
    return p is not None and p.is_alive()


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    # -------------- plumbing --------------
    def _json(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self):
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n) or b"{}")

    def log_message(self, fmt, *args):  # quiet access log
        pass

    # -------------- routes --------------
    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/info":
            commit = ""
            try:
                commit = subprocess.run(
                    ["git", "rev-parse", "HEAD"], cwd=ROOT,
                    capture_output=True, text=True).stdout.strip()
            except Exception:
                pass
            return self._json(200, {"JG_commit_hash": commit,
                                    "status": "running",
                                    "processes": len(ctx)})
        if path == "/schema":
            return self._json(200, TrainOptions().get_schema())
        if path == "/train":
            procs = [{"name": n,
                      "status": "running" if is_alive(p) else "stopped"}
                     for n, p in ctx.items()]
            return self._json(200, {"processes": procs})
        if path.startswith("/train/"):
            name = path[len("/train/"):]
            if name in ctx:
                status = "running" if is_alive(ctx[name]) else "stopped"
                return self._json(200, {"status": status, "name": name})
            return self._json(404, {"detail": "Not found"})
        if path.startswith("/ws/predict/"):
            return self._websocket(path[len("/ws/predict/"):])
        return self._json(404, {"detail": "Not found"})

    def do_POST(self):
        path = urlparse(self.path).path
        if path.startswith("/train/"):
            return self._train(path[len("/train/"):])
        if path == "/predict":
            return self._predict()
        return self._json(404, {"detail": "Not found"})

    def do_DELETE(self):
        parsed = urlparse(self.path)
        path = parsed.path
        if path.startswith("/train/"):
            name = path[len("/train/"):]
            if name not in ctx:
                return self._json(404, {"detail": "Not found"})
            p = ctx.pop(name)
            if is_alive(p):
                p.terminate()
                p.join(timeout=10)
            return self._json(200, {"message": "ok", "name": name,
                                    "status": "stopped"})
        if path == "/fs" or path == "/fs/":
            q = parse_qs(parsed.query)
            target = (q.get("path") or [""])[0]
            if not target:
                return self._json(400, {"detail": "path required"})
            # only paths under the allowed roots may be deleted: the
            # checkpoint/log dirs of jobs this server launched plus
            # JOLIGEN_SERVER_FS_ROOTS (default /tmp) — an unauthenticated
            # DELETE must never reach arbitrary filesystem paths
            roots = [r for r in os.environ.get(
                "JOLIGEN_SERVER_FS_ROOTS", "/tmp").split(":") if r]
            roots += list(fs_roots)
            real = os.path.realpath(target)
            if not any(real == os.path.realpath(r)
                       or real.startswith(os.path.realpath(r) + os.sep)
                       for r in roots):
                return self._json(403, {
                    "detail": f"path outside allowed roots ({roots})"})
            try:
                if os.path.isdir(real):
                    shutil.rmtree(real)
                else:
                    os.remove(real)
            except OSError as e:
                return self._json(400, {"detail": str(e)})
            return self._json(200, {"message": "ok"})
        return self._json(404, {"detail": "Not found"})

    # -------------- handlers --------------
    def _train(self, name):
        try:
            body = self._body()
            opt = TrainOptions().parse_json(body["train_options"],
                                            verbose=False)
        except Exception as e:
            traceback.print_exc()
            return self._json(400, {"detail": str(e)})
        expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        fs_roots.add(os.path.abspath(opt.checkpoints_dir))
        os.makedirs(expr_dir, exist_ok=True)
        TrainOptions().save_config(opt, expr_dir)
        log_path = os.path.join(expr_dir, "log")
        log_paths[name] = log_path
        proc = _mp.Process(target=_train_target, args=(opt, log_path))
        ctx[name] = proc
        proc.start()
        if body.get("server", {}).get("sync"):
            proc.join()
            del ctx[name]
            return self._json(201, {"message": "ok", "name": name,
                                    "status": "stopped"})
        return self._json(201, {"message": "ok", "name": name,
                                "status": "running"})

    def _predict(self):
        try:
            body = self._body()
            po = body["predict_options"]
            assert "model_in_file" in po, "predict_options.model_in_file required"
            assert "img_in" in po, "predict_options.img_in required"
        except Exception as e:
            return self._json(400, {"detail": str(e)})
        name = "predict_%d" % int(time.time() * 1000)
        log_path = os.path.join(po.get("dir_out", "/tmp"), name + ".log")
        log_paths[name] = log_path
        proc = _mp.Process(target=_predict_target, args=(po, log_path))
        ctx[name] = proc
        proc.start()
        if body.get("server", {}).get("sync"):
            proc.join()
            status = "stopped"
        else:
            status = "running"
        return self._json(200, {"message": "ok", "name": name,
                                "status": status})

    # -------------- websocket log streaming --------------
    def _websocket(self, name):
        key = self.headers.get("Sec-WebSocket-Key")
        if not key:
            return self._json(400, {"detail": "websocket handshake required"})
        accept = base64.b64encode(
            hashlib.sha1((key + WS_MAGIC).encode()).digest()).decode()
        self.send_response(101, "Switching Protocols")
        self.send_header("Upgrade", "websocket")
        self.send_header("Connection", "Upgrade")
        self.send_header("Sec-WebSocket-Accept", accept)
        self.end_headers()

        log_path = log_paths.get(name)
        pos = 0
        idle = 0
        try:
            while True:
                got = False
                if log_path and os.path.exists(log_path):
                    with open(log_path) as f:
                        f.seek(pos)
                        new = f.read()
                        pos = f.tell()
                    for line in new.splitlines():
                        self._ws_send(line)
                        got = True
                proc = ctx.get(name)
                if proc is None or not is_alive(proc):
                    # finished/deleted/unknown job: keep draining while the
                    # log still grows, then close — never spin forever
                    idle = 0 if got else idle + 1
                    if idle >= 3:
                        self._ws_send("__process_stopped__")
                        break
                time.sleep(0.5)
        except (BrokenPipeError, ConnectionResetError):
            pass

    def _ws_send(self, text):
        data = text.encode()
        header = bytes([0x81])  # FIN + text frame
        n = len(data)
        if n < 126:
            header += bytes([n])
        elif n < 65536:
            header += bytes([126]) + struct.pack(">H", n)
        else:
            header += bytes([127]) + struct.pack(">Q", n)
        self.wfile.write(header + data)


def main(host="0.0.0.0", port=8000):
    server = ThreadingHTTPServer((host, port), Handler)
    print(f"JoliGEN-TPU server listening on {host}:{port}")
    server.serve_forever()


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    a = p.parse_args()
    main(a.host, a.port)
