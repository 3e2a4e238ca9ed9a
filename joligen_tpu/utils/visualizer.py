"""Training observability: loss_log.txt, losses.json/metrics.json persistence
and an HTML gallery (reference util/visualizer.py:55-716, minus visdom/aim
servers, which are optional adapters on TPU hosts)."""

from __future__ import annotations

import json
import os
import time

import numpy as np


def tensor2im(arr):
    """NHWC float [-1,1] -> HWC uint8 (reference util/util.py tensor2im)."""
    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    a = np.clip((a + 1.0) * 127.5, 0, 255).astype(np.uint8)
    if a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    return a


class _VisdomClient:
    """Minimal stdlib visdom HTTP client (reference util/visualizer.py:86
    uses the visdom package; the wire protocol is plain JSON POSTs to
    /events, so no dependency is needed). Best-effort: disables itself on
    the first connection failure."""

    def __init__(self, server, port, env):
        server = server or "http://localhost"
        if "://" not in server:
            server = "http://" + server
        self.url = f"{server}:{port}/events"
        self.env = env or "main"
        self.dead = False

    def _post(self, payload):
        if self.dead:
            return
        import urllib.request
        try:
            req = urllib.request.Request(
                self.url, json.dumps(payload).encode(),
                {"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=2).read()
        except Exception as e:
            print(f"visdom unreachable at {self.url} ({e}); "
                  "display disabled for this run")
            self.dead = True

    def line(self, win, title, xs, series):
        """series: name -> list of y values aligned with xs."""
        data = [{"x": list(map(float, xs)), "y": list(map(float, ys)),
                 "type": "scatter", "mode": "lines", "name": k}
                for k, ys in series.items()]
        self._post({"data": data, "win": win, "eid": self.env,
                    "layout": {"title": title, "showlegend": True},
                    "opts": {"title": title}})

    def image(self, win, img_hwc_uint8, caption):
        import base64
        import io
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(img_hwc_uint8).save(buf, format="PNG")
        src = "data:image/png;base64," + base64.b64encode(
            buf.getvalue()).decode()
        h, w = img_hwc_uint8.shape[:2]
        self._post({
            "data": [{"content": {"src": src, "caption": caption,
                                  "size": [w, h]}, "type": "image"}],
            "win": win, "eid": self.env,
            "opts": {"title": caption, "width": w, "height": h}})


class _AimTracker:
    """aim experiment tracker adapter (reference util/visualizer.py:94-106
    creates an aim.Run against output_display_aim_server/port and tracks
    losses, metrics, and images). The aim package is optional: when it is
    not installed this adapter announces itself disabled once and every
    call becomes a no-op, so `--output_display_type aim` is safe on any
    host."""

    def __init__(self, server, port, experiment):
        self.run = None
        self.dead = False
        try:
            import aim
            repo = f"aim://{server.replace('http://', '')}:{port}" \
                if server else None
            self.run = aim.Run(repo=repo, experiment=experiment or "joligen")
            self._aim = aim
        except Exception as e:
            print(f"aim tracking disabled ({type(e).__name__}: {e}); "
                  "install `aim` and point --output_display_aim_server at "
                  "a running server to enable")
            self.dead = True

    # Runtime tracking errors (e.g. a transient aim-server connection
    # reset) are reported and COUNTED, not fatal: the tracker keeps
    # retrying on subsequent calls and only gives up for good after
    # _MAX_FAILS consecutive failures, announcing that loudly.
    _MAX_FAILS = 20

    def _fail(self, what, e):
        self._fails = getattr(self, "_fails", 0) + 1
        print(f"aim {what} failed ({type(e).__name__}: {e}) "
              f"[{self._fails}/{self._MAX_FAILS} consecutive]")
        if self._fails >= self._MAX_FAILS:
            print("aim tracking DISABLED for the rest of this run after "
                  f"{self._fails} consecutive failures")
            self.dead = True

    def track_scalars(self, scalars, step, context):
        if self.dead:
            return
        try:
            for k, v in scalars.items():
                self.run.track(float(v), name=k, step=int(step),
                               context={"subset": context})
            self._fails = 0
        except Exception as e:
            self._fail("scalar tracking", e)

    def track_image(self, img_hwc_uint8, name, step):
        if self.dead:
            return
        try:
            self.run.track(self._aim.Image(img_hwc_uint8), name=name,
                           step=int(step))
            self._fails = 0
        except Exception as e:
            self._fail("image tracking", e)


class Visualizer:
    def __init__(self, opt):
        self.opt = opt
        self.expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(self.expr_dir, exist_ok=True)
        self.log_path = os.path.join(self.expr_dir, "loss_log.txt")
        self.losses_json = os.path.join(self.expr_dir, "losses.json")
        self.metrics_json = os.path.join(self.expr_dir, "metrics.json")
        self.img_dir = os.path.join(self.expr_dir, "web", "images")
        if not getattr(opt, "output_no_html", False):
            os.makedirs(self.img_dir, exist_ok=True)
        self.loss_history = self._load(self.losses_json)
        self.metric_history = self._load(self.metrics_json)
        self.visdom = None
        self.aim = None
        display_types = getattr(opt, "output_display_type", None) or []
        if "visdom" in display_types:
            self.visdom = _VisdomClient(
                getattr(opt, "output_display_visdom_server",
                        "http://localhost"),
                getattr(opt, "output_display_visdom_port", 8097),
                getattr(opt, "output_display_env", ""))
        if "aim" in display_types:
            self.aim = _AimTracker(
                getattr(opt, "output_display_aim_server", "http://localhost"),
                getattr(opt, "output_display_aim_port", 53800),
                getattr(opt, "output_display_env", "") or opt.name)
        with open(self.log_path, "a") as f:
            f.write(f"================ Training Loss ({time.strftime('%c')}) ================\n")

    @staticmethod
    def _load(path):
        if os.path.exists(path):
            try:
                with open(path) as f:
                    return json.load(f)
            except json.JSONDecodeError:
                pass
        return []

    def log_losses(self, epoch, iters, losses):
        losses = {k: float(v) for k, v in losses.items()}  # sync here only
        msg = f"(epoch: {epoch}, iters: {iters}) " + " ".join(
            f"{k}: {v:.6f}" for k, v in losses.items())
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")
        self.loss_history.append({"epoch": epoch, "iters": iters, **losses})
        with open(self.losses_json, "w") as f:
            json.dump(self.loss_history, f)
        self._plot(self.loss_history, "loss", self.opt.name + " losses")
        if self.aim is not None:
            self.aim.track_scalars(losses, iters, "train")

    def log_metrics(self, epoch, iters, metrics):
        metrics = {k: float(v) for k, v in metrics.items()}
        self.metric_history.append({"epoch": epoch, "iters": iters, **metrics})
        with open(self.metrics_json, "w") as f:
            json.dump(self.metric_history, f)
        self._plot(self.metric_history, "metrics", self.opt.name + " metrics")
        if self.aim is not None:
            self.aim.track_scalars(metrics, iters, "test")

    def _plot(self, history, win, title):
        if self.visdom is None or self.visdom.dead or not history:
            return
        keys = [k for k in history[-1] if k not in ("epoch", "iters")]
        xs = [h["epoch"] + h["iters"] * 1e-9 for h in history]
        self.visdom.line(
            win, title, xs,
            {k: [h.get(k, float("nan")) for h in history] for k in keys})

    def save_images(self, visuals, epoch):
        """visuals: dict name -> NHWC array. Writes PNGs + refreshes
        index.html, and mirrors each image to visdom when enabled.
        output_num_images caps the per-call batch rows rendered; the HTML
        gallery refreshes at most every output_update_html_freq calls
        (reference visualizer options)."""
        html = not getattr(self.opt, "output_no_html", False)
        self._html_calls = getattr(self, "_html_calls", 0) + 1
        display_freq = max(1, getattr(self.opt, "output_display_freq", 1)
                           or 1)
        html_every = max(1, int(getattr(self.opt, "output_update_html_freq",
                                        display_freq) or display_freq)
                         // display_freq)
        nmax = int(getattr(self.opt, "output_num_images", 0) or 0)
        if html:
            from PIL import Image
        for name, arr in visuals.items():
            if nmax > 0 and getattr(arr, "ndim", 0) >= 4:
                arr = arr[:nmax]
            img = tensor2im(arr)
            if html:
                fn = f"epoch{epoch:03d}_{name}.png"
                Image.fromarray(img).save(os.path.join(self.img_dir, fn))
            if self.visdom is not None and not self.visdom.dead:
                self.visdom.image(f"img_{name}", img,
                                  f"{self.opt.name} {name} (epoch {epoch})")
            if self.aim is not None:
                self.aim.track_image(img, name, epoch)
        if html and self._html_calls % html_every == 0:
            self._write_html()

    def _write_html(self):
        files = sorted(os.listdir(self.img_dir), reverse=True)
        rows = "\n".join(
            f'<div style="display:inline-block;margin:4px;text-align:center">'
            f'<img src="images/{f}" width="256"/><br/>{f}</div>'
            for f in files[:200])
        with open(os.path.join(self.expr_dir, "web", "index.html"), "w") as f:
            f.write(f"<html><body><h3>{self.opt.name}</h3>{rows}</body></html>")
