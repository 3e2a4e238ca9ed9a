"""Autoregressive B2B video inference from the exported StableHLO artifact
(TPU-native analog of reference
scripts/b2b_{pth,onnx,trt}_denoiser_infer_autoregressive_progress_bbox.py).

Reads a paths file (``<image> <bbox.txt>`` per line), crops a fixed window
around the first frame's bbox with the training crop engine, then generates
the sequence clip-by-clip: the first frame of each clip is the previous
clip's last generated frame with its mask cleared (known pixels), so the
object progresses through the bbox track autoregressively.

Backends:
- ``stablehlo`` (default): runs the ``<name>.sampler.stablehlo`` artifact
  written by ``b2b_export_stablehlo.py``. The whole Heun sampling loop is
  inside the artifact, so each clip is ONE dispatch (the reference needs
  one ONNX/TensorRT call per denoise step).
- ``live``: loads the checkpoint through the framework (parity reference).

Outputs ``frame_XXXXX_generated.png`` full frames with the progressing bbox
drawn, plus an optional mp4.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import (load_image_rgb, load_model_from_file,  # noqa: E402
                    save_image_rgb, to_uint8)


class StablehloSession:
    """Loads the exported sampler program + meta sidecar; one call per clip."""

    def __init__(self, meta_path):
        with open(meta_path) as f:
            self.meta = json.load(f)
        stem = meta_path[: -len(".meta.json")]
        from jax import export as jexport
        with open(stem + ".sampler.stablehlo", "rb") as f:
            self.exported = jexport.deserialize(bytearray(f.read()))
        self.input_names = list(self.meta["sampler_inputs"])

    @property
    def nf(self):
        return int(self.meta.get("data_temporal_number_frames", 0) or 0)

    @property
    def size(self):
        return int(self.meta["data_crop_size"])

    @property
    def conditional(self):
        return bool(self.meta["flags"].get("conditional", False))

    def sample(self, gt, mask, labels, seed, y_cond=None):
        inputs = {"gt": gt.astype(np.float32),
                  "mask": mask.astype(np.float32),
                  "labels": np.asarray(labels, np.int32),
                  "seed": np.uint32(seed)}
        if self.conditional:
            inputs["y_cond"] = (y_cond if y_cond is not None
                                else gt).astype(np.float32)
        args = [inputs[n] for n in self.input_names]
        return np.asarray(self.exported.call(*args))


class LiveSession:
    """Framework-path fallback: same interface over model.inference."""

    def __init__(self, model_in_file, cpu, denoise_timesteps=0):
        self.model, self.opt = load_model_from_file(model_in_file, cpu=cpu)
        self.steps = denoise_timesteps or None

    @property
    def nf(self):
        return int(getattr(self.opt, "data_temporal_number_frames", 0) or 0) \
            if self.model.is_video else 0

    @property
    def size(self):
        return int(self.opt.data_crop_size)

    @property
    def conditional(self):
        return bool(getattr(self.model, "conditional", False))

    def sample(self, gt, mask, labels, seed, y_cond=None):
        # inputs arrive already batched, same as the artifact contract
        import jax
        self.model.rng = jax.random.PRNGKey(int(seed))
        batch = {"B": gt, "B_label_mask": mask}
        if self.conditional:
            batch["A"] = y_cond if y_cond is not None else gt
        kwargs = {}
        if self.steps:
            kwargs["denoise_timesteps"] = self.steps
        return self.model.inference(batch, **kwargs)


def load_sequence(paths_in_file, dataset_root, nb_frames):
    root = dataset_root or os.path.dirname(os.path.abspath(paths_in_file))
    imgs, bboxes = [], []
    with open(paths_in_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            imgs.append(parts[0] if os.path.isabs(parts[0])
                        else os.path.join(root, parts[0]))
            bboxes.append(parts[1] if os.path.isabs(parts[1])
                          else os.path.join(root, parts[1]))
    if nb_frames > 0:
        imgs, bboxes = imgs[:nb_frames], bboxes[:nb_frames]
    assert imgs, f"no frames parsed from {paths_in_file}"
    return imgs, bboxes


def read_bbox(path):
    with open(path) as f:
        e = f.readline().split()
    return [int(float(v)) for v in e[1:5]]


def draw_bbox(img, box, color=(0, 255, 0), thickness=2):
    x1, y1, x2, y2 = [int(v) for v in box]
    h, w = img.shape[:2]
    x1, x2 = np.clip([x1, x2], 0, w - 1)
    y1, y2 = np.clip([y1, y2], 0, h - 1)
    for t in range(thickness):
        img[np.clip(y1 + t, 0, h - 1), x1:x2] = color
        img[np.clip(y2 - t, 0, h - 1), x1:x2] = color
        img[y1:y2, np.clip(x1 + t, 0, w - 1)] = color
        img[y1:y2, np.clip(x2 - t, 0, w - 1)] = color
    return img


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True,
                   help="<name>.meta.json of the exported artifact, or the "
                        "checkpoint .pth with --backend live")
    p.add_argument("--backend", default="stablehlo",
                   choices=["stablehlo", "live"])
    p.add_argument("--paths_in_file", required=True,
                   help="'<image> <bbox.txt>' per line")
    p.add_argument("--dataset_root", default="")
    p.add_argument("--dir_out", required=True)
    p.add_argument("--nb_frames", type=int, default=0)
    p.add_argument("--crop_width", type=int, default=0,
                   help="source crop window (default: train config crop)")
    p.add_argument("--label", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--denoise_timesteps", type=int, default=0,
                   help="live backend only; the artifact bakes its count")
    p.add_argument("--fps", "--vid_fps", type=int, default=8)
    p.add_argument("--video_out", default="")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:  # must happen before the first jax import: jax.export
        os.environ.setdefault("JAX_PLATFORMS", "cpu")  # artifacts are
        # platform-bound, so run on the platform they were exported for

    if args.backend == "stablehlo":
        assert args.model_in_file.endswith(".meta.json"), \
            "--backend stablehlo expects the <name>.meta.json sidecar path"
        sess = StablehloSession(args.model_in_file)
    else:
        sess = LiveSession(args.model_in_file, args.cpu,
                           args.denoise_timesteps)

    from joligen_tpu.data.online_creation import crop_image
    imgs, bboxes = load_sequence(args.paths_in_file, args.dataset_root,
                                 args.nb_frames)
    size = sess.size
    nf = max(1, sess.nf)

    # fixed crop window around the first frame's bbox (the reference keeps
    # one window so the autoregressive context stays registered)
    crop_dim = args.crop_width or 0
    if not crop_dim:
        first = load_image_rgb(imgs[0])
        x1, y1, x2, y2 = read_bbox(bboxes[0])
        crop_dim = min(max(2 * max(x2 - x1, y2 - y1), size),
                       min(first.shape[0], first.shape[1]))
    crop_coords = crop_image(imgs[0], bboxes[0], crop_delta=0,
                             crop_center=True, crop_dim=crop_dim,
                             output_dim=size, get_crop_coordinates=True)

    crops, masks, origs, boxes = [], [], [], []
    for ip, bp in zip(imgs, bboxes):
        origs.append(load_image_rgb(ip))
        boxes.append(read_bbox(bp))
        crop, mask, _, _ = crop_image(ip, bp, crop_delta=0, crop_center=True,
                                      crop_dim=crop_dim, output_dim=size,
                                      crop_coordinates=crop_coords)
        crops.append(crop)
        masks.append(mask.astype(np.float32))

    n = len(crops)
    pad = (-n) % nf
    crops += [crops[-1]] * pad
    masks += [masks[-1]] * pad

    generated, prev = [], None
    labels = np.full((1,), args.label, np.int32)
    for ci, start in enumerate(range(0, len(crops), nf)):
        clip = np.stack(crops[start:start + nf])
        cmask = np.stack(masks[start:start + nf])
        if prev is not None:
            clip[0] = prev
            cmask[0] = np.zeros_like(cmask[0])
        gt = clip if sess.nf else clip[0]
        mk = cmask if sess.nf else cmask[0]
        y_cond = gt * (1.0 - np.clip(mk, 0.0, 1.0))
        out = sess.sample(gt[None], mk[None], labels, args.seed + ci,
                          y_cond[None])
        frames = np.asarray(out)[0]
        if frames.ndim == 3:  # image model: one frame per call
            frames = frames[None]
        prev = frames[-1]
        generated.extend(list(frames))
        print(f"clip {ci + 1}/{(len(crops) + nf - 1) // nf} done",
              flush=True)
    generated = generated[:n]

    os.makedirs(args.dir_out, exist_ok=True)
    from PIL import Image
    written = []
    x0, y0 = crop_coords[0], crop_coords[1]
    for i, (g, orig, box) in enumerate(zip(generated, origs, boxes)):
        full = orig.copy()
        cd = min(crop_dim, orig.shape[0] - y0, orig.shape[1] - x0)
        rs = np.asarray(Image.fromarray(to_uint8(g)).resize(
            (cd, cd), Image.BICUBIC), np.uint8)
        full[y0:y0 + cd, x0:x0 + cd] = rs
        draw_bbox(full, box)  # the "progress bbox" overlay
        path = os.path.join(args.dir_out, f"frame_{i:05d}_generated.png")
        save_image_rgb(path, full)
        written.append(full)
    if args.video_out:
        import cv2
        h, w = written[0].shape[:2]
        vw = cv2.VideoWriter(args.video_out,
                             cv2.VideoWriter_fourcc(*"mp4v"), args.fps,
                             (w, h))
        for fr in written:
            vw.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        vw.release()
        print("video written to", args.video_out)
    print(f"generated {len(written)} frames -> {args.dir_out}")


if __name__ == "__main__":
    main()
