"""Video diffusion inference, including autoregressive chunked generation
(reference scripts/gen_vid_diffusion.py + gen_vid_autoregressive_*).

Reads an ordered frame directory (or paths file) with per-frame bbox .txt
files, crops every frame with the SAME window (frame-0 coordinates, like the
temporal datasets), batches them into ``data_temporal_number_frames``-long
clips, and samples each clip with the video model. With ``--autoregressive``
each subsequent clip reuses the last generated frame as a clean reference
frame (t=1 semantics come from the model's GT-frame training). Generated
crops are pasted back into the original frames and written as PNGs + an
optional mp4.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import (load_image_rgb, load_model_from_file,  # noqa: E402
                    save_image_rgb, to_m1p1, to_uint8)


def list_frames(args):
    if args.paths_file:
        with open(args.paths_file) as f:
            pairs = [line.split() for line in f.read().splitlines() if line]
        imgs = [p[0] for p in pairs]
        bboxes = [p[1] if len(p) > 1 else "" for p in pairs]
        root = args.data_prefix or os.path.dirname(args.paths_file)
        imgs = [os.path.join(root, p) for p in imgs]
        bboxes = [os.path.join(root, p) if p else "" for p in bboxes]
        return imgs, bboxes
    d = args.dir_in
    imgs = sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.lower().endswith((".png", ".jpg", ".jpeg")))
    bboxes = [os.path.splitext(p)[0] + ".txt" for p in imgs]
    bboxes = [b if os.path.exists(b) else "" for b in bboxes]
    return imgs, bboxes


def inference(args):
    model, opt = load_model_from_file(args.model_in_file, cpu=args.cpu)
    from joligen_tpu.data.online_creation import crop_image
    from joligen_tpu.data.transforms import fill_mask_with_random

    imgs, bboxes = list_frames(args)
    if args.max_frames > 0:
        imgs, bboxes = imgs[: args.max_frames], bboxes[: args.max_frames]
    assert imgs, "no input frames found"
    backward = getattr(args, "direction", "forward") == "backward"
    if backward:  # generate the reversed sequence, un-reverse on output
        imgs, bboxes = imgs[::-1], bboxes[::-1]
    if getattr(args, "seed", -1) is not None and getattr(args, "seed", -1) >= 0:
        np.random.seed(args.seed)
        import jax
        model.rng = jax.random.PRNGKey(args.seed)
    nf = int(getattr(opt, "data_temporal_number_frames", 4) or 4)
    size = opt.data_crop_size

    # fixed crop window from frame 0
    crop_coords = None
    crops, masks, origs, windows = [], [], [], []
    for ip, bp in zip(imgs, bboxes):
        orig = load_image_rgb(ip)
        origs.append(orig)
        if bp:
            if crop_coords is None:
                crop_coords = crop_image(
                    ip, bp, crop_delta=0, crop_center=True,
                    crop_dim=getattr(opt, "data_online_creation_crop_size_A",
                                     512),
                    output_dim=size, get_crop_coordinates=True)
            crop, mask, _, _ = crop_image(
                ip, bp, crop_delta=0, crop_center=True,
                crop_dim=getattr(opt, "data_online_creation_crop_size_A", 512),
                output_dim=size, crop_coordinates=crop_coords)
            windows.append((crop_coords[0], crop_coords[1], crop_coords[2]))
        else:
            from PIL import Image
            crop = to_m1p1(np.asarray(Image.fromarray(orig).resize(
                (size, size), Image.BICUBIC), np.uint8))
            mask = np.ones((size, size, 1), np.int32)
            windows.append((0, 0, max(orig.shape[:2])))
        crops.append(crop)
        masks.append(mask)

    # pad the tail so every clip is full length (static shapes under jit)
    n = len(crops)
    pad = (-n) % nf
    crops += [crops[-1]] * pad
    masks += [masks[-1]] * pad

    def make_cond(crop, mask):
        if getattr(args, "cond_canny", False):
            from joligen_tpu.utils.mask_generation import \
                fill_img_with_canny
            return fill_img_with_canny(crop, mask)
        return fill_mask_with_random(crop, mask, -1)

    k_ctx = max(0, min(int(getattr(args, "context_frames", 1) or 1),
                       nf - 1))
    sigma = float(getattr(args, "context_noise_sigma", 0.0) or 0.0)
    cls_progress = list(getattr(args, "cls_progress", []) or [])
    base_cls = int(getattr(args, "cls", -1))

    generated = []
    prev_frames = None  # last k_ctx generated frames
    for ci, start in enumerate(range(0, len(crops), nf)):
        clip = np.stack(crops[start:start + nf])      # (F,H,W,C)
        cmask = np.stack(masks[start:start + nf])
        cond = np.stack([make_cond(c, m)
                         for c, m in zip(clip, cmask)])
        gt = clip.copy()
        if args.autoregressive and prev_frames is not None:
            # context frames: previous clip's trailing generated frames,
            # optionally re-noised inside the mask to match the noisy-GT
            # context the model trained on (palette_model autoregressive)
            for j, pf in enumerate(prev_frames):
                ctx = pf
                if sigma > 0:
                    m = (cmask[j] > 0.5).astype(np.float32)
                    ctx = ctx + sigma * np.random.randn(
                        *ctx.shape).astype(np.float32) * m
                gt[j] = pf
                cond[j] = ctx
                cmask[j] = np.zeros_like(cmask[j])
        batch = {"A": cond[None], "B": gt[None], "B_label_mask": cmask[None]}
        label = cls_progress[min(ci, len(cls_progress) - 1)] \
            if cls_progress else base_cls
        if label >= 0:
            batch["B_label_cls"] = np.asarray([label], np.int32)
        kwargs = {}
        if opt.model_type == "palette" and args.sampling_steps > 0:
            kwargs.update(sampling_method="ddim",
                          num_steps=args.sampling_steps)
        elif opt.model_type in ("b2b", "sc") and args.sampling_steps > 0:
            kwargs["denoise_timesteps"] = args.sampling_steps
        fake = model.inference(batch, **kwargs)
        frames = fake[0] if fake.ndim == 5 else fake  # (F,H,W,C)
        prev_frames = list(frames[-k_ctx:]) if k_ctx else None
        generated.extend(list(frames))
    generated = generated[:n]
    if backward:
        generated = generated[::-1]
        origs = origs[::-1]
        windows = windows[::-1]

    os.makedirs(args.dir_out, exist_ok=True)
    written = []
    from PIL import Image
    for i, (g, orig, win) in enumerate(zip(generated, origs, windows)):
        u8 = to_uint8(g)
        x0, y0, cdim = win
        full = orig.copy()
        rs = np.asarray(Image.fromarray(u8).resize((cdim, cdim),
                                                   Image.BICUBIC), np.uint8)
        full[y0:y0 + cdim, x0:x0 + cdim] = rs[: orig.shape[0] - y0,
                                              : orig.shape[1] - x0]
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
    print(f"Successfully generated {len(written)} frames -> {args.dir_out}")
    return written


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True)
    p.add_argument("--dir_in", default="")
    p.add_argument("--paths_file", default="")
    p.add_argument("--data_prefix", default="")
    p.add_argument("--dir_out", default=".")
    p.add_argument("--video_out", default="")
    p.add_argument("--fps", "--vid_fps", type=int, default=25)
    p.add_argument("--max_frames", type=int, default=-1)
    p.add_argument("--sampling_steps", type=int, default=-1)
    p.add_argument("--autoregressive", action="store_true")
    p.add_argument("--direction", default="forward",
                   choices=["forward", "backward"],
                   help="backward generates the reversed sequence "
                        "(reference gen_vid_autoregressive_..._backward_*)")
    p.add_argument("--context_frames", type=int, default=1,
                   help="generated frames carried into the next clip as "
                        "clean context (reference streaming seq_half)")
    p.add_argument("--context_noise_sigma", type=float, default=0.0,
                   help="gaussian noise added to context frames inside the "
                        "mask — matches the noisy-GT-context training "
                        "distribution (sigma buckets up to 0.7, reference "
                        "palette_model.py:377-411)")
    p.add_argument("--cond_canny", action="store_true",
                   help="condition on per-frame canny sketches "
                        "(reference ..._withCanny_* variants)")
    p.add_argument("--cls", type=int, default=-1,
                   help="class label for conditioned checkpoints; "
                        "progresses per clip with --cls_progress")
    p.add_argument("--cls_progress", type=int, nargs="*", default=[],
                   help="per-clip class labels (reference "
                        "..._online_progress_cls variant)")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--cpu", action="store_true")
    return p


if __name__ == "__main__":
    inference(build_parser().parse_args())
