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
            cdim = min(getattr(opt, "data_online_creation_crop_size_A", 512),
                       min(orig.shape[0], orig.shape[1]))
            windows.append((crop_coords[0], crop_coords[1], cdim))
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

    generated = []
    prev_frame = None
    for start in range(0, len(crops), nf):
        clip = np.stack(crops[start:start + nf])      # (F,H,W,C)
        cmask = np.stack(masks[start:start + nf])
        cond = np.stack([fill_mask_with_random(c, m, -1)
                         for c, m in zip(clip, cmask)])
        gt = clip.copy()
        if args.autoregressive and prev_frame is not None:
            # clean reference frame: previous clip's last generated frame
            gt[0] = prev_frame
            cond[0] = prev_frame
            cmask[0] = np.zeros_like(cmask[0])
        batch = {"A": cond[None], "B": gt[None], "B_label_mask": cmask[None]}
        kwargs = {}
        if opt.model_type == "palette" and args.sampling_steps > 0:
            kwargs.update(sampling_method="ddim",
                          num_steps=args.sampling_steps)
        elif opt.model_type in ("b2b", "sc") and args.sampling_steps > 0:
            kwargs["denoise_timesteps"] = args.sampling_steps
        fake = model.inference(batch, **kwargs)
        frames = fake[0] if fake.ndim == 5 else fake  # (F,H,W,C)
        prev_frame = frames[-1]
        generated.extend(list(frames))
    generated = generated[:n]

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
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--max_frames", type=int, default=-1)
    p.add_argument("--sampling_steps", type=int, default=-1)
    p.add_argument("--autoregressive", action="store_true")
    p.add_argument("--cpu", action="store_true")
    return p


if __name__ == "__main__":
    inference(build_parser().parse_args())
