"""Frame-by-frame video generation with the single-image diffusion path
(reference scripts/gen_video_diffusion.py:1-150).

Reads a paths.txt-style file (``image label`` per line, label = bbox .txt or
mask image), natural-sorts the frames, runs gen_single_image_diffusion per
frame with the model kept loaded, and writes the pasted full frames to a
video. ``--cond`` controls previous-frame conditioning for
``alg_diffusion_cond_image_creation=previous_frame`` checkpoints:
``previous`` = real previous frame, ``generated`` = previously generated
frame (autoregressive), ``zero`` = unconditioned.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_single_image_diffusion import build_parser, inference  # noqa: E402


def natural_keys(text):
    return [int(c) if c.isdigit() else c for c in re.split(r"(\d+)", text)]


def main():
    p = build_parser()
    p.add_argument("--dataroot", required=True,
                   help="paths file: '<image> <bbox.txt|mask.png>' per line")
    p.add_argument("--data_prefix", default="",
                   help="prefix joined to every path in --dataroot")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--nb_img_max", type=int, default=10000)
    p.add_argument("--sv_frames", action="store_true",
                   help="also keep the per-frame pngs")
    p.add_argument("--cond", default="zero",
                   choices=["previous", "zero", "generated"])
    p.add_argument("--start_frame", type=int, default=-1)
    p.add_argument("--video_out", default="")
    # --img_in is supplied per frame from --dataroot
    for a in p._actions:
        if a.dest == "img_in":
            a.required = False
    args = p.parse_args()

    with open(args.dataroot) as f:
        lines = [ln.split() for ln in f.read().splitlines() if ln.strip()]
    images = sorted((ln[0] for ln in lines if len(ln) >= 2),
                    key=natural_keys)
    labels = sorted((ln[1] for ln in lines if len(ln) >= 2),
                    key=natural_keys)
    if args.start_frame > 0:
        images, labels = images[args.start_frame:], labels[args.start_frame:]
    images, labels = images[:args.nb_img_max], labels[:args.nb_img_max]
    if not images:
        raise SystemExit(f"no frames parsed from {args.dataroot}")

    real_name = args.name or "video"
    os.makedirs(args.dir_out, exist_ok=True)
    video_out = args.video_out or os.path.join(
        args.dir_out, real_name + "_generated_video.mp4")

    frames = []
    lmodel = lopt = None
    args.previous_frame = None
    width = len(str(len(images)))
    for i, (image, label) in enumerate(zip(images, labels)):
        args.img_in = args.data_prefix + image
        args.bbox_in = args.data_prefix + label if label.endswith(".txt") \
            else ""
        args.mask_in = "" if args.bbox_in else args.data_prefix + label
        args.name = f"{real_name}_{str(i).zfill(width)}"
        frame, lmodel, lopt = inference(args, lmodel=lmodel, lopt=lopt)
        frames.append(frame)

        if args.cond == "previous":
            args.previous_frame = args.data_prefix + image
        elif args.cond == "generated":
            args.previous_frame = frame
        print(f"frame {i + 1}/{len(images)} done", flush=True)

    import cv2
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(video_out, cv2.VideoWriter_fourcc(*"mp4v"),
                         args.fps, (w, h))
    for fr in frames:
        vw.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
    vw.release()
    if not args.sv_frames:
        for i in range(len(frames)):
            stem = os.path.join(args.dir_out,
                                f"{real_name}_{str(i).zfill(width)}")
            for suffix in ("_generated", "_generated_crop", "_orig", "_cond",
                           "_y_t", "_mask"):
                fp = stem + suffix + ".png"
                if os.path.exists(fp):
                    os.remove(fp)
    print("video written to", video_out)


if __name__ == "__main__":
    main()
