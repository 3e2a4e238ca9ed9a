"""Diffusion single-image inference with crop / conditioning / paste-back
parity (reference scripts/gen_single_image_diffusion.py:819 inference).

Pipeline: load checkpoint dir -> crop around the bbox/mask exactly like
training (data/online_creation.crop_image) -> build the conditioning image
(random-noise fill or computed sketch) -> run the sampler -> resize the
generated crop and paste it back into the full-resolution input.

Outputs ``<name>_orig.png``, ``<name>_cond.png``, ``<name>_generated.png``,
``<name>_generated_crop.png``, ``<name>_y_t.png``, ``<name>_mask.png``
(same contract as the reference script).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import (load_image_rgb, load_model_from_file,  # noqa: E402
                    save_image_rgb, to_m1p1, to_uint8)


def build_inputs(args, opt):
    """Returns (full_img_uint8, crop [-1,1], mask (H,W,1) int32,
    bbox_select [x1,y1,x2,y2] in full-image coords)."""
    from joligen_tpu.data.online_creation import crop_image

    img = load_image_rgb(args.img_in)
    H, W = img.shape[:2]
    size = opt.data_crop_size

    if args.bbox_in:
        crop, mask, ref_bbox, cat = crop_image(
            args.img_in, args.bbox_in,
            mask_delta=[args.mask_delta] if args.mask_delta else
            getattr(opt, "data_online_creation_mask_delta_A", [[]]),
            crop_delta=0, crop_center=True,
            mask_square=getattr(opt, "data_online_creation_mask_square_A",
                                False),
            crop_dim=(args.crop_width or
                      getattr(opt, "data_online_creation_crop_size_A", 512)),
            output_dim=size,
            context_pixels=getattr(opt, "data_online_context_pixels", 0),
        )
        with open(args.bbox_in) as f:
            elts = f.readline().split()
        x1, y1, x2, y2 = [int(float(v)) for v in elts[1:5]]
        # crop window actually used (centered, clipped) in full-image coords
        cdim = max(min((args.crop_width or
                        getattr(opt, "data_online_creation_crop_size_A", 512)),
                       min(W, H)), x2 - x1, y2 - y1)
        cx = int(np.clip((x1 + x2) / 2 - cdim / 2, 0, W - cdim))
        cy = int(np.clip((y1 + y2) / 2 - cdim / 2, 0, H - cdim))
        bbox_select = [cx, cy, cx + cdim, cy + cdim]
        return img, crop, mask, bbox_select

    # whole-image mode with a mask file
    from PIL import Image
    pil = Image.fromarray(img).resize((size, size), Image.BICUBIC)
    crop = to_m1p1(np.asarray(pil, np.uint8))
    if args.mask_in:
        m = Image.open(args.mask_in).convert("L").resize((size, size),
                                                         Image.NEAREST)
        mask = (np.asarray(m) > 0).astype(np.int32)[:, :, None]
    else:
        mask = np.ones((size, size, 1), np.int32)
    return img, crop, mask, [0, 0, W, H]


def inference(args, lmodel=None, lopt=None):
    """Run one generation; ``lmodel``/``lopt`` allow callers (the video
    scripts) to reuse a loaded model across frames, mirroring the reference
    generate() lmodel/lopt threading (scripts/gen_single_image_diffusion.py:
    167-236). Returns (full_frame_uint8, model, opt)."""
    if lmodel is not None:
        model, opt = lmodel, lopt
    else:
        model, opt = load_model_from_file(args.model_in_file, cpu=args.cpu)
    if args.seed >= 0:
        random.seed(args.seed)
        np.random.seed(args.seed)
        import jax
        model.rng = jax.random.PRNGKey(args.seed)

    img, crop, mask, bbox_select = build_inputs(args, opt)

    cond_creation = (args.alg_diffusion_cond_image_creation or
                     getattr(opt, "alg_diffusion_cond_image_creation", "y_t"))
    if cond_creation == "computed_sketch":
        from joligen_tpu.utils.mask_generation import random_edge_mask
        fns = (getattr(opt, "alg_diffusion_cond_computed_sketch_list", None)
               or ["canny"])
        cond = random_edge_mask(fns, crop, mask)
    elif cond_creation == "previous_frame":
        # reference scripts/gen_single_image_diffusion.py:562-578 — condition
        # on the previous frame cropped to the same window; all -1 when none.
        prev = getattr(args, "previous_frame", None)
        size = crop.shape[0]
        if prev is not None:
            if isinstance(prev, str):
                prev = load_image_rgb(prev)
            x1, y1, x2, y2 = bbox_select
            prev = prev[y1:y2, x1:x2]
            from PIL import Image
            prev = np.asarray(Image.fromarray(prev).resize(
                (size, size), Image.BICUBIC), np.uint8)
            cond = to_m1p1(prev)
        else:
            cond = -np.ones_like(crop)
    else:  # y_t: randomize the masked region
        from joligen_tpu.data.transforms import fill_mask_with_random
        cond = fill_mask_with_random(crop, mask, -1)

    outs = []
    for it in range(max(1, args.nb_samples)):
        batch = {"A": cond[None], "B": crop[None],
                 "B_label_mask": mask[None]}
        kwargs = {}
        if opt.model_type == "palette":
            if args.sampling_method:
                kwargs["sampling_method"] = args.sampling_method
            if args.sampling_steps > 0:
                kwargs["num_steps"] = args.sampling_steps
        elif opt.model_type in ("sc", "b2b") and args.sampling_steps > 0:
            kwargs["denoise_timesteps"] = args.sampling_steps
        fake = model.inference(batch, **kwargs)
        outs.append(fake[0])

    name = args.name or os.path.splitext(os.path.basename(args.img_in))[0]
    os.makedirs(args.dir_out, exist_ok=True)
    from PIL import Image
    last_full = img
    for it, out in enumerate(outs):
        suffix = f"_{it}" if len(outs) > 1 else ""
        out_u8 = to_uint8(out)
        # paste the generated crop back into the original image
        x1, y1, x2, y2 = bbox_select
        resized = np.asarray(Image.fromarray(out_u8).resize(
            (min(img.shape[1], x2 - x1), min(img.shape[0], y2 - y1)),
            Image.BICUBIC), np.uint8)
        full = img.copy()
        full[y1:y1 + resized.shape[0], x1:x1 + resized.shape[1]] = resized
        last_full = full
        save_image_rgb(os.path.join(args.dir_out,
                                    f"{name}{suffix}_generated.png"), full)
        save_image_rgb(os.path.join(args.dir_out,
                                    f"{name}{suffix}_generated_crop.png"),
                       out_u8)
    save_image_rgb(os.path.join(args.dir_out, f"{name}_orig.png"), img)
    save_image_rgb(os.path.join(args.dir_out, f"{name}_cond.png"),
                   to_uint8(cond))
    save_image_rgb(os.path.join(args.dir_out, f"{name}_y_t.png"),
                   to_uint8(crop))
    save_image_rgb(os.path.join(args.dir_out, f"{name}_mask.png"),
                   (mask[:, :, 0] > 0).astype(np.uint8) * 255)
    if args.bbox_in:
        with open(os.path.join(args.dir_out, f"{name}_orig_bbox.json"),
                  "w") as f:
            json.dump(bbox_select, f)
    print("Successfully generated image", name)
    return last_full, model, opt


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True)
    p.add_argument("--img_in", required=True)
    p.add_argument("--mask_in", default="")
    p.add_argument("--bbox_in", default="")
    p.add_argument("--dir_out", default=".")
    p.add_argument("--name", default="")
    p.add_argument("--nb_samples", type=int, default=1)
    p.add_argument("--sampling_steps", type=int, default=-1)
    p.add_argument("--sampling_method", default="",
                   choices=["", "ddpm", "ddim"])
    p.add_argument("--alg_diffusion_cond_image_creation", default="")
    p.add_argument("--mask_delta", type=int, nargs="*", default=[])
    p.add_argument("--crop_width", type=int, default=0)
    p.add_argument("--crop_height", type=int, default=0)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--cpu", action="store_true")
    return p


if __name__ == "__main__":
    inference(build_parser().parse_args())
