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
        crop, mask, ref_bbox, cat, meta = crop_image(
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
            bbox_ref_id=getattr(args, "bbox_ref_id", -1),
            min_crop_bbox_ratio=getattr(args, "min_crop_bbox_ratio", 0) or None,
            return_meta=True,
        )
        # crop window actually used, in full-image coords (reference
        # scripts/gen_single_image_diffusion.py derives this from the crop
        # call itself)
        cx, cy, cdim = meta["x_crop"], meta["y_crop"], meta["crop_size"]
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


def _cond_augment(arr_u8, rotation, persp_horizontal, persp_vertical):
    """Random rotation (expand) + horizontal/vertical perspective warp of
    the exemplar (reference cond_augment,
    scripts/gen_single_image_diffusion.py:239-270)."""
    import cv2
    if rotation:
        from PIL import Image
        ang = random.uniform(-rotation, rotation)
        im = Image.fromarray(arr_u8).rotate(ang, Image.BICUBIC, expand=True)
        bbox = im.getbbox()
        if bbox:   # crop back to content (reference :162)
            im = im.crop(bbox)
        arr_u8 = np.asarray(im)
    h, w = arr_u8.shape[:2]
    start = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    end = start.copy()
    d = h * persp_horizontal * random.random()
    if random.choice([True, False]):
        end[1][1] += d
        end[2][1] -= d
    else:
        end[0][1] += d
        end[3][1] -= d
    d = h * persp_vertical * random.random()
    if random.choice([True, False]):
        end[3][0] += d
        end[2][0] -= d
    else:
        end[0][0] += d
        end[1][0] -= d
    if np.any(start != end):
        m = cv2.getPerspectiveTransform(start, end)
        arr_u8 = cv2.warpPerspective(arr_u8, m, (w, h))
    return arr_u8


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
    if cond_creation in ("computed_sketch", "sketch", "canny", "depth",
                         "hed", "hough", "sam"):
        from joligen_tpu.utils.mask_generation import random_edge_mask
        if cond_creation == "computed_sketch":
            fns = (getattr(opt, "alg_diffusion_cond_computed_sketch_list",
                           None) or ["canny"])
        else:
            fns = [cond_creation]
        kw = {}
        thr = getattr(args, "alg_diffusion_sketch_canny_thresholds", None)
        if thr and len(thr) == 2 and fns == ["canny"]:
            # fixed canny thresholds at inference (reference
            # scripts/gen_single_image_diffusion.py:600-605)
            kw = dict(low_threshold=int(thr[0]), high_threshold=int(thr[1]))
        cond = random_edge_mask(fns, crop, mask, opt=opt, **kw)
    elif cond_creation == "low_res":
        # super-resolution conditioning (reference
        # scripts/gen_single_image_diffusion.py:629-639): optionally
        # downsample by the SR scale first, then upsample back
        from PIL import Image
        size = crop.shape[0]
        cond = crop
        if getattr(args, "alg_diffusion_super_resolution_downsample", False):
            scale = float(getattr(
                opt, "alg_diffusion_super_resolution_scale", 2.0) or 2.0)
            low = max(1, int(size / scale))
            u8 = ((cond + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
            u8 = np.asarray(Image.fromarray(u8).resize((low, low),
                                                       Image.BICUBIC))
            u8 = np.asarray(Image.fromarray(u8).resize((size, size),
                                                       Image.BICUBIC))
            cond = u8.astype(np.float32) / 127.5 - 1.0
    elif cond_creation == "pix2pix":
        cond = crop
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

    if getattr(args, "cond_in", ""):
        # exemplar insertion: paste a conditioning image (sprite) into the
        # mask region, optionally rotated / perspective-warped /
        # aspect-padded (reference scripts/gen_single_image_diffusion.py:
        # 440-500 cond_in + cond_augment)
        sprite = load_image_rgb(args.cond_in)
        sprite = _cond_augment(
            sprite, getattr(args, "cond_rotation", 0.0),
            getattr(args, "cond_persp_horizontal", 0.0),
            getattr(args, "cond_persp_vertical", 0.0))
        ys, xs = np.nonzero(mask[:, :, 0])
        if ys.size:
            x0, y0, x1, y1 = xs.min(), ys.min(), xs.max() + 1, ys.max() + 1
            bw, bh = x1 - x0, y1 - y0
            if getattr(args, "cond_keep_ratio", False) and bh > 0:
                # pad the sprite to the bbox aspect ratio (reference :457-470)
                br = bw / bh
                ch, cw = sprite.shape[:2]
                cr = cw / max(1, ch)
                nw, nh = cw, ch
                if cr < br:
                    nw = round(cw * br / cr)
                elif cr > br:
                    nh = round(ch * cr / br)
                pad = np.zeros((nh, nw, 3), np.uint8)
                ox, oy = (nw - cw) // 2, (nh - ch) // 2
                pad[oy:oy + ch, ox:ox + cw] = sprite
                sprite = pad
            from PIL import Image
            sp = np.asarray(Image.fromarray(sprite).resize(
                (bw, bh), Image.BICUBIC), np.uint8)
            cond = cond.copy()
            region = mask[y0:y1, x0:x1, 0:1] > 0
            cond[y0:y1, x0:x1] = np.where(
                region, sp.astype(np.float32) / 127.5 - 1.0,
                cond[y0:y1, x0:x1])

    outs = []
    for it in range(max(1, args.nb_samples)):
        batch = {"A": cond[None], "B": crop[None],
                 "B_label_mask": mask[None]}
        if getattr(args, "ref_in", ""):
            # ref-image conditioning (reference :274-280 ref_in)
            from PIL import Image
            size = crop.shape[0]
            ref = np.asarray(Image.fromarray(
                load_image_rgb(args.ref_in)).resize((size, size),
                                                    Image.BICUBIC), np.uint8)
            batch["ref_A"] = (ref.astype(np.float32) / 127.5 - 1.0)[None]
        kwargs = {}
        if opt.model_type == "palette":
            if args.sampling_method:
                kwargs["sampling_method"] = args.sampling_method
            if args.sampling_steps > 0:
                kwargs["num_steps"] = args.sampling_steps
            if getattr(args, "alg_diffusion_guidance_scale", 0.0) > 0:
                kwargs["guidance_scale"] = args.alg_diffusion_guidance_scale
        elif opt.model_type in ("sc", "b2b"):
            steps = (args.sampling_steps if args.sampling_steps > 0 else
                     getattr(args, "alg_sc_denoise_inferstep", -1))
            if steps and steps > 0:
                kwargs["denoise_timesteps"] = steps
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
    p.add_argument("--alg_sc_denoise_inferstep", type=int, default=-1,
                   help="shortcut-model inference step count (reference "
                        "inference_diffusion_options.py)")
    p.add_argument("--cond_in", default="",
                   help="exemplar image pasted into the mask region "
                        "(reference inference_diffusion_options.py)")
    p.add_argument("--cond_keep_ratio", action="store_true")
    p.add_argument("--cond_rotation", type=float, default=0.0)
    p.add_argument("--cond_persp_horizontal", type=float, default=0.0)
    p.add_argument("--cond_persp_vertical", type=float, default=0.0)
    p.add_argument("--ref_in", default="",
                   help="reference image for ref-conditioned diffusion")
    p.add_argument("--alg_diffusion_sketch_canny_thresholds", type=int,
                   nargs=2, default=None,
                   help="fixed canny thresholds for sketch conditioning")
    p.add_argument("--alg_diffusion_guidance_scale", type=float, default=0.0,
                   help="classifier-free guidance scale at sampling")
    p.add_argument("--alg_diffusion_super_resolution_downsample",
                   action="store_true",
                   help="downsample the input by the SR scale before "
                        "low_res conditioning")
    p.add_argument("--sampling_method", default="",
                   choices=["", "ddpm", "ddim"])
    p.add_argument("--alg_diffusion_cond_image_creation", default="")
    p.add_argument("--mask_delta", type=int, nargs="*", default=[])
    p.add_argument("--bbox_ref_id", type=int, default=-1,
                   help="bbox id to use (reference inference_diffusion_options.py:124)")
    p.add_argument("--min_crop_bbox_ratio", type=float, default=0,
                   help="minimum crop-to-bbox size ratio "
                        "(reference inference_diffusion_options.py:133)")
    p.add_argument("--crop_width", type=int, default=0)
    p.add_argument("--crop_height", type=int, default=0)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--cpu", action="store_true")
    return p


if __name__ == "__main__":
    inference(build_parser().parse_args())
