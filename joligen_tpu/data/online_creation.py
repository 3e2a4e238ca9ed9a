"""Online bbox-crop engine: build (crop, mask) training samples around
annotated objects at load time.

Behavioral rebuild of reference data/online_creation.py:259-1364
(crop_image) — the heart of object insertion/removal: read a bbox .txt
(lines ``cat x1 y1 x2 y2``), pick a bbox, expand it by mask_delta (pixels or
ratio), jitter it by mask_random_offset, optionally square it, crop a
``crop_dim`` window around it with ``crop_delta`` jitter plus
``context_pixels`` margin, resize to ``output_dim``, and emit the synchronized
label mask. All of this is ragged host-side work; the device sees only the
fixed (output_dim, output_dim) result.
"""

from __future__ import annotations

import math
import random

import numpy as np
from PIL import Image

from .transforms import load_image


def rotation_enabled(opt):
    """Pre-crop rotation gate (reference online_creation.py:128-134)."""
    return (
        not getattr(opt, "dataaug_no_rotate", False)
        and bool(getattr(opt, "data_online_creation_rotate_before_crop", False))
        and float(getattr(opt, "data_online_creation_rotate_max_angle", 0.0)) > 0.0
        and "online" in getattr(opt, "data_dataset_mode", "")
    )


def sample_rotation_state(opt, rng=None):
    """One rotation draw per sample (shared across all frames of a clip);
    reference online_creation.py:137-146."""
    if not rotation_enabled(opt):
        return None
    rng = rng or random
    max_angle = float(getattr(opt, "data_online_creation_rotate_max_angle", 0.0))
    return {
        "angle": rng.uniform(-max_angle, max_angle),
        "rebox_mask_after_rotation": bool(
            getattr(opt, "data_online_creation_rotate_rebox_mask_after_rotation",
                    False)
        ),
    }


def _rotate_bboxes_expand(bboxes, width, height, angle):
    """Axis-aligned bounds of each bbox's four corners after rotating the
    image by ``angle`` (PIL CCW) with expand=True. Matches the reference's
    corner math (online_creation.py:149-195): the point transform uses
    -angle because image y points down."""
    a = math.radians(-angle)
    cos_a, sin_a = math.cos(a), math.sin(a)
    cx, cy = width / 2.0, height / 2.0
    # bounds of the rotated image frame (for the expand offset)
    corners = np.array([(0, 0), (width, 0), (width, height), (0, height)],
                       dtype=np.float64) - (cx, cy)
    rot = corners @ np.array([[cos_a, sin_a], [-sin_a, cos_a]])
    min_x, min_y = rot[:, 0].min(), rot[:, 1].min()
    out = np.empty_like(bboxes)
    for i, (x1, y1, x2, y2) in enumerate(bboxes):
        pts = np.array([(x1, y1), (x2, y1), (x2, y2), (x1, y2)],
                       dtype=np.float64) - (cx, cy)
        r = pts @ np.array([[cos_a, sin_a], [-sin_a, cos_a]])
        out[i] = [math.floor(r[:, 0].min() - min_x),
                  math.floor(r[:, 1].min() - min_y),
                  math.ceil(r[:, 0].max() - min_x),
                  math.ceil(r[:, 1].max() - min_y)]
    return out


def read_bbox_file(bbox_path):
    """Lines: 'cat x1 y1 x2 y2' (absolute pixels)."""
    cats, bboxes = [], []
    with open(bbox_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5:
                continue
            cats.append(int(float(parts[0])))
            bboxes.append([float(v) for v in parts[1:5]])
    if not bboxes:
        raise ValueError(f"no valid bbox line in {bbox_path}")
    return cats, np.asarray(bboxes, dtype=np.float64)


def _delta_for_cat(mask_delta, cat):
    """mask_delta is a list-per-category of [dx(,dy)] pixel paddings
    (reference common_options: data_online_creation_mask_delta_A)."""
    if not mask_delta:
        return 0.0, 0.0
    entry = mask_delta[min(max(cat - 1, 0), len(mask_delta) - 1)]
    if not entry:
        return 0.0, 0.0
    dx = float(entry[0])
    dy = float(entry[1]) if len(entry) > 1 else dx
    return dx, dy


def crop_image(
    img_path,
    bbox_path,
    mask_delta=((),),
    mask_random_offset=(0.0,),
    crop_delta=50,
    mask_square=False,
    crop_dim=512,
    output_dim=256,
    context_pixels=0,
    load_size=(),
    select_cat=-1,
    fixed_mask_size=-1,
    inverted_mask=False,
    single_bbox=False,
    override_class=-1,
    get_crop_coordinates=False,
    crop_coordinates=None,
    crop_center=False,
    mask_delta_ratio=((),),
    rng=None,
    rotation_state=None,
):
    """Returns (crop float32 (D,D,C) in [-1,1], mask int32 (D,D,1),
    ref_bbox [x1,y1,x2,y2] in crop coords, category int)."""
    rng = rng or random
    img = load_image(img_path)
    cats, bboxes = read_bbox_file(bbox_path)

    if load_size:
        tw = int(load_size[0])
        th = int(load_size[1]) if len(load_size) > 1 else tw
        sx, sy = tw / img.size[0], th / img.size[1]
        img = img.resize((tw, th), Image.BICUBIC)
        bboxes = bboxes * np.array([sx, sy, sx, sy])

    # ---- optional pre-crop rotation with bbox reboxing (reference
    # online_creation.py:616-723): rotate the full frame with expand=True,
    # rebox every bbox to the axis-aligned bounds of its rotated corners,
    # and reject crop windows that would include expand-fill pixels.
    valid_arr = None
    angle = float(rotation_state.get("angle", 0.0)) if rotation_state else 0.0
    if abs(angle) > 1e-6:
        src_w, src_h = img.size
        fill = 0 if img.mode == "L" else tuple([0] * len(img.getbands()))
        img = img.rotate(angle, Image.BICUBIC, expand=True, fillcolor=fill)
        valid = Image.new("L", (src_w, src_h), 255).rotate(
            angle, Image.NEAREST, expand=True, fillcolor=0)
        valid_arr = np.asarray(valid, dtype=np.uint8) > 0
        bboxes = _rotate_bboxes_expand(bboxes, src_w, src_h, angle)
        if not rotation_state.get("rebox_mask_after_rotation", False):
            bboxes = bboxes + np.array([-2.0, -2.0, 2.0, 2.0])  # bbox_pad
        bboxes = np.clip(
            bboxes,
            0,
            np.array([img.size[0], img.size[1], img.size[0], img.size[1]],
                     dtype=np.float64))

    W, H = img.size

    # ---- bbox selection
    idx_all = list(range(len(cats)))
    if select_cat != -1:
        idx_all = [i for i in idx_all if cats[i] == select_cat]
        if not idx_all:
            raise ValueError(f"no bbox of category {select_cat} in {bbox_path}")
    chosen = idx_all[0] if (single_bbox or len(idx_all) == 1) else rng.choice(idx_all)
    cat = cats[chosen] if override_class == -1 else override_class
    x1, y1, x2, y2 = bboxes[chosen]

    # ---- mask-level geometry: delta expansion, random offset, squaring
    dx, dy = _delta_for_cat([list(m) for m in mask_delta], cats[chosen])
    rdx, rdy = _delta_for_cat([list(m) for m in mask_delta_ratio], cats[chosen]) \
        if any(len(m) for m in mask_delta_ratio) else (0.0, 0.0)
    if rdx or rdy:
        dx += rdx * (x2 - x1)
        dy += rdy * (y2 - y1)
    x1, x2 = x1 - dx, x2 + dx
    y1, y2 = y1 - dy, y2 + dy

    off = list(mask_random_offset) or [0.0]
    ox = float(off[0]); oy = float(off[1]) if len(off) > 1 else ox
    if ox > 0:
        jit = (rng.random() * 2 - 1) * ox * (x2 - x1)
        x1, x2 = x1 + jit, x2 + jit
    if oy > 0:
        jit = (rng.random() * 2 - 1) * oy * (y2 - y1)
        y1, y2 = y1 + jit, y2 + jit

    if mask_square:
        side = max(x2 - x1, y2 - y1)
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        x1, x2 = cx - side / 2, cx + side / 2
        y1, y2 = cy - side / 2, cy + side / 2

    if fixed_mask_size > 0:
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        x1, x2 = cx - fixed_mask_size / 2, cx + fixed_mask_size / 2
        y1, y2 = cy - fixed_mask_size / 2, cy + fixed_mask_size / 2

    x1 = max(0.0, x1); y1 = max(0.0, y1)
    x2 = min(float(W), x2); y2 = min(float(H), y2)

    # ---- crop window around the mask
    eff_crop = min(crop_dim, min(W, H))
    bw, bh = x2 - x1, y2 - y1
    # crop must contain the (expanded) bbox
    eff_crop = int(max(eff_crop, bw + 2 * context_pixels, bh + 2 * context_pixels))
    eff_crop = min(eff_crop, min(W, H))

    def _window_valid(wx0, wy0):
        """No expand-fill pixels inside the crop+context window (reference
        online_creation.py:730-746 validate_crop_has_valid_source)."""
        if valid_arr is None:
            return True
        vx0, vy0 = wx0 - context_pixels, wy0 - context_pixels
        vx1, vy1 = wx0 + eff_crop + context_pixels, wy0 + eff_crop + context_pixels
        if vx0 < 0 or vy0 < 0 or vx1 > W or vy1 > H:
            return False
        region = valid_arr[vy0:vy1, vx0:vx1]
        return region.size > 0 and bool(np.all(region))

    def _sample_window(jitter):
        cx_center = (x1 + x2) / 2
        cy_center = (y1 + y2) / 2
        wx0 = cx_center - eff_crop / 2
        wy0 = cy_center - eff_crop / 2
        if jitter and not crop_center and crop_delta > 0:
            wx0 += rng.randint(-crop_delta, crop_delta)
            wy0 += rng.randint(-crop_delta, crop_delta)
        wx0 = int(np.clip(wx0, 0, W - eff_crop))
        wy0 = int(np.clip(wy0, 0, H - eff_crop))
        # keep bbox inside the crop
        wx0 = int(np.clip(wx0, x2 + context_pixels - eff_crop, x1 - context_pixels))
        wy0 = int(np.clip(wy0, y2 + context_pixels - eff_crop, y1 - context_pixels))
        wx0 = int(np.clip(wx0, 0, W - eff_crop))
        wy0 = int(np.clip(wy0, 0, H - eff_crop))
        return wx0, wy0

    if crop_coordinates is not None:
        cx0, cy0 = crop_coordinates
    else:
        cx0, cy0 = _sample_window(jitter=True)
        if not _window_valid(cx0, cy0):
            for _ in range(9):  # re-jitter, then fall back to centered
                cx0, cy0 = _sample_window(jitter=True)
                if _window_valid(cx0, cy0):
                    break
            else:
                cx0, cy0 = _sample_window(jitter=False)
                if not _window_valid(cx0, cy0):
                    # reference raises here too; dataset catches -> sample skipped
                    raise ValueError(
                        f"rotated crop contains fill pixels for {img_path}")

    if get_crop_coordinates:
        return (cx0, cy0)

    crop = img.crop((cx0, cy0, cx0 + eff_crop, cy0 + eff_crop))

    # ---- mask in crop coordinates
    mask = np.zeros((eff_crop, eff_crop), dtype=np.int32)
    mx1 = int(np.clip(x1 - cx0, 0, eff_crop))
    my1 = int(np.clip(y1 - cy0, 0, eff_crop))
    mx2 = int(np.clip(x2 - cx0, 0, eff_crop))
    my2 = int(np.clip(y2 - cy0, 0, eff_crop))
    mask[my1:my2, mx1:mx2] = int(cat)
    if inverted_mask:
        mask = np.where(mask > 0, 0, 1).astype(np.int32)

    # ---- resize to model size
    out_total = output_dim + 2 * context_pixels
    scale = out_total / eff_crop
    crop = crop.resize((out_total, out_total), Image.BICUBIC)
    mask_img = Image.fromarray(mask.astype(np.uint8) if mask.max() < 256
                               else mask.astype(np.int32), mode=None)
    mask_img = Image.fromarray(mask.astype(np.uint8))
    mask_img = mask_img.resize((out_total, out_total), Image.NEAREST)
    mask = np.asarray(mask_img, dtype=np.int32)[:, :, None]

    arr = np.asarray(crop, dtype=np.float32) / 127.5 - 1.0
    if arr.ndim == 2:
        arr = arr[:, :, None]

    ref_bbox = np.asarray(
        [mx1 * scale, my1 * scale, mx2 * scale, my2 * scale], dtype=np.float32)
    return arr, mask, ref_bbox, int(cat)


def sanitize_paths(img_paths, bbox_paths, root=None, max_check=None, verbose=False):
    """Drop samples whose image/bbox files are unreadable
    (reference online_creation.py:1405-1488)."""
    import os
    good_imgs, good_bboxes = [], []
    for i, (ip, bp) in enumerate(zip(img_paths, bbox_paths)):
        if max_check is not None and i >= max_check:
            good_imgs.extend(img_paths[i:])
            good_bboxes.extend(bbox_paths[i:])
            break
        rip = os.path.join(root, ip) if root else ip
        rbp = os.path.join(root, bp) if root else bp
        try:
            with Image.open(rip) as im:
                im.verify()
            read_bbox_file(rbp)
        except Exception as e:
            if verbose:
                print(f"sanitize: dropping {ip}: {e}")
            continue
        good_imgs.append(ip)
        good_bboxes.append(bp)
    return good_imgs, good_bboxes
