"""Conditioning sketch builders (reference util/mask_generation.py:22-272).

Fill the masked region of an image with an edge/sketch representation used
as diffusion conditioning (``alg_diffusion_cond_image_creation=
computed_sketch``). Canny runs on-host via cv2 with randomized thresholds
like the reference; HED/depth/SAM variants require frozen nets whose weights
cannot be downloaded here — they fall back to canny (documented) unless the
weights file is present.
"""

from __future__ import annotations

import random

import numpy as np


def _to_uint8(img):
    """[-1,1] float (H,W,C) -> uint8 (H,W,C)."""
    return ((np.asarray(img) + 1.0) * 127.5).clip(0, 255).astype(np.uint8)


def _from_uint8(img):
    return img.astype(np.float32) / 127.5 - 1.0


def fill_img_with_canny(img, mask, low_threshold=None, high_threshold=None,
                        low_threshold_random=-1, high_threshold_random=-1,
                        select_mask=True, rng=None):
    """Replace masked pixels with the canny edge map (white edges on black),
    reference util/mask_generation.py fill_img_with_canny: random thresholds
    drawn per-call when the *_random bounds are given."""
    import cv2
    rng = rng or random
    max_value = 255 * 3
    if high_threshold is None and low_threshold is None:
        if high_threshold_random != -1 and low_threshold_random != -1:
            high_threshold = rng.randint(low_threshold_random,
                                         high_threshold_random)
            low_threshold = rng.randint(low_threshold_random, high_threshold)
        else:
            high_threshold = max_value
            low_threshold = rng.randint(0, max_value)
    elif high_threshold is None:
        high_threshold = max_value
    elif low_threshold is None:
        low_threshold = 0

    u8 = _to_uint8(img)
    edges = cv2.Canny(u8, low_threshold, high_threshold)
    edges3 = np.repeat(edges[:, :, None], u8.shape[-1], axis=2)
    sketch = _from_uint8(edges3)
    return _compose(img, sketch, mask, select_mask)


def fill_img_with_sketch(img, mask, select_mask=True, **kw):
    """Binary gradient-magnitude sketch (reference fill_img_with_sketch uses
    a pencil-sketch GAN; weights unavailable -> sobel-based sketch)."""
    import cv2
    u8 = cv2.cvtColor(_to_uint8(img), cv2.COLOR_RGB2GRAY) \
        if img.shape[-1] == 3 else _to_uint8(img)[..., 0]
    gx = cv2.Sobel(u8, cv2.CV_32F, 1, 0)
    gy = cv2.Sobel(u8, cv2.CV_32F, 0, 1)
    mag = np.sqrt(gx ** 2 + gy ** 2)
    mag = (mag / (mag.max() + 1e-6) * 255).astype(np.uint8)
    sk = np.repeat(mag[:, :, None], img.shape[-1], axis=2)
    return _compose(img, _from_uint8(sk), mask, select_mask)


def fill_img_with_hed(img, mask, select_mask=True, **kw):
    """HED soft-edge conditioning (reference util/mask_generation.py via
    sketch_generation/hed.py). Runs the flax HED net when
    ``$JOLIGEN_TPU_WEIGHTS_DIR/hed_bsds500.npz`` exists; degrades to canny
    otherwise."""
    from .hed import hed_edges
    u8 = _to_uint8(img)
    if u8.shape[-1] == 1:
        u8 = np.repeat(u8, 3, axis=2)
    edge = hed_edges(u8)
    if edge is None:
        return fill_img_with_canny(img, mask, select_mask=select_mask)
    e3 = np.repeat(edge[:, :, None], img.shape[-1], axis=2)
    return _compose(img, _from_uint8(e3), mask, select_mask)


def fill_img_with_depth(img, mask, select_mask=True, **kw):
    """MiDaS depth conditioning (reference util/mask_generation.py via the
    midas_v21_small net). Runs the flax MidasSmall when
    ``$JOLIGEN_TPU_WEIGHTS_DIR/midas_small.npz`` exists; otherwise falls
    back to blurred luminance as a crude monocular-depth proxy."""
    import cv2
    from .midas import midas_depth
    rgb = _to_uint8(img)
    if rgb.shape[-1] == 1:
        rgb = np.repeat(rgb, 3, axis=2)
    d = midas_depth(rgb)
    if d is None:
        u8 = cv2.cvtColor(_to_uint8(img), cv2.COLOR_RGB2GRAY) \
            if img.shape[-1] == 3 else _to_uint8(img)[..., 0]
        d = cv2.GaussianBlur(u8, (21, 21), 0)
    d3 = np.repeat(d[:, :, None], img.shape[-1], axis=2)
    return _compose(img, _from_uint8(d3), mask, select_mask)


def _compose(img, cond, mask, select_mask):
    img = np.asarray(img, np.float32)
    if not select_mask or mask is None:
        return cond.astype(np.float32)
    m = (np.asarray(mask).astype(np.float32) > 0).astype(np.float32)
    if m.ndim == 2:
        m = m[:, :, None]
    return (img * (1.0 - m) + cond * m).astype(np.float32)


def fill_img_with_hough(img, mask, select_mask=True, **kw):
    """MLSD line-segment conditioning (reference util/mask_generation.py
    via sketch_generation/mlsd.py). Runs the flax MLSD when
    ``$JOLIGEN_TPU_WEIGHTS_DIR/mlsd_large.npz`` exists; cv2 HoughLinesP
    drawn white-on-black otherwise."""
    import cv2
    from .mlsd import mlsd_lines
    rgb = _to_uint8(img)
    if rgb.shape[-1] == 1:
        rgb = np.repeat(rgb, 3, axis=2)
    drawn = mlsd_lines(rgb)
    if drawn is not None:
        c3 = np.repeat(drawn[:, :, None], img.shape[-1], axis=2)
        return _compose(img, _from_uint8(c3), mask, select_mask)
    u8 = cv2.cvtColor(_to_uint8(img), cv2.COLOR_RGB2GRAY) \
        if img.shape[-1] == 3 else _to_uint8(img)[..., 0]
    edges = cv2.Canny(u8, 50, 150)
    lines = cv2.HoughLinesP(edges, 1, np.pi / 180, threshold=20,
                            minLineLength=5, maxLineGap=3)
    canvas = np.zeros_like(u8)
    if lines is not None:
        for x1, y1, x2, y2 in lines[:, 0]:
            cv2.line(canvas, (x1, y1), (x2, y2), 255, 1)
    c3 = np.repeat(canvas[:, :, None], img.shape[-1], axis=2)
    return _compose(img, _from_uint8(c3), mask, select_mask)


def _sam_knobs(opt):
    """Collect the SAM-sketch tuning knobs from whichever prefix the
    config used (reference declares alg_diffusion_sam_* and
    alg_diffusion_cond_sam_*; the palette path reads alg_palette_sam_*)."""
    if opt is None:
        return {}
    def get(stem, default):
        for pre in ("alg_diffusion_cond_sam_", "alg_diffusion_sam_",
                    "alg_palette_sam_"):
            v = getattr(opt, pre + stem, None)
            if v is not None:
                return v
        return default
    return dict(
        crop_delta=int(get("crop_delta", 50) or 0),
        points_per_side=int(get("points_per_side", 16) or 16),
        sample_points_in_ellipse=not bool(
            get("no_sample_points_in_ellipse", False)),
        min_mask_area=float(get("min_mask_area", 0.001) or 0.0),
        max_mask_area=float(get("max_mask_area", 0.99) or 1.0),
        redundancy_threshold=float(get("redundancy_threshold", 0.62)
                                   or 0.62),
        use_sobel_filter=not bool(get("no_sobel_filter", False)),
        sobel_threshold=float(get("sobel_threshold", 0.7) or 0.7),
        output_binary_sam=not bool(get("no_output_binary_sam", False)),
        use_gaussian_filter=bool(get("use_gaussian_filter", False)),
        final_canny=bool(get("final_canny", False)),
    )


def fill_img_with_sam(img, mask, select_mask=True, opt=None, **kw):
    """SAM boundary sketch (reference util/mask_generation.py:179-230):
    crop around the mask bbox with ``sam_crop_delta`` margin, prompt SAM
    with an automatic point grid, filter masks by area/redundancy, and
    draw the surviving boundaries back into the masked region. Falls back
    to a single box prompt when the grid finds nothing, and to the sobel
    sketch when sam_vit.npz is absent."""
    import cv2
    from .sam import predict_sam_edges, predict_sam_mask
    u8 = _to_uint8(img)
    if u8.shape[-1] == 1:
        u8 = np.repeat(u8, 3, axis=2)
    m = np.asarray(mask)[..., 0] if np.asarray(mask).ndim == 3 \
        else np.asarray(mask)
    ys, xs = np.nonzero(m > 0)
    if len(xs):
        box = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    else:
        box = [0, 0, u8.shape[1], u8.shape[0]]

    knobs = _sam_knobs(opt)
    cd = knobs.pop("crop_delta", 50)
    x0 = max(0, box[0] - cd); y0 = max(0, box[1] - cd)
    x1 = min(u8.shape[1], box[2] + cd); y1 = min(u8.shape[0], box[3] + cd)
    edges = None
    if x1 > x0 and y1 > y0:
        crop_edges = predict_sam_edges(u8[y0:y1, x0:x1], **knobs)
        if crop_edges is not None:
            edges = np.zeros(u8.shape[:2], np.uint8)
            edges[y0:y1, x0:x1] = crop_edges
    if edges is None or not edges.any():
        # grid found nothing (or no weights): single box prompt, contours
        sam_masks = predict_sam_mask(u8, np.asarray([box], np.float32),
                                     multimask=True)
        if sam_masks is None:
            return fill_img_with_sketch(img, mask, select_mask=select_mask)
        edges = np.zeros(u8.shape[:2], np.uint8)
        for sm in sam_masks:
            contours, _ = cv2.findContours(sm.astype(np.uint8),
                                           cv2.RETR_LIST,
                                           cv2.CHAIN_APPROX_NONE)
            cv2.drawContours(edges, contours, -1, 255, 1)
    e3 = np.repeat(edges[:, :, None], img.shape[-1], axis=2)
    return _compose(img, _from_uint8(e3), mask, select_mask)


def refine_mask_with_sam(img, mask):
    """Replace a rectangular label mask with the SAM-predicted object mask
    prompted by its bbox (reference data_refined_mask,
    base_diffusion_model.py:265-271 + sam_inference.predict_sam_mask).
    Returns the original mask when weights are absent."""
    from .sam import predict_sam_mask
    m = np.asarray(mask)
    m2d = m[..., 0] if m.ndim == 3 else m
    ys, xs = np.nonzero(m2d > 0)
    if not len(xs):
        return mask
    box = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    u8 = _to_uint8(img)
    if u8.shape[-1] == 1:
        u8 = np.repeat(u8, 3, axis=2)
    sam_masks = predict_sam_mask(u8, np.asarray([box], np.float32))
    if sam_masks is None:
        return mask
    cat = int(m2d.max())
    refined = np.where(sam_masks[0], cat, 0).astype(m.dtype)
    return refined[..., None] if m.ndim == 3 else refined


EDGE_FILLERS = {
    "canny": fill_img_with_canny,
    "sketch": fill_img_with_sketch,
    "hed": fill_img_with_hed,
    "depth": fill_img_with_depth,
    "hough": fill_img_with_hough,
    # SAM sketch needs SAM weights (zero-egress); sobel sketch stands in
    "sam": fill_img_with_sam,
}


def random_edge_mask(fn_list, img, mask, rng=None, opt=None, **kw):
    """Pick one conditioning builder at random (reference random_edge_mask).
    ``opt`` threads the SAM-sketch tuning knobs to fill_img_with_sam."""
    rng = rng or random
    fn = EDGE_FILLERS[rng.choice([f for f in fn_list if f in EDGE_FILLERS])]
    if fn is fill_img_with_canny:
        return fn(img, mask, rng=rng, **kw)
    if fn is fill_img_with_sam:
        return fn(img, mask, opt=opt, **kw)
    return fn(img, mask, **kw)
