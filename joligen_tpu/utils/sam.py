"""Segment-Anything (SAM) in flax: promptable mask prediction from box /
point prompts (reference models/modules/sam/sam_inference.py wraps the
segment_anything + mobile_sam packages for mask refinement, sam-sketch
conditioning and the sam f_s segmenter).

The architecture mirrors ``transformers.SamModel`` exactly (the parity test
instantiates a random tiny HF SamModel and checks bit-level agreement), so
the porter (tools/port_sam_weights.py) can consume either the HF
``facebook/sam-vit-base`` checkpoint or the original ``sam_vit_b`` .pth.

Weights: ``$JOLIGEN_TPU_WEIGHTS_DIR/sam_vit.npz``. Without them SAM-based
features stay gated (callers fall back: canny sketch, bbox-rectangle
masks).
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamConfig:
    # vision encoder (ViT-B defaults)
    image_size: int = 1024
    patch: int = 16
    vis_dim: int = 768
    vis_layers: int = 12
    vis_heads: int = 12
    vis_mlp: int = 3072
    window: int = 14
    global_attn_indexes: tuple = (2, 5, 8, 11)
    out_ch: int = 256           # neck / prompt / decoder hidden
    # mask decoder
    dec_layers: int = 2
    dec_heads: int = 8
    dec_mlp: int = 2048
    dec_downsample: int = 2
    iou_head_depth: int = 3
    iou_head_hidden: int = 256
    num_multimask: int = 3

    @property
    def grid(self):
        return self.image_size // self.patch


# ---------------------------------------------------------------------------
# vision encoder
# ---------------------------------------------------------------------------

def _get_rel_pos(q_size, k_size, rel_pos):
    """Relative position table lookup (modeling_sam.py get_rel_pos)."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(rel_pos, (max_rel_dist, rel_pos.shape[1]),
                                   "linear")
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int32)]


class _VisionAttention(nn.Module):
    cfg: SamConfig
    native_size: int   # table length basis: window size, or native grid

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> same, with decomposed rel-pos bias. Params are
        declared at the checkpoint's native size; _get_rel_pos interpolates
        when running at a different resolution."""
        b, h, w, c = x.shape
        heads = self.cfg.vis_heads
        hd = c // heads
        qkv = nn.Dense(3 * c, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, b * heads, h * w, hd)
        attn = (q * hd ** -0.5) @ k.transpose(0, 2, 1)
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.native_size - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.native_size - 1, hd))
        rph = _get_rel_pos(h, h, rel_h)
        rpw = _get_rel_pos(w, w, rel_w)
        rq = q.reshape(b * heads, h, w, hd)
        bias_h = jnp.einsum("bhwc,hkc->bhwk", rq, rph)
        bias_w = jnp.einsum("bhwc,wkc->bhwk", rq, rpw)
        attn = attn + (bias_h[:, :, :, :, None]
                       + bias_w[:, :, :, None, :]).reshape(
            b * heads, h * w, h * w)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            q.dtype)
        out = (attn @ v).reshape(b, heads, h, w, hd)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
        return nn.Dense(c, name="proj")(out)


class _VisionLayer(nn.Module):
    cfg: SamConfig
    window: int   # 0 = global

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        if self.window:
            ws = self.window
            ph = (ws - h % ws) % ws
            pw = (ws - w % ws) % ws
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            H, W = h + ph, w + pw
            x = x.reshape(b, H // ws, ws, W // ws, ws, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
        x = _VisionAttention(
            self.cfg, self.window if self.window else self.cfg.grid,
            name="attn")(x)
        if self.window:
            x = x.reshape(b, H // ws, W // ws, ws, ws, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, H, W, c)
            x = x[:, :h, :w]
        x = res + x
        y = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        y = nn.Dense(self.cfg.vis_mlp, name="lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, name="lin2")(y)
        return x + y


class _ChannelsLastLN(nn.Module):
    """SamLayerNorm: plain LN over the channel axis, eps 1e-6."""
    @nn.compact
    def __call__(self, x):
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-6)
        return x * self.param("scale", nn.initializers.ones,
                              (x.shape[-1],)) + \
            self.param("bias", nn.initializers.zeros, (x.shape[-1],))


class SamVisionEncoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, x):
        """x: (B, S, S, 3) preprocessed. Returns (B, grid, grid, out_ch)."""
        cfg = self.cfg
        h = nn.Conv(cfg.vis_dim, (cfg.patch, cfg.patch),
                    strides=(cfg.patch, cfg.patch), padding="VALID",
                    name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, cfg.grid, cfg.grid, cfg.vis_dim))
        # native-grid param; resized when running at another resolution
        if pos.shape[1] != h.shape[1]:
            pos = jax.image.resize(
                pos, (1, h.shape[1], h.shape[2], cfg.vis_dim), "bicubic")
        h = h + pos
        for i in range(cfg.vis_layers):
            win = 0 if i in cfg.global_attn_indexes else cfg.window
            h = _VisionLayer(cfg, win, name=f"layer{i}")(h)
        h = nn.Conv(cfg.out_ch, (1, 1), use_bias=False, name="neck_conv1")(h)
        h = _ChannelsLastLN(name="neck_ln1")(h)
        h = nn.Conv(cfg.out_ch, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2")(h)
        h = _ChannelsLastLN(name="neck_ln2")(h)
        return h


# ---------------------------------------------------------------------------
# prompt encoder + mask decoder
# ---------------------------------------------------------------------------

class SamPromptEncoder(nn.Module):
    """Box (and optional point) prompts -> sparse embeddings; dense =
    no-mask embedding (mask prompts unused by the reference's box flow)."""
    cfg: SamConfig

    @nn.compact
    def __call__(self, boxes=None, points=None, labels=None, grid=None,
                 input_size=None):
        cfg = self.cfg
        grid = grid or cfg.grid
        input_size = input_size or cfg.image_size
        table = self.param(
            "pe_table",
            lambda k, s: jax.random.normal(k, s) * (cfg.out_ch // 2),
            (2, cfg.out_ch // 2))

        def _pe(coords):
            """Random-gaussian Fourier features of [0,1] coords
            (SamPositionalEmbedding)."""
            coords = 2 * coords - 1
            coords = (coords @ table) * (2 * np.pi)
            return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)],
                                   axis=-1)
        point_embed = self.param("point_embed", nn.initializers.normal(1.0),
                                 (4, cfg.out_ch))
        not_a_point = self.param("not_a_point", nn.initializers.normal(1.0),
                                 (1, cfg.out_ch))
        no_mask = self.param("no_mask", nn.initializers.normal(1.0),
                             (1, cfg.out_ch))
        sparse = None
        if points is not None:
            pts = (points + 0.5) / input_size
            if boxes is None:  # pad with a not-a-point entry
                pts = jnp.concatenate(
                    [pts, jnp.zeros(pts.shape[:2] + (1, 2), pts.dtype)], 2)
                labels = jnp.concatenate(
                    [labels, -jnp.ones(labels.shape[:2] + (1,),
                                       labels.dtype)], 2)
            emb = _pe(pts)
            emb = jnp.where(labels[..., None] == -1, not_a_point[0], emb)
            emb = jnp.where(labels[..., None] == 0, emb + point_embed[0], emb)
            emb = jnp.where(labels[..., None] == 1, emb + point_embed[1], emb)
            sparse = emb
        if boxes is not None:
            b, nb = boxes.shape[:2]
            corners = (boxes.reshape(b, nb, 2, 2) + 0.5) / input_size
            emb = _pe(corners)
            emb = emb.at[:, :, 0].add(point_embed[2])
            emb = emb.at[:, :, 1].add(point_embed[3])
            sparse = emb if sparse is None else jnp.concatenate(
                [sparse, emb], axis=2)
        dense = jnp.broadcast_to(
            no_mask.reshape(1, 1, 1, cfg.out_ch),
            (sparse.shape[0], grid, grid, cfg.out_ch))
        # image-wide positional embedding of the feature grid (HF
        # get_image_wide_positional_embeddings)
        g = grid
        y = (jnp.arange(g, dtype=jnp.float32) + 0.5)[:, None] / g
        x = (jnp.arange(g, dtype=jnp.float32) + 0.5)[None, :] / g
        coords = jnp.stack([jnp.broadcast_to(x, (g, g)),
                            jnp.broadcast_to(y, (g, g))], axis=-1)
        image_pe = _pe(coords)
        return sparse, dense, image_pe


class _DecAttention(nn.Module):
    cfg: SamConfig
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        """q/k/v: (B, P, T, C)."""
        cfg = self.cfg
        inner = cfg.out_ch // self.downsample
        heads = cfg.dec_heads
        hd = inner // heads
        b, p = q.shape[:2]

        def split(x):
            return x.reshape(b * p, -1, heads, hd).transpose(0, 2, 1, 3)

        qh = split(nn.Dense(inner, name="q_proj")(q))
        kh = split(nn.Dense(inner, name="k_proj")(k))
        vh = split(nn.Dense(inner, name="v_proj")(v))
        attn = jax.nn.softmax(
            (qh * hd ** -0.5 @ kh.transpose(0, 1, 3, 2)).astype(jnp.float32),
            axis=-1).astype(q.dtype)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(b, p, -1, inner)
        return nn.Dense(cfg.out_ch, name="out_proj")(out)


class _TwoWayBlock(nn.Module):
    cfg: SamConfig
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, qpe, kpe):
        cfg = self.cfg
        if self.skip_first_pe:
            queries = _DecAttention(cfg, 1, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + _DecAttention(cfg, 1, name="self_attn")(
                q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-6, name="ln1")(queries)
        q = queries + qpe
        k = keys + kpe
        queries = queries + _DecAttention(
            cfg, cfg.dec_downsample, name="cross_t2i")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-6, name="ln2")(queries)
        y = nn.Dense(cfg.dec_mlp, name="mlp_lin1")(queries)
        y = nn.relu(y)
        queries = queries + nn.Dense(cfg.out_ch, name="mlp_lin2")(y)
        queries = nn.LayerNorm(epsilon=1e-6, name="ln3")(queries)
        q = queries + qpe
        k = keys + kpe
        keys = keys + _DecAttention(
            cfg, cfg.dec_downsample, name="cross_i2t")(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-6, name="ln4")(keys)
        return queries, keys


class _FeedForward(nn.Module):
    hidden: int
    out: int
    depth: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, name="proj_in")(x))
        for i in range(self.depth - 2):
            x = nn.relu(nn.Dense(self.hidden, name=f"layer{i}")(x))
        x = nn.Dense(self.out, name="proj_out")(x)
        return nn.sigmoid(x) if self.sigmoid_output else x


class SamMaskDecoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_emb, image_pe, sparse, dense,
                 multimask_output=True):
        """image_emb: (B,g,g,C); image_pe: (g,g,C); sparse: (B,P,T,C);
        dense: (B,g,g,C). Returns (masks (B,P,M,4g,4g), iou (B,P,M))."""
        cfg = self.cfg
        nm = cfg.num_multimask + 1
        b, g = image_emb.shape[0], image_emb.shape[1]
        p = sparse.shape[1]
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, cfg.out_ch))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (nm, cfg.out_ch))
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None, None],
            (b, p, nm + 1, cfg.out_ch))
        tokens = jnp.concatenate([out_tokens, sparse], axis=2)

        img = (image_emb + dense)
        img = jnp.repeat(img.reshape(b, 1, g * g, cfg.out_ch), p, axis=1)
        kpe = jnp.broadcast_to(image_pe.reshape(1, 1, g * g, cfg.out_ch),
                               (b, p, g * g, cfg.out_ch))
        queries, keys = tokens, img
        for i in range(cfg.dec_layers):
            queries, keys = _TwoWayBlock(cfg, skip_first_pe=(i == 0),
                                         name=f"block{i}")(
                queries, keys, tokens, kpe)
        q = queries + tokens
        k = keys + kpe
        queries = queries + _DecAttention(cfg, cfg.dec_downsample,
                                          name="final_t2i")(q, k, keys)
        # HF layer_norm_final_attn uses torch's default eps (1e-5)
        queries = nn.LayerNorm(epsilon=1e-5, name="ln_final")(queries)

        iou_out = queries[:, :, 0]
        mask_out = queries[:, :, 1:1 + nm]

        up = keys.reshape(b * p, g, g, cfg.out_ch)
        up = nn.ConvTranspose(cfg.out_ch // 4, (2, 2), strides=(2, 2),
                              name="upscale_conv1")(up)
        up = nn.gelu(_ChannelsLastLN(name="upscale_ln")(up),
                     approximate=False)
        up = nn.gelu(nn.ConvTranspose(cfg.out_ch // 8, (2, 2),
                                      strides=(2, 2),
                                      name="upscale_conv2")(up),
                     approximate=False)
        hyper = jnp.stack(
            [_FeedForward(cfg.out_ch, cfg.out_ch // 8, 3,
                          name=f"hyper{i}")(mask_out[:, :, i])
             for i in range(nm)], axis=2)        # (b,p,nm,c/8)
        up = up.reshape(b, p, 4 * g * 4 * g, cfg.out_ch // 8)
        masks = jnp.einsum("bpmc,bpsc->bpms", hyper, up)
        masks = masks.reshape(b, p, nm, 4 * g, 4 * g)
        iou = _FeedForward(cfg.iou_head_hidden, nm, cfg.iou_head_depth,
                           name="iou_head")(iou_out)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, :, sl], iou[:, :, sl]


class SamModel(nn.Module):
    cfg: SamConfig = SamConfig()

    @nn.compact
    def __call__(self, pixel_values, input_boxes=None, input_points=None,
                 input_labels=None, multimask_output=True):
        """pixel_values: (B,S,S,3) preprocessed; input_boxes: (B,nb,4) in
        pixel coords of the SxS frame. Returns (low_res_masks, iou_pred)."""
        img = SamVisionEncoder(self.cfg, name="vision_encoder")(pixel_values)
        sparse, dense, image_pe = SamPromptEncoder(
            self.cfg, name="prompt_encoder")(
            boxes=input_boxes, points=input_points, labels=input_labels,
            grid=img.shape[1], input_size=pixel_values.shape[1])
        return SamMaskDecoder(self.cfg, name="mask_decoder")(
            img, image_pe, sparse, dense, multimask_output)


# ---------------------------------------------------------------------------
# weights + host API
# ---------------------------------------------------------------------------

SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SamSegmenter(nn.Module):
    """f_s_net=sam: frozen SAM as the semantic segmenter (reference
    base_model.py:1522-1560 replaces the label mask with predict_sam of the
    image, prompted by the ref bbox or the full frame). Returns 2-class
    logits (background, object) at input resolution; fully stop_gradient'd.

    run_size trades accuracy for step cost: the ViT runs at run_size^2
    instead of the 1024^2 SAM pretraining resolution (pos embeddings are
    resized, rel-pos tables interpolated)."""
    cfg: SamConfig
    run_size: int = 256

    @nn.compact
    def __call__(self, x, boxes=None):
        n, h, w, c = x.shape
        if c == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        img = (jnp.clip(x.astype(jnp.float32), -1, 1) + 1.0) * 127.5
        img = (img - SAM_MEAN) / SAM_STD
        s = self.run_size
        if (h, w) != (s, s):
            img = jax.image.resize(img, (n, s, s, 3), "bilinear")
        if boxes is None:
            boxes = jnp.tile(jnp.asarray([[0.0, 0.0, s, s]]), (n, 1, 1))
        else:
            boxes = boxes.reshape(n, -1, 4) * (s / jnp.asarray(
                [w, h, w, h], jnp.float32))
        masks, _ = SamModel(self.cfg, name="sam")(
            img, input_boxes=boxes, multimask_output=False)
        m = jax.lax.stop_gradient(masks[:, 0, 0])      # (n, s/4, s/4)
        m = jax.image.resize(m, (n, h, w), "bilinear")
        return jnp.stack([-m, m], axis=-1)             # 2-class logits


def sam_weights_path():
    wd = os.environ.get("JOLIGEN_TPU_WEIGHTS_DIR", "")
    path = os.path.join(wd, "sam_vit.npz")
    return path if (wd and os.path.exists(path)) else None


def load_sam_params(npz_path):
    """npz contract: flat '/'-joined flax param paths plus optional cfg_*
    scalars, exactly as produced by tools/port_sam_weights.py (validated
    against transformers.SamModel in tests). Returns (params, SamConfig)."""
    z = np.load(npz_path)
    tree = {}
    for key in z.files:
        if key.startswith("cfg_"):
            continue
        node = tree
        parts = key.split("/")
        for pt in parts[:-1]:
            node = node.setdefault(pt, {})
        node[parts[-1]] = jnp.asarray(z[key])
    if "cfg_vis_dim" in z.files:
        cfg = SamConfig(
            image_size=int(z["cfg_image_size"]), patch=int(z["cfg_patch"]),
            vis_dim=int(z["cfg_vis_dim"]),
            vis_layers=int(z["cfg_vis_layers"]),
            vis_heads=int(z["cfg_vis_heads"]),
            vis_mlp=int(z["cfg_vis_mlp"]), window=int(z["cfg_window"]),
            global_attn_indexes=tuple(int(i) for i in z["cfg_global_idx"]),
            out_ch=int(z["cfg_out_ch"]), dec_mlp=int(z["cfg_dec_mlp"]),
            dec_heads=int(z["cfg_dec_heads"]),
            iou_head_hidden=int(z["cfg_iou_hidden"]))
    else:
        cfg = SamConfig()
    return {"params": tree}, cfg


_CACHED = None


def predict_sam_mask(img_rgb_u8, boxes_xyxy, multimask=False):
    """Host API mirroring reference predict_sam (sam_inference.py): uint8
    RGB (H,W,3) + boxes (N,4) in image pixels -> bool masks (N,H,W).
    Returns None when sam_vit.npz is absent."""
    global _CACHED
    path = sam_weights_path()
    if path is None:
        return None
    from PIL import Image
    if _CACHED is None:
        params, cfg = load_sam_params(path)
        net = SamModel(cfg)
        fns = {mm: jax.jit(lambda p, xx, bb, mm=mm: net.apply(
            p, xx, input_boxes=bb, multimask_output=mm))
            for mm in (False, True)}
        _CACHED = (net, params, fns)
    net, params, fns = _CACHED
    h, w = img_rgb_u8.shape[:2]
    size = net.cfg.image_size
    x = np.asarray(Image.fromarray(img_rgb_u8).resize(
        (size, size), Image.BILINEAR), np.float32)
    x = (x - SAM_MEAN) / SAM_STD
    boxes = np.asarray(boxes_xyxy, np.float32).reshape(1, -1, 4)
    boxes = boxes * np.array([size / w, size / h, size / w, size / h],
                             np.float32)
    masks, iou = fns[bool(multimask)](params, jnp.asarray(x[None]),
                                      jnp.asarray(boxes))
    masks = np.asarray(masks)[0]          # (nb, M, 256, 256)
    iou = np.asarray(iou)[0]
    best = iou.argmax(axis=1) if multimask else np.zeros(
        masks.shape[0], np.int64)
    out = []
    for i in range(masks.shape[0]):
        m = masks[i, best[i]]
        m = np.asarray(Image.fromarray(
            (m > 0).astype(np.uint8) * 255).resize((w, h), Image.NEAREST))
        out.append(m > 0)
    return np.stack(out) if out else None


def predict_sam_edges(img_rgb_u8, points_per_side=16,
                      sample_points_in_ellipse=True, min_mask_area=0.001,
                      max_mask_area=0.99, redundancy_threshold=0.62,
                      use_sobel_filter=True, sobel_threshold=0.7,
                      output_binary_sam=False, use_gaussian_filter=False,
                      final_canny=False):
    """Automatic-grid SAM edge sketch (reference
    sam_inference.predict_sam_edges used by fill_img_with_sam,
    util/mask_generation.py:179-230): prompt SAM with a points_per_side
    grid (optionally restricted to the inscribed ellipse), filter masks by
    area and IoU redundancy, and draw the surviving masks' boundaries
    (sobel of the soft union or binary contours), with optional gaussian
    smoothing and a final canny pass. Returns a uint8 edge map (H, W) or
    None when sam_vit.npz is absent."""
    import cv2
    global _CACHED
    path = sam_weights_path()
    if path is None:
        return None
    from PIL import Image
    if _CACHED is None:
        params, cfg = load_sam_params(path)
        net = SamModel(cfg)
        fns = {mm: jax.jit(lambda p, xx, bb, mm=mm: net.apply(
            p, xx, input_boxes=bb, multimask_output=mm))
            for mm in (False, True)}
        _CACHED = (net, params, fns)
    net, params, fns = _CACHED
    if "points" not in fns:
        # cached like the box fns — a fresh @jax.jit closure per call would
        # re-trace the whole ViT every image
        fns["points"] = jax.jit(lambda p, xx, pp, ll: net.apply(
            p, xx, input_points=pp, input_labels=ll, multimask_output=True))
    h, w = img_rgb_u8.shape[:2]
    size = net.cfg.image_size
    x = np.asarray(Image.fromarray(img_rgb_u8).resize(
        (size, size), Image.BILINEAR), np.float32)
    x = (x - SAM_MEAN) / SAM_STD

    # point-prompt grid in model coordinates
    n = max(2, int(points_per_side))
    lin = (np.arange(n) + 0.5) / n
    gx, gy = np.meshgrid(lin, lin)
    pts = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    if sample_points_in_ellipse:
        keep = ((pts[:, 0] - 0.5) ** 2 + (pts[:, 1] - 0.5) ** 2) <= 0.25
        pts = pts[keep]
    pts_model = (pts * size).astype(np.float32)

    points = jnp.asarray(pts_model.reshape(1, -1, 1, 2))
    labels = jnp.ones((1, pts_model.shape[0], 1), jnp.int32)
    masks, iou = fns["points"](params, jnp.asarray(x[None]), points, labels)
    masks = np.asarray(masks)[0]          # (np, 3, 256, 256)
    iou = np.asarray(iou)[0]              # (np, 3)

    # best mask per point, filtered by predicted IoU and area bounds
    cand = []
    total = masks.shape[-1] * masks.shape[-2]
    for i in range(masks.shape[0]):
        j = int(iou[i].argmax())
        if iou[i, j] < 0.7:
            continue
        m = masks[i, j] > 0
        area = m.mean()
        if area < min_mask_area or area > max_mask_area:
            continue
        cand.append((float(iou[i, j]), m))
    cand.sort(key=lambda t: -t[0])
    kept = []
    for score, m in cand:
        dup = False
        for km in kept:
            inter = np.logical_and(m, km).sum()
            union = np.logical_or(m, km).sum()
            if union and inter / union > redundancy_threshold:
                dup = True
                break
        if not dup:
            kept.append(m)

    edge = np.zeros(masks.shape[-2:], np.float32)
    for m in kept:
        mf = m.astype(np.float32)
        if use_sobel_filter and not output_binary_sam:
            gxv = cv2.Sobel(mf, cv2.CV_32F, 1, 0, ksize=3)
            gyv = cv2.Sobel(mf, cv2.CV_32F, 0, 1, ksize=3)
            g = np.sqrt(gxv ** 2 + gyv ** 2)
            edge = np.maximum(edge, (g > sobel_threshold).astype(np.float32))
        else:
            contours, _ = cv2.findContours(m.astype(np.uint8),
                                           cv2.RETR_LIST,
                                           cv2.CHAIN_APPROX_NONE)
            cv2.drawContours(edge, contours, -1, 1.0, 1)
    edge_u8 = (edge * 255).astype(np.uint8)
    if use_gaussian_filter:
        edge_u8 = cv2.GaussianBlur(edge_u8, (3, 3), 0)
    if final_canny:
        edge_u8 = cv2.Canny(edge_u8, 100, 200)
    edge_u8 = np.asarray(Image.fromarray(edge_u8).resize(
        (w, h), Image.NEAREST))
    return edge_u8
