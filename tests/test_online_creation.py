"""Crop-engine unit tests mirroring the reference's
tests/test_online_creation_fixed_mask.py plus coverage for the bbox
selection/broadening/meta features (reference data/online_creation.py)."""

import random

import numpy as np
import pytest
from PIL import Image

from joligen_tpu.data.online_creation import _broaden_rect, crop_image


def _write_sample(tmp_path, bbox_lines, size=(256, 256), name="image"):
    img_path = tmp_path / f"{name}.png"
    bbox_path = tmp_path / f"{name}.txt"
    Image.new("RGB", size, color=(127, 127, 127)).save(img_path)
    bbox_path.write_text(bbox_lines)
    return str(img_path), str(bbox_path)


def _mask_bbox(mask):
    ys, xs = np.nonzero(mask[:, :, 0])
    assert ys.size, "empty mask"
    return xs.min(), ys.min(), xs.max() + 1, ys.max() + 1


def test_fixed_model_mask_exact_square_with_crop_coordinates(tmp_path):
    """fixed_mask_size_model forces an exact square side in model pixels
    (reference online_creation.py:1253-1283 and its fixed-mask test)."""
    img_path, bbox_path = _write_sample(tmp_path, "1 96 96 116 116\n")
    common = dict(
        mask_random_offset=[0.0], mask_delta=[[]], crop_delta=0,
        mask_square=False, crop_dim=128, output_dim=128, context_pixels=0,
        load_size=[], crop_center=True, fixed_mask_size_model=64,
    )
    coords = crop_image(img_path, bbox_path, get_crop_coordinates=True,
                        **common)
    assert len(coords) == 3 and coords[2] == 128
    crop, mask, _, _ = crop_image(img_path, bbox_path,
                                  crop_coordinates=coords, **common)
    x1, y1, x2, y2 = _mask_bbox(mask)
    assert (x2 - x1, y2 - y1) == (64, 64)
    assert crop.shape == (128, 128, 3)


def test_fixed_model_mask_respects_min_border(tmp_path):
    """The fixed square is clamped to leave fixed_mask_min_unmasked_border
    model pixels on every side, even for a bbox at the image corner."""
    img_path, bbox_path = _write_sample(tmp_path, "1 0 0 30 30\n")
    _, mask, _, _ = crop_image(
        img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
        crop_delta=0, mask_square=False, crop_dim=128, output_dim=64,
        context_pixels=0, load_size=[], crop_center=True,
        fixed_mask_size_model=60, fixed_mask_min_unmasked_border_model=6,
    )
    x1, y1, x2, y2 = _mask_bbox(mask)
    assert (x2 - x1) == (y2 - y1) == 64 - 2 * 6
    assert x1 >= 6 and y1 >= 6 and x2 <= 64 - 6 and y2 <= 64 - 6


def test_model_border_enlarges_crop_when_bbox_fills_it(tmp_path):
    """Border-only mode (fixed size <= 0): the crop grows so the mask
    leaves >= border unmasked model pixels (online_creation.py:1084-1097)."""
    img_path, bbox_path = _write_sample(tmp_path, "1 40 40 168 168\n")
    _, mask, _, _ = crop_image(
        img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
        crop_delta=0, mask_square=False, crop_dim=128, output_dim=64,
        context_pixels=0, load_size=[], crop_center=True,
        fixed_mask_min_unmasked_border_model=4,
    )
    x1, y1, x2, y2 = _mask_bbox(mask)
    assert x1 >= 4 and y1 >= 4 and x2 <= 64 - 4 and y2 <= 64 - 4


def test_multi_bbox_rasterization_keeps_all_categories(tmp_path):
    img_path, bbox_path = _write_sample(
        tmp_path, "1 10 10 40 40\n2 80 80 120 120\n")
    _, mask, _, cat = crop_image(
        img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
        crop_delta=0, mask_square=False, crop_dim=256, output_dim=256,
        context_pixels=0, load_size=[], crop_center=True,
        rng=random.Random(0),
    )
    vals = set(np.unique(mask)) - {0}
    assert vals == {1, 2}
    assert cat in (1, 2)


def test_single_bbox_and_bbox_ref_id_restrict_mask(tmp_path):
    img_path, bbox_path = _write_sample(
        tmp_path, "1 10 10 40 40\n2 80 80 120 120\n")
    _, mask, _, cat = crop_image(
        img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
        crop_delta=0, mask_square=False, crop_dim=256, output_dim=256,
        context_pixels=0, load_size=[], crop_center=True, bbox_ref_id=1,
    )
    assert set(np.unique(mask)) - {0} == {2} and cat == 2
    _, mask, _, cat = crop_image(
        img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
        crop_delta=0, mask_square=False, crop_dim=256, output_dim=256,
        context_pixels=0, load_size=[], crop_center=True, single_bbox=True,
        rng=random.Random(3),
    )
    assert len(set(np.unique(mask)) - {0}) == 1


def test_random_bbox_without_label_file(tmp_path):
    img_path = tmp_path / "img.png"
    Image.new("RGB", (128, 128), color=(10, 10, 10)).save(img_path)
    np.random.seed(0)
    crop, mask, ref_bbox, cat = crop_image(
        str(img_path), None, mask_random_offset=[0.0], mask_delta=[[]],
        crop_delta=0, mask_square=False, crop_dim=64, output_dim=64,
        context_pixels=0, load_size=[], crop_center=True, random_bbox=True,
    )
    assert crop.shape == (64, 64, 3) and cat == 1


def test_crop_size_jitter_within_bounds(tmp_path):
    img_path, bbox_path = _write_sample(tmp_path, "1 96 96 116 116\n")
    sizes = set()
    for seed in range(12):
        coords = crop_image(
            img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
            crop_delta=20, mask_square=False, crop_dim=128, output_dim=128,
            context_pixels=0, load_size=[], get_crop_coordinates=True,
            rng=random.Random(seed),
        )
        assert 108 <= coords[2] <= 148
        sizes.add(coords[2])
    assert len(sizes) > 1, "crop size never jittered"


def test_min_crop_bbox_ratio_enlarges_crop(tmp_path):
    img_path, bbox_path = _write_sample(tmp_path, "1 96 96 136 136\n")
    coords = crop_image(
        img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
        crop_delta=0, mask_square=False, crop_dim=64, output_dim=64,
        context_pixels=0, load_size=[], get_crop_coordinates=True,
        crop_center=True, min_crop_bbox_ratio=4.0,
    )
    assert coords[2] == 160  # 40px bbox * 4.0


def test_load_size_keep_ratio_scales_params(tmp_path):
    img_path, bbox_path = _write_sample(
        tmp_path, "1 200 200 280 280\n", size=(512, 256))
    crop, mask, _, _ = crop_image(
        img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
        crop_delta=0, mask_square=False, crop_dim=256, output_dim=64,
        context_pixels=0, load_size=[256], load_size_keep_ratio=True,
        crop_center=True, return_meta=False,
    )
    assert crop.shape == (64, 64, 3)
    # aspect preserved: long side 512 -> 256 means crop_dim scaled to 128,
    # which still fits the (shorter) 128px image side
    _, _, _, _, meta = crop_image(
        img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
        crop_delta=0, mask_square=False, crop_dim=256, output_dim=64,
        context_pixels=0, load_size=[256], load_size_keep_ratio=True,
        crop_center=True, return_meta=True,
    )
    assert meta["loaded_width"] == 256 and meta["loaded_height"] == 128
    assert meta["crop_size"] == 128


def test_return_meta_maps_original_bbox(tmp_path):
    img_path, bbox_path = _write_sample(tmp_path, "1 96 96 116 116\n")
    _, mask, _, _, meta = crop_image(
        img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[5, 5]],
        crop_delta=0, mask_square=False, crop_dim=128, output_dim=128,
        context_pixels=0, load_size=[], crop_center=True, return_meta=True,
    )
    pb = meta["processed_bboxes"][0]
    assert (pb["original_xmin"], pb["original_ymin"],
            pb["original_xmax"], pb["original_ymax"]) == (96, 96, 116, 116)
    # the delta-expanded bbox in crop coords matches the rasterized mask
    scale = 128 / meta["crop_size"]
    x1 = round((pb["xmin"] - meta["x_crop"]) * scale)
    y1 = round((pb["ymin"] - meta["y_crop"]) * scale)
    mx1, my1, mx2, my2 = _mask_bbox(mask)
    assert abs(mx1 - x1) <= 1 and abs(my1 - y1) <= 1
    assert (mx2 - mx1) == (my2 - my1) == round(30 * scale)


def test_broaden_rect_always_contains_source_bbox():
    rng = random.Random(0)
    for _ in range(200):
        x1, y1 = rng.uniform(0, 100), rng.uniform(0, 100)
        x2, y2 = x1 + rng.uniform(1, 60), y1 + rng.uniform(1, 60)
        nx1, ny1, nx2, ny2 = _broaden_rect(x1, y1, x2, y2, 200, 200, rng)
        assert nx1 <= x1 and ny1 <= y1 and nx2 >= x2 and ny2 >= y2
        assert nx1 >= 0 and ny1 >= 0 and nx2 <= 200 and ny2 <= 200


def test_broaden_rect_aug_through_crop_image(tmp_path):
    img_path, bbox_path = _write_sample(tmp_path, "1 96 96 116 116\n")
    grew = False
    for seed in range(8):
        _, mask, _, _ = crop_image(
            img_path, bbox_path, mask_random_offset=[0.0], mask_delta=[[]],
            crop_delta=0, mask_square=False, crop_dim=128, output_dim=128,
            context_pixels=0, load_size=[], crop_center=True,
            broaden_rect_aug=True, rng=random.Random(seed),
        )
        x1, y1, x2, y2 = _mask_bbox(mask)
        assert (x2 - x1) >= 19 and (y2 - y1) >= 19  # never shrinks
        grew = grew or (x2 - x1) > 21 or (y2 - y1) > 21
    assert grew, "broaden_rect_aug never broadened in 8 draws"


def test_register_tokens_jit_param_shape():
    """JiT register tokens (reference tests/test_vit_register_tokens.py):
    off by default, parameter (1, N, hidden) when enabled, output shape
    unchanged."""
    import jax
    import jax.numpy as jnp

    from joligen_tpu.models.modules.jit import JiT

    kw = dict(patch_size=8, hidden_size=32, depth=2, num_heads=2,
              out_channels=3)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,))
    net0 = JiT(**kw, num_register_tokens=0)
    v0 = net0.init(jax.random.PRNGKey(0), x, t)
    flat0 = jax.tree_util.tree_leaves_with_path(v0)
    assert not any("register_tokens" in jax.tree_util.keystr(p)
                   for p, _ in flat0)

    # reference semantics (vit.py:459-476): registers are inserted at
    # block ``in_context_start`` — with depth <= in_context_start the
    # insertion never happens and no parameter materializes
    net_never = JiT(**kw, num_register_tokens=3)   # default ics=4 > depth 2
    v_never = net_never.init(jax.random.PRNGKey(0), x, t)
    assert not any("register_tokens" in jax.tree_util.keystr(p)
                   for p, _ in jax.tree_util.tree_leaves_with_path(v_never))

    net3 = JiT(**kw, num_register_tokens=3, in_context_start=0,
               in_context_len=0)
    v3 = net3.init(jax.random.PRNGKey(0), x, t)
    reg = [l for p, l in jax.tree_util.tree_leaves_with_path(v3)
           if "register_tokens" in jax.tree_util.keystr(p)]
    assert len(reg) == 1 and reg[0].shape == (1, 3, 32)
    y = net3.apply(v3, x, t)
    assert y.shape == (1, 16, 16, 3)


def test_image_bits_16_normalization(tmp_path):
    """data_image_bits>8 keeps depth through loading + normalization
    (reference data/utils.py:4-14, base_dataset.py:513-523)."""
    from types import SimpleNamespace

    from joligen_tpu.data.transforms import PairedTransform, load_image

    arr = np.zeros((32, 32), dtype=np.uint16)
    arr[:16] = 65535
    arr[16:] = 0
    path = str(tmp_path / "img16.png")
    Image.fromarray(arr).save(path)

    img = load_image(path, img_bits=16)
    assert np.asarray(img).max() == 65535, "16-bit depth lost at load"

    opt = SimpleNamespace(data_load_size=32, data_crop_size=32,
                          data_preprocess="resize_and_crop",
                          data_image_bits=16)
    tr = PairedTransform(opt, phase="test")
    out = tr.image(img, tr.sample_params())
    assert out.shape == (32, 32, 1)
    assert out.max() == pytest.approx(1.0, abs=1e-3)
    assert out.min() == pytest.approx(-1.0, abs=1e-3)

    # 12-bit data in a 16-bit container scales by 2**12-1
    arr12 = np.full((32, 32), 4095, dtype=np.uint16)
    path12 = str(tmp_path / "img12.png")
    Image.fromarray(arr12).save(path12)
    opt.data_image_bits = 12
    tr12 = PairedTransform(opt, phase="test")
    out12 = tr12.image(load_image(path12, img_bits=12), tr12.sample_params())
    assert out12.max() == pytest.approx(1.0, abs=1e-3)
