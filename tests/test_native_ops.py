"""Native C++ host-pipeline kernels: build, bind, match numpy semantics."""

import numpy as np


def test_native_builds_and_matches():
    from joligen_tpu.data.native import (fill_mask_with_random, get_lib,
                                         normalize_u8, stack_f32)
    lib = get_lib()
    assert lib is not None, "g++ is in the image; native build must succeed"

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (17, 13, 3), np.uint8)
    np.testing.assert_allclose(normalize_u8(u8),
                               u8.astype(np.float32) / 127.5 - 1.0,
                               atol=1e-6)

    arrs = [rng.randn(5, 4, 3).astype(np.float32) for _ in range(4)]
    np.testing.assert_array_equal(stack_f32(arrs), np.stack(arrs))

    img = rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32)
    mask = np.zeros((8, 8, 1), np.int32)
    mask[2:5, 2:5] = 1
    out = fill_mask_with_random(img, mask, seed=7)
    sel = mask[..., 0] > 0
    assert (out[~sel] == img[~sel]).all()
    assert (out[sel] != img[sel]).any()
    assert out[sel].min() >= -1.0 and out[sel].max() <= 1.0
    # determinism for a fixed seed
    out2 = fill_mask_with_random(img, mask, seed=7)
    np.testing.assert_array_equal(out, out2)


def test_loader_uses_native_stack():
    from joligen_tpu.data.loader import collate
    rng = np.random.RandomState(1)
    samples = [{"A": rng.randn(4, 4, 3).astype(np.float32),
                "idx": i} for i in range(3)]
    batch = collate(samples)
    assert batch["A"].shape == (3, 4, 4, 3)
    np.testing.assert_array_equal(batch["A"],
                                  np.stack([s["A"] for s in samples]))
