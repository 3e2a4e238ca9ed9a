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


def test_pad_custom_vjp_matches_autodiff():
    """resnet_generator._pad carries a hand-written transpose (perf: the
    jnp.pad(reflect) autodiff transpose emitted ~19 unfused ops per
    ResnetBlock). The fold-back math must match plain autodiff exactly."""
    import jax
    import jax.numpy as jnp

    from joligen_tpu.models.modules.resnet_generator import _pad

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 9, 3), jnp.float32)
    ct = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 9, 3), jnp.float32)
    modes = {"reflect": "reflect", "replicate": "edge", "zeros": "constant"}
    for p in (1, 3):
        for mode, jmode in modes.items():
            ref_fn = lambda y: jnp.sum(
                jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)), mode=jmode)
                * jnp.pad(ct, ((0, 0), (p, p), (p, p), (0, 0))))
            got_fn = lambda y: jnp.sum(
                _pad(y, p, mode)
                * jnp.pad(ct, ((0, 0), (p, p), (p, p), (0, 0))))
            ref = jax.grad(ref_fn)(x)
            got = jax.grad(got_fn)(x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"p={p} mode={mode}")


def test_fused_group_norm_film_act_matches_unfused():
    """ops/fused_norm.group_norm_film_act carries a residual-minimal custom
    VJP (saves only x + per-group stats). Value AND all gradients must match
    the open-coded flax-style path it replaced in unet_mha (reference chain:
    unet_generator_attn.py GroupNorm -> scale-shift -> SiLU)."""
    import jax
    import jax.numpy as jnp

    from joligen_tpu.ops.fused_norm import group_norm_film_act

    def unfused(x, gamma, beta, scale, shift, groups, act):
        b = x.shape[0]
        c = x.shape[-1]
        xr = x.reshape(b, -1, groups, c // groups).astype(jnp.float32)
        mean = xr.mean(axis=(1, 3), keepdims=True)
        var = ((xr - mean) ** 2).mean(axis=(1, 3), keepdims=True)
        y = (xr - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y.reshape(x.shape)
        if gamma is not None:
            y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        y = y.astype(x.dtype)
        if scale is not None:
            sc = scale.reshape((b,) + (1,) * (x.ndim - 2) + (c,))
            sh = shift.reshape((b,) + (1,) * (x.ndim - 2) + (c,))
            y = y * (1 + sc.astype(x.dtype)) + sh.astype(x.dtype)
        if act == "silu":
            y = jax.nn.silu(y)
        elif act == "relu":
            y = jax.nn.relu(y)
        return y

    key = jax.random.PRNGKey(0)
    # bf16 tolerance is accumulation noise: reduced grads (dgamma/dbeta) sum
    # ~60 bf16-rounded products, and the two paths round in different orders.
    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 6e-2)):
        for affine in (True, False):
            for film in (True, False):
                for act in (None, "silu", "relu"):
                    ks = jax.random.split(key, 6)
                    x = jax.random.normal(ks[0], (2, 6, 5, 8), dtype)
                    gamma = (1 + 0.1 * jax.random.normal(ks[1], (8,))
                             if affine else None)
                    beta = (0.1 * jax.random.normal(ks[2], (8,))
                            if affine else None)
                    scale = (0.1 * jax.random.normal(ks[3], (2, 1, 1, 8),
                                                     dtype) if film else None)
                    shift = (0.1 * jax.random.normal(ks[4], (2, 1, 1, 8),
                                                     dtype) if film else None)
                    ct = jax.random.normal(ks[5], x.shape, dtype)
                    args = (x, gamma, beta, scale, shift)
                    diff = [i for i, a in enumerate(args) if a is not None]

                    def loss_fused(*da):
                        full = list(args)
                        for i, v in zip(diff, da):
                            full[i] = v
                        return jnp.sum(
                            group_norm_film_act(*full, groups=4, act=act)
                            .astype(jnp.float32) * ct.astype(jnp.float32))

                    def loss_ref(*da):
                        full = list(args)
                        for i, v in zip(diff, da):
                            full[i] = v
                        return jnp.sum(
                            unfused(*full, groups=4, act=act or "none")
                            .astype(jnp.float32) * ct.astype(jnp.float32))

                    da = [args[i] for i in diff]
                    v1, g1 = jax.value_and_grad(loss_fused, range(len(da)))(*da)
                    v2, g2 = jax.value_and_grad(loss_ref, range(len(da)))(*da)
                    tag = f"dtype={dtype.__name__} aff={affine} film={film} act={act}"
                    np.testing.assert_allclose(float(v1), float(v2),
                                               rtol=tol, err_msg=tag)
                    for a, b_ in zip(g1, g2):
                        np.testing.assert_allclose(
                            np.asarray(a, np.float32),
                            np.asarray(b_, np.float32),
                            rtol=tol, atol=tol, err_msg=tag)
