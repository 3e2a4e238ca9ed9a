"""Model export (reference util/export.py + base_model.py:870-938).

The reference exports ONNX and TorchScript traces of GAN generators. The
TPU-native equivalents are:

- **StableHLO**: ``jax.export`` serializes the jitted forward to portable
  StableHLO bytes (``.stablehlo`` file) — the contract-compatible
  replacement for the ONNX artifact (runnable by any StableHLO consumer,
  incl. IREE/XLA on other hardware).
- **TF SavedModel** via jax2tf when tensorflow is present (gated — TF is not
  in this image).
- **params msgpack**: the raw weights, always written.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def export_stablehlo(apply_fn, params, example_input, out_path):
    """Serialize jit(apply_fn)(params, x) at the example shapes to
    StableHLO. Returns out_path."""
    from jax import export as jexport

    fn = jax.jit(lambda x: apply_fn(params, x))
    exported = jexport.export(fn)(
        jax.ShapeDtypeStruct(example_input.shape, example_input.dtype))
    data = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path


def export_savedmodel(apply_fn, params, example_input, out_dir):
    """jax2tf SavedModel export; gated on tensorflow presence."""
    try:
        import tensorflow as tf  # noqa: F401
        from jax.experimental import jax2tf
    except ImportError as e:
        raise RuntimeError(
            "tensorflow is not available in this image; use the StableHLO "
            "artifact instead") from e
    f = jax2tf.convert(lambda x: apply_fn(params, x))
    mod = tf.Module()
    mod.f = tf.function(
        f, input_signature=[tf.TensorSpec(example_input.shape,
                                          example_input.dtype.name)])
    tf.saved_model.save(mod, out_dir)
    return out_dir


def export_generator(model, net_name="G_A", out_dir=None, size=None,
                     in_channels=3, use_ema=True):
    """Export a trained generator's forward in all available formats
    (contract analog of reference export_networks, base_model.py:870-938)."""
    out_dir = out_dir or model.save_dir
    os.makedirs(out_dir, exist_ok=True)
    state = model.states[net_name]
    params = state.ema_params if (use_ema and state.ema_params is not None) \
        else state.params
    size = size or model.opt.data_crop_size
    x = jnp.zeros((1, size, size, in_channels), jnp.float32)
    net = getattr(model, "netG", None)
    assert net is not None, "model has no generator to export"
    mt = model.opt.model_type
    if mt in ("palette", "cm", "sc", "b2b"):
        # denoiser signature: (x, t) — export at a fixed timestep input
        t = jnp.zeros((1,), jnp.float32)
        fn = jax.jit(lambda x, t: net.apply(params, x, t))
        written = {}
        try:
            from jax import export as jexport
            exported = jexport.export(fn)(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct(t.shape, t.dtype))
            path = os.path.join(out_dir, f"{net_name}.stablehlo")
            with open(path, "wb") as f:
                f.write(exported.serialize())
            written["stablehlo"] = path
        except Exception as e:
            print(f"stablehlo export failed: {e}")
        from flax import serialization
        ppath = os.path.join(out_dir, f"{net_name}_export.msgpack")
        with open(ppath, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        written["params"] = ppath
        return written

    apply_fn = lambda p, x: net.apply(p, x)
    written = {}
    try:
        written["stablehlo"] = export_stablehlo(
            apply_fn, params, x,
            os.path.join(out_dir, f"{net_name}.stablehlo"))
    except Exception as e:
        print(f"stablehlo export failed: {e}")
    from flax import serialization
    ppath = os.path.join(out_dir, f"{net_name}_export.msgpack")
    with open(ppath, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    written["params"] = ppath
    return written
