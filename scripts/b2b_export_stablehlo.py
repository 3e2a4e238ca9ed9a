"""Export a trained B2B checkpoint for serving
(TPU-native analog of reference scripts/b2b_export_onnx.py).

Two artifacts are written next to ``--dir_out``:

- ``<name>.denoiser.stablehlo`` — the single denoiser forward with the
  reference ONNX input contract (``model_input``, ``timesteps``, ``labels``
  [+ ``mask_size_cond`` / ``temporal_frame_step`` / ``global_context`` /
  ``object_refs`` when the checkpoint enables them], output ``output``) for
  consumers that drive their own sampling loop;
- ``<name>.sampler.stablehlo`` — the FULL Heun/Euler restoration loop as one
  program (``gt``, ``mask``, ``labels``, ``seed`` -> generated clip). The
  reference needs per-step ONNX/TensorRT calls because ONNX cannot express
  the loop; StableHLO carries the ``lax.scan`` natively, so serving is a
  single dispatch per clip.

A ``<name>.meta.json`` sidecar records input names/shapes/dtypes, the step
count, and conditioning flags (ONNX is self-describing; StableHLO needs the
sidecar).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import load_model_from_file  # noqa: E402


def export_b2b(model, opt, dir_out, batch_size=1, denoise_timesteps=0,
               name="b2b"):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    os.makedirs(dir_out, exist_ok=True)
    size = opt.data_crop_size
    is_video = model.is_video
    nf = int(getattr(opt, "data_temporal_number_frames", 0) or 0) \
        if is_video else 0
    cin = opt.model_input_nc
    steps = int(denoise_timesteps or model.denoise_timesteps)

    state = model.states["G_A"]
    params = state.ema_params if state.ema_params is not None else \
        state.params

    spatial = (nf, size, size) if is_video else (size, size)
    x_shape = (batch_size,) + spatial + (cin,)
    mask_shape = (batch_size,) + spatial + (1,)
    flags = {
        "mask_as_channel": model.mask_as_channel,
        "mask_size_conditioning": model.mask_size_cond,
        "temporal_frame_step_conditioning": model.frame_step_cond,
        "is_video": is_video,
        "conditional": bool(getattr(model, "conditional", False)),
    }

    # ---- single-step denoiser, reference input-name contract ------------
    # model_input channels = cond image + noisy target [+ mask channel]
    # (reference b2b_onnx...py:283 expected_model_input_channels)
    conditional = bool(getattr(model, "conditional", False))
    zc = (cin + (opt.model_output_nc if conditional else 0)
          + (1 if model.mask_as_channel else 0))
    den_inputs = {
        "model_input": ((batch_size,) + spatial + (zc,), "float32"),
        "timesteps": ((batch_size,), "float32"),
        "labels": ((batch_size,), "int32"),
    }
    if model.mask_size_cond:
        den_inputs["mask_size_cond"] = ((batch_size, 2), "float32")
    if model.frame_step_cond:
        den_inputs["temporal_frame_step"] = ((batch_size,), "float32")

    def denoiser(model_input, timesteps, labels, mask_size_cond=None,
                 temporal_frame_step=None):
        kwargs = {}
        if model.frame_step_cond:
            kwargs["temporal_frame_step"] = temporal_frame_step
        if is_video and kwargs:
            return model.netG.apply(params, model_input, timesteps,
                                    y=labels, mask_size=mask_size_cond,
                                    **kwargs)
        return model.netG.apply(params, model_input, timesteps, y=labels,
                                mask_size=mask_size_cond)

    arg_names = list(den_inputs)
    structs = [jax.ShapeDtypeStruct(s, np.dtype(d))
               for s, d in den_inputs.values()]

    def den_positional(*args):
        return denoiser(**dict(zip(arg_names, args)))

    written = {}
    exported = jexport.export(jax.jit(den_positional))(*structs)
    den_path = os.path.join(dir_out, f"{name}.denoiser.stablehlo")
    with open(den_path, "wb") as f:
        f.write(exported.serialize())
    written["denoiser"] = den_path

    # ---- full sampler program -------------------------------------------
    from joligen_tpu.models.modules.b2b import b2b_sample

    def sampler(gt, mask, labels, seed, y_cond=None):
        rng = jax.random.PRNGKey(seed)
        apply_fn = model._make_apply(mask)
        ms = None
        if model.mask_size_cond:
            from joligen_tpu.models.modules.b2b import mask_size_condition
            ms = mask_size_condition(mask, gt.shape[-3], gt.shape[-2])
        return b2b_sample(
            apply_fn, params, rng, gt, y_cond=y_cond,
            mask=(None if model.mask_as_channel else mask), labels=labels,
            num_classes=model.num_classes, denoise_timesteps=steps,
            noise_scale=model.noise_scale, t_eps=model.t_eps,
            cfg_scale=model.cfg_scale, clip_denoised=model.clip_denoised,
            mask_size=ms)

    samp_inputs = {
        "gt": (x_shape, "float32"),
        "mask": (mask_shape, "float32"),
        "labels": ((batch_size,), "int32"),
        "seed": ((), "uint32"),
    }
    if conditional:
        samp_inputs["y_cond"] = (x_shape, "float32")
    structs = [jax.ShapeDtypeStruct(s, np.dtype(d))
               for s, d in samp_inputs.values()]
    exported = jexport.export(jax.jit(sampler))(*structs)
    samp_path = os.path.join(dir_out, f"{name}.sampler.stablehlo")
    with open(samp_path, "wb") as f:
        f.write(exported.serialize())
    written["sampler"] = samp_path

    meta = {
        "model_type": "b2b",
        "data_crop_size": size,
        "data_temporal_number_frames": nf,
        "denoise_timesteps": steps,
        "batch_size": batch_size,
        "flags": flags,
        "denoiser_inputs": {k: list(v) for k, v in den_inputs.items()},
        "sampler_inputs": {k: list(v) for k, v in samp_inputs.items()},
        "outputs": ["output"],
    }
    meta_path = os.path.join(dir_out, f"{name}.meta.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    written["meta"] = meta_path
    return written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_in_file", required=True,
                   help="checkpoint .pth (EMA weights preferred)")
    p.add_argument("--dir_out", default="")
    p.add_argument("--name", default="b2b")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--denoise_timesteps", type=int, default=0,
                   help="step count baked into the sampler artifact "
                        "(default: checkpoint's first configured count)")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()

    model, opt = load_model_from_file(a.model_in_file, cpu=a.cpu)
    assert opt.model_type == "b2b", "this exporter is for B2B checkpoints"
    dir_out = a.dir_out or os.path.dirname(os.path.abspath(a.model_in_file))
    written = export_b2b(model, opt, dir_out, batch_size=a.batch_size,
                         denoise_timesteps=a.denoise_timesteps, name=a.name)
    for kind, path in written.items():
        print(f"exported {kind}: {path}")


if __name__ == "__main__":
    main()
