"""Convert a reference MAT checkpoint (torch state_dict) to joligen_tpu
MATGenerator / MATDiscriminator flax params.

The reference MAT (models/modules/mat/mat.py + basic_module.py) and our
rebuild (joligen_tpu/models/modules/mat.py) are structurally aligned
module-for-module, so conversion is pure layout translation:

  torch Linear/FullyConnectedLayer (out, in)      -> (in, out)
  torch conv OIHW (out, in, kh, kw)               -> HWIO (kh, kw, in, out)
  ModulatedConv2d weight (1, out, in, k, k)       -> (k, k, in, out)
  StyleConv/ToRGB bias (module-level)             -> our ModulatedConv bias
  buffers (resample_filter, noise_const, w_avg,
           attn_mask)                             -> dropped (recomputed /
                                                    tracked outside params)

``load_reference_mat()`` imports the ACTUAL reference module on CPU with
timm / the vit motion package stubbed (mat/__init__ is bypassed because it
pulls torchvision via pcp.py); used by the converted-weight parity tests
(tests/test_numerical_parity.py) and by this CLI:

    python tools/convert_mat_checkpoint.py ckpt.pth out.npz \
        --resolution 256 [--discriminator]
"""

from __future__ import annotations

import argparse
import math
import sys
import types

import numpy as np


# --------------------------------------------------------------------------
# Reference import machinery (CPU, zero external deps)
# --------------------------------------------------------------------------

def load_reference_mat(ref_root="/root/reference/models/modules"):
    """Import the reference mat.py as ``refmodules.mat.mat`` on CPU."""
    # another test/tool may have registered a timm stub first — make sure
    # the attributes mat.py imports exist regardless of who created it
    if "timm.models.layers" in sys.modules:
        tl = sys.modules["timm.models.layers"]
        if not hasattr(tl, "to_2tuple"):
            tl.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        if not hasattr(tl, "trunc_normal_"):
            tl.trunc_normal_ = lambda t, *a, **k: t
        if not hasattr(tl, "DropPath"):
            class _DP:
                def __init__(self, *a, **k):
                    pass

                def __call__(self, x):
                    return x
            tl.DropPath = _DP
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")

        class DropPath:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tl.DropPath = DropPath
        tl.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        tl.trunc_normal_ = lambda t, *a, **k: t
        tm.layers = tl
        timm.models = tm
        import importlib.machinery as _im
        for _m in (timm, tm, tl):
            _m.__spec__ = _im.ModuleSpec(_m.__name__, None)
        sys.modules.update({"timm": timm, "timm.models": tm,
                            "timm.models.layers": tl})

    if "refmodules" not in sys.modules:
        pkg = types.ModuleType("refmodules")
        pkg.__path__ = [ref_root]
        sys.modules["refmodules"] = pkg
    # stub the vit motion import (only used when motion_enabled=True)
    if "refmodules.vit" not in sys.modules:
        vit_pkg = types.ModuleType("refmodules.vit")
        vit_mm = types.ModuleType("refmodules.vit.vit_vid_per_layer_motion")
        vit_mm.MotionModule = object
        vit_pkg.vit_vid_per_layer_motion = vit_mm
        sys.modules["refmodules.vit"] = vit_pkg
        sys.modules["refmodules.vit.vit_vid_per_layer_motion"] = vit_mm
    # bypass mat/__init__.py (imports torchvision through pcp.py)
    if "refmodules.mat" not in sys.modules:
        mat_pkg = types.ModuleType("refmodules.mat")
        mat_pkg.__path__ = [ref_root + "/mat"]
        sys.modules["refmodules.mat"] = mat_pkg

    import importlib

    return importlib.import_module("refmodules.mat.mat")


def disable_noise(module):
    """Reference StyleConv crashes on noise_mode='none' when
    use_noise=True (unbound ``noise``, basic_module.py:243-257); flipping
    use_noise off is the reference's own no-noise configuration."""
    for m in module.modules():
        if hasattr(m, "use_noise"):
            m.use_noise = False


# --------------------------------------------------------------------------
# Layout translators
# --------------------------------------------------------------------------

def _np(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


class _Taker:
    """state_dict accessor that records consumption so nothing param-like
    is silently dropped."""

    def __init__(self, sd):
        self.sd = {k: v for k, v in sd.items()}
        self.used = set()

    def __call__(self, key):
        self.used.add(key)
        return _np(self.sd[key])

    def assert_consumed(self, skip_substrings=("resample_filter",
                                               "noise_const", "w_avg",
                                               "attn_mask",
                                               "weight_maskUpdater")):
        left = [k for k in self.sd
                if k not in self.used
                and not any(s in k for s in skip_substrings)]
        if left:
            raise AssertionError(f"unconverted reference params: {left}")


def dense(take, pfx):
    return {"weight": take(pfx + ".weight").T,
            "bias": take(pfx + ".bias")}


def conv(take, pfx):
    out = {"weight": take(pfx + ".weight").transpose(2, 3, 1, 0)}
    if pfx + ".bias" in take.sd:
        out["bias"] = take(pfx + ".bias")
    return out


def modconv(take, pfx, bias_key):
    """ModulatedConv2d (1,o,i,k,k) + owner-module bias -> our ModulatedConv."""
    w = take(pfx + ".weight")[0].transpose(2, 3, 1, 0)
    return {"weight": w,
            "affine": dense(take, pfx + ".affine"),
            "bias": take(bias_key)}


def styleconv(take, pfx, use_noise):
    out = {"conv": modconv(take, pfx + ".conv", pfx + ".bias")}
    if use_noise:
        out["noise"] = {"noise_strength": take(pfx + ".noise_strength")}
    return out


def torgb(take, pfx):
    return {"conv": modconv(take, pfx + ".conv", pfx + ".bias")}


# --------------------------------------------------------------------------
# Generator / Discriminator conversion
# --------------------------------------------------------------------------

def convert_generator(sd, img_resolution, depths=(2, 3, 4, 3, 2)):
    """torch Generator.state_dict() -> flax {'params': ...} for
    MATGenerator(base=64) at the same resolution."""
    take = _Taker(sd)
    res_log2 = int(math.log2(img_resolution))
    down_time = int(math.log2(img_resolution // 64))

    P = {"mapping": {}, "first_stage": {}, "encoder": {}, "decoder": {},
         "to_style": {}}
    for i in range(8):
        P["mapping"][f"fc{i}"] = dense(take, f"mapping.fc{i}")

    fs = P["first_stage"]
    fs["conv_first"] = {"conv": conv(take,
                                     "synthesis.first_stage.conv_first.conv")}
    for i in range(down_time):
        fs[f"enc_conv{i}"] = {
            "conv": conv(take, f"synthesis.first_stage.enc_conv.{i}.conv")}
    for i, depth in enumerate(depths):
        t = {}
        if i != 0:   # stages 1.. have a merge/upsample partial conv
            t["merge"] = {"conv": conv(
                take, f"synthesis.first_stage.tran.{i}.downsample.conv.conv")}
        for j in range(depth):
            bp = f"synthesis.first_stage.tran.{i}.blocks.{j}"
            t[f"block{j}"] = {
                "attn": {n: dense(take, f"{bp}.attn.{n}")
                         for n in ("q", "k", "v", "proj")},
                "fuse": dense(take, f"{bp}.fuse"),
                "mlp_fc1": dense(take, f"{bp}.mlp.fc1"),
                "mlp_fc2": dense(take, f"{bp}.mlp.fc2"),
            }
        t["conv"] = {"conv": conv(take,
                                  f"synthesis.first_stage.tran.{i}.conv.conv")}
        fs[f"tran{i}"] = t
    fs["ws_style"] = dense(take, "synthesis.first_stage.ws_style")
    fs["to_square"] = dense(take, "synthesis.first_stage.to_square")
    for j in range(4):
        fs[f"down_conv{j}"] = conv(
            take, f"synthesis.first_stage.down_conv.{j}")
    fs["to_style"] = dense(take, "synthesis.first_stage.to_style")
    for i in range(down_time):
        dp = f"synthesis.first_stage.dec_conv.{i}"
        fs[f"dec{i}a"] = styleconv(take, f"{dp}.conv0", use_noise=False)
        fs[f"dec{i}b"] = styleconv(take, f"{dp}.conv1", use_noise=False)
        fs[f"dec{i}rgb"] = torgb(take, f"{dp}.toRGB")

    for i in range(res_log2, 3, -1):
        res = 2 ** i
        bp = f"synthesis.enc.EncConv_Block_{res}x{res}"
        P["encoder"][f"enc{i}_c0"] = conv(take, f"{bp}.conv0")
        P["encoder"][f"enc{i}_c1"] = conv(take, f"{bp}.conv1")

    P["to_square"] = dense(take, "synthesis.to_square")
    for j in range(3):
        P["to_style"][f"down{j}"] = conv(take, f"synthesis.to_style.conv.{j}")
    P["to_style"]["fc"] = dense(take, "synthesis.to_style.fc")

    P["decoder"]["dec4"] = {
        "conv0": conv(take, "synthesis.dec.Dec_16x16.conv0"),
        "conv1": styleconv(take, "synthesis.dec.Dec_16x16.conv1",
                           use_noise=True),
        "rgb": torgb(take, "synthesis.dec.Dec_16x16.toRGB"),
    }
    for r in range(5, res_log2 + 1):
        bp = f"synthesis.dec.Dec_{2 ** r}x{2 ** r}"
        P["decoder"][f"dec{r}"] = {
            "conv0": styleconv(take, f"{bp}.conv0", use_noise=True),
            "conv1": styleconv(take, f"{bp}.conv1", use_noise=True),
            "rgb": torgb(take, f"{bp}.toRGB"),
        }

    take.assert_consumed()
    return {"params": P}


def convert_discriminator(sd, img_resolution):
    """torch Discriminator.state_dict() -> flax params for
    MATDiscriminator(base=64)."""
    take = _Taker(sd)
    res_log2 = int(math.log2(img_resolution))
    P = {}
    for prefix, ref in (("main", "Dis"), ("stg1", "Dis_stg1")):
        P[f"{prefix}_from_rgb"] = conv(take, f"{ref}.0.conv")
        for n, res in enumerate(range(res_log2, 2, -1), start=1):
            P[f"{prefix}_b{res}"] = {
                "conv0": conv(take, f"{ref}.{n}.conv0"),
                "conv1": conv(take, f"{ref}.{n}.conv1"),
                "skip": conv(take, f"{ref}.{n}.skip"),
            }
        # sequential index: FromRGB + (res_log2-2) blocks + mbstd, then conv
        final_idx = 1 + (res_log2 - 2) + 1
        P[f"{prefix}_final"] = conv(take, f"{ref}.{final_idx}")
        sfx = "" if prefix == "main" else "_stg1"
        # fc0 consumes the flattened 4x4 map: torch flattens NCHW
        # (c*16 + h*4 + w), we flatten NHWC (h*4*C + w*C + c) — permute
        # the input columns accordingly
        w0 = take(f"fc0{sfx}.weight")           # (out, C*4*4)
        out_f = w0.shape[0]
        c4 = w0.shape[1] // 16
        w0 = w0.reshape(out_f, c4, 4, 4).transpose(0, 2, 3, 1)
        P[f"{prefix}_fc0"] = {"weight": w0.reshape(out_f, -1).T,
                              "bias": take(f"fc0{sfx}.bias")}
        P[f"{prefix}_fc1"] = dense(take, f"fc1{sfx}")
    take.assert_consumed()
    return {"params": P}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="torch checkpoint (.pth state_dict)")
    ap.add_argument("dst", help="output .npz of flattened flax params")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--discriminator", action="store_true")
    a = ap.parse_args(argv)

    import torch

    sd = torch.load(a.src, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    cvt = convert_discriminator if a.discriminator else convert_generator
    params = cvt(sd, a.resolution)

    flat = {}

    def _flatten(d, pfx=""):
        for k, v in d.items():
            if isinstance(v, dict):
                _flatten(v, pfx + k + "/")
            else:
                flat[pfx + k] = v

    _flatten(params["params"])
    np.savez(a.dst, **flat)
    print(f"wrote {len(flat)} arrays to {a.dst}")


if __name__ == "__main__":
    main()
