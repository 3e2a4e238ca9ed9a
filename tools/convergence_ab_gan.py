"""Independent-training convergence A/B vs the reference — GAN family.

The diffusion analog (tools/convergence_ab.py) closes the quality-parity
ladder for the palette family; this tool does the same for the GAN family,
whose training dynamics (two optimizers, adversarial equilibrium) the
trajectory tests only follow for 8 steps. Both frameworks train the SAME
CycleGAN recipe (reference cycle_gan_model.py:263-347 G losses,
loss.py:288-307 D loss, Adam lr 2e-4 betas (0.5, 0.999), G-then-D group
order, pool_size 0, lambda_idt 0 — the identity term actively fights a
color-inverting mapping, and the reference exposes it as a knob) on the
same synthetic unpaired task from INDEPENDENT initializations:

- domain A: procedural Gaussian-bump "blob" images;
- domain B: NEGATED blobs from a disjoint image set (unpaired) — the
  simplest distribution-matching map from A to B is pixel negation, which
  a converged CycleGAN must discover;
- reference side: the ACTUAL reference ResnetGenerator x2 +
  NLayerDiscriminator x2 executed in torch, with the reference's
  normal(0.02) init (gan_networks.py init_net default);
- tpu side: our flax ResnetGenerator/NLayerDiscriminator + optax from our
  own init;
- shared: dataset and minibatch index schedule (variance reduction);
- eval: held-out a_test -> PSNR(G_A(a), -a) per side. Two equally-correct
  frameworks should land within a couple of dB of each other.

Prints one JSON line:
  {"psnr_ref": .., "psnr_tpu": .., "g_tail_ref": .., "g_tail_tpu": ..,
   "steps": N}

Run on CPU:  JAX_PLATFORMS=cpu python tools/convergence_ab_gan.py --steps 600
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

IMG = 32   # the n_layers=3 NLayer D needs >1 spatial element at its last
# InstanceNorm, which 16px (the diffusion A/B size) violates

NGF, NDF, NBLOCKS, NLAYERS = 16, 8, 2, 3
LR, BETAS, EPS = 2e-4, (0.5, 0.999), 1e-8
LAMBDA_CYCLE = 10.0


def make_dataset(n, seed):
    """Procedural blob images (same family as convergence_ab.make_dataset,
    scaled to 32px): tanh-squashed sums of Gaussian bumps."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    imgs = np.zeros((n, IMG, IMG, 3), np.float32)
    for i in range(n):
        acc = np.zeros((IMG, IMG, 3), np.float32)
        for _ in range(4):
            cy, cx = rng.uniform(4, IMG - 4, 2)
            s = rng.uniform(3.0, 8.0)
            amp = rng.uniform(-2.0, 2.0, 3).astype(np.float32)
            bump = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
            acc += bump[..., None] * amp
        imgs[i] = np.tanh(acc)
    return imgs, None


def reference_gan_importable():
    """Stub wget/torchvision/util so the reference resnet_generator and
    discriminators modules import standalone, then return
    (ResnetGenerator, NLayerDiscriminator)."""
    if "wget" not in sys.modules:
        sys.modules["wget"] = types.ModuleType("wget")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvm = types.ModuleType("torchvision.models")
        tvv = types.ModuleType("torchvision.models.vgg")
        tv.transforms, tv.models, tvm.vgg = tvt, tvm, tvv
        sys.modules.update({
            "torchvision": tv, "torchvision.transforms": tvt,
            "torchvision.models": tvm, "torchvision.models.vgg": tvv})
    # "util" may already be the REAL /root/reference/util package (the
    # vit helpers import util.model_util through it); the submodule stub
    # must be registered either way or `from util.util import tensor2im`
    # loads the real util/util.py, which imports piq (absent here)
    if "util.util" not in sys.modules or not hasattr(
            sys.modules["util.util"], "tensor2im"):
        uu = types.ModuleType("util.util")
        uu.tensor2im = lambda *a, **k: None
        if "util" not in sys.modules:
            u = types.ModuleType("util")
            u.__path__ = []
            sys.modules["util"] = u
        sys.modules["util"].util = uu
        sys.modules["util.util"] = uu
    for name, path in [
            ("models", "/root/reference/models"),
            ("models.modules", "/root/reference/models/modules"),
            ("models.modules.resnet_architecture",
             "/root/reference/models/modules/resnet_architecture")]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = [path]
            sys.modules[name] = m
    from models.modules.resnet_architecture.resnet_generator import (
        ResnetGenerator)
    from models.modules.discriminators import NLayerDiscriminator
    return ResnetGenerator, NLayerDiscriminator


def _init_normal(torch, net, gain=0.02):
    """Reference init_weights 'normal' branch (models/gan_networks.py
    init_net default: normal(0, 0.02) on Conv/Linear weights, zero bias;
    InstanceNorm here is non-affine so carries no tensors)."""
    for m in net.modules():
        cls = m.__class__.__name__
        if hasattr(m, "weight") and m.weight is not None and (
                "Conv" in cls or "Linear" in cls):
            torch.nn.init.normal_(m.weight, 0.0, gain)
            if getattr(m, "bias", None) is not None:
                torch.nn.init.zeros_(m.bias)


def train_reference(torch, imgs_a, imgs_b, sched, seed):
    import itertools

    from torch import nn as tnn

    RefG, RefD = reference_gan_importable()
    torch.manual_seed(seed)
    norm_layer = functools.partial(tnn.InstanceNorm2d, affine=False)
    gA = RefG(input_nc=3, output_nc=3, ngf=NGF, norm_layer=norm_layer,
              use_dropout=False, n_blocks=NBLOCKS, mobile=False)
    gB = RefG(input_nc=3, output_nc=3, ngf=NGF, norm_layer=norm_layer,
              use_dropout=False, n_blocks=NBLOCKS, mobile=False)
    dA = RefD(input_nc=3, ndf=NDF, n_layers=NLAYERS, norm_layer=norm_layer)
    dB = RefD(input_nc=3, ndf=NDF, n_layers=NLAYERS, norm_layer=norm_layer)
    for net in (gA, gB, dA, dB):
        _init_normal(torch, net)

    opt_G = torch.optim.Adam(
        itertools.chain(gA.parameters(), gB.parameters()),
        lr=LR, betas=BETAS, eps=EPS)
    opt_D = torch.optim.Adam(
        itertools.chain(dA.parameters(), dB.parameters()),
        lr=LR, betas=BETAS, eps=EPS)
    mse, l1 = tnn.MSELoss(), tnn.L1Loss()

    def nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    g_hist = []
    for ia, ib in sched:
        rA = nchw(imgs_a[ia])
        rB = nchw(imgs_b[ib])
        fake_B = gA(rA)
        rec_A = gB(fake_B)
        fake_A = gB(rB)
        rec_B = gA(fake_A)
        loss_G = (mse(dB(fake_B), torch.ones_like(dB(fake_B)))
                  + mse(dA(fake_A), torch.ones_like(dA(fake_A)))
                  + LAMBDA_CYCLE * l1(rec_A, rA)
                  + LAMBDA_CYCLE * l1(rec_B, rB))
        opt_G.zero_grad()
        loss_G.backward()
        opt_G.step()
        g_hist.append(float(loss_G.detach()))

        fB, fA = fake_B.detach(), fake_A.detach()
        loss_D = (0.5 * (mse(dB(rB), torch.ones_like(dB(rB)))
                         + mse(dB(fB), torch.zeros_like(dB(fB))))
                  + 0.5 * (mse(dA(rA), torch.ones_like(dA(rA)))
                           + mse(dA(fA), torch.zeros_like(dA(fA)))))
        opt_D.zero_grad()
        loss_D.backward()
        opt_D.step()

    def infer(a):
        with torch.no_grad():
            out = gA(nchw(a))
        return np.transpose(out.numpy(), (0, 2, 3, 1))

    return infer, g_hist


def train_tpu(imgs_a, imgs_b, sched, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from joligen_tpu.models.modules.discriminators import (
        NLayerDiscriminator)
    from joligen_tpu.models.modules.resnet_generator import ResnetGenerator

    jg = ResnetGenerator(out_channels=3, ngf=NGF, n_blocks=NBLOCKS,
                         norm="instance", mobile=False,
                         up_mode="convtranspose", dtype=jnp.float32)
    jd = NLayerDiscriminator(ndf=NDF, n_layers=NLAYERS, norm="instance",
                             antialias=False, dtype=jnp.float32)
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    ex = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    params = {"gA": jg.init(k[0], ex), "gB": jg.init(k[1], ex),
              "dA": jd.init(k[2], ex), "dB": jd.init(k[3], ex)}
    tx = optax.adam(LR, b1=BETAS[0], b2=BETAS[1], eps=EPS)
    g_state = tx.init((params["gA"], params["gB"]))
    d_state = tx.init((params["dA"], params["dB"]))

    def mse(pred, target):
        return jnp.mean((pred - target) ** 2)

    @jax.jit
    def step(params, g_state, d_state, rA, rB):
        def g_loss(gp, dA, dB):
            gA, gB = gp
            fake_B = jg.apply(gA, rA)
            rec_A = jg.apply(gB, fake_B)
            fake_A = jg.apply(gB, rB)
            rec_B = jg.apply(gA, fake_A)
            loss = (mse(jd.apply(dB, fake_B), 1.0)
                    + mse(jd.apply(dA, fake_A), 1.0)
                    + LAMBDA_CYCLE * jnp.abs(rec_A - rA).mean()
                    + LAMBDA_CYCLE * jnp.abs(rec_B - rB).mean())
            return loss, (fake_B, fake_A)

        (lG, (fB, fA)), g_grads = jax.value_and_grad(g_loss, has_aux=True)(
            (params["gA"], params["gB"]), params["dA"], params["dB"])
        upd, g_state = tx.update(g_grads, g_state,
                                 (params["gA"], params["gB"]))
        gA, gB = optax.apply_updates((params["gA"], params["gB"]), upd)
        fB = jax.lax.stop_gradient(fB)
        fA = jax.lax.stop_gradient(fA)

        def d_loss(dp):
            dA, dB = dp
            return (0.5 * (mse(jd.apply(dB, rB), 1.0)
                           + mse(jd.apply(dB, fB), 0.0))
                    + 0.5 * (mse(jd.apply(dA, rA), 1.0)
                             + mse(jd.apply(dA, fA), 0.0)))

        lD, d_grads = jax.value_and_grad(d_loss)(
            (params["dA"], params["dB"]))
        upd, d_state = tx.update(d_grads, d_state,
                                 (params["dA"], params["dB"]))
        dA, dB = optax.apply_updates((params["dA"], params["dB"]), upd)
        return ({"gA": gA, "gB": gB, "dA": dA, "dB": dB},
                g_state, d_state, lG)

    g_hist = []
    for ia, ib in sched:
        params, g_state, d_state, lG = step(
            params, g_state, d_state,
            jnp.asarray(imgs_a[ia]), jnp.asarray(imgs_b[ib]))
    # fetch only the last loss (honest completion, single host sync)
    g_hist.append(float(lG))

    infer = jax.jit(lambda a: jg.apply(params["gA"], a))

    def run(a):
        return np.asarray(infer(jnp.asarray(a)))

    return run, g_hist


def psnr(a, b):
    m = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(4.0 / max(m, 1e-12))   # range [-1, 1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_train", type=int, default=64)
    ap.add_argument("--n_test", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)

    import torch

    torch.set_num_threads(max(1, (os.cpu_count() or 2) // 2))
    imgs_a, _ = make_dataset(a.n_train, a.seed)
    blobs_b, _ = make_dataset(a.n_train, a.seed + 1)   # disjoint content
    imgs_b = -blobs_b                                   # domain B = negated
    test_a, _ = make_dataset(a.n_test, a.seed + 2)

    rng = np.random.RandomState(a.seed + 3)
    sched = [(rng.randint(0, a.n_train, a.batch),
              rng.randint(0, a.n_train, a.batch))
             for _ in range(a.steps)]

    infer_ref, g_ref = train_reference(torch, imgs_a, imgs_b, sched,
                                       seed=a.seed + 10)
    infer_tpu, g_tpu = train_tpu(imgs_a, imgs_b, sched, seed=a.seed + 20)

    out_ref = infer_ref(test_a)
    out_tpu = infer_tpu(test_a)
    res = {
        "psnr_ref": round(psnr(out_ref, -test_a), 3),
        "psnr_tpu": round(psnr(out_tpu, -test_a), 3),
        "g_tail_ref": round(float(np.mean(g_ref[-10:])), 4),
        "g_tail_tpu": round(float(np.mean(g_tpu[-1:])), 4),
        "steps": a.steps,
    }
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
