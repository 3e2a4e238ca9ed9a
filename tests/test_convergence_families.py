"""CI guards for the four remaining family convergence A/Bs
(tools/convergence_ab_families.py — VERDICT r3 next #3): CM, SC, B2B
video, MAT each train the same task as the ACTUAL reference modules from
independent inits with shared draws, and must land within noise of the
reference's held-out quality. Longer runs are recorded in BASELINE.md;
these CI versions use reduced steps.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

pytestmark = [pytest.mark.parity, pytest.mark.slow]


def _run(family, *extra):
    import contextlib
    import io
    import json

    from tools.convergence_ab_families import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main([family, *extra])
    line = [ln for ln in buf.getvalue().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def test_convergence_ab_cm_independent_training():
    """iCT consistency training (reference CMGenerator.cm_forward + the
    cm_model pseudo-huber loss) from independent inits: 2-step sampling
    PSNR within 1.5 dB of the reference."""
    r = _run("cm", "--steps", "120")
    assert r["tail_loss_tpu"] < 0.02, r
    assert r["tail_loss_ref"] < 0.02, r
    assert r["psnr_masked_tpu"] > r["psnr_masked_ref"] - 1.5, r


def test_convergence_ab_sc_independent_training():
    """Shortcut-model training (reference SCGenerator.sc_forward +
    flow/bootstrap targets) from independent inits: 4-step Euler sampling
    PSNR within 1.5 dB."""
    r = _run("sc", "--steps", "120")
    assert r["psnr_masked_tpu"] > 5.0, r
    assert r["psnr_masked_tpu"] > r["psnr_masked_ref"] - 1.5, r


def test_convergence_ab_b2b_vid_independent_training():
    """B2B video flow matching (reference JiTViD + the b2b_generator
    x-pred -> velocity loss) from independent inits: masked PSNR over
    generated frames within 1.5 dB."""
    r = _run("b2b_vid", "--steps", "60", "--batch", "4")
    assert r["tail_loss_tpu"] < 1.5, r
    assert r["psnr_masked_tpu"] > r["psnr_masked_ref"] - 1.5, r


def test_convergence_ab_mat_independent_training():
    """MAT adversarial inpainting at CONVERGENCE depth (VERDICT r4 next
    #4): the ACTUAL reference MAT G+D with the mat_model recipe — nonsat
    GAN + lazy R1 + EMA ramp-up (mat_model.py:914-940) — trained from
    independent inits for a couple hundred steps at reduced
    resolution/width (128px, width base 16 on BOTH sides: the reference
    FirstStage crashes below 128, and full width is ~85 s/step on CPU).
    Held-out EMA inpainting PSNR within 2 dB of the reference and tail
    losses finite on both sides. The 300-step run is recorded in
    BASELINE.md (round-5 MAT convergence table).

    Size calibration (2026-08-21, this 1-core testbed): width 8 / batch 2
    is the largest config whose jax-side step stays CPU-tractable — the
    modulated-conv backward lowers pathologically on XLA:CPU (G fwd+bwd
    29.7 s at width 16 batch 4 vs 2.6 s at width 8 batch 2; fine on TPU,
    where the mat bench sustains 48+ img/s at 256px full width). ~7 s/step
    ours + ~2 s/step torch -> 150 steps ~= 23 min, the parity-lane scale
    of the old 2-step guard but at convergence depth."""
    import numpy as np
    r = _run("mat", "--steps", "150", "--batch", "2", "--mat_res", "128",
             "--mat_width", "8")
    for k in ("tail_g_loss_ref", "tail_g_loss_tpu", "tail_d_loss_ref",
              "tail_d_loss_tpu"):
        assert np.isfinite(r[k]), r
    assert r["psnr_masked_tpu"] > r["psnr_masked_ref"] - 2.0, r
