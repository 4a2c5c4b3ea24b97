"""Default-suite geometry gate: a scaled-down convergence anchor on the CPU.

The full anchor (tests/test_geometry_anchor.py) needs a real chip and an
env var (SATNERF_ANCHOR=1); before r4 a geometry regression could therefore
ship unless someone remembered the chip ritual. This test runs the SAME
train -> DSM -> register -> MAE chain (reference protocol:
/root/reference/sat_utils.py:197-219 compute_mae_and_save_dsm_diff) on every
plain `pytest` run, scaled until it fits a 1-core host: 128-px 10-view
smooth-terrain synthetic AOI, 8x64 sat-nerf, 32 samples/ray, batch
512 x 800 steps at lr 1e-3, on ONE virtual CPU device (a subprocess through
tools/cpu_mesh_run.py — the in-suite 8-device mesh is for sharding tests;
XLA CPU collectives on a starved 1-core box are the known wedge mode, and
geometry needs no mesh).

Measured on this host (re-measured r5 after the fixture grew its shading /
transient / rpc-noise knobs — default output stayed byte-identical and the
seeds reproduced r4's values to the millimeter; ~445 s/run idle, ~2x under
load):

    seed 0: DSM MAE 2.96 m, val PSNR 14.6   (r4: 2.96)
    seed 1: DSM MAE 2.59 m, val PSNR 14.9   (r4: 2.59)
    seed 2: DSM MAE 2.65 m, val PSNR 15.0   (r4: 2.65)

The "flat DSM at the terrain mean" floor through the same registration
protocol is 6.45 m — i.e. a run that learns no geometry at all scores ~6.5.
The gate (4.0 m = 1.35x the worst measured seed, well below the floor)
asserts "the chain converges to terrain-scale geometry" — a sampling,
compositing, ray-construction, or registration regression blows it up by
meters — while staying insensitive to seed noise (worst seed + 12 sigma of
the 0.17 m cross-seed std). The opt-in chip anchor owns tightness (1.4 m
gate at the 64k x 1200 config).
"""

import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MAE_GATE_M = 4.0   # worst measured seed 2.96 m; flat-DSM floor 6.45 m
PSNR_FLOOR = 12.5  # worst measured seed 14.6 dB


def _parse_final_metrics(stdout: str) -> dict:
    # train/loop.py:283 prints: done in <t>s — {'val/psnr': ..., ...}
    for line in reversed(stdout.splitlines()):
        if line.startswith("done in"):
            return ast.literal_eval(line.split("—", 1)[1].strip())
    raise AssertionError(
        f"no final-metrics line in train output:\n{stdout[-2000:]}")


def test_geometry_anchor_cpu(tmp_path):
    root = str(tmp_path / "aoi")
    # The suite conftest pins an 8-device XLA_FLAGS; the subprocess should
    # run a plain single-device CPU backend.
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_aoi.py"),
         root, "--n_train", "10", "--n_test", "1", "--size", "128",
         "--view_spread", "0.25", "--terrain", "smooth", "--checker", "8",
         "--alt_bounds", "terrain"],
        check=True, cwd=REPO, env=env, timeout=600)

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cpu_mesh_run.py"),
         "-n", "1",
         os.path.join(REPO, "train.py"),
         "--root_dir", os.path.join(root, "data"),
         "--gt_dir", os.path.join(root, "gt"),
         "--cache_dir", os.path.join(root, "cache"),
         "--logs_dir", str(tmp_path / "logs"),
         "--ckpts_dir", str(tmp_path / "ckpts"),
         "--model", "sat-nerf", "--exp_name", "anchor_cpu", "--gpu_id", "0",
         "--fc_units", "64", "--fc_layers", "8", "--n_samples", "32",
         "--chunk", "16384", "--lr", "1e-3",
         "--batch_size", "512", "--max_train_steps", "800",
         "--log_every_n_steps", "400", "--save_every_n_epochs", "999",
         "--val_every_n_epochs", "999", "--seed", "0"],
        cwd=REPO, env=env, timeout=2400, capture_output=True, text=True)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-3000:])

    metrics = _parse_final_metrics(proc.stdout)
    assert metrics["val/mae"] < MAE_GATE_M, (
        f"geometry regression: CPU anchor DSM MAE {metrics['val/mae']:.3f} m "
        f"(gate {MAE_GATE_M} m; measured 2.59-2.96 m over seeds 0-2; a "
        f"no-geometry flat DSM scores 6.45 m)")
    assert metrics["val/psnr"] > PSNR_FLOOR, metrics
