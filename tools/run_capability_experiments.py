#!/usr/bin/env python
"""Functional capability validation (VERDICT r4 missing #1/#2/#3): train
A/B model pairs on synthetic AOIs that actually CONTAIN the phenomena the
Sat-NeRF machinery exists for, and report whether each mechanism works:

  shadow     — a SHADED AOI (per-image sun, Lambert + cast shadows,
               tests/fixtures.py analytic_sun_term): nerf vs s-nerf vs
               s-nerf+SC. Gates: the irradiance models beat vanilla nerf on
               novel views, and the rendered sun_v map reproduces the
               analytic sun map (correlation + shadow IoU).
               Reference machinery: /root/reference/models/snerf.py:65-67,
               SC pass /root/reference/rendering.py:90-108.
  solar      — study_solar_interpolation.py's sun sweep on the SAME shaded
               AOI (VERDICT r4 weak #6: the study had only ever interpolated
               between identical suns): train the SC-anchored s-nerf, sweep
               10 interpolated sun directions, and gate that the rendered
               sun maps actually move (decorrelated extremes, travelling
               shadow masks). Reference machinery:
               /root/reference/study_solar_interpolation.py:145-246.
  transient  — an AOI where a subset of train views is corrupted by painted
               transient boxes ({img}_TRANSIENT.npy masks): s-nerf vs
               sat-nerf. Gates: the beta head recovers clean-view PSNR that
               s-nerf loses, and the rendered beta map localizes the
               transient pixels. Reference machinery:
               /root/reference/models/satnerf.py:151-153, metrics.py:21-25.
  ba         — the SAME imagery with clean vs mis-registered RPCs
               (fixtures rpc_noise_px; byte-identical image siblings) and
               BA-style tie points: BA vs noBA vs noBA+DS. Gates: RPC noise
               degrades DSM MAE, depth supervision recovers it — the real
               ablation behind run_all.sh rows 6-7. Reference machinery:
               /root/reference/create_satellite_dataset.py:32-78,
               datasets/satellite_depth.py:84-129.

Usage (the r5 artifact command; ~1-2 h on the chip, days on 1 CPU core):
  python tools/run_capability_experiments.py /tmp/cap --platform tpu \
      --out CAPABILITY_r05.json
Smoke (plumbing only): --preset smoke --platform cpu

Each run trains via satnerf_tpu.train.loop.fit and evaluates via eval.py's
eval_aoi in a child process (same pattern as tools/train_reference_torch.py:
the sitecustomize pins the session platform, so CPU forcing must happen
in-process inside the child). Completed runs are skipped on rerun.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRESETS = {
    "full": dict(size=64, n_train=10, n_test=2, fc_units=96, fc_layers=8,
                 n_samples=24, batch_size=2048, max_train_steps=4000,
                 lr=5e-4),
    "smoke": dict(size=32, n_train=4, n_test=1, fc_units=32, fc_layers=4,
                  n_samples=8, batch_size=512, max_train_steps=200,
                  lr=1e-3),
}

# experiment -> (AOI builder extra flags, [(run name, config overrides)])
def experiment_table(p):
    # view_spread 0.25 = the geometry-anchor parallax (tests/
    # test_geometry_anchor_cpu.py): without it the ray geometry barely
    # constrains altitude and every mechanism drowns in floaters
    common_aoi = ["--size", str(p["size"]), "--n_train", str(p["n_train"]),
                  "--n_test", str(p["n_test"]), "--alt_bounds", "terrain",
                  "--view_spread", "0.25", "--checker", "8"]
    # smooth terrain (the geometry-anchor scene: continuous Lambert
    # shading, converges to ~1 m MAE so floaters can't out-compete
    # the honest decomposition) + low suns for long cast shadows
    shaded_aoi = common_aoi + ["--shading", "--terrain", "smooth",
                               "--checker", "8", "--sun_el", "25", "50"]
    return {
        "shadow": {
            "aoi": {"shaded": shaded_aoi},
            "runs": [
                ("nerf", "shaded", dict(model="nerf", sc_lambda=0.0)),
                ("snerf_sc00", "shaded", dict(model="s-nerf", sc_lambda=0.0)),
                ("snerf_sc05", "shaded", dict(model="s-nerf",
                                              sc_lambda=0.05)),
            ],
        },
        "solar": {
            # study_solar_interpolation.py driven on a scene whose suns
            # actually differ (VERDICT r4 weak #6: the study had only ever
            # interpolated between identical suns): train the SC-anchored
            # s-nerf, then sweep 10 interpolated sun directions and measure
            # that the rendered sun maps MOVE (decorrelated extremes,
            # travelling shadow masks). Reference:
            # /root/reference/study_solar_interpolation.py:145-246.
            # its own AOI: suns at 15-40 deg for long, stark shadows (the
            # shadow A/B's 25-50 deg keeps its committed numbers untouched),
            # and a 3x step budget + sc_lambda 0.1 (the reference's stronger
            # published SC weight, run_all.sh) — measured at the shadow
            # preset (sc 0.05 / 4k steps) the sweep is near-degenerate
            # (corr_extremes 0.997, rel_std 1.4%): sun_v learns the mean
            # shadow map but barely its direction dependence
            "aoi": {"shaded_low": common_aoi + [
                "--shading", "--terrain", "smooth", "--checker", "8",
                "--sun_el", "15", "40"]},
            "runs": [
                ("snerf_sc10", "shaded_low", dict(model="s-nerf",
                                                  sc_lambda=0.1,
                                                  max_train_steps=12000)),
            ],
            "sweep": ["snerf_sc10"],
        },
        "transient": {
            # every train view except idx 0 gets 3 painted boxes (~10% of
            # its pixels): strong enough view-inconsistency that averaging
            # it away (s-nerf) visibly costs clean-view quality
            "aoi": {"transient": common_aoi + ["--transient_frac", "1.0",
                                               "--transient_size", "12",
                                               "--n_transients", "3"]},
            "runs": [
                ("snerf", "transient", dict(model="s-nerf", sc_lambda=0.0)),
                ("satnerf", "transient", dict(model="sat-nerf",
                                              sc_lambda=0.0)),
            ],
        },
        "ba": {
            "aoi": {
                "ba_clean": common_aoi + ["--terrain", "smooth",
                                          "--keypoints", "300"],
                "ba_noisy": common_aoi + ["--terrain", "smooth",
                                          "--keypoints", "300",
                                          "--rpc_noise", "2.5"],
            },
            "runs": [
                ("ba", "ba_clean", dict(model="sat-nerf", sc_lambda=0.0)),
                ("noba", "ba_noisy", dict(model="sat-nerf", sc_lambda=0.0)),
                ("noba_ds", "ba_noisy", dict(model="sat-nerf", sc_lambda=0.0,
                                             ds_lambda=1000.0)),
            ],
        },
    }


# ------------------------------------------------------------ child phases


def _phase_train(args):
    from satnerf_tpu.config import Config
    from satnerf_tpu.train.loop import fit

    spec = json.loads(args._spec)
    aoi = os.path.join(args.workdir, "aoi", spec["aoi"])
    cfg = Config(
        exp_name=spec["name"], root_dir=os.path.join(aoi, "data"),
        gt_dir=os.path.join(aoi, "gt"), cache_dir=os.path.join(aoi, "cache"),
        logs_dir=os.path.join(args.workdir, "logs"),
        ckpts_dir=os.path.join(args.workdir, "ckpts"),
        save_every_n_epochs=10 ** 6, val_every_n_epochs=10 ** 6,
        num_sanity_val_steps=0, noise_std=0.0, precision="float32",
        # tiny AOIs mean tiny epochs: the reference's StepLR (0.9/epoch)
        # collapses the lr by ~1e-9 over the run's ~200 epochs, freezing
        # training after the first quarter; cosine keeps the demo runs
        # learning to the end (capability demos, not parity runs)
        lr_scheduler="cosine",
        **spec["overrides"])
    fit(cfg)


def _final_epoch(workdir, name):
    ckpts = glob.glob(os.path.join(workdir, "ckpts", name, "epoch=*.ckpt"))
    return max(int(re.search(r"epoch=(\d+)\.ckpt$", p).group(1))
               for p in ckpts)


def _phase_eval(args):
    from eval import eval_aoi

    spec = json.loads(args._spec)
    name = spec["name"]
    aoi = os.path.join(args.workdir, "aoi", spec["aoi"])
    epoch = _final_epoch(args.workdir, name)
    out_dir = os.path.join(args.workdir, "eval")
    metrics = eval_aoi(name, os.path.join(args.workdir, "logs"), out_dir,
                       epoch, split="val")
    result = {"val": metrics, "epoch": epoch}

    if spec.get("train_maps"):
        eval_aoi(name, os.path.join(args.workdir, "logs"), out_dir, epoch,
                 split="train")
        data_dir = os.path.join(aoi, "data")
        sun = _sun_agreement(data_dir, os.path.join(out_dir, name, "train"),
                             epoch)
        if sun:
            result["sun"] = sun
        beta = _beta_localization(data_dir,
                                  os.path.join(out_dir, name, "train"),
                                  epoch)
        if beta:
            result["beta"] = beta

    path = os.path.join(args.workdir, "metrics", f"{name}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[{name}] {json.dumps(result)}")


def _sun_agreement(data_dir, train_out, epoch):
    """Correlate each rendered composited sun_v map against the fixture's
    analytic sun_term sidecar.

    The rendered map is sum(weights * sun_v), and the weight sum is not 1
    (and is not saved), so the comparison must be scale-free: Pearson
    correlation, plus shadow-mask IoU where the predicted mask is
    thresholded RELATIVE to the image's own bright level (0.5 x P90) while
    the analytic mask uses the absolute sun_term < 0.3."""
    from satnerf_tpu.geo.geotiff import read_geotiff

    corrs, ious = [], []
    for p in sorted(glob.glob(os.path.join(train_out, "sun",
                                           f"*_epoch{epoch}.tif"))):
        src = re.sub(rf"_epoch{epoch}\.tif$", "", os.path.basename(p))
        side = os.path.join(data_dir, f"{src}_SUN.npy")
        if not os.path.exists(side):
            continue
        ana = np.load(side).ravel()
        pred = np.asarray(read_geotiff(p).data, np.float64).ravel()
        corrs.append(float(np.corrcoef(pred, ana)[0, 1]))
        sm = ana < 0.3
        pm = pred < 0.5 * np.percentile(pred, 90)
        ious.append(float((sm & pm).sum() / max((sm | pm).sum(), 1)))
    if not corrs:
        return None
    return {"corr_mean": float(np.mean(corrs)),
            "shadow_iou_mean": float(np.mean(ious)),
            "per_image_corr": corrs, "per_image_iou": ious}


def _beta_localization(data_dir, train_out, epoch):
    """Mean rendered beta inside vs outside each image's transient mask."""
    from satnerf_tpu.geo.geotiff import read_geotiff

    inside, outside = [], []
    for p in sorted(glob.glob(os.path.join(train_out, "beta",
                                           f"*_epoch{epoch}.tif"))):
        src = re.sub(rf"_epoch{epoch}\.tif$", "", os.path.basename(p))
        side = os.path.join(data_dir, f"{src}_TRANSIENT.npy")
        if not os.path.exists(side):
            continue
        mask = np.load(side).ravel()
        beta = np.asarray(read_geotiff(p).data, np.float64).ravel()
        inside.append(float(beta[mask].mean()))
        outside.append(float(beta[~mask].mean()))
    if not inside:
        return None
    return {"beta_in_mask": float(np.mean(inside)),
            "beta_off_mask": float(np.mean(outside)),
            "ratio": float(np.mean(inside) / max(np.mean(outside), 1e-9))}


def _phase_sweep(args):
    """Drive study_solar_interpolation.sun_interp on the trained checkpoint,
    then quantify that the sweep is non-degenerate: on a shadow-free scene
    (r4 state) every interpolated sun renders the same map; on the shaded
    AOI the extremes must decorrelate and the shadow mask must travel."""
    from study_solar_interpolation import sun_interp

    spec = json.loads(args._spec)
    name = spec["name"]
    epoch = _final_epoch(args.workdir, name)
    out_dir = os.path.join(args.workdir, "solar")
    sun_interp(name, os.path.join(args.workdir, "logs"), out_dir, epoch,
               n_interp=10)
    stats = _sweep_stats(os.path.join(out_dir, name, "sun"))

    mpath = os.path.join(args.workdir, "metrics", f"{name}.json")
    with open(mpath) as f:
        result = json.load(f)
    result["sweep"] = stats
    with open(mpath, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[{name}] sweep {json.dumps(stats)}")


def _sweep_stats(sun_dir):
    """Across the sweep's rendered sun maps (sorted by solar incidence
    angle): Pearson correlation + shadow-mask IoU between the two extreme
    suns, and the mean per-pixel std across all angles relative to the mean
    level. Shadow masks use the same relative threshold as _sun_agreement
    (pred < 0.5 x P90) since composited maps are not weight-normalized."""
    from satnerf_tpu.geo.geotiff import read_geotiff

    paths = []
    for p in glob.glob(os.path.join(sun_dir, "*deg.tif")):
        m = re.search(r"solar_incidence_angle_([0-9.]+)deg", p)
        if m:
            paths.append((float(m.group(1)), p))
    paths.sort()
    maps = [np.asarray(read_geotiff(p).data, np.float64).ravel()
            for _, p in paths]
    angles = [a for a, _ in paths]
    stack = np.stack(maps)
    lo, hi = stack[0], stack[-1]
    corr = float(np.corrcoef(lo, hi)[0, 1])
    masks = [m < 0.5 * np.percentile(m, 90) for m in (lo, hi)]
    iou = float((masks[0] & masks[1]).sum()
                / max((masks[0] | masks[1]).sum(), 1))
    shadow_frac = [float((m < 0.5 * np.percentile(m, 90)).mean())
                   for m in maps]
    return {
        "n_interp": len(maps),
        "angles_deg": angles,
        "corr_extremes": corr,
        "shadow_iou_extremes": iou,
        "rel_std": float(stack.std(axis=0).mean() / max(stack.mean(), 1e-9)),
        "shadow_frac_per_angle": shadow_frac,
    }


# ----------------------------------------------------------------- parent


def _child(args, spec, phase):
    cmd = [sys.executable, "-u"]
    if args.platform == "cpu":
        cmd += [os.path.join(REPO, "tools", "cpu_mesh_run.py"), "-n", "1"]
    cmd += [os.path.abspath(__file__), args.workdir,
            "--preset", args.preset, "--platform", args.platform,
            "--_phase", phase, "--_spec", json.dumps(spec)]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env)
    if r.returncode != 0:
        raise RuntimeError(
            f"{spec['name']} phase {phase} failed ({r.returncode})")
    print(f"[{spec['name']}:{phase}] done in {time.time() - t0:.0f}s")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("workdir")
    ap.add_argument("--preset", default="full", choices=sorted(PRESETS))
    ap.add_argument("--platform", default="cpu", choices=("cpu", "tpu"),
                    help="cpu = in-process-forced single virtual CPU device "
                         "(tools/cpu_mesh_run.py); tpu = session platform")
    ap.add_argument("--experiments", nargs="+",
                    default=["shadow", "solar", "transient", "ba"])
    ap.add_argument("--out", default=None,
                    help="also write the report here (CAPABILITY_r05.json)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--_phase", default=None,
                    choices=("train", "eval", "sweep"),
                    help=argparse.SUPPRESS)
    ap.add_argument("--_spec", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args._phase == "train":
        return _phase_train(args)
    if args._phase == "eval":
        return _phase_eval(args)
    if args._phase == "sweep":
        return _phase_sweep(args)

    p = PRESETS[args.preset]
    table = experiment_table(p)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}

    report = {"preset": args.preset, "config": p, "experiments": {}}
    for exp_name in args.experiments:
        exp = table[exp_name]
        for aoi_key, flags in exp["aoi"].items():
            aoi = os.path.join(args.workdir, "aoi", aoi_key)
            if not os.path.isdir(os.path.join(aoi, "data")):
                subprocess.run(
                    [sys.executable,
                     os.path.join(REPO, "tools", "make_synthetic_aoi.py"),
                     aoi, "--seed", str(args.seed)] + flags,
                    check=True, cwd=REPO, env=env)
        results = {}
        for run_name, aoi_key, overrides in exp["runs"]:
            name = f"{exp_name}_{run_name}"
            preset_keys = {k: p[k] for k in ("fc_units", "fc_layers",
                                             "n_samples", "batch_size",
                                             "max_train_steps", "lr")}
            overrides = dict(preset_keys, **overrides)  # run overrides win
            overrides["seed"] = args.seed
            spec = {"name": name, "aoi": aoi_key, "overrides": overrides,
                    "train_maps": exp_name in ("shadow", "transient")}
            mpath = os.path.join(args.workdir, "metrics", f"{name}.json")
            if not os.path.exists(mpath):
                ckpt_dir = os.path.join(args.workdir, "ckpts", name)
                if not glob.glob(os.path.join(ckpt_dir, "epoch=*.ckpt")):
                    _child(args, spec, "train")
                _child(args, spec, "eval")
            if run_name in exp.get("sweep", ()):
                with open(mpath) as f:
                    if "sweep" not in json.load(f):
                        _child(args, spec, "sweep")
            with open(mpath) as f:
                results[run_name] = json.load(f)
        report["experiments"][exp_name] = results

    gates = {}
    ex = report["experiments"]
    if "shadow" in ex:
        s = ex["shadow"]
        gates["shadow_snerf_beats_nerf_psnr"] = (
            s["snerf_sc05"]["val"]["psnr"] > s["nerf"]["val"]["psnr"])
        gates["shadow_sun_corr_sc05"] = s["snerf_sc05"].get(
            "sun", {}).get("corr_mean")
        gates["shadow_sun_iou_sc05"] = s["snerf_sc05"].get(
            "sun", {}).get("shadow_iou_mean")
    if "solar" in ex:
        sw = ex["solar"]["snerf_sc10"].get("sweep", {})
        gates["solar_sweep_corr_extremes"] = sw.get("corr_extremes")
        gates["solar_sweep_shadow_iou_extremes"] = sw.get(
            "shadow_iou_extremes")
        gates["solar_sweep_rel_std"] = sw.get("rel_std")
    if "transient" in ex:
        t = ex["transient"]
        gates["transient_satnerf_psnr_gain"] = (
            t["satnerf"]["val"]["psnr"] - t["snerf"]["val"]["psnr"])
        gates["transient_beta_ratio"] = t["satnerf"].get(
            "beta", {}).get("ratio")
    if "ba" in ex:
        b = ex["ba"]
        gates["ba_noise_degrades_mae"] = (
            b["noba"]["val"]["mae"] - b["ba"]["val"]["mae"])
        gates["ba_ds_recovers_mae"] = (
            b["noba"]["val"]["mae"] - b["noba_ds"]["val"]["mae"])
    report["gates"] = gates
    report["provenance"] = {
        "generator": "tools/run_capability_experiments.py --preset "
                     f"{args.preset} --platform {args.platform}",
        "round": 5,
    }

    path = os.path.join(args.workdir, "capability_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.out}")
    print(f"wrote {path}")
    print(json.dumps(gates, indent=2))
    return report


if __name__ == "__main__":
    main()
