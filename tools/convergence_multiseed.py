#!/usr/bin/env python
"""Multi-seed convergence parity (VERDICT r4 ask #4): run the
cross-framework harness (tools/train_reference_torch.py --compare) with N
seeds per framework at the scaled-up config, measure the CROSS-SEED spread
of each framework's converged val metrics, and report the cross-framework
delta against that spread.

This replaces r4's single-seed "inside seed noise" claim (which borrowed a
spread number from a different experiment) with a measured sigma from the
SAME config: the report carries per-seed torch/ours metrics, per-framework
std-dev, the |mean-vs-mean| delta, and a recommended band (~2 sigma, the
value tests/test_convergence_parity.py's CONVERGED_BAND is tightened to).
Reference protocol: per-AOI mean PSNR/SSIM/MAE over the test split
(/root/reference/eval_satnerf.py:286-313).

Usage (the r5 artifact command):
  python tools/convergence_multiseed.py /tmp/cms_aoi /tmp/cms_work \
      --out CONVERGENCE_r05.json --seeds 0 1 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

METRICS = ("psnr", "ssim", "mae")


def run_seed(args, seed: int) -> dict:
    work = os.path.join(args.workdir, f"seed{seed}")
    report_path = os.path.join(work, "convergence_report.json")
    cmd = [sys.executable,
           os.path.join(REPO, "tools", "train_reference_torch.py"),
           args.aoi_dir, work, "--compare", "--cpu_mesh",
           "--model", args.model,
           "--fc_units", str(args.fc_units),
           "--fc_layers", str(args.fc_layers),
           "--n_samples", str(args.n_samples),
           "--batch_size", str(args.batch_size),
           "--max_train_steps", str(args.max_train_steps),
           "--sc_lambda", str(args.sc_lambda),
           "--seed", str(seed)]
    t0 = time.time()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(cmd, cwd=REPO, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"seed {seed} harness failed ({r.returncode})")
    with open(report_path) as f:
        report = json.load(f)
    print(f"[seed {seed}] done in {time.time() - t0:.0f}s: "
          f"delta {report['delta']}")
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("aoi_dir")
    ap.add_argument("workdir")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--model", default="sat-nerf")
    ap.add_argument("--fc_units", type=int, default=64)
    ap.add_argument("--fc_layers", type=int, default=8)
    ap.add_argument("--n_samples", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--max_train_steps", type=int, default=3000)
    ap.add_argument("--sc_lambda", type=float, default=0.05)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--n_train", type=int, default=8)
    ap.add_argument("--out", default=None,
                    help="also write the aggregate report here "
                         "(e.g. CONVERGENCE_r05.json)")
    args = ap.parse_args(argv)

    if not os.path.isdir(os.path.join(args.aoi_dir, "data")):
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "make_synthetic_aoi.py"),
             args.aoi_dir, "--size", str(args.size),
             "--n_train", str(args.n_train), "--n_test", "1"],
            check=True, cwd=REPO, env=env)

    per_seed = {}
    for seed in args.seeds:
        per_seed[seed] = run_seed(args, seed)

    torch_m = {k: [per_seed[s]["torch_reference"][k] for s in args.seeds]
               for k in METRICS}
    ours_m = {k: [per_seed[s]["ours"][k] for s in args.seeds]
              for k in METRICS}
    agg = {
        "config": per_seed[args.seeds[0]]["config"],
        "steps": args.max_train_steps,
        "seeds": list(args.seeds),
        "torch_reference": {
            k: {"per_seed": torch_m[k], "mean": float(np.mean(torch_m[k])),
                "std": float(np.std(torch_m[k], ddof=1))} for k in METRICS},
        "ours": {
            k: {"per_seed": ours_m[k], "mean": float(np.mean(ours_m[k])),
                "std": float(np.std(ours_m[k], ddof=1))} for k in METRICS},
    }
    # cross-framework delta of seed means, vs the pooled cross-seed sigma
    agg["delta_of_means"] = {
        k: abs(agg["torch_reference"][k]["mean"] - agg["ours"][k]["mean"])
        for k in METRICS}
    agg["seed_sigma_pooled"] = {
        k: float(np.sqrt(0.5 * (agg["torch_reference"][k]["std"] ** 2
                                + agg["ours"][k]["std"] ** 2)))
        for k in METRICS}
    agg["delta_in_sigmas"] = {
        k: (agg["delta_of_means"][k] / agg["seed_sigma_pooled"][k]
            if agg["seed_sigma_pooled"][k] > 0 else float("inf"))
        for k in METRICS}
    agg["recommended_band_2sigma"] = {
        k: 2.0 * agg["seed_sigma_pooled"][k] for k in METRICS}
    agg["provenance"] = {
        "generator": "tools/convergence_multiseed.py",
        "aoi": f"tools/make_synthetic_aoi.py --size {args.size} "
               f"--n_train {args.n_train} --n_test 1",
        "round": 5,
        "note": "per-seed reports under the workdir; torch_reference = "
                "/root/reference's executed render_rays + SatNerfLoss under "
                "real torch Adam+StepLR; both frameworks trained with seeds "
                "{0,1,2} and scored by the same eval/DSM chain",
    }

    path = os.path.join(args.workdir, "convergence_multiseed.json")
    os.makedirs(args.workdir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(agg, f, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(agg, f, indent=2)
        print(f"wrote {args.out}")
    print(f"wrote {path}")
    print(json.dumps({"delta_of_means": agg["delta_of_means"],
                      "seed_sigma_pooled": agg["seed_sigma_pooled"],
                      "delta_in_sigmas": agg["delta_in_sigmas"]}, indent=2))
    return agg


if __name__ == "__main__":
    main()
