#!/usr/bin/env python
"""Run bench.py across every measured kernel-path configuration and emit ONE
JSON artifact, so non-default-path regressions are visible round-over-round
instead of living as one-time DESIGN.md prose (VERDICT r3 weak #6).

Rows mirror docs/DESIGN.md "Config -> kernel path -> measured throughput":
train default / solar-correction / hierarchical / nerf, serve rays / points /
hierarchical / nerf, and the eval product surface. Each row is its own
bench.py subprocess (own compile cache entry, own watchdog) parameterized by
the BENCH_* env knobs bench.py already exposes.

Usage:
  python tools/bench_matrix.py [--out BENCH_MATRIX.json] [--rows a,b,...]
  python tools/bench_matrix.py --list

Writes {"rows": {name: bench-json-line}, "failed": {name: reason}} and exits
nonzero if any selected row failed.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> env overrides for bench.py (defaults: 64k batch, 20 steps, bf16,
# sat-nerf, fused auto, train mode)
ROWS = {
    "train_default": {},
    "train_sc": {"BENCH_SC": "0.05"},
    "train_nimp": {"BENCH_NIMP": "8"},
    "train_nerf": {"BENCH_MODEL": "nerf"},
    "serve_rays": {"BENCH_MODE": "render", "BENCH_FUSED": "rays",
                   "BENCH_BATCH": "262144"},
    "serve_points": {"BENCH_MODE": "render", "BENCH_FUSED": "on",
                     "BENCH_BATCH": "131072"},
    "serve_nimp": {"BENCH_MODE": "render", "BENCH_FUSED": "rays",
                   "BENCH_NIMP": "8", "BENCH_BATCH": "262144"},
    "serve_nerf": {"BENCH_MODE": "render", "BENCH_MODEL": "nerf",
                   "BENCH_BATCH": "262144"},
    "image_surface": {"BENCH_MODE": "image", "BENCH_BATCH": "262144",
                      "BENCH_STEPS": "5"},
}


def run_row(name: str, overrides: dict, timeout_s: int) -> dict:
    env = dict(os.environ)
    env.update(overrides)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout_s,
    )
    dt = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py exit {proc.returncode}: {proc.stderr[-500:]}")
    line = proc.stdout.strip().splitlines()[-1]
    row = json.loads(line)
    row["wall_s"] = round(dt, 1)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="BENCH_MATRIX.json")
    ap.add_argument("--rows", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-row wall timeout, seconds")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args(argv)

    if args.list:
        for k, v in ROWS.items():
            print(f"{k}: {v or '(defaults)'}")
        return 0

    selected = (args.rows.split(",") if args.rows else list(ROWS))
    unknown = [r for r in selected if r not in ROWS]
    if unknown:
        sys.exit(f"unknown rows: {unknown}; use --list")

    results, failed = {}, {}
    for name in selected:
        print(f"[{name}] running...", flush=True)
        try:
            row = run_row(name, ROWS[name], args.timeout)
            results[name] = row
            print(f"[{name}] {row['value']:,} {row['unit']} "
                  f"(mfu {row.get('mfu')}) in {row['wall_s']}s", flush=True)
        except Exception as e:  # keep measuring the remaining rows
            failed[name] = str(e)
            print(f"[{name}] FAILED: {e}", flush=True)

    out = {"rows": results, "failed": failed,
           "env": {k: v for k, v in os.environ.items()
                   if k.startswith("BENCH_")}}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} ({len(results)} ok, {len(failed)} failed)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
