#!/usr/bin/env python
"""Attribute train-step time on the real chip: trace N steady-state steps of
the bench configuration with jax.profiler, then aggregate device-op durations
from the perfetto trace (plugins/profile/*/\\*.trace.json.gz).

Usage: python tools/profile_step.py [out_dir]
Env knobs match bench.py (BENCH_BATCH, BENCH_MODEL, ...).
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 65536))
STEPS = int(os.environ.get("BENCH_STEPS", 10))
MODEL = os.environ.get("BENCH_MODEL", "sat-nerf")
PRECISION = os.environ.get("BENCH_PRECISION", "bfloat16")
FUSED = os.environ.get("BENCH_FUSED", "auto")
MODE = os.environ.get("BENCH_MODE", "train")  # train | render


def run(out_dir):
    import jax

    from satnerf_tpu.config import Config
    from satnerf_tpu.parallel.mesh import make_mesh, shard_rays
    from satnerf_tpu.train.system import NeRFSystem

    cfg = Config(model=MODEL, fc_units=512, fc_layers=8, n_samples=64,
                 batch_size=BATCH, sc_lambda=0.0, max_train_steps=300000,
                 precision=PRECISION, fused=FUSED)
    mesh = make_mesh()
    system = NeRFSystem(cfg, dataset_len=max(BATCH * 64, 1 << 20), mesh=mesh)
    state = system.init_state(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    n = 1 << 20
    rays = rng.rand(n, 11).astype(np.float32)
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
    rays[:, 6], rays[:, 7] = 0.0, 1.0
    rgbs = rng.rand(n, 3).astype(np.float32)
    ts = rng.randint(0, 30, n).astype(np.int32)
    _, (r, g, t) = shard_rays(mesh, rays, rgbs, ts)
    data = {"rays": r, "rgbs": g, "ts": t}

    if MODE == "render":
        import jax.numpy as jnp

        render = system.make_eval_render()
        rr = jnp.asarray(rays[:BATCH])
        tt = jnp.asarray(ts[:BATCH])
        k = jax.random.PRNGKey(1)
        acc = jax.jit(lambda s, o: s + o["rgb_coarse"].sum())
        out = render(state.params, rr, tt, k)
        float(out["rgb_coarse"].sum())
        jax.profiler.start_trace(out_dir)
        s = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = render(state.params, rr, tt, k)
            s = acc(s, out)
        assert np.isfinite(float(s))
        dt = time.perf_counter() - t0
        jax.profiler.stop_trace()
        print(f"{STEPS} renders in {dt:.3f}s -> {BATCH*STEPS/dt:,.0f} rays/s")
        return dt

    step = system.make_train_step()
    key = jax.random.PRNGKey(1)
    state, m = step(state, data, key)
    float(m["loss"])
    for _ in range(3):
        state, m = step(state, data, key)
    float(m["loss"])

    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, data, key)
        jax.block_until_ready(m["loss"])
    float(m["loss"])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"{STEPS} steps in {dt:.3f}s -> {BATCH*STEPS/dt:,.0f} rays/s")
    return dt


def aggregate(out_dir):
    paths = sorted(glob.glob(
        os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace.json.gz found under", out_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid names containing TPU/device; host python threads excluded
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dur_by_op = defaultdict(float)
    cnt_by_op = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        # only leaf-level XLA op tracks (skip the step/module summary rows)
        tname = e.get("name", "")
        dur = e.get("dur", 0) / 1e6  # us -> s
        dur_by_op[tname] += dur
        cnt_by_op[tname] += 1
        total += dur
    top = sorted(dur_by_op.items(), key=lambda kv: -kv[1])[:40]
    print(f"\ntop device ops (sum over trace, process filter TPU): "
          f"total {total:.3f}s")
    for name, d in top:
        print(f"{d*1000:10.1f} ms  x{cnt_by_op[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/satnerf_profile"
    os.makedirs(out, exist_ok=True)
    run(out)
    aggregate(out)
