#!/usr/bin/env python
"""Training-throughput benchmark on the flagship Sat-NeRF configuration.

Measures steady-state rays/sec/chip of the full jitted train step (render +
loss + grads + Adam) at the reference's canonical network shape (8x512 SIREN
trunk, 64 samples/ray, transient embedding; opt.py:50-55) with a batch sized
to saturate the chip. Prints ONE json line:

  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": N / 5e6}

vs_baseline is relative to the BASELINE.json north-star target of 5M
rays/sec/chip (the reference publishes no throughput numbers of its own —
BASELINE.md).

BENCH_MODE=render measures the serving path (forward render of eval/DSM
products, sharded across the mesh); BENCH_FUSED=rays additionally composites
inside the kernel (fused_render_rays) — the fastest serving configuration.
"""

import json
import os
import sys
import time

import numpy as np

# 64k rays x 64 samples saturates the chip (86k rays/s vs 77k at 16k rays);
# 128k overflows HBM in the backward
BATCH = int(os.environ.get("BENCH_BATCH", 65536))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
MODEL = os.environ.get("BENCH_MODEL", "sat-nerf")
PRECISION = os.environ.get("BENCH_PRECISION", "bfloat16")
FUSED = os.environ.get("BENCH_FUSED", "auto")
MODE = os.environ.get("BENCH_MODE", "train")  # train | render | image
# "render" = raw pipelined device throughput of the sharded render step;
# "image"  = the real eval/DSM product surface (render_image: host chunking
#            at cfg.chunk rays/launch + async dispatch + host concat)
SC = float(os.environ.get("BENCH_SC", 0.0))  # sc_lambda (solar correction)
NIMP = int(os.environ.get("BENCH_NIMP", 0))  # n_importance (fine model)
CHUNK = int(os.environ.get("BENCH_CHUNK", 0))  # 0 = config default


# Watchdog: the tunneled TPU runtime can wedge (every device op hangs —
# CLAUDE.md gotchas). Fail fast with a nonzero exit instead of hanging the
# caller forever; generous default covers the ~40-90 s remote compiles.
# A daemon THREAD, not SIGALRM: a wedged main thread is blocked inside a
# C call and never reaches the bytecode boundary where a signal handler
# could run, while os._exit from another thread always works.
WATCHDOG_S = int(os.environ.get("BENCH_WATCHDOG_S", 1500))


def _arm_watchdog():
    import threading

    def _abort():
        print(f"bench.py watchdog: no result within {WATCHDOG_S}s — "
              "TPU tunnel likely wedged (see CLAUDE.md)", file=sys.stderr)
        sys.stderr.flush()
        os._exit(1)

    if WATCHDOG_S > 0:
        t = threading.Timer(WATCHDOG_S, _abort)
        t.daemon = True
        t.start()
        return t
    return None


def main():
    watchdog = _arm_watchdog()
    import jax

    from satnerf_tpu.config import Config
    from satnerf_tpu.parallel.mesh import make_mesh, shard_rays
    from satnerf_tpu.train.system import NeRFSystem
    from satnerf_tpu.utils.flops import (V5E_PEAK_BF16, V5E_PEAK_F32,
                                         flops_per_ray)

    peak = V5E_PEAK_BF16 if PRECISION == "bfloat16" else V5E_PEAK_F32

    cfg = Config(model=MODEL, fc_units=512, fc_layers=8, n_samples=64,
                 batch_size=BATCH, sc_lambda=SC, n_importance=NIMP,
                 max_train_steps=300000, precision=PRECISION, fused=FUSED,
                 **({"chunk": CHUNK} if CHUNK else {}))
    mesh = make_mesh()
    n_chips = mesh.devices.size
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

    if MODE == "image":
        rays_np, ts_np = rays[:BATCH], ts[:BATCH]
        system.render_image(state.params, rays_np, ts_np)  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = system.render_image(state.params, rays_np, ts_np)
        dt = time.perf_counter() - t0  # device_get inside forces completion
        assert out["rgb_coarse"].shape[0] == BATCH
        per_chip = BATCH * STEPS / dt / n_chips
        fpr = flops_per_ray(MODEL, cfg.fc_layers, cfg.fc_units,
                            cfg.n_samples, mode="render", n_importance=NIMP)
        if watchdog is not None:
            watchdog.cancel()
        print(json.dumps({
            "metric": "image_rays_per_sec_per_chip",
            "value": round(per_chip, 1),
            "unit": "rays/s",
            "vs_baseline": round(per_chip / 5e6, 4),
            "flops_per_ray": round(fpr / 1e6, 2),
            "mfu": round(per_chip * fpr / peak, 4),
        }))
        return

    if MODE == "render":
        # novel-view-synthesis serving throughput: forward render only,
        # sharded across the mesh like eval/DSM grids
        render = system.make_eval_render()
        import jax.numpy as jnp

        r = jnp.asarray(rays[:BATCH])
        t = jnp.asarray(ts[:BATCH])
        k = jax.random.PRNGKey(1)
        out = render(state.params, r, t, k)
        float(out["rgb_coarse"].sum())

        # pipelined serving: batches stay in flight, completion is forced by
        # a device-side scalar dependency chain fetched ONCE at the end
        # (block_until_ready lies on the tunneled runtime — CLAUDE.md)
        acc = jax.jit(lambda s, o: s + o["rgb_coarse"].sum())
        s = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = render(state.params, r, t, k)
            s = acc(s, out)
        assert np.isfinite(float(s))
        dt = time.perf_counter() - t0
        per_chip = BATCH * STEPS / dt / n_chips
        fpr = flops_per_ray(MODEL, cfg.fc_layers, cfg.fc_units,
                            cfg.n_samples, mode="render",
                            n_importance=NIMP)
        if watchdog is not None:
            watchdog.cancel()
        print(json.dumps({
            "metric": "render_rays_per_sec_per_chip",
            "value": round(per_chip, 1),
            "unit": "rays/s",
            "vs_baseline": round(per_chip / 5e6, 4),
            "flops_per_ray": round(fpr / 1e6, 2),
            "mfu": round(per_chip * fpr / peak, 4),
        }))
        return

    step = system.make_train_step()
    key = jax.random.PRNGKey(1)

    # warmup: compile + 3 steps (fetch forces completion — on the tunneled
    # axon runtime, block_until_ready after a chain of donated steps can
    # return before the chain has executed, so every timed step is fetched)
    state, m = step(state, data, key)
    float(m["loss"])
    for _ in range(3):
        state, m = step(state, data, key)
    float(m["loss"])

    # steps chain through the donated state, so fetching the FINAL step's
    # loss forces the whole sequence; a per-step block_until_ready would add
    # one tunnel RTT (~30-56 ms) per step that the real training loop
    # (train/loop.py) never pays — same methodology as the render mode below
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, data, key)
    float(m["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = BATCH * STEPS / dt
    per_chip = rays_per_sec / n_chips
    fpr = flops_per_ray(MODEL, cfg.fc_layers, cfg.fc_units, cfg.n_samples,
                        mode="train", sc=SC > 0, n_importance=NIMP)
    if watchdog is not None:
        watchdog.cancel()
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "rays/s",
        "vs_baseline": round(per_chip / 5e6, 4),
        "flops_per_ray": round(fpr / 1e6, 2),
        "mfu": round(per_chip * fpr / peak, 4),
    }))


if __name__ == "__main__":
    main()
