#!/usr/bin/env python
"""Decompose the hierarchical SERVE dispatch (coarse kernel -> sample_pdf ->
union merge -> fine kernel) into separately-timed stages on the real chip.

VERDICT r3 weak #2 / ask #4: serve `--n_importance 8` ran at 151.3k rays/s
(55% MFU) vs the ~196k the coarse kernel rate implies for 136-sample rays,
while fine TRAINING reached 94% of the same two-launch ceiling. This probe
measures where the missing time goes: the two kernel launches themselves vs
the XLA glue (inverse-CDF resampling + the sorted union), and compares the
old glue (72-wide per-ray `jnp.sort` of the concatenated union,
rendering.py:129-131 idiom) against the rank-merge path
(`render/sampling.py:merge_sorted_zvals`).

Timing methodology = bench.py: stages stay in flight through a device-side
accumulator chain, one scalar fetch at the end (block_until_ready is not
trustworthy through the tunnel — CLAUDE.md).

Usage:  python tools/serve_nimp_probe.py [batch] [steps]
Prints one JSON line with seconds-per-launch and rays/s per stage.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
NIMP = int(os.environ.get("BENCH_NIMP", 8))


def main():
    import jax
    import jax.numpy as jnp

    from satnerf_tpu.config import Config
    from satnerf_tpu.parallel.mesh import make_mesh
    from satnerf_tpu.render.sampling import (merge_sorted_zvals, sample_pdf,
                                             stratified_zvals)
    from satnerf_tpu.train.system import NeRFSystem

    cfg = Config(model="sat-nerf", fc_units=512, fc_layers=8, n_samples=64,
                 batch_size=BATCH, n_importance=NIMP, precision="bfloat16",
                 fused="rays", max_train_steps=300000)
    mesh = make_mesh()
    system = NeRFSystem(cfg, dataset_len=1 << 20, mesh=mesh)
    state = system.init_state(jax.random.PRNGKey(0))
    params = state.params

    rng = np.random.RandomState(0)
    rays = rng.rand(BATCH, 11).astype(np.float32)
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
    rays[:, 6], rays[:, 7] = 0.0, 1.0
    r = jnp.asarray(rays)
    t = jnp.asarray(rng.randint(0, 30, BATCH).astype(np.int32))
    key = jax.random.PRNGKey(1)

    from satnerf_tpu.ops.pallas.fused_mlp import fused_render_rays

    ecfg = system.eval_render_cfg
    t_embed = jax.jit(system._embed_ts)(params, t)
    rays_o, rays_d = r[:, 0:3], r[:, 3:6]
    near, far = r[:, 6:7], r[:, 7:8]
    sun_d = r[:, 8:11]

    def coarse_fn(params, k, want_weights):
        z = stratified_zvals(k, near, far, ecfg.n_samples, ecfg.perturb,
                             ecfg.use_disp)
        out = fused_render_rays(
            params["coarse"], rays_o, rays_d, sun_d, t_embed, z,
            layers=cfg.fc_layers, feat=cfg.fc_units, skip=4, use_beta=True,
            tau=cfg.t_embbeding_tau, dtype=system.compute_dtype,
            return_weights=want_weights)
        return z, out

    # fixed inputs for the glue-only stages
    z_vals, coarse0 = jax.jit(lambda p, k: coarse_fn(p, k, True))(params, key)
    w0 = coarse0["weights"]
    jax.block_until_ready(w0)

    def glue_old(w, z, k):
        z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
        z_fine = sample_pdf(k, z_mid, w[:, 1:-1], NIMP, det=True)
        return jnp.sort(jnp.concatenate([z, z_fine], axis=-1), axis=-1)

    def glue_new(w, z, k):
        z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
        z_fine = sample_pdf(k, z_mid, w[:, 1:-1], NIMP, det=True)
        return merge_sorted_zvals(z, jnp.sort(z_fine, axis=-1))

    def pdf_only(w, z, k):
        z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
        return sample_pdf(k, z_mid, w[:, 1:-1], NIMP, det=True)

    z_all0 = jax.jit(glue_old)(w0, z_vals, key)

    def fine_fn(params, z_all):
        return fused_render_rays(
            params["fine"], rays_o, rays_d, sun_d, t_embed, z_all,
            layers=cfg.fc_layers, feat=cfg.fc_units, skip=4, use_beta=True,
            tau=cfg.t_embbeding_tau, dtype=system.compute_dtype,
            return_weights=False)

    full = system.make_eval_render()

    stages = {
        "coarse_now": jax.jit(
            lambda p, k: coarse_fn(p, k, False)[1]["rgb"].sum()),
        "coarse_w": jax.jit(
            lambda p, k: coarse_fn(p, k, True)[1]["rgb"].sum()),
        "pdf": jax.jit(lambda k: pdf_only(w0, z_vals, k).sum()),
        "glue_old": jax.jit(lambda k: glue_old(w0, z_vals, k).sum()),
        "glue_new": jax.jit(lambda k: glue_new(w0, z_vals, k).sum()),
        "fine": jax.jit(lambda p: fine_fn(p, z_all0)["rgb"].sum()),
        "full": jax.jit(
            lambda p, k: full(p, r, t, k)["rgb_fine"].sum()),
    }

    results = {}
    for name, fn in stages.items():
        if name in ("coarse_now", "coarse_w"):
            call = lambda: fn(params, key)
        elif name == "fine":
            call = lambda: fn(params)
        elif name == "full":
            call = lambda: fn(params, key)
        else:
            call = lambda: fn(key)
        s = call()
        float(s)  # compile + settle
        acc = jnp.zeros(())
        add = jax.jit(lambda a, b: a + b)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            acc = add(acc, call())
        assert np.isfinite(float(acc))
        dt = (time.perf_counter() - t0) / STEPS
        results[name] = {"s_per_launch": round(dt, 4),
                         "rays_per_s": round(BATCH / dt, 1)}
        print(name, results[name], flush=True)

    results["batch"] = BATCH
    print(json.dumps(results))


if __name__ == "__main__":
    main()
