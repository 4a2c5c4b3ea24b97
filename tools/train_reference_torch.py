#!/usr/bin/env python
"""Convergence-level cross-framework parity: train the REFERENCE's executed
torch stack on rays from OUR data pipeline, then push the resulting
checkpoint through OUR eval/DSM chain next to a same-config run of our own
trainer, and report |ΔPSNR| / |ΔSSIM| / |ΔMAE|.

This goes beyond the single-step parity of tests/test_reference_parity.py:
it executes the reference's actual training DYNAMICS — its `render_rays`
(/root/reference/rendering.py:52-158), its `SatNerfLoss`/`SNerfLoss`
(/root/reference/metrics.py:36-73), a real `torch.optim.Adam(lr, wd=0)` +
`StepLR(step_size=1, gamma=0.9)` stepped per epoch
(/root/reference/main.py:81-94, /root/reference/train_utils.py:41-57), the
1-based `train_steps` counter and the hardcoded `< 2`-epoch beta warm-up
(/root/reference/main.py:120,128-131), and per-epoch DataLoader-style
shuffling — end to end, for thousands of steps, on the same synthetic AOI
our own trainer consumes.

The torch run is written as a run directory our tooling reads natively:
  {workdir}/ckpts/{exp}/epoch={n}.ckpt   — PyTorch-Lightning-style payload
                                           (state_dict keyed nerf_coarse.* /
                                           embedding_t.*; eval/loader.py
                                           detects + imports it)
  {workdir}/logs/{exp}/opts.json         — the model spec for rehydration

Usage (CPU-sized; prefix with tools/cpu_mesh_run.py off-chip):
  python tools/make_synthetic_aoi.py /tmp/cparity --size 64 --n_train 4
  python tools/train_reference_torch.py /tmp/cparity /tmp/cparity/work \
      --batch_size 512 --max_train_steps 960 --compare

`--compare` additionally trains OUR system at the identical config, evals
both checkpoints through eval.py's eval_aoi, and writes
{workdir}/convergence_report.json. tests/test_convergence_parity.py runs
this module at a smaller config and asserts the deltas.

Process layout: the torch phase runs in the parent; every JAX phase (our
trainer, both evals) runs in its own subprocess, which also mirrors how the
CLIs are really driven. `--cpu_mesh` routes the child phases through
tools/cpu_mesh_run.py (the sitecustomize pins the axon TPU platform, so the
forcing must happen in-process inside each child), on ONE virtual device by
default: XLA's CPU all-reduce rendezvous hard-aborts after 40 s
(rendezvous.cc:127) when 8 device threads share one core at a real config
size, and dynamics parity needs no mesh — the sharded step is pinned by the
suite's shard_map tests. Completed phases are skipped on rerun (the
checkpoint / metrics json on disk are the phase state).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference"


# ----------------------------------------------------------- reference import


def load_reference(ref_dir: str = REF):
    """Import the reference's own modules (torch CPU executes them here).
    kornia is stubbed: unavailable in this env and not on the training path
    (reference metrics.py:6 imports it at module level only)."""
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        klosses = types.ModuleType("kornia.losses")

        def _ssim_stub(*a, **k):
            raise RuntimeError("kornia stub: ssim unavailable in this env")

        klosses.ssim = _ssim_stub
        kornia.losses = klosses
        sys.modules["kornia"] = kornia
        sys.modules["kornia.losses"] = klosses
    if ref_dir not in sys.path:
        sys.path.append(ref_dir)
    import metrics as ref_metrics
    import models as ref_models
    import rendering as ref_rendering

    return types.SimpleNamespace(models=ref_models, rendering=ref_rendering,
                                 metrics=ref_metrics)


def _ref_args(cfg):
    """The argparse-namespace surface render_rays/load_model/load_loss
    consume (reference opt.py:14-77 field names)."""
    return types.SimpleNamespace(
        model=cfg.model, n_samples=cfg.n_samples,
        n_importance=cfg.n_importance, sc_lambda=cfg.sc_lambda,
        chunk=1 << 20, noise_std=cfg.noise_std, fc_layers=cfg.fc_layers,
        fc_units=cfg.fc_units, t_embbeding_tau=cfg.t_embbeding_tau,
    )


# ------------------------------------------------------------- torch training


def train_reference_torch(cfg, rays, rgbs, ts, seed: int = 0,
                          log_every: int = 50, depth=None):
    """The reference's executed training loop on a device-free ray tensor.

    Faithful to main.py's semantics:
      - per-epoch shuffle, ceil(N/B) batches incl. a short final batch
        (DataLoader(shuffle=True), drop_last default False — main.py:97-102)
      - `train_steps` incremented BEFORE the loss selection (main.py:120)
      - sat-nerf warm-up: SNerfLoss while
        get_current_epoch(train_steps) < 2, i.e.
        train_steps // (N // B) < 2 (main.py:128-131, the floor-division
        epoch counter of train_utils.py:14-15)
      - `args.noise_std *= 0.9` per step (main.py:132)
      - depth supervision (`depth=(d_rays, d_depths, d_ts)`, cfg.ds_lambda>0):
        a second forward on a keypoint-ray batch from an independently
        shuffled, cycled loader; the reference's executed `DepthLoss`
        (metrics.py:75-92) with weights unless ds_noweights, ADDED only
        while train_steps < round(ds_drop * max_train_steps)
        (main.py:34-38,134-142 — the forward still runs after the drop)
      - StepLR(gamma=0.9) stepped once per DataLoader pass
        (pl 'interval': 'epoch' — main.py:86-94)

    Returns (tmodels, per-step losses, per-step lrs).
    """
    import torch

    if cfg.n_importance > 0 and cfg.model in ("s-nerf", "sat-nerf"):
        # the reference cannot execute these combinations (SURVEY.md §5):
        # s-nerf fine uses the undefined rays_d_ (rendering.py:134); the
        # sat-nerf fine sc pass rebinds result_ (rendering.py:146), dropping
        # every *_coarse key before its own loss reads them; and SatNerfLoss
        # itself composites the fine branch's (n_samples+n_importance)-wide
        # weights_fine against the n_samples-wide per-sample beta_coarse
        # (metrics.py:22) — a shape crash the moment the 2-epoch beta
        # warm-up ends
        if cfg.model == "s-nerf":
            raise ValueError(
                "reference bug: s-nerf + n_importance crashes in "
                "/root/reference/rendering.py:134 (undefined rays_d_)")
        if cfg.sc_lambda > 0:
            raise ValueError(
                "reference bug: sat-nerf + sc_lambda + n_importance crashes "
                "in /root/reference/rendering.py:146 (result_ rebound to the "
                "fine sun pass, *_coarse keys lost)")
        spe_guard = max(rays.shape[0] // cfg.batch_size, 1)
        if cfg.max_train_steps >= 2 * spe_guard:
            raise ValueError(
                "reference bug: sat-nerf + n_importance crashes in "
                "/root/reference/metrics.py:22 once beta activates (after "
                "the 2-epoch warm-up, main.py:128-131): weights_fine is "
                f"{cfg.n_samples + cfg.n_importance}-wide but beta_coarse "
                f"is {cfg.n_samples}-wide per sample. This run would cross "
                f"the warm-up at step {2 * spe_guard} of "
                f"{cfg.max_train_steps}; use --model nerf for hierarchical "
                "parity runs")

    ref = load_reference()
    torch.manual_seed(seed)
    args = _ref_args(cfg)
    tmodels = {"coarse": ref.models.load_model(args)}
    if cfg.n_importance > 0:
        tmodels["fine"] = ref.models.load_model(args)
    use_ts = cfg.model == "sat-nerf"
    if use_ts:
        tmodels["t"] = torch.nn.Embedding(cfg.t_embbeding_vocab,
                                          cfg.t_embbeding_tau)

    params = []
    for m in tmodels.values():
        params += list(m.parameters())
    opt = torch.optim.Adam(params, lr=cfg.lr, weight_decay=0)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.9)

    loss_fn = ref.metrics.load_loss(args)
    loss_without_beta = (ref.metrics.SNerfLoss(lambda_sc=cfg.sc_lambda)
                         if use_ts else None)

    n = rays.shape[0]
    b = cfg.batch_size
    spe_floor = n // b  # the reference's epoch counter denominator
    rng = np.random.RandomState(seed)
    t_rays = torch.from_numpy(np.asarray(rays, np.float32))
    t_rgbs = torch.from_numpy(np.asarray(rgbs, np.float32))
    t_ts = torch.from_numpy(np.asarray(ts, np.int64)) if use_ts else None

    # depth supervision: the reference's DepthLoss over keypoint rays from a
    # second shuffled DataLoader cycled alongside the color one
    # (main.py:34-38,96-109,134-142)
    depth_loss = None
    if depth is not None and cfg.ds_lambda > 0:
        d_rays, d_depths, d_ts = depth
        depth_loss = ref.metrics.DepthLoss(lambda_ds=cfg.ds_lambda)
        ds_drop = np.round(cfg.ds_drop * cfg.max_train_steps)  # main.py:38
        td_rays = torch.from_numpy(np.asarray(d_rays, np.float32))
        td_depths = torch.from_numpy(np.asarray(d_depths, np.float32))
        td_ts = (torch.from_numpy(np.asarray(d_ts, np.int64))
                 if use_ts else None)
        nd = td_rays.shape[0]
        d_rng = np.random.RandomState(seed + 1)
        d_perm, d_lo = d_rng.permutation(nd), 0

        def next_depth_batch():
            nonlocal d_perm, d_lo
            if d_lo >= nd:  # cycled shuffled loader
                d_perm, d_lo = d_rng.permutation(nd), 0
            idx = d_perm[d_lo:d_lo + b]
            d_lo += b
            return idx

    losses, lrs = [], []
    train_steps = 0
    t0 = time.time()
    while train_steps < cfg.max_train_steps:
        perm = rng.permutation(n)
        for lo in range(0, n, b):  # ceil batches: short tail kept
            if train_steps >= cfg.max_train_steps:
                break
            train_steps += 1  # main.py:120 — BEFORE the epoch check
            idx = perm[lo:lo + b]
            batch_rays, batch_rgbs = t_rays[idx], t_rgbs[idx]
            batch_ts = t_ts[idx] if use_ts else None
            results = ref.rendering.render_rays(tmodels, args, batch_rays,
                                                batch_ts)
            if ("beta_coarse" in results
                    and train_steps // max(spe_floor, 1) < 2):
                loss, _ = loss_without_beta(results, batch_rgbs)
            else:
                loss, _ = loss_fn(results, batch_rgbs)
            args.noise_std *= 0.9
            if depth_loss is not None:  # main.py:134-142 ordering: after
                # the noise decay; forward every step, added until ds_drop
                didx = next_depth_batch()
                d_res = ref.rendering.render_rays(
                    tmodels, args, td_rays[didx],
                    td_ts[didx] if use_ts else None)
                kp_depths = td_depths[didx, 0]
                kp_weights = (1. if cfg.ds_noweights
                              else td_depths[didx, 1])
                loss_depth, _ = depth_loss(d_res, kp_depths, kp_weights)
                if train_steps < ds_drop:
                    loss = loss + loss_depth
            lrs.append(opt.param_groups[0]["lr"])
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(loss.item())
            if log_every and train_steps % log_every == 0:
                rate = train_steps * b / max(time.time() - t0, 1e-9)
                print(f"[torch-ref] step {train_steps}/"
                      f"{cfg.max_train_steps} loss {losses[-1]:.5f} "
                      f"lr {lrs[-1]:.2e} rays/s {rate:,.0f}")
        sched.step()  # end of the DataLoader pass
    return tmodels, losses, lrs


def save_reference_run(cfg, tmodels, workdir: str, exp_name: str,
                       n_epoch: int) -> str:
    """Write the torch run as a run dir our eval stack loads natively:
    a PL-style .ckpt (the format import_torch_checkpoint/eval.loader read)
    plus opts.json. Returns the checkpoint path."""
    import torch

    sd = {}
    for key, prefix in (("coarse", "nerf_coarse"), ("fine", "nerf_fine")):
        if key in tmodels:
            for name, p in tmodels[key].state_dict().items():
                sd[f"{prefix}.{name}"] = p
    if "t" in tmodels:
        sd["embedding_t.weight"] = tmodels["t"].weight.detach().clone()

    ckpt_dir = os.path.join(workdir, "ckpts", exp_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt = os.path.join(ckpt_dir, f"epoch={n_epoch}.ckpt")
    torch.save({"state_dict": sd, "epoch": n_epoch}, ckpt)
    cfg.dump()
    return ckpt


# ------------------------------------------------------------- orchestration


def _build_parser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("aoi_dir", help="make_synthetic_aoi output (data/ + gt/)")
    ap.add_argument("workdir")
    ap.add_argument("--model", default="sat-nerf",
                    choices=["nerf", "s-nerf", "sat-nerf"])
    ap.add_argument("--fc_units", type=int, default=64)
    ap.add_argument("--fc_layers", type=int, default=8)
    ap.add_argument("--n_samples", type=int, default=16)
    ap.add_argument("--n_importance", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--max_train_steps", type=int, default=960)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--sc_lambda", type=float, default=0.05)
    ap.add_argument("--ds_lambda", type=float, default=0.0,
                    help="depth-supervision weight; >0 trains BOTH stacks "
                         "with the reference's DepthLoss dynamics "
                         "(/root/reference/main.py:134-142) on the AOI's "
                         "keypoint rays (make_synthetic_aoi --keypoints)")
    ap.add_argument("--ds_drop", type=float, default=0.25)
    ap.add_argument("--ds_noweights", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--compare", action="store_true",
                    help="also train OUR system at the same config and "
                         "write convergence_report.json with the deltas")
    ap.add_argument("--fused", default="auto",
                    help="our trainer's kernel path (compare mode)")
    ap.add_argument("--cpu_mesh", action="store_true",
                    help="run the JAX phases on the CPU (via "
                         "tools/cpu_mesh_run.py) instead of the session "
                         "platform")
    ap.add_argument("--cpu_devices", type=int, default=1,
                    help="virtual device count for --cpu_mesh. Default 1: "
                         "dynamics parity needs no mesh, and XLA's CPU "
                         "all-reduce rendezvous hard-aborts after 40 s "
                         "(rendezvous.cc) when 8 device threads share one "
                         "core at a real config size — the sharded path is "
                         "covered by the suite's shard_map tests instead")
    # internal: subprocess phase dispatch (see module docstring)
    ap.add_argument("--_phase", default=None, choices=["ours", "eval"],
                    help=argparse.SUPPRESS)
    ap.add_argument("--_run_id", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_epoch", type=int, default=None,
                    help=argparse.SUPPRESS)
    return ap


def _configs(args):
    from satnerf_tpu.config import Config

    common = dict(
        model=args.model, fc_units=args.fc_units, fc_layers=args.fc_layers,
        n_samples=args.n_samples, n_importance=args.n_importance,
        batch_size=args.batch_size, max_train_steps=args.max_train_steps,
        lr=args.lr, sc_lambda=args.sc_lambda, ds_lambda=args.ds_lambda,
        ds_drop=args.ds_drop, ds_noweights=args.ds_noweights, noise_std=0.0,
        root_dir=os.path.join(args.aoi_dir, "data"),
        gt_dir=os.path.join(args.aoi_dir, "gt"),
        cache_dir=os.path.join(args.aoi_dir, "cache"),
        seed=args.seed,
        logs_dir=os.path.join(args.workdir, "logs"),
        ckpts_dir=os.path.join(args.workdir, "ckpts"),
    )
    tcfg = Config(exp_name="torch_ref", **common)
    # shuffle sampling = the same per-epoch permutation semantics as the
    # reference DataLoader; f32 so CPU-mesh comparisons carry no dtype skew
    ocfg = Config(exp_name="ours", sampling="shuffle", precision="float32",
                  fused=args.fused, save_every_n_epochs=10 ** 6,
                  val_every_n_epochs=10 ** 6, num_sanity_val_steps=0,
                  **common)
    return tcfg, ocfg, common


def _child(args, extra):
    """Re-invoke this module for a JAX phase, optionally on the CPU mesh."""
    cmd = [sys.executable]
    if args.cpu_mesh:
        cmd += [os.path.join(REPO, "tools", "cpu_mesh_run.py"),
                "-n", str(args.cpu_devices)]
    cmd.append(os.path.abspath(__file__))
    cmd += [args.aoi_dir, args.workdir]
    passthrough = ["--model", args.model, "--fc_units", str(args.fc_units),
                   "--fc_layers", str(args.fc_layers),
                   "--n_samples", str(args.n_samples),
                   "--n_importance", str(args.n_importance),
                   "--batch_size", str(args.batch_size),
                   "--max_train_steps", str(args.max_train_steps),
                   "--lr", str(args.lr), "--sc_lambda", str(args.sc_lambda),
                   "--ds_lambda", str(args.ds_lambda),
                   "--ds_drop", str(args.ds_drop),
                   "--seed", str(args.seed), "--fused", args.fused]
    if args.ds_noweights:
        passthrough.append("--ds_noweights")
    cmd += passthrough + extra
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"phase {extra} failed (exit {r.returncode})")
    print(f"[phase {extra[1]}] done in {time.time() - t0:.1f}s")


def _metrics_path(workdir, run_id):
    return os.path.join(workdir, "eval", f"{run_id}_metrics.json")


def _stamp_config(workdir, args):
    """Phase-skip is keyed on on-disk products at epoch={t_epoch}; a rerun
    into the same workdir with changed hyperparameters that keep the same
    step count (lr, sc_lambda, ds_lambda, fc_units, ...) would silently mix
    stale and fresh phases. Stamp the full CLI config; on mismatch, drop
    every phase product so all phases rerun fresh (ADVICE r4)."""
    import shutil

    cfg = {k: v for k, v in sorted(vars(args).items())
           if not k.startswith("_") and k not in ("workdir", "cpu_mesh",
                                                  "cpu_devices")}
    stamp_path = os.path.join(workdir, "harness_config.json")
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            old = json.load(f)
        if old != cfg:
            changed = sorted(set(old) ^ set(cfg)
                             | {k for k in set(old) & set(cfg)
                                if old[k] != cfg[k]})
            print(f"[harness] config changed ({', '.join(changed)}); "
                  f"invalidating completed phases in {workdir}")
            for sub in ("ckpts", "logs", "eval"):
                shutil.rmtree(os.path.join(workdir, sub), ignore_errors=True)
            for leftover in ("convergence_report.json",):
                try:
                    os.remove(os.path.join(workdir, leftover))
                except OSError:
                    pass
    os.makedirs(workdir, exist_ok=True)
    with open(stamp_path, "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True)


def main(argv=None):
    args = _build_parser().parse_args(argv)
    tcfg, ocfg, common = _configs(args)
    workdir = args.workdir

    if args._phase == "ours":
        from satnerf_tpu.train.loop import fit

        fit(ocfg)
        return

    if args._phase == "eval":
        from eval import eval_aoi

        m = eval_aoi(args._run_id, os.path.join(workdir, "logs"),
                     os.path.join(workdir, "eval"), args._epoch, split="val")
        with open(_metrics_path(workdir, args._run_id), "w") as f:
            json.dump(m, f)
        return

    # ---- parent: the reference's executed trainer on OUR rays (torch only;
    # JAX work happens in child processes). Completed phases are skipped on
    # rerun — their on-disk products (checkpoint / metrics json) ARE the
    # phase state, so a crash in a later phase (e.g. the XLA CPU collective
    # rendezvous aborting under host contention) never costs the ~16-min
    # torch phase again. _stamp_config guards the skip against hyperparameter
    # changes that keep the same step count.
    _stamp_config(workdir, args)
    from satnerf_tpu.data import SatelliteScene

    scene = SatelliteScene(tcfg.root_dir, split="train",
                           cache_dir=tcfg.cache_dir)
    n = len(scene)
    spe = n // args.batch_size
    t_epoch = args.max_train_steps // max(spe, 1)
    print(f"dataset: {n} rays, spe(floor) {spe}, "
          f"{args.max_train_steps} steps = ~{t_epoch} epochs")
    t_ckpt = os.path.join(workdir, "ckpts", "torch_ref",
                          f"epoch={t_epoch}.ckpt")
    if os.path.exists(t_ckpt):
        print(f"[torch-ref] reusing completed phase: {t_ckpt}")
    else:
        depth = None
        if args.ds_lambda > 0:
            from satnerf_tpu.data.satellite_depth import SatelliteDepthScene

            dscene = SatelliteDepthScene(tcfg.root_dir, split="train",
                                         cache_dir=tcfg.cache_dir)
            depth = (dscene.all_rays, dscene.all_depths, dscene.all_ids)
            print(f"depth supervision: {dscene.all_rays.shape[0]} keypoint "
                  f"rays, lambda {args.ds_lambda}, drop at "
                  f"{np.round(args.ds_drop * args.max_train_steps):.0f}")
        tmodels, tlosses, _ = train_reference_torch(
            tcfg, scene.all_rays, scene.all_rgbs, scene.all_ids,
            seed=args.seed, depth=depth)
        ckpt = save_reference_run(tcfg, tmodels, workdir, "torch_ref",
                                  t_epoch)
        print(f"[torch-ref] final loss {tlosses[-1]:.5f}; checkpoint {ckpt}")

    if not os.path.exists(_metrics_path(workdir, "torch_ref")):
        _child(args, ["--_phase", "eval", "--_run_id", "torch_ref",
                      "--_epoch", str(t_epoch)])
    with open(_metrics_path(workdir, "torch_ref")) as f:
        t_metrics = json.load(f)
    print(f"[torch-ref] eval: {t_metrics}")
    report = {"config": {k: v for k, v in common.items()
                         if not k.endswith("_dir")},
              "steps": args.max_train_steps, "n_rays": n,
              "torch_reference": t_metrics}

    if args.compare:
        o_ckpt = os.path.join(workdir, "ckpts", "ours",
                              f"epoch={t_epoch}.ckpt")
        if os.path.exists(o_ckpt):
            print(f"[ours] reusing completed phase: {o_ckpt}")
        else:
            _child(args, ["--_phase", "ours"])
        if not os.path.exists(_metrics_path(workdir, "ours")):
            _child(args, ["--_phase", "eval", "--_run_id", "ours",
                          "--_epoch", str(t_epoch)])
        with open(_metrics_path(workdir, "ours")) as f:
            o_metrics = json.load(f)
        print(f"[ours] eval: {o_metrics}")
        report["ours"] = o_metrics
        report["delta"] = {
            k: abs(t_metrics[k] - o_metrics[k])
            for k in ("psnr", "ssim", "mae")
            if np.isfinite(t_metrics[k]) and np.isfinite(o_metrics[k])
        }

    path = os.path.join(workdir, "convergence_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {path}")
    print(json.dumps(report.get("delta", report["torch_reference"])))
    return report


if __name__ == "__main__":
    main()
