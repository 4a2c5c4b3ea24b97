"""The training driver: dataset loading, device placement, the step loop,
per-epoch validation, and checkpointing.

Functional replacement for pytorch-lightning's Trainer + the NeRF_pl module
glue (main.py:233-261). Behavior parity:

  * `num_sanity_val_steps` validation batches before training (main.py:257)
  * validation every epoch; the first val item is a train image excluded from
    metrics (main.py:170-171, 202-203)
  * checkpoints at every `save_every_n_epochs`-th epoch, named epoch={n}.ckpt
  * per-step scalars: lr, train/loss, train/psnr (+ loss terms)
  * optional DSM MAE against lidar GT during validation when gt_dir is set

The hot loop never touches the host: the dataset lives sharded on-device and
batches are drawn inside the jitted step (train/system.py).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from satnerf_tpu.config import Config
from satnerf_tpu.data import load_dataset
from satnerf_tpu.eval.images import save_nerf_output_to_images
from satnerf_tpu.eval.val_ts import (
    find_best_embedding_for_val_image,
    predefined_val_ts,
)
from satnerf_tpu.ops.ssim import psnr as psnr_np
from satnerf_tpu.ops.ssim import ssim as ssim_np
from satnerf_tpu.parallel.distributed import is_main, maybe_init_distributed
from satnerf_tpu.parallel.mesh import make_mesh, shard_rays
from satnerf_tpu.train.checkpoints import (
    checkpoint_path,
    load_checkpoint,
    save_checkpoint,
)
from satnerf_tpu.train.logging import RunLogger, visualize_depth
from satnerf_tpu.train.system import NeRFSystem


def validate(system: NeRFSystem, state, val_dataset, cfg: Config,
             logger: RunLogger, step: int, epoch: int,
             max_images: int | None = None, save_images: bool = False):
    """Render val images, log PSNR/SSIM (+ DSM MAE for sat data)."""
    n_images = len(val_dataset)
    if max_images is not None:
        n_images = min(n_images, max_images)

    metrics = {"psnr": [], "ssim": [], "mae": []}
    for i in range(n_images):
        sample = val_dataset.load_image(i)
        rays, rgbs = sample["rays"], sample["rgbs"]
        h, w = int(sample["h"]), int(sample["w"])

        ts = None
        if system.use_ts:
            t = predefined_val_ts(sample["src_id"])
            if t is None:
                own = int(sample["ts"][0])
                vocab = cfg.t_embbeding_vocab
                n_train = min(getattr(val_dataset, "n_train", vocab) or vocab,
                              vocab)
                if own < n_train:
                    # the val-probe train image: its own id IS a trained
                    # embedding (datasets/satellite.py:127-133 keeps item 0
                    # a train image)
                    t = own
                else:
                    # unknown-AOI val image: its id (n_train + i) is outside
                    # the embedding vocab — JAX would silently clamp the
                    # gather to an arbitrary embedding. Search the train
                    # embeddings for the best-PSNR surrogate instead,
                    # matching eval.py (reference eval_satnerf.py:148-164).
                    t = find_best_embedding_for_val_image(
                        system, state.params, rays, rgbs,
                        train_indices=range(n_train))
            ts = np.full(rays.shape[0], t, dtype=np.int32)

        results = system.render_image(state.params, rays, ts)
        typ = "fine" if "rgb_fine" in results else "coarse"
        pred = results[f"rgb_{typ}"]

        img = np.moveaxis(pred.reshape(h, w, 3), -1, 0)
        img_gt = np.moveaxis(rgbs.reshape(h, w, 3), -1, 0)
        depth_vis = visualize_depth(results[f"depth_{typ}"].reshape(h, w))
        is_val_image = not (cfg.data == "sat" and i == 0)
        split = "val" if is_val_image else "train"
        idx = i - 1 if is_val_image else i
        logger.images(step, f"{split}_{idx}/GT_pred_depth",
                      np.stack([img_gt, img, depth_vis]))

        if save_images and cfg.data == "sat" and i <= 1:
            out_dir = os.path.join(cfg.logs_dir, cfg.exp_name, split)
            save_nerf_output_to_images(val_dataset, sample, results, out_dir,
                                       epoch)

        p = psnr_np(pred, rgbs)
        s = ssim_np(img, img_gt)
        if is_val_image:
            metrics["psnr"].append(p)
            metrics["ssim"].append(s)
            if cfg.data == "sat" and cfg.gt_dir is not None:
                try:
                    from satnerf_tpu.eval.dsm_metrics import (
                        compute_mae_and_save_dsm_diff,
                    )

                    out_dir = os.path.join(cfg.logs_dir, cfg.exp_name, "val")
                    tmp = os.path.join(out_dir, "dsm", f"tmp_pred_dsm_{step}.tif")
                    val_dataset.dsm_from_prediction(
                        rays, results[f"depth_{typ}"], dsm_path=tmp
                    )
                    mae = compute_mae_and_save_dsm_diff(
                        tmp, sample["src_id"], cfg.gt_dir, out_dir, 0, save=False
                    )
                    os.remove(tmp)
                    metrics["mae"].append(mae)
                except Exception as e:  # parity: main.py:218-219 -> NaN
                    metrics["mae"].append(float("nan"))

    out = {}
    if metrics["psnr"]:
        out["val/psnr"] = float(np.mean(metrics["psnr"]))
        out["val/ssim"] = float(np.mean(metrics["ssim"]))
    if metrics["mae"]:
        out["val/mae"] = float(np.nanmean(metrics["mae"]))
    if out:
        logger.scalars(step, out)
    return out


def fit(cfg: Config) -> dict:
    """Run the full training job. Returns final metrics summary."""
    t0 = time.time()
    # multi-host: join the global runtime first (no-op single-process); the
    # mesh then spans every host's chips and the step's psum rides ICI+DCN
    n_procs = maybe_init_distributed()
    main = is_main()
    mesh = make_mesh(cfg.n_devices)
    if main:
        print(f"mesh: {mesh.devices.size} device(s) across {n_procs} "
              f"process(es): {mesh.devices.ravel()[:4]}...")

    train_sets = load_dataset(cfg, split="train")
    val_sets = load_dataset(cfg, split="val")
    train_ds = train_sets[0]
    depth_ds = train_sets[1] if len(train_sets) > 1 else None
    val_ds = val_sets[0]

    system = NeRFSystem(
        cfg,
        dataset_len=len(train_ds),
        depth_dataset_len=len(depth_ds) if depth_ds else 0,
        mesh=mesh,
    )
    # all run IO (TensorBoard, opts.json, checkpoints, product dumps, eval)
    # belongs to process 0; other hosts only feed the global train step
    logger = RunLogger(cfg.logs_dir, cfg.exp_name) if main else None
    # opts.json is half the checkpoint contract (opt.py:85-87) — guarantee it
    # regardless of whether the run came through the CLI or fit() directly
    if main and not os.path.exists(
        os.path.join(cfg.logs_dir, cfg.exp_name, "opts.json")
    ):
        cfg.dump()

    state = system.init_state(jax.random.PRNGKey(cfg.seed))
    if cfg.ckpt_path:
        params, opt_state, step0 = load_checkpoint(cfg.ckpt_path, state)
        from satnerf_tpu.train.system import TrainState
        import jax.numpy as jnp

        state = TrainState(params, opt_state, jnp.asarray(step0, jnp.int32))
        print(f"resumed from {cfg.ckpt_path} at step {step0}")

    # device-resident dataset, sharded along the ray axis
    ids = train_ds.all_ids if hasattr(train_ds, "all_ids") else None
    _, (d_rays, d_rgbs, d_ts) = shard_rays(
        mesh, train_ds.all_rays, train_ds.all_rgbs,
        ids if ids is not None else np.zeros(len(train_ds), np.int32),
    )
    data = {"rays": d_rays, "rgbs": d_rgbs, "ts": d_ts}
    if depth_ds is not None:
        _, (dd_rays, dd_depths, dd_ts) = shard_rays(
            mesh, depth_ds.all_rays, depth_ds.all_depths, depth_ds.all_ids
        )
        data.update({"d_rays": dd_rays, "d_depths": dd_depths, "d_ts": dd_ts})

    train_step = system.make_train_step()
    key = jax.random.PRNGKey(cfg.seed + 1)

    # --sampling shuffle: per-epoch on-device permutation of each shard
    # (without-replacement epoch semantics like the reference DataLoader;
    # depth-supervision rays keep the default i.i.d. draw)
    epoch_perm = None
    if cfg.sampling == "shuffle":
        epoch_perm = system.make_epoch_perm()
        perm_key = jax.random.PRNGKey(cfg.seed + 2)
        data["perm"] = epoch_perm(
            d_rays, jax.random.fold_in(perm_key, int(state.step) // system.spe)
        )

    # sanity validation (main.py:257) — eval is host-local (system.eval_mesh)
    if main and cfg.num_sanity_val_steps > 0:
        validate(system, state, val_ds, cfg, logger, step=0, epoch=0,
                 max_images=cfg.num_sanity_val_steps)

    spe = system.spe
    start_step = int(state.step)
    last_log = time.time()
    rays_done = 0
    final_metrics = {}

    for step_i in range(start_step, cfg.max_train_steps):
        # device trace of a steady-state window (replaces the reference's
        # pl profiler="simple", main.py:259, with a real hardware profile)
        if cfg.profile_dir and step_i == start_step + 20:
            jax.profiler.start_trace(cfg.profile_dir)
        if cfg.profile_dir and step_i == start_step + 30:
            jax.profiler.stop_trace()
            print(f"wrote jax profiler trace to {cfg.profile_dir}")

        state, m = train_step(state, data, key)
        rays_done += cfg.batch_size * cfg.grad_accum

        if main and (step_i + 1) % cfg.log_every_n_steps == 0:
            m = {k: float(v) for k, v in m.items()}
            if not np.isfinite(m["loss"]):
                # failure detection at the log boundary (the only place the
                # loop fetches device scalars — a per-step check would add a
                # tunnel RTT per step). The state is already poisoned, but an
                # emergency dump preserves it for diagnosis; resume from the
                # last periodic epoch checkpoint instead.
                p = os.path.join(cfg.ckpts_dir, cfg.exp_name,
                                 "nan-crash.ckpt")  # NOT epoch={n}: stays
                # invisible to the eval CLI's epoch-glob resolution
                save_checkpoint(p, state)
                raise FloatingPointError(
                    f"non-finite loss {m['loss']} at step {step_i + 1} "
                    f"(lr {m['lr']:.3g}); poisoned state dumped to {p} — "
                    f"resume from the last epoch={{n}}.ckpt")
            now = time.time()
            rps = rays_done / max(now - last_log, 1e-9)
            last_log, rays_done = now, 0
            logger.scalars(step_i + 1, {
                "lr": m["lr"], "train/loss": m["loss"],
                "train/psnr": m["psnr"], "train/rays_per_sec": rps,
                **({"train/loss_depth": m["loss_depth"]} if "loss_depth" in m else {}),
            })
            print(f"step {step_i + 1}/{cfg.max_train_steps} "
                  f"loss {m['loss']:.5f} psnr {m['psnr']:.2f} "
                  f"rays/s {rps:,.0f}")

        # epoch boundary: validate + checkpoint
        if (step_i + 1) % spe == 0:
            epoch = (step_i + 1) // spe
            if epoch_perm is not None:
                data["perm"] = epoch_perm(d_rays,
                                          jax.random.fold_in(perm_key, epoch))
            if main and epoch % cfg.val_every_n_epochs == 0:
                save = epoch % cfg.save_every_n_epochs == 0
                final_metrics = validate(
                    system, state, val_ds, cfg, logger, step_i + 1, epoch,
                    save_images=save,
                )
            if main and epoch % cfg.save_every_n_epochs == 0:
                p = checkpoint_path(cfg.ckpts_dir, cfg.exp_name, epoch)
                save_checkpoint(p, state)
                print(f"saved {p}")

    # final checkpoint + validation
    if main:
        epoch = cfg.max_train_steps // spe
        p = checkpoint_path(cfg.ckpts_dir, cfg.exp_name, epoch)
        save_checkpoint(p, state)
        final_metrics = validate(system, state, val_ds, cfg, logger,
                                 cfg.max_train_steps, epoch, save_images=True)
        logger.close()
        print(f"done in {time.time() - t0:.1f}s — {final_metrics}")
    if n_procs > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("satnerf_fit_end")
    return {"state": state, "system": system, "metrics": final_metrics}
