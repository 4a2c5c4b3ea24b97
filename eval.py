#!/usr/bin/env python
"""Novel-view-synthesis evaluation over an AOI — the reference's
eval_satnerf.py CLI (`eval_aoi`): render every test image from a trained run,
dump the full GeoTIFF product set, and report mean PSNR / SSIM / DSM MAE.

Usage:
  python eval.py eval_aoi --run_id RUN --logs_dir logs --output_dir out \
      --epoch_number 28 --split val [--checkpoints_dir ckpts] \
      [--root_dir ...] [--img_dir ...] [--gt_dir ...]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil

import numpy as np


def eval_aoi(run_id: str, logs_dir: str, output_dir: str, epoch_number: int,
             split: str = "val", checkpoints_dir: str | None = None,
             root_dir: str | None = None, img_dir: str | None = None,
             gt_dir: str | None = None):
    from satnerf_tpu.data.satellite import SatelliteScene
    from satnerf_tpu.eval.dsm_metrics import compute_mae_and_save_dsm_diff
    from satnerf_tpu.eval.images import save_nerf_output_to_images
    from satnerf_tpu.eval.loader import load_nerf, load_run_config
    from satnerf_tpu.eval.val_ts import (find_best_embedding_for_val_image,
                                         predefined_val_ts)
    from satnerf_tpu.ops.ssim import psnr as psnr_np
    from satnerf_tpu.ops.ssim import ssim as ssim_np

    cfg = load_run_config(logs_dir, run_id)
    if gt_dir is not None:
        cfg.gt_dir = gt_dir
    if img_dir is not None:
        cfg.img_dir = img_dir
    if root_dir is not None:
        cfg.root_dir = root_dir
    if cfg.cache_dir is not None and not os.path.isdir(cfg.cache_dir):
        cfg.cache_dir = None

    if checkpoints_dir is None:
        checkpoints_dir = cfg.ckpts_dir
    # the reference numbers checkpoints from 0 and evals epoch_number-1
    # (eval_satnerf.py:239); our epochs are 1-based, so use the number as-is
    # if present, else fall back to epoch_number-1
    from satnerf_tpu.train.checkpoints import checkpoint_path

    epoch_to_load = epoch_number
    if not os.path.exists(checkpoint_path(checkpoints_dir, run_id, epoch_to_load)):
        epoch_to_load = epoch_number - 1
    resolved = checkpoint_path(checkpoints_dir, run_id, epoch_to_load)
    print(f"loading checkpoint: {resolved}")
    system, params = load_nerf(run_id, logs_dir, checkpoints_dir, epoch_to_load)

    dataset = SatelliteScene(cfg.root_dir, cfg.img_dir,
                             split="eval_train" if split == "train" else "val",
                             img_downscale=cfg.img_downscale,
                             cache_dir=cfg.cache_dir)
    if split == "train":
        samples_to_eval = np.arange(0, len(dataset.records))
    else:
        samples_to_eval = np.arange(1, len(dataset.records))

    psnr, ssim, mae = [], [], []
    for i in samples_to_eval:
        sample = dataset.load_image(int(i))
        rays, rgbs = sample["rays"], sample["rgbs"]
        src_id = sample["src_id"]
        h, w = int(sample["h"]), int(sample["w"])

        ts = None
        if cfg.model == "sat-nerf":
            if split == "val":
                t = predefined_val_ts(src_id)
                if t is None:
                    # unseen AOI: brute-force the best-PSNR train embedding,
                    # like the reference search over the train images
                    # (eval_satnerf.py:148-164); the dataset already counted
                    # the train split, so no second train.txt read
                    n_search = min(dataset.n_train, cfg.t_embbeding_vocab)
                    t = find_best_embedding_for_val_image(
                        system, params, rays, rgbs,
                        train_indices=range(n_search))
                    print(f"  (searched embedding for {src_id}: t={t})")
                ts = np.full(rays.shape[0], t, dtype=np.int32)
            else:
                ts = sample["ts"]

        results = system.render_image(params, rays, ts)

        out_dir = os.path.join(output_dir, run_id, split)
        os.makedirs(out_dir, exist_ok=True)
        save_nerf_output_to_images(dataset, sample, results, out_dir,
                                   epoch_number)

        typ = "fine" if "rgb_fine" in results else "coarse"
        psnr_ = psnr_np(results[f"rgb_{typ}"], rgbs)
        psnr.append(psnr_)
        pred_chw = np.moveaxis(results[f"rgb_{typ}"].reshape(h, w, 3), -1, 0)
        gt_chw = np.moveaxis(rgbs.reshape(h, w, 3), -1, 0)
        ssim_ = ssim_np(pred_chw, gt_chw)
        ssim.append(ssim_)

        mae_ = float("nan")
        if cfg.gt_dir is not None:
            pred_dsm_path = f"{out_dir}/dsm/{src_id}_epoch{epoch_number}.tif"
            try:
                mae_ = compute_mae_and_save_dsm_diff(
                    pred_dsm_path, src_id, cfg.gt_dir, out_dir, epoch_number
                )
            except (AssertionError, FileNotFoundError) as e:
                print(f"  (no DSM GT for {src_id}: {e})")
        mae.append(mae_)
        print(f"{src_id}: psnr {psnr_:.3f} / ssim {ssim_:.3f} / mae {mae_:.3f}")

        # tuck registered DSMs into subdirs (eval_satnerf.py:300-309)
        for pat, sub in (("*rdsm_epoch*.tif", "rdsm"),
                         ("*rdsm_diff_epoch*.tif", "rdsm_diff")):
            for in_tmp in glob.glob(os.path.join(out_dir, pat)):
                out_tmp = os.path.join(out_dir, sub, os.path.basename(in_tmp))
                os.makedirs(os.path.dirname(out_tmp), exist_ok=True)
                shutil.copyfile(in_tmp, out_tmp)
                os.remove(in_tmp)

    print(f"\nMean PSNR: {np.mean(psnr):.3f}")
    print(f"Mean SSIM: {np.mean(ssim):.3f}")
    print(f"Mean MAE: {np.nanmean(mae):.3f}\n")
    return {"psnr": float(np.mean(psnr)), "ssim": float(np.mean(ssim)),
            "mae": float(np.nanmean(mae))}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("eval_aoi")
    e.add_argument("--run_id", required=True)
    e.add_argument("--logs_dir", required=True)
    e.add_argument("--output_dir", required=True)
    e.add_argument("--epoch_number", type=int, required=True)
    e.add_argument("--split", default="val")
    e.add_argument("--checkpoints_dir", default=None)
    e.add_argument("--root_dir", default=None)
    e.add_argument("--img_dir", default=None)
    e.add_argument("--gt_dir", default=None)
    args = ap.parse_args()
    if args.cmd == "eval_aoi":
        kw = vars(args)
        kw.pop("cmd")
        eval_aoi(**kw)


if __name__ == "__main__":
    main()
