#!/usr/bin/env python
"""Turnkey reference-parity protocol (VERDICT r1 missing item 1).

One command that takes a prepared DFC2019-style dataset + a reference
PyTorch-Lightning checkpoint, imports the weights, re-renders the val split
through the sharded TPU eval path, and writes a side-by-side parity report
(PSNR / SSIM / DSM MAE) — the reference's whole eval protocol
(/root/reference/eval_satnerf.py:213-313) as a single unit.

Usage:
  python tools/parity_report.py --ckpt /path/epoch=27.ckpt \
      --root_dir DATASET_DIR [--img_dir ...] --gt_dir TRUTH_DIR \
      --output_dir OUT \
      [--opts /path/ref_run/opts.json]            # reference run config
      [--model sat-nerf --fc_layers 8 --fc_units 512 ...]  # or explicit
      [--expected_psnr X --expected_ssim Y --expected_mae Z]

The checkpoint may be a torch PL .ckpt (auto-imported via
train/checkpoints.import_torch_checkpoint) or one of our msgpack .ckpt
files. Writes {output_dir}/parity_report.json and prints the table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_ID = "parity"


def build_config(args):
    from satnerf_tpu.config import Config

    fields = Config.__dataclass_fields__
    base = {}
    if args.opts:
        with open(args.opts) as f:
            base = {k: v for k, v in json.load(f).items() if k in fields}
    for k in ("model", "fc_layers", "fc_units", "n_samples", "n_importance",
              "t_embbeding_vocab", "t_embbeding_tau", "img_downscale",
              "chunk"):
        v = getattr(args, k, None)
        if v is not None:
            base[k] = v
    base["root_dir"] = args.root_dir
    base["img_dir"] = args.img_dir or args.root_dir
    base["gt_dir"] = args.gt_dir
    base["cache_dir"] = args.cache_dir
    base["exp_name"] = RUN_ID
    base["logs_dir"] = os.path.join(args.output_dir, "logs")
    base["ckpts_dir"] = os.path.join(args.output_dir, "ckpts")
    return Config(**base)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="reference PL .ckpt (torch) or our msgpack .ckpt")
    ap.add_argument("--root_dir", required=True)
    ap.add_argument("--img_dir", default=None)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--cache_dir", default=None)
    ap.add_argument("--opts", default=None,
                    help="reference run opts.json (model spec)")
    ap.add_argument("--model", default=None)
    ap.add_argument("--fc_layers", type=int, default=None)
    ap.add_argument("--fc_units", type=int, default=None)
    ap.add_argument("--n_samples", type=int, default=None)
    ap.add_argument("--n_importance", type=int, default=None)
    ap.add_argument("--t_embbeding_vocab", type=int, default=None)
    ap.add_argument("--t_embbeding_tau", type=int, default=None)
    ap.add_argument("--img_downscale", type=float, default=None)
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--expected_psnr", type=float, default=None)
    ap.add_argument("--expected_ssim", type=float, default=None)
    ap.add_argument("--expected_mae", type=float, default=None)
    args = ap.parse_args(argv)

    cfg = build_config(args)

    # assemble a run dir the standard eval surface understands:
    # {logs}/parity/opts.json + {ckpts}/parity/epoch={N}.ckpt
    m = re.search(r"epoch=(\d+)", os.path.basename(args.ckpt))
    epoch = int(m.group(1)) if m else 0
    cfg.dump()
    from satnerf_tpu.train.checkpoints import checkpoint_path

    dst = checkpoint_path(cfg.ckpts_dir, RUN_ID, epoch)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copyfile(args.ckpt, dst)

    import importlib

    eval_mod = importlib.import_module("eval")
    ours = eval_mod.eval_aoi(
        run_id=RUN_ID, logs_dir=cfg.logs_dir, output_dir=args.output_dir,
        epoch_number=epoch, split="val", checkpoints_dir=cfg.ckpts_dir,
        root_dir=cfg.root_dir, img_dir=cfg.img_dir, gt_dir=cfg.gt_dir,
    )

    expected = {"psnr": args.expected_psnr, "ssim": args.expected_ssim,
                "mae": args.expected_mae}
    report = {"checkpoint": os.path.abspath(args.ckpt), "epoch": epoch,
              "root_dir": os.path.abspath(cfg.root_dir),
              "ours": ours, "reference": expected,
              "delta": {k: (ours[k] - expected[k]
                            if expected[k] is not None else None)
                        for k in ours}}
    out_path = os.path.join(args.output_dir, "parity_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)

    print(f"\nparity report -> {out_path}")
    print(f"{'metric':>8} | {'ours':>10} | {'reference':>10} | {'delta':>10}")
    for k in ("psnr", "ssim", "mae"):
        ref = expected[k]
        print(f"{k:>8} | {ours[k]:>10.4f} | "
              f"{(f'{ref:.4f}' if ref is not None else '—'):>10} | "
              f"{(f'{ours[k] - ref:+.4f}' if ref is not None else '—'):>10}")
    return report


if __name__ == "__main__":
    main()
