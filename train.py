#!/usr/bin/env python
"""Training entry point — the reference's `python3 main.py` equivalent with
the same CLI flags (see satnerf_tpu/config.py).

Example (reference README training command shape):
  python train.py --root_dir data/root_dir/crops_rpcs_ba_v2/JAX_068 \
      --img_dir data/DFC2019/Track3-RGB-crops/JAX_068 \
      --cache_dir cache/JAX_068_ds1 --gt_dir data/Track3-Truth \
      --model sat-nerf --exp_name JAX_068_ds1_sat-nerf --gpu_id 0
"""

import sys

from satnerf_tpu.config import get_opts
from satnerf_tpu.train.loop import fit


def main(argv=None):
    cfg = get_opts(argv)
    print(f"\nRunning {cfg.exp_name}\n")
    fit(cfg)


if __name__ == "__main__":
    main()
