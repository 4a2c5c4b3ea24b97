#!/bin/bash
# r3 TPU work queue — EXECUTED after the tunnel recovered (all items green;
# results folded into docs/DESIGN.md and STATUS.md). Kept as the rerun
# recipe for these experiments.
cd /root/repo
echo "=== 0) quick chip sanity: default train bench (2 min)"
BENCH_STEPS=10 timeout 900 python bench.py 2>/dev/null | tail -1
echo "=== 1) grad-accum on real Mosaic: fused kernel under scan, 2x64k"
timeout 1200 python -u train.py --root_dir /tmp/anchor2/data --gt_dir /tmp/anchor2/gt \
  --cache_dir /tmp/anchor2/cache --model sat-nerf --exp_name ga_sanity --gpu_id 0 \
  --batch_size 65536 --grad_accum 2 --max_train_steps 60 --log_every_n_steps 20 \
  --save_every_n_epochs 999 --val_every_n_epochs 999 --seed 0 \
  --logs_dir /tmp/anchor2/logs --ckpts_dir /tmp/anchor2/ckpts 2>&1 | grep -E "step|done|Error|error" | tail -6
echo "=== 2) seed-2 spread run (full output)"
timeout 2400 python -u train.py --root_dir /tmp/anchor2/data --gt_dir /tmp/anchor2/gt \
  --cache_dir /tmp/anchor2/cache --model sat-nerf --exp_name a2_s2b --gpu_id 0 \
  --batch_size 1024 --max_train_steps 20000 --log_every_n_steps 2000 \
  --save_every_n_epochs 999 --val_every_n_epochs 999 --seed 2 \
  --logs_dir /tmp/anchor2/logs --ckpts_dir /tmp/anchor2/ckpts > /tmp/a2_s2b.log 2>&1 || true
tail -3 /tmp/a2_s2b.log
echo "=== 3) E1: anchor2 64k x 1200 (4x rays)"
/tmp/anchor_run.sh a2_b64k 0 --batch_size 65536 --max_train_steps 1200 --log_every_n_steps 200 > /tmp/a2_b64k.log 2>&1 || true
tail -3 /tmp/a2_b64k.log
echo "=== 4) E2: anchor2 256k EFFECTIVE batch via grad_accum 4 x 300 steps"
/tmp/anchor_run.sh a2_ga256k 0 --batch_size 65536 --grad_accum 4 --max_train_steps 300 --log_every_n_steps 60 > /tmp/a2_ga256k.log 2>&1 || true
tail -3 /tmp/a2_ga256k.log
echo "=== 5) E3: anchor2 n_samples 128"
/tmp/anchor_run.sh a2_ns128 0 --n_samples 128 > /tmp/a2_ns128.log 2>&1 || true
tail -3 /tmp/a2_ns128.log
echo QUEUE_DONE_MAIN
# (appended) 6) image-surface bench after the threaded fetch (3 reps)
for i in 1 2 3; do
  V=$(BENCH_MODE=image BENCH_BATCH=262144 timeout 900 python bench.py 2>/dev/null | tail -1)
  echo "image rep=$i $V"
done
echo QUEUE_DONE_ALL

# -----------------------------------------------------------------------
# Context (r3): the axon TPU tunnel wedged at ~2026-08-17 19:11 UTC and
# stayed down 10+ hours, blocking these runs. Execute this queue when the
# chip is back (probe first: a 1k x 1k matmul under `timeout 240`).
#
# The anchor2 dataset lives at /tmp/anchor2; if gone, rebuild with:
#   python tools/make_synthetic_aoi.py /tmp/anchor2 --n_train 10 \
#     --n_test 2 --size 256 --view_spread 0.25 --terrain smooth \
#     --checker 8 --alt_bounds terrain
# and /tmp/anchor_run.sh is the 4-line wrapper at the top of this file's
# git history (train.py on /tmp/anchor2 with seed/extra-flag args).
#
# What each item decides:
#   0  chip sanity + r3 kernel (narrow heads) perf on real Mosaic
#   1  grad_accum (pallas-under-scan) compiles + trains on real Mosaic
#   2  anchor2 seed-2 -> 3-seed spread for the MAE_GATE_M calibration
#      (tests/test_geometry_anchor.py, currently 2.3 from seeds {0,1})
#   3  64k-batch anchor: does 4x rays cut the low-frequency undulation
#      residual (tools/dsm_diagnostics.py errstruct) below 1 m?
#   4  256k EFFECTIVE batch via --grad_accum 4: same question, bigger lever
#   5  n_samples 128: bin width at fixed relief
#   6  image-surface bench after the r3 threaded fetch (target >=370k
#      rays/s or wire-bound; DESIGN.md matrix row currently 304.3k)
