"""Multi-host (DCN-level) data parallelism.

The reference is strictly single-process/single-GPU (SURVEY.md §2: no DDP,
no NCCL/MPI anywhere — main.py:252 pins one device). The TPU-native design
scales past one host the JAX way: every process joins a global runtime via
`jax.distributed.initialize`, the train step shard_maps over ONE global mesh
covering all hosts' chips, and XLA routes the gradient psum over ICI within
a slice and DCN across slices. No torch-DDP-style replica machinery: the
program is a single SPMD computation; hosts differ only in which rows of the
sharded ray tensors they feed.

Design decisions:

* Dataset placement: every host loads (or reads from the shared cache) the
  full ray set, then contributes only the rows owned by its local devices
  (`shard_rays` in mesh.py calls `contribute_global` below). Satellite AOIs
  are a few GB of rays — replicating the host-side load is simpler and more
  robust than a distributed reader, and the device memory is sharded either
  way. This mirrors the reference's per-worker DataLoader replication
  (main.py:96-117) at the host level.
* Training collectives span the global mesh; **eval stays host-local**: the
  eval/DSM ray grids shard across the local chips only (`eval_mesh`), so
  validation and product dumps need no cross-host gathers and run on the
  main process alone while the others idle at the next train collective.
* Only process 0 writes: checkpoints, TensorBoard, GeoTIFFs, metrics.jsonl.

Environment contract (set per process by the launcher):

    SATNERF_COORDINATOR=host0:12345   # coordinator address
    SATNERF_NUM_PROCS=2               # total processes
    SATNERF_PROC_ID=0                 # this process's id

On Cloud TPU pods, `jax.distributed.initialize()` auto-discovers these; the
env vars are only needed where no cluster metadata exists (e.g. the CPU
multi-process test, tests/test_multihost.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def maybe_init_distributed() -> int:
    """Join the global runtime if a coordinator is configured.

    Returns the number of processes (1 when not distributed). Safe to call
    more than once and before any device use — it must run BEFORE the first
    jax.devices()/backend touch, like jax.distributed.initialize itself.
    """
    coord = os.environ.get("SATNERF_COORDINATOR")
    if not coord:
        return 1
    # NOTE: do not touch jax.devices()/process_count() before initialize —
    # that would bring the backend up single-process
    if not getattr(maybe_init_distributed, "_up", False):
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["SATNERF_NUM_PROCS"]),
            process_id=int(os.environ["SATNERF_PROC_ID"]),
        )
        maybe_init_distributed._up = True
    return jax.process_count()


def is_main() -> bool:
    """True on the process that owns logging/checkpoint/eval IO."""
    return jax.process_index() == 0


def contribute_global(sharding, host_array: np.ndarray):
    """Build a global sharded array from a host-replicated numpy array.

    Every process holds the same `host_array` (see module docstring); each
    contributes exactly the rows its addressable devices own under
    `sharding`. Single-process, this degrades to a plain device_put.
    """
    if jax.process_count() == 1:
        return jax.device_put(host_array, sharding)
    shape = host_array.shape
    addressable = sharding.addressable_devices_indices_map(shape)
    # rows owned by this process = union of its devices' index ranges; for a
    # 1-D ray sharding these are contiguous [lo, hi) slices
    lo = min(idx[0].start or 0 for idx in addressable.values())
    hi = max(shape[0] if idx[0].stop is None else idx[0].stop
             for idx in addressable.values())
    # make_mesh's jax.devices() ordering guarantees contiguity; a permuted /
    # topology-optimized device order would silently include other
    # processes' rows in [lo, hi) — fail loudly instead
    owned = sum(
        (shape[0] if idx[0].stop is None else idx[0].stop)
        - (idx[0].start or 0)
        for idx in addressable.values()
    )
    if owned != hi - lo:
        raise ValueError(
            "contribute_global requires each process's addressable rows to "
            f"form one contiguous block; got {owned} owned rows spanning "
            f"[{lo}, {hi}). Use a mesh built from jax.devices() order "
            "(parallel.mesh.make_mesh), not a permuted device mesh."
        )
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(host_array[lo:hi]), shape
    )
