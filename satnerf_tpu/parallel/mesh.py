"""Device mesh + sharding helpers for ray-parallel training.

The model is a ~1-5M-param MLP — it fits trivially in one chip's HBM, so
there is no tensor/pipeline parallelism (documented decision, SURVEY.md §2):
parameters are replicated and the embarrassingly-parallel ray axis is sharded
across all chips over ICI. Gradients are combined with a single psum inside
the shard_map'd train step; XLA lowers it to an ICI all-reduce.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = 0) -> Mesh:
    """1D mesh over the first `n_devices` devices (0 = all)."""
    devs = jax.devices()
    if n_devices and n_devices > 0:
        devs = devs[:n_devices]
        if jax.process_count() > 1:
            # a truncated mesh that leaves some process with zero local
            # devices would crash later in opaque ways (empty eval mesh,
            # min() over no addressable rows in contribute_global)
            procs = {d.process_index for d in devs}
            if procs != set(range(jax.process_count())):
                raise ValueError(
                    f"n_devices={n_devices} covers only processes "
                    f"{sorted(procs)} of {jax.process_count()}; in a "
                    "multi-process run every process must own at least one "
                    "mesh device (use n_devices=0 for all devices)"
                )
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (rays) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, *arrays, pad_value=0.0):
    """Place host arrays on the mesh sharded along axis 0, padding the
    leading dim up to a multiple of the mesh size. Returns (padded_len,
    [sharded arrays...]).

    Works across hosts: when the mesh spans multiple processes, every host
    passes the same (replicated) numpy arrays and contributes only the rows
    its local devices own (parallel/distributed.contribute_global)."""
    from satnerf_tpu.parallel.distributed import contribute_global

    n = mesh.devices.size
    out = []
    padded = None
    for a in arrays:
        a = np.asarray(a)
        rem = (-a.shape[0]) % n
        if rem:
            pad_width = [(0, rem)] + [(0, 0)] * (a.ndim - 1)
            a = np.pad(a, pad_width, constant_values=pad_value)
        padded = a.shape[0]
        out.append(contribute_global(batch_sharding(mesh), a))
    return padded, out
