"""Worker process for tests/test_multihost.py.

Joins a 2-process JAX runtime (4 virtual CPU devices each -> one global
8-device mesh), runs a few deterministic train steps through the full
sharded system, and prints one JSON line with the per-step losses and a
parameter checksum so the parent can compare processes against each other
and against a single-process 8-device run.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from satnerf_tpu.config import Config  # noqa: E402
from satnerf_tpu.parallel.distributed import (  # noqa: E402
    is_main,
    maybe_init_distributed,
)
from satnerf_tpu.parallel.mesh import make_mesh, shard_rays  # noqa: E402
from satnerf_tpu.train.system import NeRFSystem  # noqa: E402


def main():
    n_procs = maybe_init_distributed()
    assert n_procs == 2, n_procs
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    rng = np.random.RandomState(0)
    n = 1024
    rays = rng.rand(n, 11).astype(np.float32)
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
    rays[:, 6], rays[:, 7] = 0.0, 1.0
    rgbs = rng.rand(n, 3).astype(np.float32)
    ts = rng.randint(0, 5, n).astype(np.int32)

    cfg = Config(model="sat-nerf", batch_size=128, fc_units=32, fc_layers=2,
                 n_samples=8, max_train_steps=100, sc_lambda=0.0)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    system = NeRFSystem(cfg, dataset_len=n, mesh=mesh)
    # eval mesh must have collapsed to the 4 local chips
    assert system.eval_mesh.devices.size == 4

    state = system.init_state(jax.random.PRNGKey(0))
    _, (r, g, t) = shard_rays(mesh, rays, rgbs, ts)
    step = system.make_train_step()
    key = jax.random.PRNGKey(1)

    losses = []
    for _ in range(3):
        state, m = step(state, {"rays": r, "rgbs": g, "ts": t}, key)
        losses.append(float(m["loss"]))

    # params are replicated -> fully addressable on every process
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    checksum = float(sum(np.abs(l).sum() for l in leaves))

    # ---- proc-0-only run IO under a live 2-process runtime: checkpoint +
    # metrics.jsonl exactly as train/loop.py gates them, then resume from
    # the checkpoint on BOTH processes and continue. Each process writes
    # into its OWN directory, so a gating bug (proc 1 writing) shows up as
    # files under proc1/ — the parent asserts that dir stays absent.
    io_extra = {}
    io_base = os.environ.get("SATNERF_TEST_IO_DIR")
    if io_base:
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        from satnerf_tpu.train.checkpoints import (load_checkpoint,
                                                   save_checkpoint)
        from satnerf_tpu.train.logging import RunLogger
        from satnerf_tpu.train.system import TrainState

        my_dir = os.path.join(io_base, f"proc{jax.process_index()}")
        if is_main():
            logger = RunLogger(my_dir, "run")
            logger.scalars(3, {"train/loss": losses[-1]})
            logger.close()
            save_checkpoint(os.path.join(my_dir, "run", "epoch=1.ckpt"),
                            state)
        multihost_utils.sync_global_devices("ckpt_written")

        def run_two(st):
            out = []
            for _ in range(2):
                st, m = step(st, {"rays": r, "rgbs": g, "ts": t}, key)
                out.append(float(m["loss"]))
            return out

        cont_losses = run_two(state)

        # every process resumes from PROC 0's checkpoint (shared storage)
        ckpt = os.path.join(io_base, "proc0", "run", "epoch=1.ckpt")
        tmpl = system.init_state(jax.random.PRNGKey(7))
        p_, o_, s_ = load_checkpoint(ckpt, tmpl)
        resumed_losses = run_two(
            TrainState(p_, o_, jnp.asarray(s_, jnp.int32))
        )
        my_files = []
        if os.path.isdir(my_dir):
            my_files = sorted(
                os.path.relpath(os.path.join(dp, f), my_dir)
                for dp, _, fs in os.walk(my_dir) for f in fs
            )
        io_extra = {"cont_losses": cont_losses,
                    "resumed_losses": resumed_losses,
                    "io_files": my_files}

    # host-local eval path on the collapsed mesh (process 0 only, as the
    # training loop would drive it)
    eval_ok = True
    if is_main():
        out = system.render_image(state.params, rays[:70], ts[:70])
        eval_ok = bool(np.isfinite(out["rgb_coarse"]).all()
                       and out["rgb_coarse"].shape == (70, 3))

    print(json.dumps({
        "proc": jax.process_index(),
        "losses": losses,
        "checksum": checksum,
        "eval_ok": eval_ok,
        **io_extra,
    }), flush=True)


if __name__ == "__main__":
    main()
