#!/usr/bin/env python
"""Run any repo CLI on a virtual multi-device CPU mesh.

The machine's sitecustomize pins JAX to the single-chip axon TPU platform at
jax-config level, so env vars alone cannot retarget a script; the platform
must be forced in-process BEFORE any device use (tests/conftest.py does the
same for pytest). This wrapper does that and then executes the target script
as __main__:

  python tools/cpu_mesh_run.py [-n DEVICES] train.py --root_dir ... [flags]
  python tools/cpu_mesh_run.py eval.py eval_aoi --run_id ... [flags]

Useful when the TPU tunnel is down or wedged (CLAUDE.md gotchas) and for
exercising the sharded train/eval paths without hardware — the same virtual
mesh the test suite and `__graft_entry__.dryrun_multichip` use.
"""

import os
import runpy
import sys


def main():
    argv = sys.argv[1:]
    n = 8
    if argv and argv[0] == "-n":
        n = int(argv[1])
        argv = argv[2:]
    if not argv:
        sys.exit(__doc__)

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    script = argv[0]
    if not os.path.exists(script):
        cand = os.path.join(repo, script)
        if os.path.exists(cand):
            script = cand
    sys.argv = [script] + argv[1:]
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
