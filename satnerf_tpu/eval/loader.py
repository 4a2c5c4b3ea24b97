"""Rebuild a trained system from a run directory (opts.json + epoch={n}.ckpt).

The reference's load_nerf (eval_satnerf.py:68-93): the run's opts.json is the
model spec, the checkpoint supplies the weights. Both our msgpack checkpoints
and reference PyTorch-Lightning .ckpt files are accepted — the latter via the
torch importer, giving apples-to-apples eval of reference-trained weights.
"""

from __future__ import annotations

import json
import os

import jax

from satnerf_tpu.config import Config
from satnerf_tpu.train.checkpoints import (
    checkpoint_path,
    import_torch_checkpoint,
    load_checkpoint,
)
from satnerf_tpu.train.system import NeRFSystem


def load_run_config(logs_dir: str, run_id: str) -> Config:
    with open(os.path.join(logs_dir, run_id, "opts.json")) as f:
        return Config(**{k: v for k, v in json.load(f).items()
                         if k in Config.__dataclass_fields__})


def load_nerf(run_id: str, logs_dir: str, ckpts_dir: str, epoch_number: int):
    """Returns (system, params) ready for render_image."""
    cfg = load_run_config(logs_dir, run_id)
    ckpt = checkpoint_path(ckpts_dir, run_id, epoch_number)
    if not os.path.exists(ckpt):
        raise FileNotFoundError(f"Could not find checkpoint {ckpt}")
    system = NeRFSystem(cfg, dataset_len=max(cfg.batch_size, 1), mesh=None)

    with open(ckpt, "rb") as f:
        magic = f.read(2)
    if magic == b"PK" or ckpt.endswith(".pt"):  # torch zipfile serialization
        params = import_torch_checkpoint(ckpt, cfg.model, cfg.fc_layers)
    else:
        try:
            state = system.init_state(jax.random.PRNGKey(0))
            params, _, _ = load_checkpoint(ckpt, state)
        except Exception:
            params = import_torch_checkpoint(ckpt, cfg.model, cfg.fc_layers)
    return system, params
