"""Checkpointing with the reference's on-disk contract.

Layout parity (main.py:241-246, eval_satnerf.py:68-93):
  {ckpts_dir}/{exp_name}/epoch={n}.ckpt   — msgpack state (flax.serialization)
  {logs_dir}/{exp_name}/opts.json         — written by config.dump()

The .ckpt payload is a dict {params, opt_state, step} (opt state included so
--ckpt_path resume continues Adam moments, like Lightning's
resume_from_checkpoint at main.py:251).

`import_torch_checkpoint` converts a real PyTorch-Lightning reference .ckpt
(state_dict keyed nerf_coarse.* / nerf_fine.* / embedding_t.*) into our param
pytree for apples-to-apples eval of reference-trained weights.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
from flax import serialization


def checkpoint_path(ckpts_dir: str, exp_name: str, epoch: int) -> str:
    return os.path.join(ckpts_dir, exp_name, f"epoch={epoch}.ckpt")


def save_checkpoint(path: str, state) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        # to_state_dict flattens optax's namedtuple/tuple states into plain
        # nested dicts that msgpack can carry
        "opt_state": serialization.to_state_dict(jax.device_get(state.opt_state)),
        "step": int(state.step),
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, payload)
        ))


def load_checkpoint(path: str, template_state=None):
    """Returns (params, opt_state, step). With a template state, restores
    exact pytree structure; otherwise returns raw nested dicts."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if template_state is not None:
        params = serialization.from_state_dict(
            jax.device_get(template_state.params), raw["params"]
        )
        opt_state = serialization.from_state_dict(
            jax.device_get(template_state.opt_state), raw["opt_state"]
        )
        return params, opt_state, raw["step"]
    return raw["params"], raw["opt_state"], raw["step"]


def list_checkpoints(ckpts_dir: str, exp_name: str):
    """Sorted (epoch, path) pairs found under the run dir."""
    d = os.path.join(ckpts_dir, exp_name)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        m = re.match(r"epoch=(\d+)\.ckpt$", name)
        if m:
            out.append((int(m.group(1)), os.path.join(d, name)))
    return sorted(out)


# ------------------------------------------------------- torch interop


def _torch_linear_to_dense(sd: dict, prefix: str) -> dict:
    """torch Linear (out,in) weight + bias -> flax Dense kernel (in,out)."""
    w = np.asarray(sd[f"{prefix}.weight"])
    b = np.asarray(sd[f"{prefix}.bias"])
    return {"Dense_0": {"kernel": w.T.copy(), "bias": b.copy()}}


def import_torch_state_dict(sd: dict, variant: str, layers: int = 8) -> dict:
    """Map one reference model's state_dict (fc_net.* naming from
    models/nerf.py:156-177 etc.) to our RadianceField param pytree."""
    p = {}
    for i in range(layers):
        p[f"fc_{i}"] = _torch_linear_to_dense(sd, f"fc_net.{2 * i}")
    p["sigma_head"] = _torch_linear_to_dense(sd, "sigma_from_xyz.0")
    p["feats_head"] = _torch_linear_to_dense(sd, "feats_from_xyz")
    p["rgb_0"] = _torch_linear_to_dense(sd, "rgb_from_xyzdir.0")
    p["rgb_1"] = _torch_linear_to_dense(sd, "rgb_from_xyzdir.2")
    if variant in ("s-nerf", "sat-nerf"):
        p["sun_v_0"] = _torch_linear_to_dense(sd, "sun_v_net.0")
        p["sun_v_1"] = _torch_linear_to_dense(sd, "sun_v_net.2")
        p["sun_v_2"] = _torch_linear_to_dense(sd, "sun_v_net.4")
        p["sun_v_out"] = _torch_linear_to_dense(sd, "sun_v_net.6")
        p["sky_0"] = _torch_linear_to_dense(sd, "sky_color.0")
        p["sky_1"] = _torch_linear_to_dense(sd, "sky_color.2")
    if variant == "sat-nerf":
        p["beta_0"] = _torch_linear_to_dense(sd, "beta_from_xyz.0")
        p["beta_1"] = _torch_linear_to_dense(sd, "beta_from_xyz.2")
    return p


def export_torch_state_dict(params: dict, variant: str,
                            layers: int = 8) -> dict:
    """Inverse of import_torch_checkpoint: our param dict {coarse[, fine]
    [, t]} -> a reference-style PL checkpoint payload with a state_dict
    keyed nerf_coarse.* / nerf_fine.* / embedding_t.* (numpy arrays; wrap in
    torch tensors + torch.save for a file the reference tooling reads).
    Used by the parity protocol to round-trip weights and by anyone moving
    weights back to the reference implementation."""
    sd = {}

    def put(model_prefix, p):
        names = [(f"fc_{i}", f"fc_net.{2 * i}") for i in range(layers)]
        names += [("sigma_head", "sigma_from_xyz.0"),
                  ("feats_head", "feats_from_xyz"),
                  ("rgb_0", "rgb_from_xyzdir.0"),
                  ("rgb_1", "rgb_from_xyzdir.2")]
        if variant in ("s-nerf", "sat-nerf"):
            names += [("sun_v_0", "sun_v_net.0"), ("sun_v_1", "sun_v_net.2"),
                      ("sun_v_2", "sun_v_net.4"), ("sun_v_out", "sun_v_net.6"),
                      ("sky_0", "sky_color.0"), ("sky_1", "sky_color.2")]
        if variant == "sat-nerf":
            names += [("beta_0", "beta_from_xyz.0"),
                      ("beta_1", "beta_from_xyz.2")]
        for ours, theirs in names:
            d = p[ours]["Dense_0"]
            sd[f"{model_prefix}.{theirs}.weight"] = (
                np.asarray(d["kernel"]).T.copy())
            sd[f"{model_prefix}.{theirs}.bias"] = np.asarray(d["bias"]).copy()

    put("nerf_coarse", params["coarse"])
    if "fine" in params:
        put("nerf_fine", params["fine"])
    if "t" in params:
        sd["embedding_t.weight"] = np.asarray(params["t"]["embedding"]).copy()
    return {"state_dict": sd}


def import_torch_checkpoint(ckpt_path: str, variant: str, layers: int = 8):
    """Load a reference PL checkpoint (torch .ckpt) into our param dict
    {coarse[, fine][, t]} (eval_satnerf.py:23-44 prefix filtering)."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    def sub(prefix):
        pl = len(prefix) + 1
        return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix + ".")}

    params = {"coarse": import_torch_state_dict(sub("nerf_coarse"), variant, layers)}
    fine = sub("nerf_fine")
    if fine:
        params["fine"] = import_torch_state_dict(fine, variant, layers)
    emb = sub("embedding_t")
    if emb:
        params["t"] = {"embedding": np.asarray(emb["weight"])}
    return params
