"""Checkpoint tests: native save/load roundtrip and import of a real
PyTorch-Lightning-style reference checkpoint built with torch."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from satnerf_tpu.config import Config
from satnerf_tpu.parallel.mesh import make_mesh
from satnerf_tpu.train.checkpoints import (
    checkpoint_path,
    import_torch_checkpoint,
    list_checkpoints,
    load_checkpoint,
    save_checkpoint,
)
from satnerf_tpu.train.system import NeRFSystem


def _torch_satnerf_state_dict(layers=4, feat=32, tau=4, seed=0):
    """Build a reference-layout state dict: fc_net.{2i}, sigma_from_xyz.0,
    feats_from_xyz, rgb_from_xyzdir.{0,2}, sun_v_net.{0,2,4,6},
    sky_color.{0,2}, beta_from_xyz.{0,2} (models/satnerf.py:103-153)."""
    g = torch.Generator().manual_seed(seed)

    def lin(i, o):
        # SIREN-scale weights keep pre-activations O(1): unscaled randn makes
        # sin(30*pre) chaotic and the cross-framework comparison meaningless
        w = torch.randn(o, i, generator=g) * (6.0 / i) ** 0.5 / 3
        b = torch.randn(o, generator=g) * 0.1
        return (w, b)

    sd = {}

    def put(prefix, w, b):
        sd[f"{prefix}.weight"] = w
        sd[f"{prefix}.bias"] = b

    put("fc_net.0", *lin(3, feat))
    for l in range(1, layers):
        in_f = feat + 3 if l == 4 else feat
        put(f"fc_net.{2 * l}", *lin(in_f, feat))
    put("sigma_from_xyz.0", *lin(feat, 1))
    put("feats_from_xyz", *lin(feat, feat))
    put("rgb_from_xyzdir.0", *lin(feat, feat // 2))
    put("rgb_from_xyzdir.2", *lin(feat // 2, 3))
    put("sun_v_net.0", *lin(feat + 3, feat // 2))
    put("sun_v_net.2", *lin(feat // 2, feat // 2))
    put("sun_v_net.4", *lin(feat // 2, feat // 2))
    put("sun_v_net.6", *lin(feat // 2, 1))
    put("sky_color.0", *lin(3, feat // 2))
    put("sky_color.2", *lin(feat // 2, 3))
    put("beta_from_xyz.0", *lin(feat + tau, feat // 2))
    put("beta_from_xyz.2", *lin(feat // 2, 1))
    return sd


class TestNativeCheckpoints:
    def test_save_load_roundtrip(self, tmp_path, eight_devices):
        cfg = Config(model="sat-nerf", batch_size=128, fc_units=32,
                     fc_layers=2, n_samples=8, max_train_steps=10)
        sys_ = NeRFSystem(cfg, dataset_len=1024, mesh=make_mesh(1))
        state = sys_.init_state(jax.random.PRNGKey(0))
        p = str(tmp_path / "epoch=3.ckpt")
        save_checkpoint(p, state)
        params, opt_state, step = load_checkpoint(p, state)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            jax.device_get(state.params), params,
        )
        assert step == 0

    def test_list_and_path(self, tmp_path):
        d = tmp_path / "run"
        d.mkdir()
        for e in (4, 12, 8):
            (d / f"epoch={e}.ckpt").write_bytes(b"x")
        found = list_checkpoints(str(tmp_path), "run")
        assert [e for e, _ in found] == [4, 8, 12]
        assert checkpoint_path(str(tmp_path), "run", 8).endswith("run/epoch=8.ckpt")


class TestTorchImport:
    def test_imports_pl_checkpoint_and_matches_torch_forward(self, tmp_path):
        """Load a PL-prefixed torch checkpoint and verify our model
        reproduces the torch forward pass of the same weights."""
        layers, feat, tau = 4, 32, 4
        sd = _torch_satnerf_state_dict(layers, feat, tau)
        ckpt = {
            "state_dict": {
                **{f"nerf_coarse.{k}": v for k, v in sd.items()},
                "embedding_t.weight": torch.randn(30, tau),
            }
        }
        path = str(tmp_path / "epoch=1.ckpt")
        torch.save(ckpt, path)

        params = import_torch_checkpoint(path, "sat-nerf", layers)
        assert set(params) == {"coarse", "t"}
        assert params["t"]["embedding"].shape == (30, tau)

        # torch forward of the same architecture (reference math)
        def torch_forward(x, sun, t):
            h = x
            for l in range(layers):
                w = torch.tensor(sd[f"fc_net.{2 * l}.weight"])
                b = torch.tensor(sd[f"fc_net.{2 * l}.bias"])
                if l == 4:
                    h = torch.cat([x, h], -1)
                pre = h @ w.T + b
                h = torch.sin((30.0 if l == 0 else 1.0) * pre)
            sigma = torch.nn.functional.softplus(
                h @ sd["sigma_from_xyz.0.weight"].T + sd["sigma_from_xyz.0.bias"]
            )
            feats = h @ sd["feats_from_xyz.weight"].T + sd["feats_from_xyz.bias"]
            r = torch.sin(h_rgb := feats @ sd["rgb_from_xyzdir.0.weight"].T
                          + sd["rgb_from_xyzdir.0.bias"])
            rgb = torch.sigmoid(r @ sd["rgb_from_xyzdir.2.weight"].T
                                + sd["rgb_from_xyzdir.2.bias"])
            rgb = rgb * 1.002 - 0.001
            return rgb, sigma

        rng = np.random.RandomState(0)
        x = rng.randn(16, 3).astype(np.float32) * 0.2
        sun = rng.randn(16, 3).astype(np.float32)
        t_e = rng.randn(16, tau).astype(np.float32)

        rgb_t, sigma_t = torch_forward(
            torch.tensor(x), torch.tensor(sun), torch.tensor(t_e)
        )

        from satnerf_tpu.models import build_model

        m = build_model("sat-nerf", layers, feat)
        out = m.apply({"params": params["coarse"]}, jnp.array(x),
                      sun_dir=jnp.array(sun), t_embed=jnp.array(t_e))
        np.testing.assert_allclose(out["rgb"], rgb_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(out["sigma"], sigma_t.numpy()[:, 0],
                                   atol=1e-5)
