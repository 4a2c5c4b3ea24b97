"""Fused classic-NeRF kernel vs the flax model (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from satnerf_tpu.models import build_model
from satnerf_tpu.ops.pallas import fused_nerf as FN


def _setup(F=32, L=8, N=70, seed=0):
    m = build_model("nerf", L, F)
    params = m.init(jax.random.PRNGKey(seed), jnp.zeros((2, 3)),
                    view_dir=jnp.zeros((2, 3)))["params"]
    rng = np.random.RandomState(seed)
    xyz = jnp.array(rng.randn(N, 3).astype(np.float32) * 0.3)
    vd = jnp.array(rng.randn(N, 3).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=1, keepdims=True)
    return m, params, xyz, vd


class TestFusedNerfForward:
    def test_matches_flax(self):
        m, params, xyz, vd = _setup()
        ref = m.apply({"params": params}, xyz, view_dir=vd)
        with pltpu.force_tpu_interpret_mode():
            out = FN.fused_nerf_apply(params, xyz, vd, layers=8, feat=32,
                                      dtype=jnp.float32)
        # fast-trig posenc introduces ~2e-5 input noise into the trunk
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=5e-4)
        np.testing.assert_allclose(out["sigma"], ref["sigma"], atol=2e-3)

    def test_leading_dims(self):
        m, params, xyz, vd = _setup(N=60)
        with pltpu.force_tpu_interpret_mode():
            out = FN.fused_nerf_apply(params, xyz.reshape(10, 6, 3),
                                      vd.reshape(10, 6, 3), layers=8, feat=32,
                                      dtype=jnp.float32)
        assert out["rgb"].shape == (10, 6, 3)
        assert out["sigma"].shape == (10, 6)


class TestFusedNerfGradients:
    def test_param_grads_match(self):
        m, params, xyz, vd = _setup()

        def loss_ref(p):
            o = m.apply({"params": p}, xyz, view_dir=vd)
            return o["rgb"].sum() + 2 * o["sigma"].sum()

        def loss_fused(p):
            o = FN.fused_nerf_apply(p, xyz, vd, layers=8, feat=32,
                                    dtype=jnp.float32)
            return o["rgb"].sum() + 2 * o["sigma"].sum()

        with pltpu.force_tpu_interpret_mode():
            g_ref = jax.grad(loss_ref)(params)
            g_fused = jax.grad(loss_fused)(params)

        for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
            b = g_fused
            for p in path:
                b = b[p.key]
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-3,
                err_msg=jax.tree_util.keystr(path),
            )


class TestFusedNerfRender:
    def test_render_rays_matches_flax_composite(self):
        """One-kernel nerf render (expansion + posenc + field + compositing)
        vs the flax model + render/composite.py non-shadow branch."""
        from satnerf_tpu.render.composite import composite

        m, params, _, _ = _setup()
        rng = np.random.RandomState(3)
        R, S = 24, 8
        rays_o = jnp.array(rng.randn(R, 3).astype(np.float32) * 0.2)
        rays_d = jnp.array(rng.randn(R, 3).astype(np.float32))
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)
        z_vals = jnp.array(
            np.sort(rng.rand(R, S).astype(np.float32), axis=1) + 0.1
        )

        xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[:, :, None]
        vd = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)
        ref = composite(m.apply({"params": params}, xyz, view_dir=vd),
                        z_vals, shadow=False)

        with pltpu.force_tpu_interpret_mode():
            out = FN.fused_nerf_render_rays(
                params, rays_o, rays_d, z_vals, layers=8, feat=32,
                dtype=jnp.float32, return_weights=True,
            )
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=1e-3)
        np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-3)
        np.testing.assert_allclose(out["weights"], ref["weights"], atol=1e-3)
        np.testing.assert_allclose(
            out["opacity"], ref["weights"].sum(-1), atol=1e-3
        )
