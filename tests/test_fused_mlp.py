"""Fused Pallas field kernel vs the flax RadianceField — forward and full
gradient equivalence, run in Pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from satnerf_tpu.models import build_model
from satnerf_tpu.ops.pallas import fused_mlp as FM


def _setup(variant="sat-nerf", F=32, L=8, N=64, seed=0):
    m = build_model(variant, L, F)
    key = jax.random.PRNGKey(seed)
    params = m.init(key, jnp.zeros((2, 3)), sun_dir=jnp.zeros((2, 3)),
                    t_embed=jnp.zeros((2, 4)))["params"]
    rng = np.random.RandomState(seed)
    xyz = jnp.array(rng.randn(N, 3).astype(np.float32) * 0.3)
    sun = jnp.array(rng.randn(N, 3).astype(np.float32))
    sun = sun / jnp.linalg.norm(sun, axis=1, keepdims=True)
    t_e = jnp.array(rng.randn(N, 4).astype(np.float32))
    return m, params, xyz, sun, t_e


class TestFusedForward:
    @pytest.mark.parametrize("variant", ["sat-nerf", "s-nerf"])
    def test_matches_flax(self, variant):
        m, params, xyz, sun, t_e = _setup(variant)
        use_beta = variant == "sat-nerf"
        ref = m.apply({"params": params}, xyz, sun_dir=sun,
                      t_embed=t_e if use_beta else None)
        with pltpu.force_tpu_interpret_mode():
            out = FM.fused_field_apply(
                params, xyz, sun, t_e if use_beta else None,
                layers=8, feat=32, use_beta=use_beta, dtype=jnp.float32,
            )
        keys = ["rgb", "sigma", "sun_v", "sky_rgb"] + (
            ["beta"] if use_beta else []
        )
        for k in keys:
            np.testing.assert_allclose(out[k], ref[k], atol=1e-4)

    def test_leading_dims_preserved(self):
        m, params, xyz, sun, t_e = _setup(N=60)
        xyz3 = xyz.reshape(10, 6, 3)
        with pltpu.force_tpu_interpret_mode():
            out = FM.fused_field_apply(
                params, xyz3, sun.reshape(10, 6, 3), t_e.reshape(10, 6, 4),
                layers=8, feat=32, dtype=jnp.float32,
            )
        assert out["rgb"].shape == (10, 6, 3)
        assert out["sigma"].shape == (10, 6)

    def test_non_tile_multiple(self):
        """N not a multiple of the kernel tile gets padded + unpadded."""
        m, params, xyz, sun, t_e = _setup(N=37)
        ref = m.apply({"params": params}, xyz, sun_dir=sun, t_embed=t_e)
        with pltpu.force_tpu_interpret_mode():
            out = FM.fused_field_apply(params, xyz, sun, t_e, layers=8,
                                       feat=32, dtype=jnp.float32)
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=1e-4)


class TestFusedGradients:
    def test_all_param_grads_match(self):
        m, params, xyz, sun, t_e = _setup()

        def loss(apply_out):
            return (apply_out["rgb"].sum() + 2 * apply_out["sigma"].sum()
                    + 3 * apply_out["sun_v"].sum() + apply_out["sky_rgb"].sum()
                    + 0.5 * apply_out["beta"].sum())

        def loss_ref(p):
            return loss(m.apply({"params": p}, xyz, sun_dir=sun, t_embed=t_e))

        def loss_fused(p):
            return loss(FM.fused_field_apply(p, xyz, sun, t_e, layers=8,
                                             feat=32, dtype=jnp.float32))

        with pltpu.force_tpu_interpret_mode():
            g_ref = jax.grad(loss_ref)(params)
            g_fused = jax.grad(loss_fused)(params)

        for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
            b = g_fused
            for p in path:
                b = b[p.key]
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=3e-4,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_t_embed_input_grad(self):
        m, params, xyz, sun, t_e = _setup()

        def f_ref(t):
            return m.apply({"params": params}, xyz, sun_dir=sun,
                           t_embed=t)["beta"].sum()

        def f_fused(t):
            return FM.fused_field_apply(params, xyz, sun, t, layers=8,
                                        feat=32, dtype=jnp.float32)["beta"].sum()

        with pltpu.force_tpu_interpret_mode():
            g_ref = jax.grad(f_ref)(t_e)
            g_fused = jax.grad(f_fused)(t_e)
        np.testing.assert_allclose(g_fused, g_ref, atol=1e-4)


class TestPacking:
    def test_pack_unpack_roundtrip_shapes(self):
        m, params, *_ = _setup()
        packed = FM.pack_params(params, 8, 32, 4, True, 4, jnp.float32)
        assert packed["A"].shape == (16, 32)
        assert packed["B"].shape == (7, 32, 32)
        # narrow heads are stored transposed (16, K) for the VPU path
        assert packed["Wsig"].shape == (16, 32)
        grads = {k: jnp.ones_like(v) for k, v in packed.items()}
        un = FM.unpack_grads(grads, params, 8, 32, 4, True)
        for name, sub in un.items():
            assert sub["Dense_0"]["kernel"].shape == (
                params[name]["Dense_0"]["kernel"].shape
            ), name


class TestRayMode:
    def test_forward_matches_point_mode(self):
        m, params, xyz, sun, t_e = _setup(N=0)
        rng = np.random.RandomState(3)
        R, S = 10, 8
        rays_o = jnp.array(rng.randn(R, 3).astype(np.float32) * 0.2)
        rays_d = jnp.array(rng.randn(R, 3).astype(np.float32))
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)
        sun_d = jnp.array(rng.randn(R, 3).astype(np.float32))
        t_r = jnp.array(rng.randn(R, 4).astype(np.float32))
        z = jnp.array(np.sort(rng.rand(R, S).astype(np.float32), -1))

        xyz_pts = rays_o[:, None, :] + rays_d[:, None, :] * z[:, :, None]
        sun_pts = jnp.broadcast_to(sun_d[:, None, :], (R, S, 3))
        t_pts = jnp.broadcast_to(t_r[:, None, :], (R, S, 4))

        with pltpu.force_tpu_interpret_mode():
            ref = FM.fused_field_apply(params, xyz_pts, sun_pts, t_pts,
                                       layers=8, feat=32, dtype=jnp.float32)
            out = FM.fused_field_apply_rays(params, rays_o, rays_d, sun_d,
                                            t_r, z, layers=8, feat=32,
                                            dtype=jnp.float32)
        for k in ("rgb", "sigma", "sun_v", "sky_rgb", "beta"):
            np.testing.assert_allclose(out[k], ref[k], atol=1e-5, err_msg=k)

    def test_grads_match_point_mode(self):
        m, params, *_ = _setup(N=0)
        rng = np.random.RandomState(4)
        R, S = 10, 8
        rays_o = jnp.array(rng.randn(R, 3).astype(np.float32) * 0.2)
        rays_d = jnp.array(rng.randn(R, 3).astype(np.float32))
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)
        sun_d = jnp.array(rng.randn(R, 3).astype(np.float32))
        t_r = jnp.array(rng.randn(R, 4).astype(np.float32))
        z = jnp.array(np.sort(rng.rand(R, S).astype(np.float32), -1))

        def loss_rays(p, t):
            o = FM.fused_field_apply_rays(p, rays_o, rays_d, sun_d, t, z,
                                          layers=8, feat=32, dtype=jnp.float32)
            return (o["rgb"].sum() + 2 * o["sigma"].sum() + o["beta"].sum()
                    + 3 * o["sun_v"].sum())

        def loss_pts(p, t):
            xyz_pts = rays_o[:, None, :] + rays_d[:, None, :] * z[:, :, None]
            sun_pts = jnp.broadcast_to(sun_d[:, None, :], (R, S, 3))
            t_pts = jnp.broadcast_to(t[:, None, :], (R, S, 4))
            o = FM.fused_field_apply(p, xyz_pts, sun_pts, t_pts, layers=8,
                                     feat=32, dtype=jnp.float32)
            return (o["rgb"].sum() + 2 * o["sigma"].sum() + o["beta"].sum()
                    + 3 * o["sun_v"].sum())

        with pltpu.force_tpu_interpret_mode():
            g_r = jax.grad(loss_rays, argnums=(0, 1))(params, t_r)
            g_p = jax.grad(loss_pts, argnums=(0, 1))(params, t_r)

        for path, a in jax.tree_util.tree_leaves_with_path(g_p[0]):
            b = g_r[0]
            for p in path:
                b = b[p.key]
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(b) / scale,
                                       np.asarray(a) / scale, atol=1e-5,
                                       err_msg=jax.tree_util.keystr(path))
        # t_embed input grads
        np.testing.assert_allclose(g_r[1], g_p[1], atol=1e-5)


class TestFusedRender:
    """fused_render_rays (in-kernel compositing) vs flax field + XLA
    compositor (render/composite.py)."""

    @pytest.mark.parametrize("variant", ["sat-nerf", "s-nerf"])
    def test_matches_field_plus_composite(self, variant):
        from satnerf_tpu.render.composite import composite

        m, params, *_ = _setup(variant, N=0)
        use_beta = variant == "sat-nerf"
        rng = np.random.RandomState(7)
        R, S = 12, 8
        rays_o = jnp.array(rng.randn(R, 3).astype(np.float32) * 0.2)
        rays_d = jnp.array(rng.randn(R, 3).astype(np.float32))
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)
        sun_d = jnp.array(rng.randn(R, 3).astype(np.float32))
        t_r = jnp.array(rng.randn(R, 4).astype(np.float32))
        z = jnp.array(np.sort(rng.rand(R, S).astype(np.float32) * 3, -1))

        xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[:, :, None]
        sun = jnp.broadcast_to(sun_d[:, None, :], (R, S, 3))
        t_e = (jnp.broadcast_to(t_r[:, None, :], (R, S, 4))
               if use_beta else None)
        field = m.apply({"params": params}, xyz, sun_dir=sun, t_embed=t_e)
        ref = composite(field, z, noise=None, shadow=True)

        with pltpu.force_tpu_interpret_mode():
            out = FM.fused_render_rays(params, rays_o, rays_d, sun_d,
                                       t_r if use_beta else None, z,
                                       layers=8, feat=32, use_beta=use_beta,
                                       dtype=jnp.float32)

        w = np.asarray(ref["weights"])
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=2e-4)
        np.testing.assert_allclose(out["depth"], ref["depth"], atol=2e-4)
        np.testing.assert_allclose(out["opacity"], w.sum(-1), atol=2e-4)
        np.testing.assert_allclose(
            out["sun"], (w[..., None] * np.asarray(ref["sun"])).sum(-2),
            atol=2e-4)
        np.testing.assert_allclose(
            out["albedo"], (w[..., None] * np.asarray(ref["albedo"])).sum(-2),
            atol=2e-4)
        np.testing.assert_allclose(
            out["sky"], (w[..., None] * np.asarray(ref["sky"])).sum(-2),
            atol=2e-4)
        if use_beta:
            np.testing.assert_allclose(
                out["beta"], (w[..., None] * np.asarray(ref["beta"])).sum(-2),
                atol=2e-4)

    def test_ray_padding(self):
        """R not a multiple of the ray tile: padded rows must not leak."""
        m, params, *_ = _setup("sat-nerf", N=0)
        rng = np.random.RandomState(8)
        S = 8
        for R in (5, 11):
            rays_o = jnp.array(rng.randn(R, 3).astype(np.float32) * 0.2)
            rays_d = jnp.array(rng.randn(R, 3).astype(np.float32))
            sun_d = jnp.array(rng.randn(R, 3).astype(np.float32))
            t_r = jnp.array(rng.randn(R, 4).astype(np.float32))
            z = jnp.array(np.sort(rng.rand(R, S).astype(np.float32), -1))
            with pltpu.force_tpu_interpret_mode():
                out = FM.fused_render_rays(params, rays_o, rays_d, sun_d,
                                           t_r, z, layers=8, feat=32,
                                           dtype=jnp.float32)
            assert out["rgb"].shape == (R, 3)
            assert np.isfinite(np.asarray(out["rgb"])).all()
            assert np.isfinite(np.asarray(out["depth"])).all()


class TestExpansionPrimitives:
    """Direct unit tests of the relayout-free expansion building blocks
    (iota-matmul selection/one-hot/lane-shift) against plain numpy."""

    def test_ray_selector(self):
        r, s = 5, 3
        sel = np.asarray(FM._ray_selector(r, s))
        want = np.zeros((r * s, r), np.float32)
        for q in range(r * s):
            want[q, q // s] = 1.0
        np.testing.assert_array_equal(sel, want)

    def test_sample_onehot(self):
        r, s = 4, 6
        _, onehot = FM._sample_onehot(r, s)
        want = np.zeros((r * s, s), np.float32)
        for q in range(r * s):
            want[q, q % s] = 1.0
        np.testing.assert_array_equal(np.asarray(onehot), want)

    def test_expand_rays_layout(self):
        rng = np.random.RandomState(11)
        r, s, tau = 3, 4, 4
        rays = np.zeros((r, FM.IN_COLS), np.float32)
        rays[:, : 9 + tau] = rng.randn(r, 9 + tau)
        z = np.sort(rng.rand(r, s).astype(np.float32), -1)
        out = np.asarray(FM._expand_rays(jnp.array(rays), jnp.array(z), tau))
        assert out.shape == (r * s, FM.IN_COLS)
        for ri in range(r):
            for si in range(s):
                q = ri * s + si
                np.testing.assert_allclose(
                    out[q, 0:3],
                    rays[ri, 0:3] + rays[ri, 3:6] * z[ri, si], rtol=1e-6)
                np.testing.assert_allclose(out[q, 3:6], rays[ri, 6:9],
                                           rtol=1e-6)
                np.testing.assert_allclose(out[q, 6:6 + tau],
                                           rays[ri, 9:9 + tau], rtol=1e-6)
                np.testing.assert_array_equal(out[q, 6 + tau:], 0.0)
