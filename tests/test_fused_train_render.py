"""Fused TRAIN render kernel (expansion + field + compositing in one Pallas
kernel with a custom compositor VJP) vs the flax field + render/composite.py
XLA path — forward and per-parameter gradient equivalence, plus the
end-to-end _loss_and_metrics wiring. Interpret mode on CPU.

The backward derivation under test is docs/KERNEL_NOTES.md; semantics match
the reference compositor (models/satnerf.py:44-79) and loss (metrics.py:21-25).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from satnerf_tpu.models import build_model
from satnerf_tpu.ops.pallas import fused_mlp as FM
from satnerf_tpu.render.composite import composite

F, L, TAU = 32, 8, 4


def _setup(variant="sat-nerf", R=24, S=16, seed=0, noise_std=0.1):
    m = build_model(variant, L, F)
    params = m.init(jax.random.PRNGKey(seed), jnp.zeros((2, 3)),
                    sun_dir=jnp.zeros((2, 3)),
                    t_embed=jnp.zeros((2, TAU)))["params"]
    rng = np.random.RandomState(seed)
    rays_o = jnp.array(rng.randn(R, 3).astype(np.float32) * 0.3)
    rays_d = jnp.array(rng.randn(R, 3).astype(np.float32))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)
    sun = jnp.array(rng.randn(R, 3).astype(np.float32))
    sun = sun / jnp.linalg.norm(sun, axis=1, keepdims=True)
    t_e = jnp.array(rng.randn(R, TAU).astype(np.float32))
    z = jnp.sort(jnp.array(rng.rand(R, S).astype(np.float32)), axis=1)
    noise = (jnp.array(rng.randn(R, S).astype(np.float32)) * noise_std
             if noise_std else None)
    gt = jnp.array(rng.rand(R, 3).astype(np.float32))
    return m, params, rays_o, rays_d, sun, t_e, z, noise, gt


def _ref_render(m, params, rays_o, rays_d, sun, t_e, z, noise, use_beta):
    r, s = z.shape
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[:, :, None]
    sd = jnp.broadcast_to(sun[:, None, :], xyz.shape)
    tb = (jnp.broadcast_to(t_e[:, None, :], (r, s, TAU)) if use_beta else None)
    out = m.apply({"params": params}, xyz, sun_dir=sd, t_embed=tb)
    return composite(out, z, noise=noise, shadow=True)


def _fused_render(params, rays_o, rays_d, sun, t_e, z, noise, use_beta):
    return FM.fused_train_render_rays(
        params, rays_o, rays_d, sun, t_e if use_beta else None, z, noise,
        layers=L, feat=F, use_beta=use_beta, tau=TAU, dtype=jnp.float32,
    )


class TestForward:
    @pytest.mark.parametrize("variant", ["sat-nerf", "s-nerf"])
    def test_matches_xla_compositor(self, variant):
        use_beta = variant == "sat-nerf"
        m, params, ro, rd, sun, t_e, z, noise, _ = _setup(variant)
        ref = _ref_render(m, params, ro, rd, sun, t_e, z, noise, use_beta)
        with pltpu.force_tpu_interpret_mode():
            out = _fused_render(params, ro, rd, sun, t_e, z, noise, use_beta)
        w = ref["weights"]
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=2e-4)
        np.testing.assert_allclose(out["depth"], ref["depth"], atol=2e-4)
        np.testing.assert_allclose(out["opacity"], w.sum(-1), atol=2e-4)
        for k, q in (("sun", ref["sun"]), ("sky", ref["sky"]),
                     ("albedo", ref["albedo"])):
            want = jnp.sum(w[..., None] * q, axis=-2)
            np.testing.assert_allclose(out[k], want, atol=2e-4, err_msg=k)
        if use_beta:
            want = jnp.sum(w[..., None] * ref["beta"], axis=-2)
            np.testing.assert_allclose(out["beta"], want, atol=2e-4)

    def test_no_noise_and_ray_padding(self):
        """noise=None and a ray count that is not a tile multiple."""
        m, params, ro, rd, sun, t_e, z, _, _ = _setup(R=11, noise_std=0.0)
        ref = _ref_render(m, params, ro, rd, sun, t_e, z, None, True)
        with pltpu.force_tpu_interpret_mode():
            out = _fused_render(params, ro, rd, sun, t_e, z, None, True)
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=2e-4)
        np.testing.assert_allclose(out["depth"], ref["depth"], atol=2e-4)


class TestGradients:
    def _losses(self, m, gt, args):
        """Matching losses over the XLA path (per-sample reductions) and the
        fused path (pre-integrated per-ray outputs), touching EVERY output:
        rgb (uncertainty-weighted), depth, opacity, sun, sky, albedo, beta."""
        rays_o, rays_d, sun, z, noise = args

        def loss_ref(p, te):
            r = _ref_render(m, p, rays_o, rays_d, sun, te, z, noise, True)
            w = r["weights"]
            beta = jnp.sum(w[..., None] * r["beta"], axis=-2) + 0.05
            l = jnp.mean((r["rgb"] - gt) ** 2 / (2 * beta**2))
            l += (3 + jnp.mean(jnp.log(beta))) / 2
            l += 0.3 * jnp.mean(r["depth"]) + 0.1 * jnp.mean(w.sum(-1))
            for c, q in ((0.2, "sun"), (0.15, "sky"), (0.25, "albedo")):
                l += c * jnp.mean(jnp.sum(w[..., None] * r[q], axis=-2))
            return l

        def loss_fused(p, te):
            o = _fused_render(p, rays_o, rays_d, sun, te, z, noise, True)
            beta = o["beta"] + 0.05
            l = jnp.mean((o["rgb"] - gt) ** 2 / (2 * beta**2))
            l += (3 + jnp.mean(jnp.log(beta))) / 2
            l += 0.3 * jnp.mean(o["depth"]) + 0.1 * jnp.mean(o["opacity"])
            for c, q in ((0.2, "sun"), (0.15, "sky"), (0.25, "albedo")):
                l += c * jnp.mean(o[q])
            return l

        return loss_ref, loss_fused

    def test_every_param_and_t_embed_grad(self):
        m, params, ro, rd, sun, t_e, z, noise, gt = _setup()
        loss_ref, loss_fused = self._losses(m, gt, (ro, rd, sun, z, noise))
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, t_e)
        with pltpu.force_tpu_interpret_mode():
            g_fus = jax.grad(loss_fused, argnums=(0, 1))(params, t_e)
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_ref[0]),
            jax.tree_util.tree_leaves(g_fus[0]),
        ):
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4,
                err_msg=f"param grad {jax.tree_util.keystr(path)}",
            )
        scale = max(float(jnp.abs(g_ref[1]).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(g_fus[1]) / scale,
                                   np.asarray(g_ref[1]) / scale, atol=5e-4,
                                   err_msg="t_embed grad")

    def test_loss_values_match(self):
        m, params, ro, rd, sun, t_e, z, noise, gt = _setup()
        loss_ref, loss_fused = self._losses(m, gt, (ro, rd, sun, z, noise))
        l_ref = float(loss_ref(params, t_e))
        with pltpu.force_tpu_interpret_mode():
            l_fus = float(loss_fused(params, t_e))
        assert abs(l_ref - l_fus) < 1e-4


class TestSystemWiring:
    """_loss_and_metrics through the fused train-render branch must equal the
    XLA branch: same key -> same z/noise draws, so loss and grads match to
    kernel f32 noise. Covers beta warm-up (snerf loss on fused outputs), the
    beta_ray loss contract, solar correction, and the depth branch."""

    def test_loss_and_grads_match_unfused(self, rng, eight_devices):
        from satnerf_tpu.config import Config
        from satnerf_tpu.train.system import NeRFSystem

        kw = dict(model="sat-nerf", batch_size=64, fc_units=F, fc_layers=L,
                  n_samples=8, max_train_steps=100, sc_lambda=0.05,
                  ds_lambda=100.0, noise_std=1.0)
        sys_f = NeRFSystem(Config(fused="rays", **kw), dataset_len=512)
        sys_o = NeRFSystem(Config(fused="off", **kw), dataset_len=512)
        assert sys_f._use_fused_train_render
        assert not sys_o._use_fused_train_render
        params = sys_o.init_params(jax.random.PRNGKey(0))

        n = 64
        rays = rng.rand(n, 11).astype(np.float32)
        rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
        rays[:, 6], rays[:, 7] = 0.0, 1.0
        rgbs = jnp.array(rng.rand(n, 3).astype(np.float32))
        ts = jnp.array(rng.randint(0, 5, n).astype(np.int32))
        rays = jnp.array(rays)
        d_targets = jnp.array(rng.rand(16, 2).astype(np.float32))
        d_rays, d_ts = rays[:16], ts[:16]
        key = jax.random.PRNGKey(3)

        def run(system, step):
            def f(p):
                return system._loss_and_metrics(
                    p, rays, rgbs, ts, key, jnp.asarray(step, jnp.int32),
                    d_rays, d_targets, d_ts,
                )
            return jax.value_and_grad(f, has_aux=True)(params)

        for step in (0, 50):  # 0 = snerf warm-up loss, 50 = full satnerf loss
            (l_o, _), g_o = run(sys_o, step)
            with pltpu.force_tpu_interpret_mode():
                (l_f, _), g_f = run(sys_f, step)
            np.testing.assert_allclose(float(l_f), float(l_o), atol=1e-4)
            for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(g_o),
                jax.tree_util.tree_leaves(g_f),
            ):
                scale = max(float(jnp.abs(a).max()), 1e-6)
                np.testing.assert_allclose(
                    np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-3,
                    err_msg=f"step {step}: {jax.tree_util.keystr(path)}",
                )


class TestFusedLossGrads:
    """The single-kernel train step (loss + adjoints + field backward in one
    launch, _fused_loss_and_grads) must reproduce value_and_grad over the XLA
    path: loss value, every metric, the exact grads-tree structure, and every
    parameter gradient — across warm-up / sc / depth-supervision states."""

    @pytest.mark.parametrize("variant", ["sat-nerf", "s-nerf"])
    def test_matches_value_and_grad(self, rng, eight_devices, variant):
        from satnerf_tpu.config import Config
        from satnerf_tpu.train.system import NeRFSystem

        kw = dict(model=variant, batch_size=64, fc_units=F, fc_layers=L,
                  n_samples=8, max_train_steps=100, sc_lambda=0.05,
                  ds_lambda=100.0, noise_std=1.0)
        sys_f = NeRFSystem(Config(fused="rays", **kw), dataset_len=512)
        sys_o = NeRFSystem(Config(fused="off", **kw), dataset_len=512)
        assert sys_f._use_fused_train_loss
        params = sys_o.init_params(jax.random.PRNGKey(0))

        n = 64
        rays = rng.rand(n, 11).astype(np.float32)
        rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
        rays[:, 6], rays[:, 7] = 0.0, 1.0
        rays = jnp.array(rays)
        rgbs = jnp.array(rng.rand(n, 3).astype(np.float32))
        ts = jnp.array(rng.randint(0, 5, n).astype(np.int32))
        d_targets = jnp.array(rng.rand(16, 2).astype(np.float32))
        d_rays, d_ts = rays[:16], ts[:16]
        key = jax.random.PRNGKey(3)

        for step in (0, 50):
            st = jnp.asarray(step, jnp.int32)

            def f(p):
                return sys_o._loss_and_metrics(p, rays, rgbs, ts, key, st,
                                               d_rays, d_targets, d_ts)

            (l_o, m_o), g_o = jax.value_and_grad(f, has_aux=True)(params)
            with pltpu.force_tpu_interpret_mode():
                (l_f, m_f), g_f = sys_f._fused_loss_and_grads(
                    params, rays, rgbs, ts, key, st, d_rays, d_targets, d_ts)

            np.testing.assert_allclose(float(l_f), float(l_o), atol=1e-4)
            for mk in ("loss", "psnr", "loss_depth", "loss_total"):
                np.testing.assert_allclose(float(m_f[mk]), float(m_o[mk]),
                                           atol=1e-3, err_msg=mk)
            assert (jax.tree_util.tree_structure(g_o)
                    == jax.tree_util.tree_structure(g_f))
            for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(g_o),
                jax.tree_util.tree_leaves(g_f),
            ):
                scale = max(float(jnp.abs(a).max()), 1e-6)
                np.testing.assert_allclose(
                    np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-3,
                    err_msg=f"step {step}: {jax.tree_util.keystr(path)}",
                )

    @pytest.mark.parametrize("layers,feat", [(6, 96), (4, 64), (10, 40)])
    def test_exotic_shapes_match_value_and_grad(self, rng, eight_devices,
                                                layers, feat):
        """Non-default network shapes through the single-kernel train step.

        The kernels are parametric in (fc_layers, fc_units) — including
        fc_layers <= skip, where the reference's skip-concat at layer 4
        (models/nerf.py:160-166 semantics) simply never fires, and
        fc_layers > 8. Verified on real Mosaic too (r4 chip probe: forward
        kernels at 6x96 / 10x256 / 4x64 match the flax field, and the train
        kernel compiles + runs at 6x96 / 4x64)."""
        from satnerf_tpu.config import Config
        from satnerf_tpu.train.system import NeRFSystem

        kw = dict(model="sat-nerf", batch_size=64, fc_units=feat,
                  fc_layers=layers, n_samples=8, max_train_steps=100,
                  sc_lambda=0.0, noise_std=0.0)
        sys_f = NeRFSystem(Config(fused="rays", **kw), dataset_len=512)
        sys_o = NeRFSystem(Config(fused="off", **kw), dataset_len=512)
        assert sys_f._use_fused_train_loss
        params = sys_o.init_params(jax.random.PRNGKey(0))

        n = 64
        rays = rng.rand(n, 11).astype(np.float32)
        rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
        rays[:, 6], rays[:, 7] = 0.0, 1.0
        rays = jnp.array(rays)
        rgbs = jnp.array(rng.rand(n, 3).astype(np.float32))
        ts = jnp.array(rng.randint(0, 5, n).astype(np.int32))
        key = jax.random.PRNGKey(3)
        st = jnp.asarray(50, jnp.int32)

        def f(p):
            return sys_o._loss_and_metrics(p, rays, rgbs, ts, key, st,
                                           None, None, None)

        (l_o, m_o), g_o = jax.value_and_grad(f, has_aux=True)(params)
        with pltpu.force_tpu_interpret_mode():
            (l_f, m_f), g_f = sys_f._fused_loss_and_grads(
                params, rays, rgbs, ts, key, st, None, None, None)

        np.testing.assert_allclose(float(l_f), float(l_o), atol=1e-4)
        assert (jax.tree_util.tree_structure(g_o)
                == jax.tree_util.tree_structure(g_f))
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_o),
            jax.tree_util.tree_leaves(g_f),
        ):
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-3,
                err_msg=f"{layers}x{feat}: {jax.tree_util.keystr(path)}",
            )

    @pytest.mark.parametrize("variant", ["sat-nerf", "s-nerf"])
    def test_hierarchical_matches_value_and_grad(self, rng, eight_devices,
                                                 variant):
        """n_importance > 0: the two-launch fused dispatch (coarse kernel
        with weights out -> sample_pdf -> fine kernel over the sorted union,
        plus per-model sc passes) vs value_and_grad over the XLA coarse+fine
        path (rendering.py:118-156 semantics). Tolerances are slightly wider
        than the coarse-only test: kernel-vs-XLA f32 rounding in the coarse
        weights shifts sample_pdf's resampled depths by ~1e-6, which the
        SIREN field amplifies."""
        from satnerf_tpu.config import Config
        from satnerf_tpu.train.system import NeRFSystem

        kw = dict(model=variant, batch_size=64, fc_units=F, fc_layers=L,
                  n_samples=8, n_importance=4, max_train_steps=100,
                  sc_lambda=0.05, ds_lambda=100.0, noise_std=1.0)
        sys_f = NeRFSystem(Config(fused="rays", **kw), dataset_len=512)
        sys_o = NeRFSystem(Config(fused="off", **kw), dataset_len=512)
        assert sys_f._use_fused_train_loss
        assert not sys_f._use_fused_train_render  # render path stays 2-launch
        params = sys_o.init_params(jax.random.PRNGKey(0))
        assert "fine" in params

        n = 64
        rays = rng.rand(n, 11).astype(np.float32)
        rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
        rays[:, 6], rays[:, 7] = 0.0, 1.0
        rays = jnp.array(rays)
        rgbs = jnp.array(rng.rand(n, 3).astype(np.float32))
        ts = jnp.array(rng.randint(0, 5, n).astype(np.int32))
        d_targets = jnp.array(rng.rand(16, 2).astype(np.float32))
        d_rays, d_ts = rays[:16], ts[:16]
        key = jax.random.PRNGKey(3)

        for step in (0, 50):
            st = jnp.asarray(step, jnp.int32)

            def f(p):
                return sys_o._loss_and_metrics(p, rays, rgbs, ts, key, st,
                                               d_rays, d_targets, d_ts)

            (l_o, m_o), g_o = jax.value_and_grad(f, has_aux=True)(params)
            with pltpu.force_tpu_interpret_mode():
                (l_f, m_f), g_f = sys_f._fused_loss_and_grads(
                    params, rays, rgbs, ts, key, st, d_rays, d_targets, d_ts)

            np.testing.assert_allclose(float(l_f), float(l_o), atol=5e-4)
            for mk in ("loss", "psnr", "loss_depth", "loss_total"):
                np.testing.assert_allclose(float(m_f[mk]), float(m_o[mk]),
                                           atol=5e-3, err_msg=mk)
            assert (jax.tree_util.tree_structure(g_o)
                    == jax.tree_util.tree_structure(g_f))
            for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(g_o),
                jax.tree_util.tree_leaves(g_f),
            ):
                scale = max(float(jnp.abs(a).max()), 1e-6)
                np.testing.assert_allclose(
                    np.asarray(b) / scale, np.asarray(a) / scale, atol=3e-3,
                    err_msg=f"step {step}: {jax.tree_util.keystr(path)}",
                )

    def test_ray_padding_masked(self, rng, eight_devices):
        """A ray count that is not a tile multiple: padded rays must
        contribute nothing to loss or grads."""
        from satnerf_tpu.config import Config
        from satnerf_tpu.train.system import NeRFSystem

        kw = dict(model="sat-nerf", batch_size=64, fc_units=F, fc_layers=L,
                  n_samples=8, max_train_steps=100, sc_lambda=0.0,
                  noise_std=0.0)
        sys_f = NeRFSystem(Config(fused="rays", **kw), dataset_len=512)
        sys_o = NeRFSystem(Config(fused="off", **kw), dataset_len=512)
        params = sys_o.init_params(jax.random.PRNGKey(0))
        n = 19  # not a multiple of the backward ray tile
        rays = rng.rand(n, 11).astype(np.float32)
        rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
        rays[:, 6], rays[:, 7] = 0.0, 1.0
        rays = jnp.array(rays)
        rgbs = jnp.array(rng.rand(n, 3).astype(np.float32))
        ts = jnp.array(rng.randint(0, 5, n).astype(np.int32))
        key, st = jax.random.PRNGKey(3), jnp.asarray(60, jnp.int32)

        def f(p):
            return sys_o._loss_and_metrics(p, rays, rgbs, ts, key, st)

        (l_o, _), g_o = jax.value_and_grad(f, has_aux=True)(params)
        with pltpu.force_tpu_interpret_mode():
            (l_f, _), g_f = sys_f._fused_loss_and_grads(params, rays, rgbs,
                                                        ts, key, st)
        np.testing.assert_allclose(float(l_f), float(l_o), atol=1e-4)
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_o),
            jax.tree_util.tree_leaves(g_f),
        ):
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-3,
                err_msg=jax.tree_util.keystr(path),
            )


class TestFusedNerfLossGrads:
    """nerf-variant single-kernel train step (fused_nerf_train_loss_grads)
    vs value_and_grad over the flax + XLA path."""

    def test_matches_value_and_grad(self, rng, eight_devices):
        from satnerf_tpu.config import Config
        from satnerf_tpu.train.system import NeRFSystem

        kw = dict(model="nerf", batch_size=64, fc_units=F, fc_layers=L,
                  n_samples=8, max_train_steps=100, noise_std=1.0)
        sys_f = NeRFSystem(Config(fused="on", **kw), dataset_len=512)
        sys_o = NeRFSystem(Config(fused="off", **kw), dataset_len=512)
        assert sys_f._use_fused_train_loss
        assert not sys_o._use_fused_train_loss
        params = sys_o.init_params(jax.random.PRNGKey(0))

        n = 64
        rays = rng.rand(n, 11).astype(np.float32)
        rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
        rays[:, 6], rays[:, 7] = 0.0, 1.0
        rays = jnp.array(rays)
        rgbs = jnp.array(rng.rand(n, 3).astype(np.float32))
        key = jax.random.PRNGKey(3)
        st = jnp.zeros((), jnp.int32)

        def f(p):
            return sys_o._loss_and_metrics(p, rays, rgbs, None, key, st)

        (l_o, m_o), g_o = jax.value_and_grad(f, has_aux=True)(params)
        with pltpu.force_tpu_interpret_mode():
            (l_f, m_f), g_f = sys_f._fused_loss_and_grads(
                params, rays, rgbs, None, key, st)

        np.testing.assert_allclose(float(l_f), float(l_o), atol=1e-4)
        np.testing.assert_allclose(float(m_f["psnr"]), float(m_o["psnr"]),
                                   atol=1e-2)
        assert (jax.tree_util.tree_structure(g_o)
                == jax.tree_util.tree_structure(g_f))
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_o),
            jax.tree_util.tree_leaves(g_f),
        ):
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-3,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_ray_padding_masked(self, rng, eight_devices):
        """Non-tile-multiple ray counts: padded rays contribute nothing."""
        from satnerf_tpu.ops.pallas.fused_nerf import (
            fused_nerf_train_loss_grads,
        )
        from satnerf_tpu.models import build_model

        m = build_model("nerf", L, F)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                        view_dir=jnp.zeros((2, 3)))["params"]
        r1, r2, S = 40, 24, 8  # tile_r is a multiple of 8; 24 pads
        rays_o = jnp.array(rng.randn(r1, 3).astype(np.float32) * 0.2)
        rays_d = jnp.array(rng.randn(r1, 3).astype(np.float32))
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)
        z = jnp.sort(jnp.array(rng.rand(r1, S).astype(np.float32)), axis=1)
        gt = jnp.array(rng.rand(r1, 3).astype(np.float32))

        def run(k):
            with pltpu.force_tpu_interpret_mode():
                return fused_nerf_train_loss_grads(
                    params, rays_o[:k], rays_d[:k], z[:k], None, gt[:k],
                    layers=L, feat=F, dtype=jnp.float32,
                )

        mse_a, g_a = run(r2)

        # oracle on exactly those r2 rays via the flax path
        from satnerf_tpu.render.composite import composite

        def loss(p):
            xyz = (rays_o[:r2, None, :]
                   + rays_d[:r2, None, :] * z[:r2, :, None])
            vd = jnp.broadcast_to(rays_d[:r2, None, :], xyz.shape)
            out = m.apply({"params": p}, xyz, view_dir=vd)
            res = composite(out, z[:r2], shadow=False)
            return jnp.mean((res["rgb"] - gt[:r2]) ** 2)

        l_o, g_o = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(mse_a), float(l_o), atol=1e-4)
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_o),
            jax.tree_util.tree_leaves(g_a),
        ):
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-3,
                err_msg=jax.tree_util.keystr(path),
            )


class TestFusedUnderScan:
    """--grad_accum wraps the single-kernel train body in a lax.scan; the
    Pallas kernel must trace and run inside the scan (this is the exact
    composition the TPU grad-accum path compiles)."""

    def test_scan_accumulation_matches_separate_calls(self, rng,
                                                      eight_devices):
        from satnerf_tpu.config import Config
        from satnerf_tpu.train.system import NeRFSystem

        kw = dict(model="sat-nerf", batch_size=64, fc_units=F, fc_layers=L,
                  n_samples=8, max_train_steps=100, noise_std=0.0)
        sys_f = NeRFSystem(Config(fused="rays", **kw), dataset_len=512)
        assert sys_f._use_fused_train_loss
        params = sys_f.init_params(jax.random.PRNGKey(0))

        n = 64
        rays = rng.rand(n, 11).astype(np.float32)
        rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
        rays[:, 6], rays[:, 7] = 0.0, 1.0
        rays = jnp.array(rays)
        rgbs = jnp.array(rng.rand(n, 3).astype(np.float32))
        ts = jnp.array(rng.randint(0, 5, n).astype(np.int32))
        step0 = jnp.asarray(0, jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(7), 2)

        def one(k):
            (loss, _), grads = sys_f._fused_loss_and_grads(
                params, rays, rgbs, ts, k, step0, None, None, None)
            return loss, grads

        with pltpu.force_tpu_interpret_mode():
            l0, g0 = one(keys[0])
            l1, g1 = one(keys[1])

            def body(carry, k):
                c_l, c_g = carry
                l, g = one(k)
                add = lambda a, b: a + b
                return (c_l + l, jax.tree_util.tree_map(add, c_g, g)), None

            (sl, sg), _ = jax.lax.scan(
                body, (l0, g0), keys[1:])

        np.testing.assert_allclose(float(sl) / 2,
                                   (float(l0) + float(l1)) / 2, rtol=1e-6)
        for a, b, c in zip(jax.tree_util.tree_leaves(sg),
                           jax.tree_util.tree_leaves(g0),
                           jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b + c),
                                       rtol=1e-5, atol=1e-6)
