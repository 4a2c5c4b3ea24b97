"""Training-system tests: sharded step correctness, schedules, and a tiny
overfit run; single-device vs 8-device gradient equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satnerf_tpu.config import Config
from satnerf_tpu.parallel.mesh import make_mesh, shard_rays
from satnerf_tpu.train.system import NeRFSystem, steps_per_epoch


def _toy_data(rng, n=2048, sat=True):
    rays = rng.rand(n, 11).astype(np.float32)
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
    rays[:, 6], rays[:, 7] = 0.0, 1.0
    rgbs = rng.rand(n, 3).astype(np.float32)
    ts = rng.randint(0, 5, n).astype(np.int32)
    return rays, rgbs, ts


def _small_cfg(**kw):
    base = dict(model="sat-nerf", batch_size=128, fc_units=32, fc_layers=2,
                n_samples=8, max_train_steps=100, sc_lambda=0.0)
    base.update(kw)
    return Config(**base)


class TestTrainStep:
    def test_runs_and_updates(self, rng, eight_devices):
        cfg = _small_cfg()
        mesh = make_mesh()
        sys_ = NeRFSystem(cfg, dataset_len=2048, mesh=mesh)
        state = sys_.init_state(jax.random.PRNGKey(0))
        p0 = jax.tree_util.tree_map(np.array, state.params)
        rays, rgbs, ts = _toy_data(rng)
        _, (r, g, t) = shard_rays(mesh, rays, rgbs, ts)
        step = sys_.make_train_step()
        state, m = step(state, {"rays": r, "rgbs": g, "ts": t},
                        jax.random.PRNGKey(1))
        assert int(state.step) == 1
        assert np.isfinite(float(m["loss"]))
        # parameters actually moved
        moved = jax.tree_util.tree_map(
            lambda a, b: np.abs(np.asarray(a) - b).max(), state.params, p0
        )
        assert max(jax.tree_util.tree_leaves(moved)) > 0

    def test_overfit_tiny(self, rng, eight_devices):
        """Loss must drop substantially when overfitting 256 rays."""
        cfg = _small_cfg(model="s-nerf", batch_size=256, fc_units=64,
                         fc_layers=4, n_samples=16, lr=1e-3)
        mesh = make_mesh()
        sys_ = NeRFSystem(cfg, dataset_len=256, mesh=mesh)
        state = sys_.init_state(jax.random.PRNGKey(0))
        rays, rgbs, ts = _toy_data(rng, n=256)
        rgbs[:] = 0.5  # constant target: easy to fit
        _, (r, g, t) = shard_rays(mesh, rays, rgbs, ts)
        step = sys_.make_train_step()
        key = jax.random.PRNGKey(1)
        first = last = None
        for i in range(60):
            state, m = step(state, {"rays": r, "rgbs": g, "ts": t}, key)
            if i == 0:
                first = float(m["loss"])
            last = float(m["loss"])
        assert last < first * 0.25, (first, last)

    def test_grads_match_single_device(self, rng, eight_devices):
        """pmean(local grads) over 8 shards == global-batch gradient."""
        import dataclasses

        cfg = _small_cfg(sc_lambda=0.1)
        mesh = make_mesh()
        sys_ = NeRFSystem(cfg, dataset_len=1024, mesh=mesh)
        # deterministic sampling: z-perturbation draws depend on batch shape,
        # which differs between the global and per-shard runs
        sys_.render_cfg = dataclasses.replace(sys_.render_cfg, perturb=0.0)
        params = sys_.init_params(jax.random.PRNGKey(0))
        rays, rgbs, ts = _toy_data(rng, n=128)
        key = jax.random.PRNGKey(3)

        def global_loss(p):
            l, _ = sys_._loss_and_metrics(
                p, jnp.array(rays), jnp.array(rgbs), jnp.array(ts), key,
                jnp.zeros((), jnp.int32),
            )
            return l

        g_global = jax.grad(global_loss)(params)

        from jax.sharding import PartitionSpec as P

        def local_grad(p, r, g, t):
            def loss(pp):
                l, _ = sys_._loss_and_metrics(
                    pp, r, g, t, key, jnp.zeros((), jnp.int32)
                )
                return l

            grads = jax.grad(loss)(p)
            return jax.lax.pmean(grads, "data")

        fn = jax.shard_map(
            local_grad, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P(), check_vma=False,
        )
        g_sharded = fn(params, jnp.array(rays), jnp.array(rgbs), jnp.array(ts))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    atol=2e-5),
            g_global, g_sharded,
        )

    def test_depth_supervision_path(self, rng, eight_devices):
        cfg = _small_cfg(ds_lambda=1000.0, ds_drop=0.5)
        mesh = make_mesh()
        sys_ = NeRFSystem(cfg, dataset_len=1024, depth_dataset_len=512, mesh=mesh)
        state = sys_.init_state(jax.random.PRNGKey(0))
        rays, rgbs, ts = _toy_data(rng, n=1024)
        d_rays, _, d_ts = _toy_data(rng, n=512)
        d_depths = rng.rand(512, 2).astype(np.float32)
        _, (r, g, t) = shard_rays(mesh, rays, rgbs, ts)
        _, (dr, dd, dt) = shard_rays(mesh, d_rays, d_depths, d_ts)
        step = sys_.make_train_step()
        state, m = step(
            state,
            {"rays": r, "rgbs": g, "ts": t, "d_rays": dr, "d_depths": dd,
             "d_ts": dt},
            jax.random.PRNGKey(1),
        )
        assert "loss_depth" in m and np.isfinite(float(m["loss_depth"]))


class TestShuffleSampling:
    """--sampling shuffle: without-replacement epoch semantics (the reference
    DataLoader's, main.py:96-117) via per-epoch on-device shard permutations."""

    def test_epoch_perm_is_per_shard_permutation(self, rng, eight_devices):
        cfg = _small_cfg(sampling="shuffle")
        mesh = make_mesh()
        sys_ = NeRFSystem(cfg, dataset_len=2048, mesh=mesh)
        n_dev = mesh.devices.size
        n_local = 16
        rays, rgbs, ts = _toy_data(rng, n=n_dev * n_local)
        _, (r, _, _) = shard_rays(mesh, rays, rgbs, ts)
        perm = np.asarray(sys_.make_epoch_perm()(r, jax.random.PRNGKey(0)))
        perms = perm.reshape(n_dev, n_local)
        for p in perms:
            assert sorted(p.tolist()) == list(range(n_local))
        # shards get independent permutations (key folded with axis index)
        assert any(not np.array_equal(perms[0], perms[i])
                   for i in range(1, n_dev))
        # a different epoch key gives a different permutation
        perm2 = np.asarray(sys_.make_epoch_perm()(r, jax.random.PRNGKey(1)))
        assert not np.array_equal(perm, perm2)

    def test_step_runs_and_overfits(self, rng, eight_devices):
        cfg = _small_cfg(model="s-nerf", batch_size=256, fc_units=64,
                         fc_layers=4, n_samples=16, lr=1e-3,
                         sampling="shuffle")
        mesh = make_mesh()
        sys_ = NeRFSystem(cfg, dataset_len=2048, mesh=mesh)
        state = sys_.init_state(jax.random.PRNGKey(0))
        rays, rgbs, ts = _toy_data(rng, n=2048)
        rgbs[:] = 0.5
        _, (r, g, t) = shard_rays(mesh, rays, rgbs, ts)
        perm = sys_.make_epoch_perm()(r, jax.random.PRNGKey(7))
        data = {"rays": r, "rgbs": g, "ts": t, "perm": perm}
        step = sys_.make_train_step()
        key = jax.random.PRNGKey(1)
        first = last = None
        for i in range(60):
            state, m = step(state, data, key)
            if i == 0:
                first = float(m["loss"])
            last = float(m["loss"])
        assert last < first * 0.25, (first, last)

    def test_epoch_draws_are_disjoint(self, rng, eight_devices):
        """Within one epoch every ray is visited at most once — checked on
        the PRODUCTION index function the jitted step uses
        (system.epoch_draw_positions), not a re-derivation."""
        from satnerf_tpu.train.system import epoch_draw_positions

        cfg = _small_cfg(batch_size=256, sampling="shuffle")
        mesh = make_mesh()
        n_dev = mesh.devices.size
        sys_ = NeRFSystem(cfg, dataset_len=2048, mesh=mesh)
        spe = sys_.spe  # 2048 // 256 = 8
        b_local = cfg.batch_size // n_dev
        n_local = 2048 // n_dev
        seen = []
        for s in range(spe):
            pos = np.asarray(epoch_draw_positions(
                jnp.asarray(s, jnp.int32), spe, b_local, n_local
            ))
            seen.extend(pos.tolist())
        assert len(seen) == len(set(seen))  # no repeats within the epoch
        assert len(seen) == spe * b_local <= n_local
        # and the epoch wraps: the next epoch's first step revisits slot 0
        again = np.asarray(epoch_draw_positions(
            jnp.asarray(spe, jnp.int32), spe, b_local, n_local
        ))
        np.testing.assert_array_equal(again, seen[:b_local])


class TestSchedules:
    def test_steps_per_epoch(self):
        assert steps_per_epoch(10000, 1024) == 9  # reference integer division
        assert steps_per_epoch(100, 1024) == 1  # guard against zero

    def test_lr_decay(self):
        cfg = _small_cfg(lr=1e-3, batch_size=128)
        sys_ = NeRFSystem(cfg, dataset_len=1280, mesh=make_mesh(1))
        # spe = 10: epoch 0 -> lr0, epoch 3 (step 30) -> lr0 * 0.9^3
        np.testing.assert_allclose(float(sys_.lr_schedule(0)), 1e-3)
        np.testing.assert_allclose(float(sys_.lr_schedule(30)), 1e-3 * 0.9**3,
                                   rtol=1e-6)

    def test_noise_decay(self):
        cfg = _small_cfg(noise_std=1.0)
        sys_ = NeRFSystem(cfg, dataset_len=1280, mesh=make_mesh(1))
        np.testing.assert_allclose(
            float(sys_._noise_std(jnp.array(10))), 0.9**10, rtol=1e-5
        )
        cfg0 = _small_cfg(noise_std=0.0)
        sys0 = NeRFSystem(cfg0, dataset_len=1280, mesh=make_mesh(1))
        assert sys0._noise_std(jnp.array(10)) is None


class TestEvalRender:
    def test_render_image_chunks(self, rng, eight_devices):
        cfg = _small_cfg(chunk=64)
        sys_ = NeRFSystem(cfg, dataset_len=1024, mesh=make_mesh())
        state = sys_.init_state(jax.random.PRNGKey(0))
        rays, _, ts = _toy_data(rng, n=150)  # not a multiple of chunk
        out = sys_.render_image(state.params, rays, ts)
        assert out["rgb_coarse"].shape == (150, 3)
        assert out["depth_coarse"].shape == (150,)


class TestEvalWire:
    def test_float16_wire_upcasts_and_matches(self, rng, eight_devices):
        """--eval_wire float16 halves the fetched bytes; the host side must
        still see float32 arrays, within f16 quantization of the f32 wire
        (depth is never compressed — it feeds the DSM chain)."""
        cfg_off = _small_cfg(chunk=64, eval_wire="off")
        cfg_f16 = _small_cfg(chunk=64, eval_wire="float16")
        mesh = make_mesh()
        sys_off = NeRFSystem(cfg_off, dataset_len=1024, mesh=mesh)
        sys_f16 = NeRFSystem(cfg_f16, dataset_len=1024, mesh=mesh)
        params = sys_off.init_params(jax.random.PRNGKey(0))
        rays, _, ts = _toy_data(rng, n=128)
        a = sys_off.render_image(params, rays, ts)
        b = sys_f16.render_image(params, rays, ts)
        for k in a:
            assert b[k].dtype == np.float32, k
        # depth is uncompressed: any difference is jit-wrapper reassociation
        # noise (~1 ulp), far below f16 quantization (~5e-4 here)
        np.testing.assert_allclose(a["depth_coarse"], b["depth_coarse"],
                                   atol=1e-6)
        np.testing.assert_allclose(a["rgb_coarse"], b["rgb_coarse"],
                                   atol=1e-3)


class TestFusedProductRender:
    """--fused rays eval path: in-kernel compositing through the sharded
    render_image surface must reproduce the flax + XLA-compositor results
    and come back in the reference-shaped product dict."""

    def test_matches_unfused_eval_render(self, rng, eight_devices):
        from jax.experimental.pallas import tpu as pltpu

        rays, rgbs, ts = _toy_data(rng, n=512)
        mesh = make_mesh()
        cfg_f = _small_cfg(fused="rays", chunk=256)
        cfg_o = _small_cfg(fused="off", chunk=256)
        sys_f = NeRFSystem(cfg_f, dataset_len=2048, mesh=mesh)
        sys_o = NeRFSystem(cfg_o, dataset_len=2048, mesh=mesh)
        assert sys_f._use_fused_product_render
        params = sys_o.init_params(jax.random.PRNGKey(0))

        with pltpu.force_tpu_interpret_mode():
            res_f = sys_f.render_image(params, rays, ts)
        res_o = sys_o.render_image(params, rays, ts)

        np.testing.assert_allclose(res_f["rgb_coarse"], res_o["rgb_coarse"],
                                   atol=2e-4)
        np.testing.assert_allclose(res_f["depth_coarse"],
                                   res_o["depth_coarse"], atol=2e-4)
        # pre-integrated extras with weights==1 == host-side (w*q).sum(-2)
        w = res_o["weights_coarse"]
        for k, ref in (("sun", res_o["sun_coarse"]),
                       ("sky", res_o["sky_coarse"]),
                       ("beta", res_o["beta_coarse"]),
                       ("albedo", res_o["albedo_coarse"])):
            got = (res_f["weights_coarse"][..., None]
                   * res_f[f"{k}_coarse"]).sum(-2)
            want = (w[..., None] * ref).sum(-2)
            np.testing.assert_allclose(got, want, atol=2e-4, err_msg=k)

    def test_fine_model_two_kernel_dispatch(self, rng, eight_devices):
        """n_importance > 0 through the fused product path: coarse render
        (weights out) -> sample_pdf -> fine render, vs the flax + XLA
        renderer. sample_pdf's searchsorted amplifies sub-ulp weight
        differences on rays whose CDF sits on a bin edge, so the comparison
        tolerates rare outliers instead of a global atol."""
        from jax.experimental.pallas import tpu as pltpu

        rays, rgbs, ts = _toy_data(rng, n=256)
        mesh = make_mesh()
        cfg_f = _small_cfg(fused="rays", chunk=256, n_importance=8)
        cfg_o = _small_cfg(fused="off", chunk=256, n_importance=8)
        sys_f = NeRFSystem(cfg_f, dataset_len=2048, mesh=mesh)
        sys_o = NeRFSystem(cfg_o, dataset_len=2048, mesh=mesh)
        assert sys_f._use_fused_product_render
        params = sys_o.init_params(jax.random.PRNGKey(0))

        with pltpu.force_tpu_interpret_mode():
            res_f = sys_f.render_image(params, rays, ts)
        res_o = sys_o.render_image(params, rays, ts)

        assert res_f["rgb_fine"].shape == (256, 3)
        assert res_f["depth_fine"].shape == (256,)
        for k in ("rgb_coarse", "rgb_fine", "depth_fine"):
            a, b = np.asarray(res_f[k]), np.asarray(res_o[k])
            err = np.abs(a - b).reshape(a.shape[0], -1).max(-1)
            assert np.median(err) < 2e-4, (k, np.median(err))
            assert (err < 2e-3).mean() > 0.97, (k, (err < 2e-3).mean())


class TestFusedNerfProductRender:
    def test_nerf_variant_dispatch(self, rng, eight_devices):
        """The nerf variant serves through fused_nerf_render_rays (any fused
        mode — its train path is point-mode but the render kernel is
        ray-mode), including the fine-model two-kernel dispatch."""
        from jax.experimental.pallas import tpu as pltpu

        rays, rgbs, ts = _toy_data(rng, n=128)
        mesh = make_mesh()
        cfg_f = _small_cfg(model="nerf", fused="on", chunk=128,
                           n_importance=4)
        cfg_o = _small_cfg(model="nerf", fused="off", chunk=128,
                           n_importance=4)
        sys_f = NeRFSystem(cfg_f, dataset_len=2048, mesh=mesh)
        sys_o = NeRFSystem(cfg_o, dataset_len=2048, mesh=mesh)
        assert sys_f._use_fused_product_render
        assert not sys_o._use_fused_product_render
        params = sys_o.init_params(jax.random.PRNGKey(0))

        with pltpu.force_tpu_interpret_mode():
            res_f = sys_f.render_image(params, rays, None)
        res_o = sys_o.render_image(params, rays, None)

        assert res_f["rgb_fine"].shape == (128, 3)
        for k in ("rgb_coarse", "depth_coarse"):
            np.testing.assert_allclose(np.asarray(res_f[k]),
                                       np.asarray(res_o[k]), atol=2e-3,
                                       err_msg=k)
        # fine pass goes through sample_pdf: tolerate CDF-edge outliers
        for k in ("rgb_fine", "depth_fine"):
            a, b = np.asarray(res_f[k]), np.asarray(res_o[k])
            err = np.abs(a - b).reshape(a.shape[0], -1).max(-1)
            assert np.median(err) < 2e-3, (k, np.median(err))
            assert (err < 2e-2).mean() > 0.95, (k, (err < 2e-2).mean())


class TestGradAccum:
    """--grad_accum: effective batch = batch_size * grad_accum with one
    optimizer update per step (micro-batch grads averaged)."""

    def test_identical_rays_match_single_batch_update(self, rng,
                                                      eight_devices):
        """With every dataset ray identical AND stratified jitter disabled,
        any draw yields the same micro-batch loss, so accum=4 must average
        4 identical grad trees — the same update as accum=1. Pins
        mean-not-sum semantics and the single-update contract. (With
        jitter on, micro-batches legitimately differ through their keys —
        that path is covered by test_distinct_micro_batches_trains.)"""
        import dataclasses

        rays, rgbs, ts = _toy_data(rng, n=1024)
        rays[:] = rays[:1]
        rgbs[:] = rgbs[:1]
        ts[:] = ts[:1]
        mesh = make_mesh()
        _, (r, g, t) = shard_rays(mesh, rays, rgbs, ts)
        data = {"rays": r, "rgbs": g, "ts": t}

        states = {}
        for accum in (1, 4):
            cfg = _small_cfg(grad_accum=accum)
            sys_ = NeRFSystem(cfg, dataset_len=1024, mesh=mesh)
            sys_.render_cfg = dataclasses.replace(sys_.render_cfg,
                                                  perturb=0.0)
            state = sys_.init_state(jax.random.PRNGKey(0))
            step = sys_.make_train_step()
            state, m = step(state, data, jax.random.PRNGKey(1))
            assert np.isfinite(float(m["loss"]))
            states[accum] = jax.tree_util.tree_map(np.asarray, state.params)

        flat1 = jax.tree_util.tree_leaves(states[1])
        flat4 = jax.tree_util.tree_leaves(states[4])
        for a, b in zip(flat1, flat4):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)

    def test_epoch_counts_effective_rays(self):
        cfg = _small_cfg(grad_accum=8)
        mesh = make_mesh()
        sys_ = NeRFSystem(cfg, dataset_len=8192, mesh=mesh)
        assert sys_.spe == 8192 // (128 * 8)

    def test_shuffle_rejected(self):
        cfg = _small_cfg(grad_accum=2, sampling="shuffle")
        mesh = make_mesh()
        sys_ = NeRFSystem(cfg, dataset_len=2048, mesh=mesh)
        with pytest.raises(ValueError, match="replacement"):
            sys_.make_train_step()

    def test_distinct_micro_batches_trains(self, rng, eight_devices):
        """accum=2 with real (distinct) data: step advances by one, loss
        falls over a short run (the accumulated path actually trains)."""
        cfg = _small_cfg(grad_accum=2, batch_size=128, lr=1e-3,
                         first_beta_epoch=999)  # pure-MSE loss: monotone-ish
        mesh = make_mesh()
        sys_ = NeRFSystem(cfg, dataset_len=512, mesh=mesh)
        state = sys_.init_state(jax.random.PRNGKey(0))
        rays, rgbs, ts = _toy_data(rng, n=512)
        rgbs[:] = 0.5
        _, (r, g, t) = shard_rays(mesh, rays, rgbs, ts)
        data = {"rays": r, "rgbs": g, "ts": t}
        step = sys_.make_train_step()
        losses = []
        for i in range(30):
            state, m = step(state, data, jax.random.PRNGKey(2))
            losses.append(float(m["loss"]))
        assert int(state.step) == 30
        assert losses[-1] < min(losses[0], 0.005)
