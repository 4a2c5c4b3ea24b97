"""Render-core tests: compositor golden values vs a torch oracle implementing
the reference formulas, sampling invariants, and full render_rays shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from satnerf_tpu.render import (
    RenderConfig,
    composite,
    ray_weights,
    render_rays,
    sample_pdf,
    stratified_zvals,
)


def torch_compositor(rgbs, sigmas, z_vals):
    """The reference alpha-compositing math (models/nerf.py:111-132) as a
    torch oracle, written from the published NeRF quadrature."""
    rgbs = torch.tensor(np.asarray(rgbs))
    sigmas = torch.tensor(np.asarray(sigmas))
    z_vals = torch.tensor(np.asarray(z_vals))
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = 1e10 * torch.ones_like(deltas[:, :1])
    deltas = torch.cat([deltas, delta_inf], -1)
    alphas = 1 - torch.exp(-deltas * torch.relu(sigmas))
    shifted = torch.cat([torch.ones_like(alphas[:, :1]), 1 - alphas + 1e-10], -1)
    transparency = torch.cumprod(shifted, -1)[:, :-1]
    weights = alphas * transparency
    depth = torch.sum(weights * z_vals, -1)
    rgb = torch.sum(weights.unsqueeze(-1) * rgbs, -2)
    return rgb.numpy(), depth.numpy(), weights.numpy(), transparency.numpy()


class TestCompositor:
    def test_matches_torch_oracle(self, rng):
        n, s = 16, 32
        rgbs = rng.rand(n, s, 3).astype(np.float32)
        sigmas = (rng.randn(n, s) * 2).astype(np.float32)
        z_vals = np.sort(rng.rand(n, s).astype(np.float32) * 2, axis=-1)
        res = composite({"rgb": jnp.array(rgbs), "sigma": jnp.array(sigmas)},
                        jnp.array(z_vals))
        rgb_t, depth_t, w_t, t_t = torch_compositor(rgbs, sigmas, z_vals)
        np.testing.assert_allclose(res["rgb"], rgb_t, atol=1e-5)
        np.testing.assert_allclose(res["depth"], depth_t, atol=1e-4)
        np.testing.assert_allclose(res["weights"], w_t, atol=1e-5)
        np.testing.assert_allclose(res["transparency"], t_t, atol=1e-5)

    def test_opaque_surface(self):
        """A single very dense sample should absorb everything at its depth."""
        n, s = 4, 8
        z = np.tile(np.linspace(0.1, 1.0, s), (n, 1)).astype(np.float32)
        sig = np.zeros((n, s), np.float32)
        sig[:, 3] = 1e8
        rgb = np.zeros((n, s, 3), np.float32)
        rgb[:, 3] = [1.0, 0.5, 0.25]
        res = composite({"rgb": jnp.array(rgb), "sigma": jnp.array(sig)},
                        jnp.array(z))
        np.testing.assert_allclose(res["depth"], z[:, 3], atol=1e-5)
        np.testing.assert_allclose(res["rgb"], rgb[:, 3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(res["weights"]).sum(-1), 1.0, atol=1e-5)

    def test_empty_space(self):
        n, s = 4, 8
        z = np.tile(np.linspace(0.1, 1.0, s), (n, 1)).astype(np.float32)
        sig = np.full((n, s), -10.0, np.float32)  # relu -> 0 density
        rgb = np.ones((n, s, 3), np.float32)
        res = composite({"rgb": jnp.array(rgb), "sigma": jnp.array(sig)},
                        jnp.array(z))
        np.testing.assert_allclose(res["rgb"], 0.0, atol=1e-6)
        np.testing.assert_allclose(res["transparency"][:, -1], 1.0, atol=1e-5)

    def test_shadow_irradiance(self):
        """Shadow compositing: full sun -> irradiance 1; no sun -> sky color."""
        n, s = 2, 4
        z = np.tile(np.linspace(0.1, 1.0, s), (n, 1)).astype(np.float32)
        sig = np.zeros((n, s), np.float32)
        sig[:, 1] = 1e8
        rgb = np.ones((n, s, 3), np.float32) * 0.8
        sun_v = np.zeros((n, s, 1), np.float32)
        sun_v[0] = 1.0  # ray 0 fully lit
        sky = np.full((n, s, 3), 0.25, np.float32)
        res = composite(
            {"rgb": jnp.array(rgb), "sigma": jnp.array(sig),
             "sun_v": jnp.array(sun_v), "sky_rgb": jnp.array(sky)},
            jnp.array(z), shadow=True,
        )
        np.testing.assert_allclose(res["rgb"][0], 0.8, atol=1e-5)
        np.testing.assert_allclose(res["rgb"][1], 0.8 * 0.25, atol=1e-5)


class TestSampling:
    def test_stratified_bounds_and_order(self):
        key = jax.random.PRNGKey(0)
        near = jnp.zeros((64, 1))
        far = jnp.ones((64, 1)) * 2.0
        z = stratified_zvals(key, near, far, 32, perturb=1.0)
        assert z.shape == (64, 32)
        assert float(z.min()) >= 0.0 and float(z.max()) <= 2.0
        assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))

    def test_deterministic_when_unperturbed(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        near = jnp.zeros((8, 1))
        far = jnp.ones((8, 1))
        z1 = stratified_zvals(k1, near, far, 16, perturb=0.0)
        z2 = stratified_zvals(k2, near, far, 16, perturb=0.0)
        np.testing.assert_array_equal(z1, z2)
        np.testing.assert_allclose(z1[0], np.linspace(0, 1, 16), atol=1e-6)

    def test_sample_pdf_concentrates(self):
        """Samples should land where the weights are."""
        key = jax.random.PRNGKey(0)
        n, m = 16, 31
        bins = jnp.tile(jnp.linspace(0.0, 1.0, m + 1), (n, 1))
        w = np.zeros((n, m), np.float32)
        w[:, 20] = 1.0  # all mass in bin 20: [20/31, 21/31]
        s = sample_pdf(key, bins, jnp.array(w), 64)
        lo, hi = 20 / 31, 21 / 31
        frac_inside = float(jnp.mean((s >= lo - 0.02) & (s <= hi + 0.02)))
        assert frac_inside > 0.95

    def test_sample_pdf_det_matches_torch(self, rng):
        """Deterministic inverse-CDF vs a torch searchsorted oracle."""
        n, m, ni = 8, 15, 24
        bins = np.sort(rng.rand(n, m + 1).astype(np.float32), -1)
        w = rng.rand(n, m).astype(np.float32)
        ours = np.asarray(sample_pdf(jax.random.PRNGKey(0), jnp.array(bins),
                                     jnp.array(w), ni, det=True))

        tb, tw = torch.tensor(bins), torch.tensor(w) + 1e-5
        pdf = tw / tw.sum(-1, keepdim=True)
        cdf = torch.cumsum(pdf, -1)
        cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], -1)
        u = torch.linspace(0, 1, ni).expand(n, ni).contiguous()
        inds = torch.searchsorted(cdf, u, right=True)
        below = torch.clamp_min(inds - 1, 0)
        above = torch.clamp_max(inds, m)
        cdf_g = torch.stack([torch.gather(cdf, 1, below), torch.gather(cdf, 1, above)], -1)
        bins_g = torch.stack([torch.gather(tb, 1, below), torch.gather(tb, 1, above)], -1)
        denom = cdf_g[..., 1] - cdf_g[..., 0]
        denom[denom < 1e-5] = 1
        ref = bins_g[..., 0] + (u - cdf_g[..., 0]) / denom * (bins_g[..., 1] - bins_g[..., 0])
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)

    def test_sample_pdf_mask_selection_equals_gather(self, rng):
        """The prefix-mask max/min selections must be bitwise equal to the
        searchsorted+gather formulation, including zero-weight runs that
        round to equal cdf values."""
        n, m, ni = 32, 31, 8
        bins = np.sort(rng.rand(n, m + 1).astype(np.float32), -1)
        w = rng.rand(n, m).astype(np.float32)
        w[:, 5:20] = 0.0  # long near-flat cdf run
        w[::3, :] = 0.0   # fully uniform fallback rows
        for det, key in ((True, 0), (False, 1), (False, 2)):
            ours = np.asarray(sample_pdf(jax.random.PRNGKey(key),
                                         jnp.array(bins), jnp.array(w), ni,
                                         det=det))
            # gather oracle on the IDENTICAL f32 cdf/u (built with the same
            # jnp ops as the implementation; only the selection differs)
            eps = 1e-5
            wn = jnp.array(w) + eps
            pdf = wn / jnp.sum(wn, axis=-1, keepdims=True)
            cdf = np.concatenate(
                [np.zeros((n, 1), np.float32),
                 np.asarray(jnp.cumsum(pdf, -1))], -1)
            if det:
                u = np.broadcast_to(
                    np.asarray(jnp.linspace(0.0, 1.0, ni)), (n, ni))
            else:
                u = np.asarray(jax.random.uniform(jax.random.PRNGKey(key),
                                                  (n, ni)))
            inds = np.stack([np.searchsorted(cdf[i], u[i], side="right")
                             for i in range(n)])
            below = np.clip(inds - 1, 0, m)
            above = np.clip(inds, 0, m)
            take = np.take_along_axis
            denom = take(cdf, above, 1) - take(cdf, below, 1)
            denom = np.where(denom < eps, np.float32(1.0), denom)
            ref = (take(bins, below, 1)
                   + (u - take(cdf, below, 1)).astype(np.float32) / denom
                   * (take(bins, above, 1) - take(bins, below, 1)))
            np.testing.assert_array_equal(ours, ref.astype(np.float32))

    def test_merge_sorted_zvals_equals_sort(self, rng):
        """The rank merge must equal the reference's sort-of-union idiom
        (rendering.py:129-131) bit for bit, including ties."""
        from satnerf_tpu.render.sampling import merge_sorted_zvals

        n, sa, sb = 64, 24, 8
        a = np.sort(rng.rand(n, sa).astype(np.float32), -1)
        b = np.sort(rng.rand(n, sb).astype(np.float32), -1)
        # force exact ties (a-vs-b and within-b duplicates)
        b[:, 2] = a[:, 5]
        b[:, 3] = a[:, 5]
        a[:, 10] = a[:, 11]
        b = np.sort(b, -1)
        merged = np.asarray(merge_sorted_zvals(jnp.array(a), jnp.array(b)))
        ref = np.sort(np.concatenate([a, b], -1), -1)
        np.testing.assert_array_equal(merged, ref)


class TestRenderRays:
    @pytest.mark.parametrize("variant,nchan", [("nerf", 0), ("s-nerf", 0), ("sat-nerf", 1)])
    def test_shapes(self, variant, nchan, rng):
        from satnerf_tpu.models import build_model, TransientEmbedding

        n = 32
        rays = rng.rand(n, 11).astype(np.float32)
        rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
        rays[:, 6], rays[:, 7] = 0.0, 1.0
        model = build_model(variant, fc_layers=2, fc_units=32)
        key = jax.random.PRNGKey(0)
        xyz = jnp.zeros((2, 4, 3))
        params = model.init(key, xyz, view_dir=jnp.zeros((2, 4, 3)),
                            sun_dir=jnp.zeros((2, 4, 3)),
                            t_embed=jnp.zeros((2, 4, 4)))["params"]
        t_embed = None
        if variant == "sat-nerf":
            emb = TransientEmbedding(30, 4)
            ep = emb.init(key, jnp.zeros((2,), jnp.int32))["params"]
            t_embed = emb.apply({"params": ep}, jnp.zeros((n,), jnp.int32))
        cfg = RenderConfig(variant=variant, n_samples=8, n_importance=0,
                           solar_correction=(variant != "nerf"))
        out = render_rays({"coarse": model}, {"coarse": params},
                          jnp.array(rays), t_embed, key, cfg)
        assert out["rgb_coarse"].shape == (n, 3)
        assert out["depth_coarse"].shape == (n,)
        assert out["weights_coarse"].shape == (n, 8)
        if variant != "nerf":
            assert out["sun_coarse"].shape == (n, 8, 1)
            assert out["sky_coarse"].shape == (n, 8, 3)
            assert "sun_sc_coarse" in out
        if variant == "sat-nerf":
            assert out["beta_coarse"].shape == (n, 8, 1)

    def test_fine_pass(self, rng):
        from satnerf_tpu.models import build_model

        n = 16
        rays = rng.rand(n, 8).astype(np.float32)
        rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
        rays[:, 6], rays[:, 7] = 0.0, 1.0
        model = build_model("nerf", fc_layers=2, fc_units=32)
        key = jax.random.PRNGKey(0)
        params = model.init(key, jnp.zeros((2, 4, 3)),
                            view_dir=jnp.zeros((2, 4, 3)))["params"]
        cfg = RenderConfig(variant="nerf", n_samples=8, n_importance=8)
        out = render_rays({"coarse": model, "fine": model},
                          {"coarse": params, "fine": params},
                          jnp.array(rays), None, key, cfg)
        assert out["rgb_fine"].shape == (n, 3)
        assert out["weights_fine"].shape == (n, 16)
