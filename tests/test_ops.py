"""Ops tests: SSIM/PSNR metrics, DSM registration pyramid, schedules."""

import numpy as np
import pytest

from satnerf_tpu.ops.dsm_registration import (
    apply_shift_arrays,
    compute_shift_arrays,
    downsample2x,
    mean_std,
    recursive_ncc,
)
from satnerf_tpu.ops.ssim import psnr, ssim, ssim_map


class TestSSIM:
    def test_identical_images(self, rng):
        img = rng.rand(3, 32, 32)
        assert ssim(img, img) > 0.9999

    def test_decreases_with_noise(self, rng):
        img = rng.rand(3, 32, 32)
        s1 = ssim(img, np.clip(img + 0.05 * rng.randn(3, 32, 32), 0, 1))
        s2 = ssim(img, np.clip(img + 0.30 * rng.randn(3, 32, 32), 0, 1))
        assert 1 > s1 > s2

    def test_vs_scipy_oracle(self, rng):
        """Independent SSIM: scipy gaussian_filter implementation of the
        standard formula with the same window (3, sigma 1.5)."""
        from scipy.ndimage import gaussian_filter1d

        def blur(x):
            # truncate the gaussian to a 3-tap window like ours
            k = np.exp(-np.arange(-1, 2) ** 2 / (2 * 1.5**2))
            k /= k.sum()
            out = np.apply_along_axis(lambda r: np.convolve(
                np.pad(r, 1, mode="reflect"), k, "valid"), 1, x)
            out = np.apply_along_axis(lambda c: np.convolve(
                np.pad(c, 1, mode="reflect"), k, "valid"), 0, out)
            return out

        a = rng.rand(24, 24)
        b = np.clip(a + 0.1 * rng.randn(24, 24), 0, 1)
        c1, c2 = 0.01**2, 0.03**2
        mu1, mu2 = blur(a), blur(b)
        s1 = blur(a * a) - mu1**2
        s2 = blur(b * b) - mu2**2
        s12 = blur(a * b) - mu1 * mu2
        expected = np.mean(
            (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
            / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
        )
        np.testing.assert_allclose(ssim(a, b), expected, atol=1e-10)

    def test_psnr(self):
        a = np.zeros((4, 4))
        b = np.full((4, 4), 0.1)
        np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-9)
        mask = np.zeros((4, 4), bool)
        mask[0, 0] = True
        b2 = a.copy()
        b2[0, 0] = 0.01
        np.testing.assert_allclose(psnr(a, b2, valid_mask=mask), 40.0, atol=1e-9)


class TestRegistration:
    def test_downsample_nan_aware(self):
        u = np.arange(16, dtype=float).reshape(1, 4, 4)
        u[0, 0, 0] = np.nan
        d = downsample2x(u)
        assert d.shape == (1, 2, 2)
        np.testing.assert_allclose(d[0, 0, 0], np.nanmean([1, 4, 5]))
        np.testing.assert_allclose(d[0, 1, 1], np.mean([10, 11, 14, 15]))

    def test_recursive_pyramid_recovers_large_shift(self):
        rng = np.random.RandomState(0)
        u = rng.randn(1, 300, 280)
        # v(i+dx, j+dy) = u  =>  shift by (7, -6)
        v = np.full_like(u, np.nan)
        v[:, :, 7:] = u[:, :, :-7]
        v = np.roll(v, -6, axis=1)
        v[:, -6:, :] = np.nan
        dx, dy = recursive_ncc(u, v)
        assert (dx, dy) == (7, -6)

    def test_affine_z_mapping(self, rng):
        u = rng.randn(1, 64, 64) * 3 + 20
        v = (u - 5.0) / 2.0  # u = 2v + 5
        dx, dy, a, b = compute_shift_arrays(u, v, scaling=True)
        assert (dx, dy) == (0, 0)
        np.testing.assert_allclose(a, 2.0, rtol=1e-6)
        np.testing.assert_allclose(b, 5.0, rtol=1e-4)
        out = apply_shift_arrays(v, dx, dy, a, b)
        np.testing.assert_allclose(out, u, rtol=1e-6)

    def test_mean_std_ignores_nans(self):
        u = np.array([[[1.0, np.nan], [3.0, 5.0]]])
        v = np.array([[[2.0, 4.0], [np.nan, 10.0]]])
        muu, muv, sigu, sigv, xcorr = mean_std(u, v)
        np.testing.assert_allclose(muu, 3.0)  # mean of 1, 5
        np.testing.assert_allclose(muv, 6.0)  # mean of 2, 10


class TestSchedules:
    def test_all_variants(self):
        import jax.numpy as jnp

        from satnerf_tpu.train.schedules import get_schedule

        spe = 10
        for name in ("step", "cosine", "exponential", "multistep"):
            s = get_schedule(name, 1e-3, 20, spe)
            v0 = float(s(jnp.array(0)))
            v_late = float(s(jnp.array(100)))
            assert v0 <= 1e-3 + 1e-9
            assert v_late < v0  # all schedules decay

        s = get_schedule("step", 1e-3, 20, spe)
        np.testing.assert_allclose(float(s(jnp.array(35))), 1e-3 * 0.9**3,
                                   rtol=1e-6)
        s = get_schedule("multistep", 1e-3, 20, spe)
        np.testing.assert_allclose(float(s(jnp.array(45))), 1e-3 * 0.25,
                                   rtol=1e-6)
        with pytest.raises(ValueError):
            get_schedule("bogus", 1e-3, 20, spe)


class TestDsmMetricResample:
    def test_crop_matched_resolution(self, tmp_path):
        from satnerf_tpu.eval.dsm_metrics import _crop_to_roi
        from satnerf_tpu.geo.geotiff import Affine, Profile, write_geotiff

        data = np.arange(64, dtype=np.float64).reshape(1, 8, 8)
        prof = Profile(8, 8, 1, "float64", 32617,
                       Affine(2.0, 0, 100.0, 0, -2.0, 50.0), float("nan"))
        p = str(tmp_path / "pred.tif")
        write_geotiff(p, data, prof)
        out, oprof = _crop_to_roi(p, 104.0, 50.0 - 12.0, 4, 4, 2.0)
        # window: cols 2..5, rows 1..4 (uly = 50 - 12 + 4*2 = 46 -> row 2)
        np.testing.assert_array_equal(out, data[0, 2:6, 2:6])

    def test_crop_resamples_mismatched_resolution(self, tmp_path):
        """Pred at 0.5 m vs GT ROI at 2 m: values aggregate by cell mean."""
        from satnerf_tpu.eval.dsm_metrics import _crop_to_roi
        from satnerf_tpu.geo.geotiff import Affine, Profile, write_geotiff

        # 16x16 pred at 0.5 m covering an 8x8 m square from (100, 42)..(108, 50)
        data = np.full((1, 16, 16), 7.0)
        data[0, :8, :8] = 3.0  # upper-left 4x4 m quadrant
        prof = Profile(16, 16, 1, "float64", 32617,
                       Affine(0.5, 0, 100.0, 0, -0.5, 50.0), float("nan"))
        p = str(tmp_path / "pred05.tif")
        write_geotiff(p, data, prof)
        out, oprof = _crop_to_roi(p, 100.0, 42.0, 4, 4, 2.0)
        assert out.shape == (4, 4)
        np.testing.assert_allclose(out[0, 0], 3.0)  # inside the 3.0 quadrant
        np.testing.assert_allclose(out[3, 3], 7.0)
        assert abs(oprof.transform.a) == 2.0


class TestFlopsModel:
    """The analytic MAC count (utils/flops.py) must equal the sum of Dense
    kernel sizes of the actual flax field — one MAC per kernel entry per
    point."""

    @pytest.mark.parametrize("variant,feat", [("sat-nerf", 512),
                                              ("s-nerf", 512),
                                              ("nerf", 256)])
    def test_macs_match_param_shapes(self, variant, feat):
        import jax
        import jax.numpy as jnp

        from satnerf_tpu.models import build_model
        from satnerf_tpu.utils.flops import field_macs_per_point

        m = build_model(variant, 8, feat)
        kw = {}
        if variant == "nerf":
            kw = dict(view_dir=jnp.zeros((2, 3)))
        else:
            kw = dict(sun_dir=jnp.zeros((2, 3)))
            if variant == "sat-nerf":
                kw["t_embed"] = jnp.zeros((2, 4))
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)), **kw)["params"]
        kernel_macs = sum(
            int(np.prod(leaf.shape))
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)
            if "kernel" in jax.tree_util.keystr(path)
        )
        assert field_macs_per_point(variant, 8, feat) == kernel_macs
