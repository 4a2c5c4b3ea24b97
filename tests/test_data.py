"""Data-layer tests: synthetic satellite dataset, scene frame, blender scene,
ray geometry consistency, DSM back-projection roundtrip."""

import json
import os

import numpy as np
import pytest

from satnerf_tpu.data import SatelliteScene, SceneFrame
from satnerf_tpu.data.rays import rays_from_rpc, sun_direction
from satnerf_tpu.geo.ellipsoid import ecef_from_latlon
from satnerf_tpu.ops.dsm_raster import raster_dsm
from tests.fixtures import ALT_MAX, ALT_MIN, build_synthetic_dataset, height_field


@pytest.fixture(scope="module")
def sat_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synsat"))
    return build_synthetic_dataset(root, n_train=3, n_test=2, w=24, h=24)


class TestSatelliteScene:
    def test_train_split_shapes(self, sat_root):
        ds = SatelliteScene(sat_root, split="train")
        n = 3 * 24 * 24
        assert ds.all_rays.shape == (n, 11)
        assert ds.all_rgbs.shape == (n, 3)
        assert ds.all_ids.shape == (n,)
        assert ds.all_rays.dtype == np.float32
        # normalized origins live in a bounded box
        assert np.abs(ds.all_rays[:, :3]).max() < 2.0
        # unit directions
        np.testing.assert_allclose(
            np.linalg.norm(ds.all_rays[:, 3:6], axis=1), 1.0, atol=1e-5
        )
        # sun dir column
        np.testing.assert_allclose(
            ds.all_rays[0, 8:11], sun_direction(60.0, 180.0), atol=1e-6
        )

    def test_scene_loc_created_and_reused(self, sat_root):
        assert os.path.exists(os.path.join(sat_root, "scene.loc"))
        with open(os.path.join(sat_root, "scene.loc")) as f:
            d = json.load(f)
        assert {"X_scale", "X_offset", "Y_scale", "Y_offset", "Z_scale",
                "Z_offset"} <= set(d)

    def test_val_split_probe_image(self, sat_root):
        """Item 0 of val must be train image 0 with embedding id 0."""
        ds = SatelliteScene(sat_root, split="val")
        assert len(ds) == 3  # 2 test + 1 train probe
        assert ds.records[0].t == 0
        # val ids continue after the 3 train ids
        assert ds.records[1].t == 3
        sample = ds.load_image(1)
        assert sample["rays"].shape == (24 * 24, 11)
        assert sample["h"] == sample["w"] == 24

    def test_ray_cache(self, sat_root, tmp_path):
        cache = str(tmp_path / "cache")
        ds1 = SatelliteScene(sat_root, split="train", cache_dir=cache)
        assert len(os.listdir(cache)) == 3
        ds2 = SatelliteScene(sat_root, split="train", cache_dir=cache)
        np.testing.assert_array_equal(ds1.all_rays, ds2.all_rays)

    def test_ray_geometry_consistency(self, sat_root):
        """A ray evaluated at its far bound must sit at min_alt (the rays are
        chords from max_alt to min_alt)."""
        ds = SatelliteScene(sat_root, split="train")
        rays = ds.all_rays[:50].astype(np.float64)
        far_pts_n = rays[:, :3] + rays[:, 7:8] * rays[:, 3:6]
        far_pts = ds.scene.denormalize_points(far_pts_n)
        from satnerf_tpu.geo.ellipsoid import latlon_from_ecef

        _, _, alts = latlon_from_ecef(far_pts[:, 0], far_pts[:, 1], far_pts[:, 2])
        np.testing.assert_allclose(alts, ALT_MIN, atol=1e-3)

    def test_dsm_backprojection_roundtrip(self, sat_root):
        """Feeding the TRUE surface depths through the DSM pipeline must
        reproduce the synthetic height field."""
        ds = SatelliteScene(sat_root, split="val")
        sample = ds.load_image(0)
        rays = sample["rays"].astype(np.float64)

        # ground-truth depth: march the ray to the surface
        depths = np.zeros(rays.shape[0])
        for i in range(rays.shape[0]):
            t_grid = np.linspace(0, rays[i, 7], 400)
            pts = ds.scene.denormalize_points(
                rays[i, :3] + t_grid[:, None] * rays[i, 3:6]
            )
            from satnerf_tpu.geo.ellipsoid import latlon_from_ecef

            lat, lon, alt = latlon_from_ecef(pts[:, 0], pts[:, 1], pts[:, 2])
            z_surf = height_field(lon, lat)
            hit = np.argmax(alt <= z_surf)
            depths[i] = t_grid[hit]

        lats, lons, alts = ds.latlonalt_from_prediction(rays, depths)
        # altitudes at the two plateau levels
        assert np.abs(np.median(alts[alts > 30]) - 50.0) < 1.5
        assert np.abs(np.median(alts[alts < 30]) - 10.0) < 1.5

        dsm = ds.dsm_from_prediction(rays, depths)
        vals = dsm[np.isfinite(dsm)]
        assert vals.min() > 5 and vals.max() < 55


class TestSceneFrame:
    def test_fit_and_normalize(self, rng):
        pts = rng.rand(100, 3) * 1000 + np.array([6.4e6, 0, 0])
        f = SceneFrame.from_points(pts)
        n = f.normalize_points(pts)
        assert np.abs(n).max() <= 1.0 + 1e-9
        np.testing.assert_allclose(f.denormalize_points(n), pts, atol=1e-6)

    def test_save_load(self, tmp_path, rng):
        pts = rng.rand(100, 3) * 1000
        f = SceneFrame.from_points(pts)
        p = str(tmp_path / "scene.loc")
        f.save(p)
        f2 = SceneFrame.load(p)
        np.testing.assert_allclose(f2.center, f.center)
        assert f2.range == f.range

    def test_normalize_rays(self):
        f = SceneFrame(center=np.array([10.0, 20.0, 30.0]), range=2.0)
        rays = np.array([[12.0, 22.0, 32.0, 0, 0, 1.0, 0.0, 4.0]])
        out = f.normalize_rays(rays)
        np.testing.assert_allclose(out[0, :3], [1, 1, 1])
        np.testing.assert_allclose(out[0, 3:6], [0, 0, 1])  # dirs untouched
        np.testing.assert_allclose(out[0, 6:8], [0, 2.0])


class TestRays:
    def test_sun_direction_nadir(self):
        d = sun_direction(90.0, 0.0)
        np.testing.assert_allclose(d, [0, 0, 1], atol=1e-12)

    def test_sun_direction_east_horizon(self):
        d = sun_direction(0.0, 90.0)
        np.testing.assert_allclose(d, [1, 0, 0], atol=1e-12)


class TestDsmRaster:
    def test_scatter_mean(self):
        cloud = np.array([
            [0.25, -0.25, 10.0],
            [0.30, -0.30, 20.0],
            [5.25, -5.25, 5.0],
        ])
        dsm = raster_dsm(cloud, 0.0, 0.0, 0.5, 12, 12, radius=0)
        assert dsm.shape == (12, 12, 1)
        np.testing.assert_allclose(dsm[0, 0, 0], 15.0)
        np.testing.assert_allclose(dsm[10, 10, 0], 5.0)
        assert np.isnan(dsm[5, 5, 0])

    def test_radius_splat(self):
        cloud = np.array([[1.25, -1.25, 8.0]])
        dsm = raster_dsm(cloud, 0.0, 0.0, 0.5, 8, 8, radius=1)
        filled = np.isfinite(dsm[:, :, 0])
        assert filled.sum() == 9  # 3x3 neighborhood
        np.testing.assert_allclose(dsm[np.where(filled)], 8.0)


class TestDownscale:
    def test_img_downscale_halves_grid_and_rescales_rpc(self, sat_root):
        ds1 = SatelliteScene(sat_root, split="train")
        ds2 = SatelliteScene(sat_root, split="train", img_downscale=2.0)
        assert len(ds2) == len(ds1) // 4
        # the downscaled ray through pixel (c, r) must match the full-res ray
        # through pixel (2c, 2r): same chord endpoints up to RPC fit noise
        n_side = 12  # 24 // 2
        r1 = ds1.all_rays.reshape(3, 24, 24, 11)
        r2 = ds2.all_rays.reshape(3, 12, 12, 11)
        np.testing.assert_allclose(
            r2[0, 3, 5, :3], r1[0, 6, 10, :3], atol=1e-4
        )
        np.testing.assert_allclose(
            r2[0, 3, 5, 3:6], r1[0, 6, 10, 3:6], atol=1e-5
        )

    def test_val_split_downscale_dims(self, sat_root):
        ds = SatelliteScene(sat_root, split="val", img_downscale=2.0)
        s = ds.load_image(0)
        assert s["h"] == s["w"] == 12
        assert s["rays"].shape == (144, 11)
        assert s["rgbs"].shape == (144, 3)
