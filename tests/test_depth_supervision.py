"""Depth-supervision dataset tests on a geometrically consistent fixture:
tie points lie ON the synthetic surface, so loaded depths must equal the
true ray lengths to the surface."""

import os

import numpy as np
import pytest

from satnerf_tpu.data.satellite_depth import SatelliteDepthScene
from satnerf_tpu.geo.ellipsoid import ecef_from_latlon
from tests.fixtures import build_synthetic_dataset, height_field


@pytest.fixture(scope="module")
def depth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synsat_depth"))
    return build_synthetic_dataset(root, n_train=3, n_test=2, w=24, h=24,
                                   with_keypoints=True, n_kp=60)


class TestDepthScene:
    def test_loads_sparse_rays_and_depths(self, depth_root):
        ds = SatelliteDepthScene(depth_root, split="train")
        n = ds.all_rays.shape[0]
        assert n > 0
        assert ds.all_rays.shape == (n, 11)
        assert ds.all_depths.shape == (n, 2)
        assert ds.all_ids.shape == (n,)
        # weights in (0, 1]: exp(-(e/e_mean)^2)
        w = ds.all_depths[:, 1]
        assert np.all(w > 0) and np.all(w <= 1)

    def test_depths_match_surface_geometry(self, depth_root):
        """depth target == distance from ray origin to the tie point, and the
        point reached at that depth sits on the true surface."""
        ds = SatelliteDepthScene(depth_root, split="train")
        rays = ds.all_rays.astype(np.float64)
        depths = ds.all_depths[:, 0].astype(np.float64)

        # walk each ray to its supervised depth and check the altitude
        pts_n = rays[:, :3] + depths[:, None] * rays[:, 3:6]
        pts = ds.scene.denormalize_points(pts_n)
        from satnerf_tpu.geo.ellipsoid import latlon_from_ecef

        lat, lon, alt = latlon_from_ecef(pts[:, 0], pts[:, 1], pts[:, 2])
        z_true = height_field(lon, lat)
        # keypoint pixel noise (0.05 px ~ 0.35 m ground) bounds the error
        assert np.median(np.abs(alt - z_true)) < 2.0
        assert np.mean(np.abs(alt - z_true) < 5.0) > 0.9

    def test_missing_pts3d_raises(self, tmp_path):
        root = str(tmp_path / "nokp")
        build_synthetic_dataset(root, n_train=2, n_test=2, w=16, h=16)
        with pytest.raises(FileNotFoundError):
            SatelliteDepthScene(root, split="train")

    def test_missing_keypoints_field_raises(self, tmp_path):
        root = str(tmp_path / "nokpfield")
        build_synthetic_dataset(root, n_train=2, n_test=2, w=16, h=16)
        np.save(os.path.join(root, "pts3d.npy"), np.zeros((5, 3)))
        with pytest.raises(ValueError, match="keypoints"):
            SatelliteDepthScene(root, split="train")

    def test_weights_penalize_reprojection_error(self, depth_root):
        """Corrupting one tie point's json observations must lower its weight
        relative to the clean loading."""
        ds = SatelliteDepthScene(depth_root, split="train")
        kp_w = ds._keypoint_weights(ds.json_files, ds.tie_points)
        # inflate a fake reprojection error by shifting one observation
        import json as _json

        with open(ds.json_files[0]) as f:
            d = _json.load(f)
        target = d["keypoints"]["pts3d_indices"][0]
        pts2d = np.array(d["keypoints"]["2d_coordinates"])
        pts2d[0] += 10.0  # 10 px off
        d["keypoints"]["2d_coordinates"] = pts2d.tolist()
        tmp = ds.json_files[0] + ".corrupt"
        with open(tmp, "w") as f:
            _json.dump(d, f)
        files = [tmp] + ds.json_files[1:]
        kp_w2 = ds._keypoint_weights(files, ds.tie_points)
        assert kp_w2[target] < kp_w[target]
        os.remove(tmp)


class TestDepthTraining:
    def test_full_loop_with_depth_supervision(self, depth_root, eight_devices,
                                              tmp_path):
        """fit() end-to-end with ds_lambda > 0 on the consistent fixture."""
        from satnerf_tpu.config import Config
        from satnerf_tpu.train.loop import fit

        cfg = Config(
            root_dir=depth_root, model="sat-nerf", batch_size=128,
            fc_units=32, fc_layers=2, n_samples=8, max_train_steps=8,
            ds_lambda=1000.0, ds_drop=0.5, sc_lambda=0.0,
            log_every_n_steps=4, save_every_n_epochs=9999,
            val_every_n_epochs=9999, num_sanity_val_steps=0,
            logs_dir=str(tmp_path / "logs"), ckpts_dir=str(tmp_path / "ckpts"),
        )
        cfg.stamp_exp_name()
        out = fit(cfg)
        assert int(out["state"].step) == 8
