"""eval_s2p component tests: PLY IO, inverse UTM, cloud->grid fusion, pair
selection. The external `s2p` binary itself stays a subprocess contract."""

import glob
import json
import os
import struct

import numpy as np
import pytest

import eval_s2p as s2p_mod


def _write_binary_ply(path, xyz):
    n = xyz.shape[0]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        for p in xyz:
            f.write(struct.pack("<fffB", p[0], p[1], p[2], 128))


def _write_ascii_ply(path, xyz):
    n = xyz.shape[0]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in xyz:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


class TestPlyReader:
    def test_binary_little_endian(self, tmp_path, rng):
        xyz = rng.rand(50, 3).astype(np.float32) * 100
        p = str(tmp_path / "b.ply")
        _write_binary_ply(p, xyz)
        out = s2p_mod.read_ply_xyz(p)
        np.testing.assert_allclose(out, xyz, rtol=1e-6)

    def test_ascii(self, tmp_path, rng):
        xyz = rng.rand(20, 3) * 10
        p = str(tmp_path / "a.ply")
        _write_ascii_ply(p, xyz)
        out = s2p_mod.read_ply_xyz(p)
        np.testing.assert_allclose(out, xyz, atol=1e-5)


class TestInverseUTM:
    def test_roundtrip(self, rng):
        from satnerf_tpu.geo.utm import utm_from_latlon

        lats = rng.uniform(28, 32, 50)
        lons = rng.uniform(-83, -79, 50)
        e, n = utm_from_latlon(lats, lons, zone_number=17)
        lon2, lat2 = s2p_mod.lonlat_from_utm(e, n, 17)
        np.testing.assert_allclose(lat2, lats, atol=1e-6)
        np.testing.assert_allclose(lon2, lons, atol=1e-6)


class TestCloudFusion:
    def test_median_mode(self):
        # three points in one cell -> median; one point in another -> itself
        xyz = np.array([
            [10.2, 20.1, 5.0], [10.3, 20.2, 7.0], [10.1, 20.3, 100.0],
            [14.0, 24.0, 3.0],
        ])
        bb = [10.0, 14.0, 20.0, 24.0]
        grid = s2p_mod.project_cloud_into_utm_grid(xyz, bb, 1.0, "med")
        vals = grid[np.isfinite(grid)]
        assert 7.0 in vals  # median of 5, 7, 100
        assert 3.0 in vals

    def test_avg_and_extrema_modes(self):
        xyz = np.array([[10.4, 20.4, 2.0], [10.4, 20.4, 6.0]])
        bb = [10.0, 12.0, 20.0, 22.0]
        avg = s2p_mod.project_cloud_into_utm_grid(xyz, bb, 1.0, "avg")
        assert 4.0 in avg[np.isfinite(avg)]
        mx = s2p_mod.project_cloud_into_utm_grid(xyz, bb, 1.0, "max")
        assert 6.0 in mx[np.isfinite(mx)]
        mn = s2p_mod.project_cloud_into_utm_grid(xyz, bb, 1.0, "min")
        assert 2.0 in mn[np.isfinite(mn)]


class TestPairSelection:
    def test_select_pairs(self, tmp_path):
        for i in range(4):
            with open(tmp_path / f"im{i}.json", "w") as f:
                json.dump({"img": f"im{i}.tif"}, f)
        pairs, n_possible = s2p_mod.select_pairs(str(tmp_path), n_pairs=3)
        assert n_possible == 6
        assert len(pairs) == 3
        assert all(a != b for a, b in pairs)

    def test_run_s2p_writes_config(self, tmp_path):
        """run_s2p writes the config json and tolerates a missing binary."""
        for i in range(2):
            with open(tmp_path / f"im{i}.json", "w") as f:
                json.dump({"img": f"im{i}.tif", "rpc": {}, "width": 10,
                           "height": 10}, f)
        out = str(tmp_path / "out")
        try:
            s2p_mod.run_s2p(str(tmp_path / "im0.json"),
                            str(tmp_path / "im1.json"),
                            str(tmp_path), out, 0.5)
        except FileNotFoundError:
            pass  # the s2p binary is absent here; config must still exist
        cfgs = [os.path.join(r, f) for r, _, fs in os.walk(out)
                for f in fs if f == "config.json"]
        assert cfgs
        with open(cfgs[0]) as f:
            cfg = json.load(f)
        assert cfg["dsm_resolution"] == 0.5
        assert cfg["matching_algorithm"] == "mgm_multi"

    def test_run_s2p_pan_band(self, tmp_path):
        """--pan_dir swaps the stereo sources for PAN frames (RGB->PAN name
        rewrite, remote prefixes skip the existence check) while keeping the
        crop's RPC — reference eval_s2p.py:100-114 semantics."""
        for i in range(2):
            with open(tmp_path / f"im{i}.json", "w") as f:
                json.dump({"img": f"JAX_068_{i:03d}_RGB.tif",
                           "rpc": {"row_offset": float(i)}, "width": 10,
                           "height": 10}, f)
        out = str(tmp_path / "out_pan")
        pan = "/vsicurl/http://example/track_3/Track3-MSI-1"
        try:
            s2p_mod.run_s2p(str(tmp_path / "im0.json"),
                            str(tmp_path / "im1.json"),
                            str(tmp_path), out, 0.5, pan_dir=pan)
        except FileNotFoundError:
            pass  # missing s2p binary
        cfgs = [os.path.join(r, f) for r, _, fs in os.walk(out)
                for f in fs if f == "config.json"]
        assert cfgs
        with open(cfgs[0]) as f:
            cfg = json.load(f)
        assert cfg["images"][0]["img"] == pan + "/JAX_068_000_PAN.tif"
        assert cfg["images"][1]["img"] == pan + "/JAX_068_001_PAN.tif"
        # RPCs stay the crop RPCs from the jsons, not the PAN frames'
        assert cfg["images"][1]["rpc"] == {"row_offset": 1.0}

    def test_run_s2p_pan_local_missing(self, tmp_path):
        """A local --pan_dir keeps the reference's existence check."""
        for i in range(2):
            with open(tmp_path / f"im{i}.json", "w") as f:
                json.dump({"img": f"im{i}_RGB.tif", "rpc": {}, "width": 4,
                           "height": 4}, f)
        with pytest.raises(FileNotFoundError):
            s2p_mod.run_s2p(str(tmp_path / "im0.json"),
                            str(tmp_path / "im1.json"), str(tmp_path),
                            str(tmp_path / "o"), 0.5,
                            pan_dir=str(tmp_path / "pan"))


class TestHeuristicPairs:
    def test_load_heuristic_pairs(self, tmp_path):
        """MSI ids from the ranking file resolve to crop jsons through the
        NITF_IID2 tag embedded in each RGB GeoTIFF (eval_s2p.py:147-173)."""
        from satnerf_tpu.geo.geotiff import write_geotiff

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        msi_ids = ["18DEC15WV03A", "04OCT14WV03B", "22JAN16WV03C"]
        for i, msi in enumerate(msi_ids):
            write_geotiff(str(img_dir / f"JAX_068_{i:03d}_RGB.tif"),
                          np.zeros((1, 4, 4), np.uint8),
                          tags={"NITF_IID2": f"{msi}-P1BS-500648062010_01_P001"})
            with open(tmp_path / f"JAX_068_{i:03d}_RGB.json", "w") as f:
                json.dump({"img": f"JAX_068_{i:03d}_RGB.tif"}, f)
        ranking = tmp_path / "pairs.txt"
        ranking.write_text(
            f"pan/{msi_ids[2]}-P1BS-x.tif pan/{msi_ids[0]}-P1BS-y.tif 0.91\n"
            f"pan/{msi_ids[1]}-P1BS-x.tif pan/UNKNOWNMSI-P1BS-y.tif 0.88\n"
            f"pan/{msi_ids[0]}-P1BS-x.tif pan/{msi_ids[1]}-P1BS-y.tif 0.85\n")
        pairs = s2p_mod.load_heuristic_pairs(str(tmp_path), str(img_dir),
                                             str(ranking), n_pairs=2)
        assert len(pairs) == 2
        # first line -> (img 2, img 0); second line skipped (unknown msi id)
        assert pairs[0] == (str(tmp_path / "JAX_068_002_RGB.json"),
                            str(tmp_path / "JAX_068_000_RGB.json"))
        assert pairs[1] == (str(tmp_path / "JAX_068_000_RGB.json"),
                            str(tmp_path / "JAX_068_001_RGB.json"))


class TestEvalS2pEndToEnd:
    def test_eval_s2p_full_flow_with_stub_binary(self, tmp_path, monkeypatch):
        """Drive eval_s2p's TOP-LEVEL orchestration end to end against a
        stub `s2p` executable that drops a known point cloud: pair loop,
        per-pair config writing, subprocess invocation, tile-cloud
        collection, mean+median fusion and MAE vs the GT DSM
        (reference eval_s2p.py:228-313). The stub writes the exact synthetic
        surface, so both fused DSMs must register to sub-meter MAE."""
        import subprocess
        import sys

        from satnerf_tpu.geo.geotiff import Affine, Profile, write_geotiff
        from satnerf_tpu.geo.utm import utm_from_latlon
        from satnerf_tpu.ops.dsm_raster import raster_dsm

        sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
        from fixtures import AOI_LAT, AOI_LON, smooth_height_field

        aoi_id = "JAX_999"
        res = 2.0

        # --- fake DFC layout: GT DSM/txt + (unread) RGB crop dir
        dfc = tmp_path / "dfc"
        gt_dir = dfc / "Track3-Truth"
        img_dir = dfc / "Track3-RGB" / aoi_id
        gt_dir.mkdir(parents=True)
        img_dir.mkdir(parents=True)
        gl = np.linspace(-0.002, 0.002, 300)
        LO, LA = np.meshgrid(AOI_LON + gl, AOI_LAT + gl)
        E, N = utm_from_latlon(LA.ravel(), LO.ravel())
        Z = smooth_height_field(LO.ravel(), LA.ravel())
        xoff = np.floor(E.min() / res) * res
        yoff = np.floor(N.min() / res) * res
        size = int(min((E.max() - xoff) // res, (N.max() - yoff) // res))
        uly = yoff + size * res
        dsm = raster_dsm(np.stack([E, N, Z], -1), xoff, uly, res, size, size,
                         radius=1)
        write_geotiff(str(gt_dir / f"{aoi_id}_DSM.tif"),
                      dsm[:, :, 0][None].astype(np.float32),
                      Profile(size, size, 1, "float32", 32617,
                              Affine(res, 0, xoff, 0, -res, uly),
                              float("nan")))
        np.savetxt(str(gt_dir / f"{aoi_id}_DSM.txt"),
                   np.array([xoff, yoff, size, res]))

        # --- three metadata jsons (pair-selection inputs); the stub never
        # reads the images, so the rpc payload only has to be serializable
        root = tmp_path / "root"
        root.mkdir()
        for i in range(3):
            name = f"{aoi_id}_{i:03d}_RGB"
            (img_dir / f"{name}.tif").write_bytes(b"not-read-by-stub")
            with open(root / f"{name}.json", "w") as f:
                json.dump({"img": f"{name}.tif", "width": 32, "height": 32,
                           "rpc": {"row_offset": 0.0, "col_offset": 0.0}}, f)

        # --- the stub `s2p`: reads the config path (argv[1]) like the real
        # pipeline, writes tiles/<r>/<c>/cloud.ply with the exact surface
        pts = np.stack([E, N, Z], -1)[:: 7]
        pts_path = tmp_path / "surface_pts.npy"
        np.save(pts_path, pts)
        bindir = tmp_path / "bin"
        bindir.mkdir()
        stub = bindir / "s2p"
        stub.write_text(f"""#!{sys.executable}
import json, os, sys
import numpy as np
cfg = sys.argv[1]
with open(cfg) as f:
    json.load(f)  # must be valid JSON with the contract fields
d = os.path.dirname(cfg)
tiles = os.path.join(d, "tiles", "row0", "col0")
os.makedirs(tiles, exist_ok=True)
pts = np.load({str(pts_path)!r})
with open(os.path.join(tiles, "cloud.ply"), "w") as f:
    f.write("ply\\nformat ascii 1.0\\nelement vertex %d\\n" % len(pts))
    f.write("property float x\\nproperty float y\\nproperty float z\\n")
    f.write("end_header\\n")
    for p in pts:
        f.write("%.3f %.3f %.3f\\n" % (p[0], p[1], p[2]))
open(os.path.join(d, "dsm.tif"), "w").write("stub")
""")
        stub.chmod(0o755)
        monkeypatch.setenv("PATH",
                           str(bindir) + os.pathsep + os.environ["PATH"])
        # the stub must be what resolves as `s2p`
        probe = subprocess.run(["s2p", "--help"], capture_output=True)
        assert probe.returncode != 0 or b"" in probe.stdout

        import random

        random.seed(0)
        out = s2p_mod.eval_s2p(aoi_id, str(root), str(dfc),
                               output_dir=str(tmp_path), n_pairs=2,
                               resolution=res)
        assert out is not None, "orchestration produced no fused DSMs"
        assert out["n_clouds"] == 2  # one cloud per selected pair
        assert os.path.exists(out["dsm_avg"]) and os.path.exists(out["dsm_med"])
        # exact surface points -> sub-meter registered MAE on both fusions
        assert out["mae_avg"] < 0.5, out
        assert out["mae_med"] < 0.5, out
        # per-pair products: config.json + stub log per pair dir
        pair_dirs = sorted(glob.glob(os.path.join(
            str(tmp_path), "s2p_dsms", aoi_id, "0?_*")))
        assert len(pair_dirs) == 2
        for d in pair_dirs:
            with open(os.path.join(d, "config.json")) as f:
                cfg = json.load(f)
            assert cfg["dsm_resolution"] == res
            assert len(cfg["images"]) == 2
            assert "roi_geojson" in cfg
