"""End-to-end product-tool tests: train a tiny run with fit(), then drive
eval_aoi and create_pretty_dsm against its artifacts on the CPU mesh."""

import os

import numpy as np
import pytest

from satnerf_tpu.config import Config
from satnerf_tpu.geo.geotiff import Affine, Profile, write_geotiff
from satnerf_tpu.geo.utm import utm_from_latlon
from satnerf_tpu.ops.dsm_raster import raster_dsm
from tests.fixtures import AOI_LAT, AOI_LON, build_synthetic_dataset, height_field


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory, eight_devices):
    """One tiny trained run + GT rasters, shared across the tool tests."""
    base = tmp_path_factory.mktemp("cli")
    data = str(base / "data")
    build_synthetic_dataset(data, n_train=3, n_test=2, w=24, h=24)

    gt = str(base / "gt")
    os.makedirs(gt, exist_ok=True)
    lons = np.linspace(AOI_LON - 0.002, AOI_LON + 0.002, 200)
    lats = np.linspace(AOI_LAT - 0.002, AOI_LAT + 0.002, 200)
    LO, LA = np.meshgrid(lons, lats)
    E, N = utm_from_latlon(LA.ravel(), LO.ravel())
    Z = height_field(LO.ravel(), LA.ravel())
    res = 2.0
    xoff = np.floor(E.min() / res) * res
    yoff = np.floor(N.min() / res) * res
    size = int(min((E.max() - xoff) // res, (N.max() - yoff) // res))
    dsm = raster_dsm(np.stack([E, N, Z], -1), xoff, yoff + size * res, res,
                     size, size, radius=1)
    prof = Profile(size, size, 1, "float32", 32617,
                   Affine(res, 0, xoff, 0, -res, yoff + size * res),
                   float("nan"))
    write_geotiff(os.path.join(gt, "SYN_000_DSM.tif"),
                  dsm[:, :, 0][None].astype(np.float32), prof)
    np.savetxt(os.path.join(gt, "SYN_000_DSM.txt"),
               np.array([xoff, yoff, size, res]))
    write_geotiff(os.path.join(gt, "SYN_000_CLS.tif"),
                  np.zeros((1, size, size), np.uint8),
                  Profile(size, size, 1, "uint8", 32617, prof.transform))

    from satnerf_tpu.train.loop import fit

    cfg = Config(
        root_dir=data, gt_dir=gt, model="sat-nerf", batch_size=128,
        fc_units=32, fc_layers=2, n_samples=8, max_train_steps=12,
        sc_lambda=0.0, first_beta_epoch=999, chunk=640,
        log_every_n_steps=6, save_every_n_epochs=1, val_every_n_epochs=9999,
        num_sanity_val_steps=0,
        logs_dir=str(base / "logs"), ckpts_dir=str(base / "ckpts"),
    )
    cfg.stamp_exp_name()
    fit(cfg)
    return {"cfg": cfg, "data": data, "gt": gt, "base": str(base)}


class TestEvalCLI:
    def test_eval_aoi(self, trained_run, capsys):
        import importlib

        eval_mod = importlib.import_module("eval")
        cfg = trained_run["cfg"]
        epochs = sorted(
            int(f.split("=")[1].split(".")[0])
            for f in os.listdir(os.path.join(cfg.ckpts_dir, cfg.exp_name))
        )
        out = eval_mod.eval_aoi(
            run_id=cfg.exp_name, logs_dir=cfg.logs_dir,
            output_dir=os.path.join(trained_run["base"], "eval_out"),
            epoch_number=epochs[-1], split="val",
            checkpoints_dir=cfg.ckpts_dir, root_dir=trained_run["data"],
            gt_dir=trained_run["gt"],
        )
        assert np.isfinite(out["psnr"]) and np.isfinite(out["ssim"])
        assert np.isfinite(out["mae"])
        stdout = capsys.readouterr().out
        # the resolved checkpoint path is announced
        assert "loading checkpoint:" in stdout
        # synthetic AOI ids are not in the predefined table -> the
        # brute-force embedding search must run (eval_satnerf.py:148-164)
        assert "searched embedding for" in stdout
        # full product set written
        d = os.path.join(trained_run["base"], "eval_out", cfg.exp_name, "val")
        for sub in ("rgb", "gt_rgb", "depth", "dsm", "sun", "albedo", "beta",
                    "sky", "rdsm", "rdsm_diff"):
            assert os.listdir(os.path.join(d, sub)), sub


class TestCreateDsmCLI:
    def test_create_pretty_dsm(self, trained_run):
        import importlib

        cd = importlib.import_module("create_dsm")
        cfg = trained_run["cfg"]
        epochs = sorted(
            int(f.split("=")[1].split(".")[0])
            for f in os.listdir(os.path.join(cfg.ckpts_dir, cfg.exp_name))
        )
        mae = cd.create_pretty_dsm(
            run_id=cfg.exp_name, logs_dir=cfg.logs_dir,
            output_dir=os.path.join(trained_run["base"], "dsm_out"),
            epoch_number=epochs[-1],
            checkpoints_dir=cfg.ckpts_dir, root_dir=trained_run["data"],
            gt_dir=trained_run["gt"],
        )
        assert np.isfinite(mae)
        run_out = os.path.join(trained_run["base"], "dsm_out", cfg.exp_name)
        files = os.listdir(run_out)
        assert any("_dsm_epoch" in f for f in files)
        assert any("_rdsm_epoch" in f and f.endswith(".tif") for f in files)
        assert any(f == "tmp_gt.tif" for f in files)  # water-masked GT copy


class TestParityProtocol:
    """tools/parity_report.py: one command from a reference-style torch PL
    checkpoint to a PSNR/SSIM/MAE parity table (VERDICT r1 missing item 1),
    tested end-to-end on the synthetic AOI with weights exported to a real
    torch checkpoint (export -> torch.save -> import round trip)."""

    def test_parity_report_from_torch_ckpt(self, trained_run):
        import importlib

        import torch

        from satnerf_tpu.eval.loader import load_nerf
        from satnerf_tpu.train.checkpoints import export_torch_state_dict

        cfg = trained_run["cfg"]
        epochs = sorted(
            int(f.split("=")[1].split(".")[0])
            for f in os.listdir(os.path.join(cfg.ckpts_dir, cfg.exp_name))
        )
        system, params = load_nerf(cfg.exp_name, cfg.logs_dir, cfg.ckpts_dir,
                                   epochs[-1])

        # export our weights as a reference-style PL checkpoint
        base = trained_run["base"]
        payload = export_torch_state_dict(params, cfg.model, cfg.fc_layers)
        payload["state_dict"] = {k: torch.tensor(np.asarray(v))
                                 for k, v in payload["state_dict"].items()}
        torch_ckpt = os.path.join(base, f"ref_epoch={epochs[-1]}.ckpt")
        torch.save(payload, torch_ckpt)

        # direct eval of the native checkpoint = the expected numbers
        eval_mod = importlib.import_module("eval")
        expected = eval_mod.eval_aoi(
            run_id=cfg.exp_name, logs_dir=cfg.logs_dir,
            output_dir=os.path.join(base, "eval_native"),
            epoch_number=epochs[-1], split="val",
            checkpoints_dir=cfg.ckpts_dir, root_dir=trained_run["data"],
            gt_dir=trained_run["gt"],
        )

        pr = importlib.import_module("tools.parity_report")
        report = pr.main([
            "--ckpt", torch_ckpt,
            "--root_dir", trained_run["data"],
            "--gt_dir", trained_run["gt"],
            "--output_dir", os.path.join(base, "parity_out"),
            "--opts", os.path.join(cfg.logs_dir, cfg.exp_name, "opts.json"),
            "--expected_psnr", str(expected["psnr"]),
            "--expected_ssim", str(expected["ssim"]),
            "--expected_mae", str(expected["mae"]),
        ])
        # the torch round trip must reproduce the native eval bit-for-bit
        # (same weights, same render path)
        assert abs(report["delta"]["psnr"]) < 1e-3
        assert abs(report["delta"]["ssim"]) < 1e-3
        assert abs(report["delta"]["mae"]) < 1e-3
        assert os.path.exists(os.path.join(base, "parity_out",
                                           "parity_report.json"))


class TestEmbeddingSearch:
    """find_best_embedding_for_val_image: the subsampled-ray search (VERDICT
    r2 item 8) must rank candidates identically to the full-image search and
    actually slice the rays it renders."""

    class _FakeSystem:
        """render_image stub: rgb for candidate t is a constant t/10 image,
        so PSNR against a gt of 0.2 peaks at t=2 regardless of subsampling."""

        def __init__(self):
            from satnerf_tpu.config import Config

            self.cfg = Config(t_embbeding_vocab=5)
            self.rendered_sizes = []

        def render_image(self, params, rays, ts):
            self.rendered_sizes.append(rays.shape[0])
            t = int(ts[0])
            return {"rgb_coarse": np.full((rays.shape[0], 3), t / 10.0,
                                          np.float32)}

    def test_argmax_preserved_and_rays_subsampled(self):
        from satnerf_tpu.eval.val_ts import find_best_embedding_for_val_image

        n = 10000
        rays = np.zeros((n, 11), np.float32)
        gt = np.full((n, 3), 0.2, np.float32)

        fake = self._FakeSystem()
        t_sub = find_best_embedding_for_val_image(fake, None, rays, gt,
                                                  max_rays=4096)
        assert t_sub == 2
        assert all(s == 4096 for s in fake.rendered_sizes)

        fake = self._FakeSystem()
        t_full = find_best_embedding_for_val_image(fake, None, rays, gt,
                                                   max_rays=0)
        assert t_full == 2
        assert all(s == n for s in fake.rendered_sizes)


class TestDSMDiagnostics:
    """tools/dsm_diagnostics.py — chain-floor oracle + error decomposition."""

    def _run(self, argv, capsys):
        import runpy
        import sys as _sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        tool = os.path.join(repo, "tools", "dsm_diagnostics.py")
        old = _sys.argv
        _sys.argv = [tool] + argv
        try:
            runpy.run_path(tool, run_name="__main__")
        finally:
            _sys.argv = old
        return capsys.readouterr().out

    def test_oracle_floor_is_small_and_finite(self, trained_run, tmp_path,
                                              capsys):
        out = self._run(
            ["oracle", "--root_dir", trained_run["data"],
             "--gt_dir", trained_run["gt"], "--split", "val",
             "--samples", "128", "--out_dir", str(tmp_path / "oracle")],
            capsys)
        assert "oracle chain floor" in out
        mae = float(out.split("MAE")[1].split("m")[0])
        # perfect depths through the real product chain on the tiny box
        # scene: the floor is splat/raster noise, far below model error
        assert np.isfinite(mae) and mae < 5.0

    def test_errstruct_identity_is_zero(self, trained_run, capsys):
        gt = os.path.join(trained_run["gt"], "SYN_000_DSM.tif")
        out = self._run(["errstruct", "--pred", gt, "--gt", gt], capsys)
        assert "raw MAE 0.000 m | bias +0.000 m" in out
        assert "per-px: 0.000 m" in out


class TestNanGuard:
    """Non-finite loss at a log boundary must dump nan-crash.ckpt and raise
    (failure detection: the loop's only device-scalar fetch point)."""

    def test_nan_loss_raises_and_dumps(self, trained_run, tmp_path,
                                       monkeypatch):
        import jax.numpy as jnp

        from satnerf_tpu.train.loop import fit
        from satnerf_tpu.train.system import NeRFSystem

        orig = NeRFSystem.make_train_step

        def poisoned(self):
            step = orig(self)

            def s(state, data, key):
                st, m = step(state, data, key)
                m = dict(m)
                m["loss"] = m["loss"] * jnp.float32(np.nan)
                return st, m

            return s

        monkeypatch.setattr(NeRFSystem, "make_train_step", poisoned)
        cfg = Config(
            root_dir=trained_run["data"], gt_dir=trained_run["gt"],
            model="sat-nerf", batch_size=128, fc_units=32, fc_layers=2,
            n_samples=8, max_train_steps=6, log_every_n_steps=2,
            save_every_n_epochs=999, val_every_n_epochs=9999,
            num_sanity_val_steps=0, first_beta_epoch=999,
            logs_dir=str(tmp_path / "logs"), ckpts_dir=str(tmp_path / "ck"),
        )
        cfg.stamp_exp_name()
        with pytest.raises(FloatingPointError, match="non-finite loss"):
            fit(cfg)
        assert os.path.exists(
            os.path.join(cfg.ckpts_dir, cfg.exp_name, "nan-crash.ckpt"))


class TestStudyScripts:
    """The two study CLIs (reference study_depth_supervision.py /
    study_solar_interpolation.py) driven end-to-end on the virtual mesh —
    previously only exercised manually on the chip."""

    def test_sun_interp_products(self, trained_run, tmp_path):
        import glob
        import importlib

        study = importlib.import_module("study_solar_interpolation")
        cfg = trained_run["cfg"]
        epochs = sorted(
            int(f.split("=")[1].split(".")[0])
            for f in os.listdir(os.path.join(cfg.ckpts_dir, cfg.exp_name)))
        study.sun_interp(
            run_id=cfg.exp_name, logs_dir=cfg.logs_dir,
            output_dir=str(tmp_path / "sun"), epoch_number=epochs[-1],
            checkpoints_dir=cfg.ckpts_dir, root_dir=trained_run["data"],
            gt_dir=trained_run["gt"], n_interp=2)
        out = os.path.join(tmp_path, "sun", cfg.exp_name)
        # per-sun renamed products + the hstacked summary sheets. The
        # fixture writes one sun for every image, so both interpolation
        # endpoints coincide and the two renamed tifs collapse to one
        # angle-stamped name — presence, not count, is the contract here.
        sun_tifs = glob.glob(os.path.join(out, "sun",
                                          "*solar_incidence_angle*.tif"))
        assert len(sun_tifs) >= 1, sorted(os.listdir(out))
        for sheet in ("sun.png", "albedo.png", "rgb.png"):
            assert os.path.exists(os.path.join(out, "summary", sheet)), sheet

    def test_depth_study_init_dsms(self, tmp_path, eight_devices):
        import glob
        import importlib

        from tests.fixtures import build_synthetic_dataset

        root = str(tmp_path / "data")
        build_synthetic_dataset(root, n_train=3, n_test=2, w=24, h=24,
                                with_keypoints=True, n_kp=60)
        cfg = Config(root_dir=root, model="sat-nerf", exp_name="ds_study",
                     logs_dir=str(tmp_path / "logs"))
        cfg.dump()

        study = importlib.import_module("study_depth_supervision")
        study.check_depth_supervision_points(
            "ds_study", cfg.logs_dir, str(tmp_path / "out"), root_dir=root)
        tifs = glob.glob(os.path.join(tmp_path, "out", "ds_study",
                                      "init_dsm_depth_supervision_*.tif"))
        assert len(tifs) == 3, tifs  # one per train view
        from satnerf_tpu.geo.geotiff import read_geotiff

        arr = read_geotiff(tifs[0]).data
        assert np.isfinite(arr).any()
