"""Loss-library golden tests against torch oracles of the reference formulas
(metrics.py:8-103)."""

import jax.numpy as jnp
import numpy as np
import torch

from satnerf_tpu.train import losses as L


def _results(rng, n=16, s=8, fine=False, shadow=False, beta=False, sc=False):
    res = {}
    for typ in (["coarse", "fine"] if fine else ["coarse"]):
        res[f"rgb_{typ}"] = jnp.array(rng.rand(n, 3).astype(np.float32))
        res[f"depth_{typ}"] = jnp.array(rng.rand(n).astype(np.float32))
        w = rng.rand(n, s).astype(np.float32)
        res[f"weights_{typ}"] = jnp.array(w / w.sum(-1, keepdims=True))
        res[f"transparency_{typ}"] = jnp.array(rng.rand(n, s).astype(np.float32))
        if beta:
            res[f"beta_{typ}"] = jnp.array(rng.rand(n, s, 1).astype(np.float32))
        if sc:
            res[f"sun_sc_{typ}"] = jnp.array(rng.rand(n, s, 1).astype(np.float32))
            res[f"weights_sc_{typ}"] = jnp.array(rng.rand(n, s).astype(np.float32))
            res[f"transparency_sc_{typ}"] = jnp.array(rng.rand(n, s).astype(np.float32))
    return res


class TestNerfLoss:
    def test_mse(self, rng):
        res = _results(rng, fine=True)
        tgt = jnp.array(rng.rand(16, 3).astype(np.float32))
        loss, d = L.nerf_loss(res, tgt)
        expect = float(torch.nn.MSELoss()(torch.tensor(np.asarray(res["rgb_coarse"])),
                                          torch.tensor(np.asarray(tgt))))
        expect += float(torch.nn.MSELoss()(torch.tensor(np.asarray(res["rgb_fine"])),
                                           torch.tensor(np.asarray(tgt))))
        np.testing.assert_allclose(float(loss), expect, rtol=1e-6)
        assert set(d) == {"coarse_color", "fine_color"}


class TestSolarCorrection:
    def test_terms_match_reference_formula(self, rng):
        res = _results(rng, sc=True)
        lam = 0.05
        t2, t3 = L.solar_correction_terms(res, "coarse", lam)
        sun = np.asarray(res["sun_sc_coarse"])[..., 0]
        trans = np.asarray(res["transparency_sc_coarse"])
        w = np.asarray(res["weights_sc_coarse"])
        e2 = lam / 3 * np.mean(np.sum((trans - sun) ** 2, -1))
        e3 = lam / 3 * np.mean(1 - np.sum(w * sun, -1))
        np.testing.assert_allclose(float(t2), e2, rtol=1e-5)
        np.testing.assert_allclose(float(t3), e3, rtol=1e-5)

    def test_gradient_only_through_sun(self, rng):
        """transparency/weights are stop-gradiented (metrics.py:30-31)."""
        import jax

        res = _results(rng, sc=True)

        def f_trans(x):
            r = dict(res)
            r["transparency_sc_coarse"] = x
            t2, t3 = L.solar_correction_terms(r, "coarse", 0.05)
            return t2 + t3

        g = jax.grad(f_trans)(res["transparency_sc_coarse"])
        np.testing.assert_allclose(np.asarray(g), 0.0)


class TestSatNerfLoss:
    def test_beta_loss_formula(self, rng):
        res = _results(rng, beta=True)
        tgt = jnp.array(rng.rand(16, 3).astype(np.float32))
        loss, d = L.satnerf_loss(res, tgt)
        w = np.asarray(res["weights_coarse"])[..., None]
        b = np.asarray(res["beta_coarse"])
        beta = (w * b).sum(-2) + 0.05
        color = np.mean((np.asarray(res["rgb_coarse"]) - np.asarray(tgt)) ** 2
                        / (2 * beta**2))
        logbeta = (3 + np.mean(np.log(beta))) / 2
        np.testing.assert_allclose(float(d["coarse_color"]), color, rtol=1e-5)
        np.testing.assert_allclose(float(d["coarse_logbeta"]), logbeta, rtol=1e-5)
        np.testing.assert_allclose(float(loss), color + logbeta, rtol=1e-5)

    def test_fine_uses_fine_beta(self, rng):
        """Reference bug not replicated: fine branch must use beta_fine."""
        res = _results(rng, fine=True, beta=True)
        tgt = jnp.array(rng.rand(16, 3).astype(np.float32))
        _, d = L.satnerf_loss(res, tgt)
        w = np.asarray(res["weights_fine"])[..., None]
        b = np.asarray(res["beta_fine"])
        beta = (w * b).sum(-2) + 0.05
        color = np.mean((np.asarray(res["rgb_fine"]) - np.asarray(tgt)) ** 2
                        / (2 * beta**2))
        np.testing.assert_allclose(float(d["fine_color"]), color, rtol=1e-5)


class TestDepthLoss:
    def test_weighted(self, rng):
        res = _results(rng)
        tgt = jnp.array(rng.rand(16).astype(np.float32))
        w = jnp.array(rng.rand(16).astype(np.float32))
        loss, d = L.depth_loss(res, tgt, w, lambda_ds=1000.0)
        expect = 1000 / 3 * np.mean(
            np.asarray(w) * (np.asarray(res["depth_coarse"]) - np.asarray(tgt)) ** 2
        )
        np.testing.assert_allclose(float(loss), expect, rtol=1e-5)

    def test_unweighted(self, rng):
        res = _results(rng)
        tgt = jnp.array(rng.rand(16).astype(np.float32))
        loss, _ = L.depth_loss(res, tgt, 1.0, lambda_ds=3.0)
        expect = np.mean((np.asarray(res["depth_coarse"]) - np.asarray(tgt)) ** 2)
        np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


class TestFactory:
    def test_variants(self):
        for v in ("nerf", "s-nerf", "sat-nerf"):
            assert callable(L.load_loss(v, 0.05))
        try:
            L.load_loss("bogus")
            assert False
        except ValueError:
            pass
