"""Geo-core unit tests: ECEF/UTM/RPC against independent oracles."""

import numpy as np
import pytest

from satnerf_tpu.geo import (
    RPCModel,
    ecef_from_latlon,
    latlon_from_ecef,
    rescale_rpc,
    scaling_params,
    utm_epsg,
    utm_from_latlon,
    utm_zone,
)
from satnerf_tpu.geo.rpc import fit_rpc_from_projection
from satnerf_tpu.geo.utm import utm_zone_letter, utm_zone_number


class TestEllipsoid:
    def test_roundtrip(self, rng):
        lat = rng.uniform(-85, 85, 1000)
        lon = rng.uniform(-180, 180, 1000)
        alt = rng.uniform(-100, 9000, 1000)
        x, y, z = ecef_from_latlon(lat, lon, alt)
        la, lo, al = latlon_from_ecef(x, y, z)
        np.testing.assert_allclose(la, lat, atol=1e-9)
        # lon wraps at +-180
        dlon = (lo - lon + 180) % 360 - 180
        np.testing.assert_allclose(dlon, 0, atol=1e-9)
        np.testing.assert_allclose(al, alt, atol=1e-6)

    def test_known_point(self):
        # equator/prime meridian at 0 alt -> (a, 0, 0)
        x, y, z = ecef_from_latlon(0.0, 0.0, 0.0)
        np.testing.assert_allclose([x, y, z], [6378137.0, 0, 0], atol=1e-6)
        # north pole -> z = b
        x, y, z = ecef_from_latlon(90.0, 0.0, 0.0)
        np.testing.assert_allclose(z, 6356752.3142, atol=1e-3)


def _snyder_utm(lat, lon, lon0):
    """Independent UTM oracle: Snyder (1987) series, ~0.1 mm accuracy."""
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lat = np.deg2rad(np.asarray(lat, float))
    dl = np.deg2rad(np.asarray(lon, float) - lon0)
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    T = np.tan(lat) ** 2
    C = ep2 * np.cos(lat) ** 2
    A = np.cos(lat) * dl
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * lat
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * lat)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * lat)
        - (35 * e2**3 / 3072) * np.sin(6 * lat)
    )
    x = k0 * N * (A + (1 - T + C) * A**3 / 6
                  + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120) + 500000
    y = k0 * (M + N * np.tan(lat) * (
        A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
        + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720))
    return x, y


class TestUTM:
    def test_vs_snyder(self, rng):
        lat = rng.uniform(25, 45, 200)
        lon0_zone = 17
        lon = rng.uniform(-84, -78, 200)  # zone 17
        e, n = utm_from_latlon(lat, lon, zone_number=lon0_zone)
        es, ns = _snyder_utm(lat, lon, -81.0)
        np.testing.assert_allclose(e, es, atol=1e-3)
        np.testing.assert_allclose(n, ns, atol=1e-3)

    def test_zones(self):
        assert utm_zone_number(30.35, -81.66) == 17
        assert utm_zone_letter(30.35) == "R"
        assert utm_zone(30.35, -81.66) == "17R"
        assert utm_epsg(30.35, -81.66) == 32617
        assert utm_epsg(-33.9, 18.4) == 32734
        # Norway exception
        assert utm_zone_number(60.0, 5.0) == 32

    def test_southern_hemisphere_offset(self):
        _, n = utm_from_latlon([-10.0], [-50.0])
        assert n[0] > 8.8e6  # false northing applied


class TestRPC:
    def _affine_cam(self):
        def project(lon, lat, alt):
            col = 500 + 9000 * (lon + 81.66) + 0.03 * alt + 200 * (lat - 30.35)
            row = 480 - 8500 * (lat - 30.35) + 0.02 * alt
            return col, row

        return project

    def test_fit_and_project(self):
        cam = self._affine_cam()
        rpc = fit_rpc_from_projection(
            cam, (-81.67, -81.65), (30.34, 30.36), (-30, 100), 1000, 1000
        )
        rng = np.random.RandomState(1)
        lon = rng.uniform(-81.668, -81.652, 500)
        lat = rng.uniform(30.342, 30.358, 500)
        alt = rng.uniform(-25, 95, 500)
        c, r = rpc.projection(lon, lat, alt)
        c0, r0 = cam(lon, lat, alt)
        np.testing.assert_allclose(c, c0, atol=1e-8)
        np.testing.assert_allclose(r, r0, atol=1e-8)

    def test_localization_inverts_projection(self):
        cam = self._affine_cam()
        rpc = fit_rpc_from_projection(
            cam, (-81.67, -81.65), (30.34, 30.36), (-30, 100), 1000, 1000
        )
        rng = np.random.RandomState(2)
        lon = rng.uniform(-81.668, -81.652, 500)
        lat = rng.uniform(30.342, 30.358, 500)
        alt = rng.uniform(-25, 95, 500)
        c, r = rpc.projection(lon, lat, alt)
        lo, la = rpc.localization(c, r, alt)
        np.testing.assert_allclose(lo, lon, atol=1e-11)
        np.testing.assert_allclose(la, lat, atol=1e-11)

    def test_localization_rational_camera(self):
        """Nontrivial denominators: perspective-style rational camera."""
        def cam(lon, lat, alt):
            L = (lon + 81.66) / 0.01
            P = (lat - 30.35) / 0.01
            H = alt / 100.0
            den = 1.0 + 0.05 * H + 0.02 * L
            col = 500 + 400 * (L + 0.1 * H) / den
            row = 500 + 420 * (-P + 0.08 * H) / den
            return col, row

        # build RPC manually with rational coefficients
        rpc = fit_rpc_from_projection(
            cam, (-81.67, -81.65), (30.34, 30.36), (-50, 150), 1000, 1000,
            n_grid=8,
        )
        # the fit is numerator-only; this camera is NOT cubic, so test the
        # solver on the fitted model self-consistently
        rng = np.random.RandomState(3)
        lon = rng.uniform(-81.668, -81.652, 200)
        lat = rng.uniform(30.342, 30.358, 200)
        alt = rng.uniform(-40, 140, 200)
        c, r = rpc.projection(lon, lat, alt)
        lo, la = rpc.localization(c, r, alt)
        c2, r2 = rpc.projection(lo, la, alt)
        np.testing.assert_allclose(c2, c, atol=1e-9)
        np.testing.assert_allclose(r2, r, atol=1e-9)

    def test_rescale(self):
        cam = self._affine_cam()
        rpc = fit_rpc_from_projection(
            cam, (-81.67, -81.65), (30.34, 30.36), (-30, 100), 1000, 1000
        )
        half = rescale_rpc(rpc, 0.5)
        lon, lat, alt = np.array([-81.66]), np.array([30.351]), np.array([12.0])
        c, r = rpc.projection(lon, lat, alt)
        c2, r2 = half.projection(lon, lat, alt)
        np.testing.assert_allclose(c2, c * 0.5, atol=1e-8)
        np.testing.assert_allclose(r2, r * 0.5, atol=1e-8)

    def test_dict_roundtrip(self):
        cam = self._affine_cam()
        rpc = fit_rpc_from_projection(
            cam, (-81.67, -81.65), (30.34, 30.36), (-30, 100), 1000, 1000
        )
        rpc2 = RPCModel.from_dict(rpc.to_dict())
        lon, lat, alt = np.array([-81.655]), np.array([30.345]), np.array([5.0])
        np.testing.assert_array_equal(
            rpc.projection(lon, lat, alt), rpc2.projection(lon, lat, alt)
        )


class TestScaling:
    def test_scaling_params(self):
        s, o = scaling_params([2.0, 4.0, 10.0])
        assert s == 4.0 and o == 6.0
        v = np.array([2.0, 4.0, 10.0])
        np.testing.assert_allclose(np.abs((v - o) / s).max(), 1.0)
