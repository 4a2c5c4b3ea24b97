"""Synthetic dataset fixtures: a 'fake RPC' satellite scene that needs no
DFC2019 data (SURVEY.md §4's fake-RPC strategy).

The scene is a flat plane at alt0 with a box bump; cameras are slightly
off-nadir parallel projections expressed as fitted RPCs; images are shaded
height fields so that geometry and pixels are consistent enough for
overfit-style training tests.
"""

from __future__ import annotations

import json
import os

import numpy as np

from satnerf_tpu.geo.geotiff import Affine, Profile, write_geotiff
from satnerf_tpu.geo.rpc import fit_rpc_from_projection

AOI_LON, AOI_LAT = -81.66, 30.35  # Jacksonville-ish
ALT_MIN, ALT_MAX = -20.0, 80.0


def make_camera(view_dx: float, view_dy: float, w: int, h: int):
    """Parallel projection with per-altitude shift (view_dx, view_dy) in
    pixels per meter of altitude — a linear pushbroom-style camera."""
    lon_scale = 0.002
    lat_scale = 0.002

    def project(lon, lat, alt):
        col = (lon - (AOI_LON - lon_scale)) / (2 * lon_scale) * (w - 1) + view_dx * alt
        row = ((AOI_LAT + lat_scale) - lat) / (2 * lat_scale) * (h - 1) + view_dy * alt
        return col, row

    return project, (AOI_LON - lon_scale, AOI_LON + lon_scale), (
        AOI_LAT - lat_scale, AOI_LAT + lat_scale)


def height_field(lon, lat):
    """Scene geometry: plane at 10 m with a 40 m box in the middle."""
    u = (lon - AOI_LON) / 0.002
    v = (lat - AOI_LAT) / 0.002
    box = (np.abs(u) < 0.3) & (np.abs(v) < 0.3)
    return np.where(box, 50.0, 10.0)


def smooth_height_field(lon, lat):
    """Continuous terrain (two hills + a ridge on a 10 m plane): unlike the
    box scene there are no depth discontinuities, so a converged model can
    reach sub-meter DSM MAE — the geometry REGRESSION anchor scene
    (quality protocol in docs/DESIGN.md)."""
    u = (lon - AOI_LON) / 0.002
    v = (lat - AOI_LAT) / 0.002
    z = 10.0 + 35.0 * np.exp(-((u - 0.25) ** 2 + (v - 0.2) ** 2)
                             / (2 * 0.18 ** 2))
    z = z + 25.0 * np.exp(-((u + 0.35) ** 2 + (v + 0.3) ** 2)
                          / (2 * 0.25 ** 2))
    return z + 12.0 * np.exp(-((u + v) ** 2) / (2 * 0.3 ** 2))


HEIGHT_FIELDS = {"box": height_field, "smooth": smooth_height_field}


def scaled_height_field(terrain: str, relief: float = 1.0):
    """Height field with its deviation from the 10 m base plane scaled by
    `relief`. With alt_bounds="terrain" the stratified z-bin width tracks
    the scene's altitude range, so relief trades bin width against parallax
    signal — measured: shrinking relief HURTS (signal loss beats bin-width
    gain; r3 anchor ladder, docs/DESIGN.md "Geometry anchor")."""
    hf = HEIGHT_FIELDS[terrain]
    if relief == 1.0:
        return hf
    return lambda lon, lat: 10.0 + relief * (hf(lon, lat) - 10.0)


def albedo_field(lon, lat, checker: int = 4):
    u = (lon - AOI_LON) / 0.002
    v = (lat - AOI_LAT) / 0.002
    ck = ((np.floor(u * checker) + np.floor(v * checker)) % 2)
    return 0.3 + 0.5 * ck.astype(np.float64)


def build_synthetic_dataset(root: str, n_train: int = 3, n_test: int = 2,
                            w: int = 32, h: int = 32, seed: int = 0,
                            with_keypoints: bool = False, n_kp: int = 40,
                            view_spread: float = 0.05,
                            terrain: str = "box", checker: int = 4,
                            alt_bounds: str = "rpc", relief: float = 1.0):
    """Write a reference-format dataset: per-image json + tif + splits.

    with_keypoints adds bundle-adjustment-style depth supervision data:
    pts3d.npy (ECEF tie points ON the true surface) and per-image
    keypoints {2d_coordinates, pts3d_indices}, like the reference's BA output
    (create_satellite_dataset.py:125-136).

    terrain selects the scene geometry (HEIGHT_FIELDS): "box" (default,
    depth-discontinuous) or "smooth" (the geometry-anchor terrain);
    checker sets the albedo checker frequency.

    alt_bounds picks the per-image min_alt/max_alt written to the json
    (which become the ray near/far and hence the stratified z-bin width):
    "rpc" (default) uses the full RPC fit range [ALT_MIN, ALT_MAX] =
    100 m; "terrain" uses the terrain's own min/max ±2 m like the
    reference derives them from the lidar DSM
    (/root/reference/create_satellite_dataset.py:101-103) — roughly
    halving the z-bin width for the same n_samples.

    relief scales the terrain's deviation from the 10 m base plane (see
    scaled_height_field) — with alt_bounds="terrain" it sets the z-bin
    width and hence the anchor scene's achievable DSM MAE.
    """
    from satnerf_tpu.geo.ellipsoid import ecef_from_latlon

    hf = scaled_height_field(terrain, relief)
    if alt_bounds == "terrain":
        gl = np.linspace(-0.002, 0.002, 241)
        glon, glat = np.meshgrid(AOI_LON + gl, AOI_LAT + gl)
        z = hf(glon.ravel(), glat.ravel())
        min_alt, max_alt = float(z.min() - 2.0), float(z.max() + 2.0)
    else:
        min_alt, max_alt = ALT_MIN, ALT_MAX
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    names = []
    n_total = n_train + n_test

    tie_lons = tie_lats = tie_alts = pts3d = None
    if with_keypoints:
        tie_lons = rng.uniform(AOI_LON - 0.0015, AOI_LON + 0.0015, n_kp)
        tie_lats = rng.uniform(AOI_LAT - 0.0015, AOI_LAT + 0.0015, n_kp)
        tie_alts = hf(tie_lons, tie_lats)
        pts3d = np.stack(ecef_from_latlon(tie_lats, tie_lons, tie_alts), -1)
        np.save(os.path.join(root, "pts3d.npy"), pts3d)

    for i in range(n_total):
        dx = rng.uniform(-view_spread, view_spread)
        dy = rng.uniform(-view_spread, view_spread)
        project, lon_r, lat_r = make_camera(dx, dy, w, h)
        rpc = fit_rpc_from_projection(project, lon_r, lat_r,
                                      (ALT_MIN, ALT_MAX), w, h)

        # render a consistent image: for each pixel march altitudes downward
        # to bracket the surface crossing, then BISECT to the exact hit.
        # (The pre-r3 renderer stopped at the marched level — a 0.84 m
        # altitude quantization that aliased every albedo edge and put a
        # ~2 m floor under the learnable geometry; with exact hits the
        # image is the true continuous projection of the scene.)
        cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
        fc, fr = cols.ravel(), rows.ravel()
        levels = np.linspace(ALT_MAX, ALT_MIN, 120)
        hit_lo = np.full(w * h, ALT_MIN)  # highest level known below surface
        hit_hi = np.full(w * h, ALT_MAX)  # lowest level known above surface
        done = np.zeros(w * h, bool)
        for alt in levels:
            lon, lat = rpc.localization(fc, fr, np.full(w * h, alt))
            below = (~done) & (alt <= hf(lon, lat))
            hit_lo = np.where(below, alt, hit_lo)
            hit_hi = np.where(done | below, hit_hi, alt)
            done |= below
        lo, hi = hit_lo.copy(), hit_hi.copy()
        for _ in range(24):  # ~100 m / 2^24 < 1 mm
            mid = 0.5 * (lo + hi)
            lon, lat = rpc.localization(fc, fr, mid)
            below = mid <= hf(lon, lat)
            lo = np.where(below, mid, lo)
            hi = np.where(below, hi, mid)
        hit = 0.5 * (lo + hi)
        lon, lat = rpc.localization(fc, fr, hit)
        img = albedo_field(lon, lat, checker).reshape(h, w)
        rgb = np.stack([img, img, img], 0)
        rgb8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)

        name = f"SYN_000_{i:03d}_RGB"
        write_geotiff(
            os.path.join(root, name + ".tif"), rgb8,
            Profile(w, h, 3, "uint8", 32617, Affine(0.5, 0, 0, 0, -0.5, 0)),
        )
        meta = {
            "img": name + ".tif",
            "height": h,
            "width": w,
            "sun_elevation": 60.0,
            "sun_azimuth": 180.0,
            "acquisition_date": f"2014100{i}120000",
            "geojson": {"center": [AOI_LON, AOI_LAT],
                        "coordinates": [[[lon_r[0], lat_r[0]], [lon_r[1], lat_r[0]],
                                         [lon_r[1], lat_r[1]], [lon_r[0], lat_r[1]],
                                         [lon_r[0], lat_r[0]]]]},
            "min_alt": min_alt,
            "max_alt": max_alt,
            "rpc": rpc.to_dict(),
        }
        if with_keypoints:
            kp_cols, kp_rows = rpc.projection(tie_lons, tie_lats, tie_alts)
            inside = ((kp_cols >= 0) & (kp_cols <= w - 1)
                      & (kp_rows >= 0) & (kp_rows <= h - 1))
            idx = np.nonzero(inside)[0]
            # small reprojection noise like real BA residuals
            noise = rng.normal(0, 0.05, (idx.size, 2))
            meta["keypoints"] = {
                "2d_coordinates": np.stack(
                    [kp_cols[idx] + noise[:, 0], kp_rows[idx] + noise[:, 1]],
                    -1,
                ).tolist(),
                "pts3d_indices": idx.tolist(),
            }
        with open(os.path.join(root, name + ".json"), "w") as f:
            json.dump(meta, f)
        names.append(name + ".json")

    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(names[:n_train]))
    with open(os.path.join(root, "test.txt"), "w") as f:
        f.write("\n".join(names[n_train:]))
    return root
