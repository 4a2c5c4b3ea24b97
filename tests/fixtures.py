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

M_PER_DEG_LAT = 111_320.0  # WGS84 meridian arc at this scale; fixture-local


def sun_vector(el_deg: float, az_deg: float) -> np.ndarray:
    """Unit vector TOWARD the sun in the local ENU frame (x=east, y=north,
    z=up) — the same convention the data pipeline's sun_direction uses
    (reference datasets/satellite.py:239-241)."""
    el, az = np.radians(el_deg), np.radians(az_deg)
    return np.array([np.sin(az) * np.cos(el), np.cos(az) * np.cos(el),
                     np.sin(el)])


def surface_normal(hf, lon, lat, delta_deg: float = 2e-6):
    """Unit upward surface normal of the height field, from central
    differences converted to meters (ENU components)."""
    m_lon = M_PER_DEG_LAT * np.cos(np.radians(AOI_LAT))
    dz_de = (hf(lon + delta_deg, lat) - hf(lon - delta_deg, lat)) / (
        2 * delta_deg * m_lon)
    dz_dn = (hf(lon, lat + delta_deg) - hf(lon, lat - delta_deg)) / (
        2 * delta_deg * M_PER_DEG_LAT)
    n = np.stack([-dz_de, -dz_dn, np.ones_like(dz_de)], axis=0)
    return n / np.linalg.norm(n, axis=0, keepdims=True)


def cast_shadow_lit(hf, lon, lat, alt, el_deg, az_deg, terrain_max,
                    step_m: float = 1.0, lift_m: float = 0.1):
    """1.0 where the surface point (lon, lat, alt) sees the sun, 0.0 where
    the terrain occludes it: a fixed-step horizon march along the sun vector
    until the ray altitude clears the terrain's maximum."""
    s = sun_vector(el_deg, az_deg)
    if s[2] <= 1e-6:
        return np.zeros_like(alt)
    m_lon = M_PER_DEG_LAT * np.cos(np.radians(AOI_LAT))
    n_steps = int(np.ceil((terrain_max - float(np.min(alt))) /
                          (step_m * s[2]))) + 1
    lit = np.ones_like(alt, dtype=bool)
    for k in range(1, n_steps + 1):
        t = k * step_m
        a = alt + lift_m + s[2] * t
        blocked = a < hf(lon + s[0] * t / m_lon,
                         lat + s[1] * t / M_PER_DEG_LAT)
        lit &= ~blocked
    return lit.astype(np.float64)


def analytic_sun_term(hf, lon, lat, el_deg, az_deg, terrain_max):
    """The per-point direct-sun factor the shaded fixture renders with:
    Lambertian cosine from the height-field normal x binary cast-shadow
    visibility. This is EXACTLY the quantity S-NeRF's sun_v head models
    (irradiance = sun_v + (1-sun_v)*sky, /root/reference/models/snerf.py:65-67),
    so a converged sun_v map should reproduce it — the capability tests
    gate on their correlation."""
    alt = hf(lon, lat)
    s = sun_vector(el_deg, az_deg)
    n = surface_normal(hf, lon, lat)
    lambert = np.clip(n[0] * s[0] + n[1] * s[1] + n[2] * s[2], 0.0, 1.0)
    return lambert * cast_shadow_lit(hf, lon, lat, alt, el_deg, az_deg,
                                     terrain_max)


AMBIENT_SKY = (0.14, 0.16, 0.25)  # bluish skylight under full shadow


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
                            alt_bounds: str = "rpc", relief: float = 1.0,
                            shading: bool = False,
                            sun_el_range: tuple = (35.0, 70.0),
                            sun_az_range: tuple = (90.0, 270.0),
                            transient_frac: float = 0.0,
                            n_transients: int = 2,
                            transient_size: int = 0,
                            rpc_noise_px: float = 0.0):
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

    shading=True turns the flat-albedo renders into sun-lit images: each
    image draws its OWN sun geometry (elevation 35-70 deg, azimuth 90-270),
    and pixels get irradiance = sun_term + (1-sun_term)*AMBIENT_SKY with
    sun_term = Lambert cosine x cast-shadow visibility (analytic_sun_term)
    — the exact image-formation model S-NeRF's sun_v/sky heads represent
    (/root/reference/models/snerf.py:65-67). The analytic sun_term map of
    every image is saved as {name}_SUN.npy for capability gates. With
    shading=False (default) the output is byte-identical to the historical
    fixture (fixed sun 60/180, pure albedo).

    transient_frac > 0 paints n_transients random bright boxes (side
    transient_size px, default w//6) into that fraction of the train images
    with index >= 1 — the satellite analog of the reference's NeRF-W occ
    perturbation (/root/reference/datasets/blender.py:61-79). Painted
    pixel masks are saved as {name}_TRANSIENT.npy; test images stay clean
    so val PSNR measures clean-scene recovery.

    rpc_noise_px > 0 mis-registers each image's WRITTEN RPC by a uniform
    +-rpc_noise_px pixel shift of row/col_offset while rendering with the
    TRUE camera — the geometry error bundle adjustment exists to fix
    (/root/reference/create_satellite_dataset.py:32-78). The noise comes
    from an independent RNG stream, so a sibling dataset built with the
    same seed and rpc_noise_px=0 has byte-identical imagery ("BA" vs
    "noBA" ablation pairs). Keypoints stay in the TRUE frame (observed
    pixels + true tie points), like real BA output.
    """
    from satnerf_tpu.geo.ellipsoid import ecef_from_latlon

    hf = scaled_height_field(terrain, relief)
    gl_shade = np.linspace(-0.002, 0.002, 241)
    gsl, gsa = np.meshgrid(AOI_LON + gl_shade, AOI_LAT + gl_shade)
    terrain_max = float(hf(gsl.ravel(), gsa.ravel()).max())
    noise_rng = np.random.RandomState(seed + 7919)
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
        if shading:
            sun_el = float(rng.uniform(*sun_el_range))
            sun_az = float(rng.uniform(*sun_az_range))
        else:
            sun_el, sun_az = 60.0, 180.0
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
        name = f"SYN_000_{i:03d}_RGB"
        if shading:
            sun_term = analytic_sun_term(hf, lon, lat, sun_el, sun_az,
                                         terrain_max).reshape(h, w)
            np.save(os.path.join(root, name + "_SUN.npy"),
                    sun_term.astype(np.float32))
            irr = [sun_term + (1.0 - sun_term) * a for a in AMBIENT_SKY]
            rgb = np.stack([img * c for c in irr], 0)
        else:
            rgb = np.stack([img, img, img], 0)
        if (transient_frac > 0 and 1 <= i < n_train
                and rng.uniform() < transient_frac):
            side = transient_size or max(3, w // 6)
            tmask = np.zeros((h, w), bool)
            for _ in range(n_transients):
                x0 = rng.randint(0, w - side + 1)
                y0 = rng.randint(0, h - side + 1)
                color = rng.uniform(0.75, 1.0, 3)
                rgb[:, y0:y0 + side, x0:x0 + side] = color[:, None, None]
                tmask[y0:y0 + side, x0:x0 + side] = True
            np.save(os.path.join(root, name + "_TRANSIENT.npy"), tmask)
        rgb8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)

        write_geotiff(
            os.path.join(root, name + ".tif"), rgb8,
            Profile(w, h, 3, "uint8", 32617, Affine(0.5, 0, 0, 0, -0.5, 0)),
        )
        if rpc_noise_px > 0:
            import dataclasses

            d_col, d_row = noise_rng.uniform(-rpc_noise_px, rpc_noise_px, 2)
            rpc_out = dataclasses.replace(
                rpc, col_offset=rpc.col_offset + float(d_col),
                row_offset=rpc.row_offset + float(d_row))
        else:
            rpc_out = rpc
        meta = {
            "img": name + ".tif",
            "height": h,
            "width": w,
            "sun_elevation": sun_el,
            "sun_azimuth": sun_az,
            "acquisition_date": f"2014100{i}120000",
            "geojson": {"center": [AOI_LON, AOI_LAT],
                        "coordinates": [[[lon_r[0], lat_r[0]], [lon_r[1], lat_r[0]],
                                         [lon_r[1], lat_r[1]], [lon_r[0], lat_r[1]],
                                         [lon_r[0], lat_r[0]]]]},
            "min_alt": min_alt,
            "max_alt": max_alt,
            "rpc": rpc_out.to_dict(),
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
