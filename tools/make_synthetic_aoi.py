#!/usr/bin/env python
"""Generate a fully synthetic satellite AOI for testing/benchmarking without
DFC2019 data: fitted fake RPC cameras, rendered height-field images, and a
lidar-style GT DSM + CLS mask on a UTM grid (the inputs the reference pipeline
expects, README.md dataset layout).

Usage: python tools/make_synthetic_aoi.py OUT_DIR [--n_train 3] [--n_test 2]
       [--size 32]
Writes OUT_DIR/data (json+tif+splits) and OUT_DIR/gt (SYN_000_DSM.tif/.txt,
SYN_000_CLS.tif).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n_train", type=int, default=3)
    ap.add_argument("--n_test", type=int, default=2)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--view_spread", type=float, default=0.05,
                    help="off-nadir parallax in px per meter of altitude")
    ap.add_argument("--terrain", default="box", choices=("box", "smooth"),
                    help="scene geometry: 'box' (discontinuous, default) or "
                         "'smooth' (the geometry-anchor terrain)")
    ap.add_argument("--checker", type=int, default=4,
                    help="albedo checker frequency")
    ap.add_argument("--alt_bounds", default="rpc", choices=("rpc", "terrain"),
                    help="per-image min/max_alt: 'rpc' (full 100 m fit "
                         "range) or 'terrain' (terrain min/max ±2 m, like "
                         "the reference's lidar-DSM-derived bounds)")
    ap.add_argument("--relief", type=float, default=1.0,
                    help="scale the terrain's deviation from the 10 m base "
                         "plane; with --alt_bounds terrain this sets the "
                         "z-bin width (geometry-anchor knob)")
    ap.add_argument("--keypoints", type=int, default=0, metavar="N",
                    help="embed N bundle-adjustment-style tie points "
                         "(pts3d.npy + per-image keypoint jsons) so "
                         "--ds_lambda training and the depth-supervision "
                         "study run on this AOI")
    ap.add_argument("--shading", action="store_true",
                    help="sun-lit images: per-image sun geometry, "
                         "Lambertian shading and cast shadows, bluish "
                         "ambient; writes {img}_SUN.npy analytic sun maps")
    ap.add_argument("--sun_el", type=float, nargs=2, default=(35.0, 70.0),
                    metavar=("LO", "HI"),
                    help="per-image sun elevation range (deg); lower "
                         "elevations cast longer shadows")
    ap.add_argument("--sun_az", type=float, nargs=2, default=(90.0, 270.0),
                    metavar=("LO", "HI"),
                    help="per-image sun azimuth range (deg)")
    ap.add_argument("--transient_frac", type=float, default=0.0,
                    help="fraction of train images (idx>=1) that get "
                         "painted transient boxes ({img}_TRANSIENT.npy "
                         "masks); test images stay clean")
    ap.add_argument("--transient_size", type=int, default=0,
                    help="transient box side in px (default w//6)")
    ap.add_argument("--n_transients", type=int, default=2,
                    help="painted boxes per perturbed train image")
    ap.add_argument("--rpc_noise", type=float, default=0.0, metavar="PX",
                    help="mis-register each image's written RPC by a "
                         "uniform +-PX pixel offset (independent RNG: same "
                         "--seed with 0 gives a byte-identical 'BA' "
                         "sibling)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from fixtures import (AOI_LAT, AOI_LON, build_synthetic_dataset,
                          scaled_height_field)
    from satnerf_tpu.geo.geotiff import Affine, Profile, write_geotiff
    from satnerf_tpu.geo.utm import utm_from_latlon
    from satnerf_tpu.ops.dsm_raster import raster_dsm

    height_field = scaled_height_field(args.terrain, args.relief)
    data_dir = os.path.join(args.out_dir, "data")
    gt_dir = os.path.join(args.out_dir, "gt")
    build_synthetic_dataset(data_dir, n_train=args.n_train, n_test=args.n_test,
                            w=args.size, h=args.size, seed=args.seed,
                            view_spread=args.view_spread,
                            terrain=args.terrain, checker=args.checker,
                            alt_bounds=args.alt_bounds, relief=args.relief,
                            with_keypoints=args.keypoints > 0,
                            n_kp=args.keypoints or 40,
                            shading=args.shading,
                            sun_el_range=tuple(args.sun_el),
                            sun_az_range=tuple(args.sun_az),
                            transient_frac=args.transient_frac,
                            transient_size=args.transient_size,
                            n_transients=args.n_transients,
                            rpc_noise_px=args.rpc_noise)

    os.makedirs(gt_dir, exist_ok=True)
    lons = np.linspace(AOI_LON - 0.002, AOI_LON + 0.002, 400)
    lats = np.linspace(AOI_LAT - 0.002, AOI_LAT + 0.002, 400)
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
                   Affine(res, 0, xoff, 0, -res, yoff + size * res), float("nan"))
    write_geotiff(os.path.join(gt_dir, "SYN_000_DSM.tif"),
                  dsm[:, :, 0][None].astype(np.float32), prof)
    np.savetxt(os.path.join(gt_dir, "SYN_000_DSM.txt"),
               np.array([xoff, yoff, size, res]))
    cls = np.zeros((1, size, size), np.uint8)
    write_geotiff(os.path.join(gt_dir, "SYN_000_CLS.tif"), cls,
                  Profile(size, size, 1, "uint8", 32617,
                          Affine(res, 0, xoff, 0, -res, yoff + size * res)))
    print(f"synthetic AOI ready: {data_dir} + {gt_dir} (DSM {size}x{size})")


if __name__ == "__main__":
    main()
