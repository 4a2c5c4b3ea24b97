"""satnerf_tpu — a TPU-native multi-view satellite photogrammetry NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
centreborelli/satnerf (CVPR EarthVision 2022): NeRF / Shadow-NeRF / Sat-NeRF
radiance fields driven by RPC satellite cameras, with solar-correction shadow
modeling, transient-uncertainty weighting, depth supervision from bundle
adjustment, and DSM (digital surface model) extraction scored against lidar.

Layout:
  geo/       host-side float64 geodesy: RPC cameras, ECEF/UTM, GeoTIFF IO
  data/      ray pipelines (satellite + blender), scene normalization, caching
  models/    flax MLP variants (NeRF, ShadowNeRF, SatNeRF) + Siren/positional enc
  render/    stratified sampling, hierarchical PDF sampling, volume rendering
  ops/       SSIM, DSM rasterization/registration, Pallas fused render kernels
  train/     jit train step, losses, schedules, checkpointing, logging
  parallel/  device mesh + sharding for multi-chip ray parallelism
  eval/      novel-view synthesis eval + DSM product tools
"""

__version__ = "0.1.0"
