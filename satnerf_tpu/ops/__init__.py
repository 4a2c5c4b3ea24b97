from satnerf_tpu.ops.dsm_raster import raster_dsm

__all__ = ["raster_dsm"]
