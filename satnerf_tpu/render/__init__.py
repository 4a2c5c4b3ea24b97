from satnerf_tpu.render.composite import composite, ray_weights
from satnerf_tpu.render.render import RenderConfig, render_rays
from satnerf_tpu.render.sampling import sample_pdf, stratified_zvals

__all__ = [
    "composite",
    "ray_weights",
    "RenderConfig",
    "render_rays",
    "sample_pdf",
    "stratified_zvals",
]
