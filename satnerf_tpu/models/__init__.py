from satnerf_tpu.models.nerf import (
    RadianceField,
    TransientEmbedding,
    build_model,
    positional_encoding,
)

__all__ = [
    "RadianceField",
    "TransientEmbedding",
    "build_model",
    "positional_encoding",
]
