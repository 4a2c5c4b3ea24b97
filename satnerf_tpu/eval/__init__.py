from satnerf_tpu.eval.dsm_metrics import (
    compute_mae_and_save_dsm_diff,
    dsm_mae,
    dsm_pointwise_diff,
)
from satnerf_tpu.eval.images import save_nerf_output_to_images, save_output_image
from satnerf_tpu.eval.val_ts import (
    find_best_embedding_for_val_image,
    predefined_val_ts,
)

__all__ = [
    "compute_mae_and_save_dsm_diff",
    "dsm_mae",
    "dsm_pointwise_diff",
    "save_nerf_output_to_images",
    "save_output_image",
    "find_best_embedding_for_val_image",
    "predefined_val_ts",
]
