from satnerf_tpu.data.blender import BlenderScene
from satnerf_tpu.data.satellite import SatelliteScene
from satnerf_tpu.data.satellite_depth import SatelliteDepthScene
from satnerf_tpu.data.scene import SceneFrame


def load_dataset(cfg, split: str):
    """Dataset factory mirroring datasets/__init__.py:5-25: returns a list
    [color_dataset, (depth_dataset if ds_lambda>0 and train)]."""
    outputs = []
    if cfg.data == "sat":
        outputs.append(
            SatelliteScene(
                root_dir=cfg.root_dir,
                img_dir=cfg.img_dir,
                split=split,
                img_downscale=cfg.img_downscale,
                cache_dir=cfg.cache_dir,
                verbose=True,
            )
        )
        if cfg.ds_lambda > 0 and split == "train":
            outputs.append(
                SatelliteDepthScene(
                    root_dir=cfg.root_dir,
                    img_dir=cfg.img_dir,
                    split=split,
                    img_downscale=cfg.img_downscale,
                    cache_dir=cfg.cache_dir,
                )
            )
    else:
        outputs.append(BlenderScene(root_dir=cfg.root_dir, split=split))
    return outputs


__all__ = [
    "BlenderScene",
    "SatelliteScene",
    "SatelliteDepthScene",
    "SceneFrame",
    "load_dataset",
]
