from satnerf_tpu.train import losses
from satnerf_tpu.train.system import NeRFSystem, TrainState, steps_per_epoch

__all__ = ["losses", "NeRFSystem", "TrainState", "steps_per_epoch"]
