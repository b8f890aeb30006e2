from tcow_tpu.objectives.losses import LossConfig
