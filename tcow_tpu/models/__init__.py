from tcow_tpu.models.timesformer import (TimeSformerConfig, config_from_network_depth,
                                         DEPTH_PRESETS)
from tcow_tpu.models.mask_tracker import SeekerConfig, seeker_config_from_args
from tcow_tpu.models import timesformer, mask_tracker
