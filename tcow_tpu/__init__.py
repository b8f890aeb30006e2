'''
TCOW-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the TCOW video mask-tracking framework
("Tracking through Containers and Occluders in the Wild", CVPR 2023).

This package reimplements the full capability surface of the reference PyTorch repo
(basilevh/tcow) with a TPU-first design:
  - models/      functional JAX backbone (divided space-time attention) + query mask tracker
                 head + streaming (online) inference + alt ResNet backbone
  - ops/         Pallas compute kernels (fused attention fwd + residual-saving bwd)
  - objectives/  losses, metrics, and on-device supervision building
  - data/        host-side datasets (Kubric, plugin videos), augmentations, query sampling
  - native/      C++ host-preprocessing kernels (ctypes)
  - parallel/    device mesh + sharding rules (data / sequence parallelism over ICI)
  - train/       jitted train step, optimizer, checkpointing, epoch driver
  - evaluation/  test driver, inference helpers, representative aggregation
  - gen_kubric/  offline Kubric dataset generation (separate Blender environment)
  - utils/       logging, visualization, misc helpers

No code is shared with the reference; file:line citations in docstrings point at the
behavior being reproduced.

Public entry points:
  from tcow_tpu.models.seeker import Seeker                 # model facade
  from tcow_tpu.models import streaming                     # online tracking
  from tcow_tpu.train import driver, step, optim, checkpoint
  from tcow_tpu.evaluation import inference, test_driver, pick_represent
'''

PROJECT_NAME = 'tcow_tpu'

__version__ = '0.1.0'
