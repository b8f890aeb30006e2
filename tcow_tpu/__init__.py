'''
TCOW-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the TCOW video mask-tracking framework
("Tracking through Containers and Occluders in the Wild", CVPR 2023).

This package reimplements the full capability surface of the reference PyTorch repo
(basilevh/tcow) with a TPU-first design:
  - models/      functional JAX backbone (divided space-time attention) + query mask tracker head
  - ops/         XLA + Pallas compute kernels (attention, pooling, resize)
  - objectives/  losses, metrics, and on-device supervision building
  - data/        host-side datasets (Kubric, plugin videos), augmentations, query sampling
  - parallel/    device mesh + sharding rules (data / sequence parallelism over ICI)
  - train/       jitted train step, optimizer, checkpointing, epoch driver
  - evaluation/  test driver, inference helpers, representative aggregation
  - utils/       logging, visualization

No code is shared with the reference; file:line citations in docstrings point at the
behavior being reproduced.
'''

PROJECT_NAME = 'tcow_tpu'

__version__ = '0.1.0'
