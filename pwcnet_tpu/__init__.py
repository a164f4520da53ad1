"""pwcnet_tpu — a TPU-native optical-flow framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of the TF1 PWC-Net reference
(daigo0927/pwcnet): 6-level feature pyramid, bilinear feature warping, local
cost-volume correlation (max displacement 4), per-level flow estimators,
dilated-conv context network, multi-scale EPE training, and the
train/test/test_continuous CLI surface — designed TPU-first:

- pure-functional ops (`pwcnet_tpu.ops`) built on shift/slice formulations
  rather than the reference's gather-heavy TF ops, with Pallas TPU kernels
  for the hot correlation path (`pwcnet_tpu.ops.pallas`);
- flax.linen models (`pwcnet_tpu.models`) with a parameter tree that maps
  1:1 onto the reference's TF checkpoint names (see
  `pwcnet_tpu.train_lib.tf_converter`);
- a torch-free host input pipeline (`pwcnet_tpu.data`) feeding
  double-buffered device batches;
- jit/sharding-based data- and spatial-parallel training
  (`pwcnet_tpu.parallel`, `pwcnet_tpu.train_lib`).
"""

__version__ = "0.1.0"

import importlib

_SUBMODULES = (
    "ops",
    "models",
    "losses",
    "data",
    "parallel",
    "train_lib",
    "utils",
)


def __getattr__(name):
    if name in _SUBMODULES:
        return importlib.import_module(f"pwcnet_tpu.{name}")
    raise AttributeError(f"module 'pwcnet_tpu' has no attribute {name!r}")
