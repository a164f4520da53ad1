"""Pallas TPU kernels for the hot ops."""

from pwcnet_tpu.ops.pallas.cost_volume import (
    cost_volume_pallas,
    cost_volume_pallas_hpad,
)
from pwcnet_tpu.ops.pallas.estimator_conv import estimator_chain_fused
from pwcnet_tpu.ops.pallas.pyramid_conv import pyramid_level_fused
from pwcnet_tpu.ops.pallas.warped_cv import (
    warped_cost_volume,
    warped_cost_volume_global,
)

__all__ = [
    "cost_volume_pallas",
    "cost_volume_pallas_hpad",
    "estimator_chain_fused",
    "pyramid_level_fused",
    "warped_cost_volume",
    "warped_cost_volume_global",
]
