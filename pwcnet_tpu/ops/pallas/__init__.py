"""Pallas TPU kernels for the hot ops."""

from pwcnet_tpu.ops.pallas.cost_volume import (
    cost_volume_pallas,
    cost_volume_pallas_hpad,
)

__all__ = ["cost_volume_pallas", "cost_volume_pallas_hpad"]
