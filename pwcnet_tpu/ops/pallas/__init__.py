"""Pallas TPU kernels for the hot ops."""

from pwcnet_tpu.ops.pallas.cost_volume import cost_volume_pallas

__all__ = ["cost_volume_pallas"]
