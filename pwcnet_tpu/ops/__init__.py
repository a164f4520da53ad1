"""Pure-functional compute ops for pwcnet_tpu."""

from pwcnet_tpu.ops.cost_volume import cost_volume
from pwcnet_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_mm,
    resize_nearest,
    upsample2x_bilinear,
    upsample2x_bilinear_mm,
)
from pwcnet_tpu.ops.warp import bilinear_warp, nearest_warp, warp

__all__ = [
    "cost_volume",
    "resize_bilinear",
    "resize_bilinear_mm",
    "resize_nearest",
    "upsample2x_bilinear",
    "upsample2x_bilinear_mm",
    "bilinear_warp",
    "nearest_warp",
    "warp",
]
