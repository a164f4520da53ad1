"""Host-side data loading for pwcnet_tpu."""

from pwcnet_tpu.data.datasets import (
    FlowDataset,
    FlyingChairs,
    SintelClean,
    SintelFinal,
    SyntheticFlow,
    get_dataset,
)
from pwcnet_tpu.data.pipeline import DataLoader, device_prefetch

__all__ = [
    "FlowDataset",
    "FlyingChairs",
    "SintelClean",
    "SintelFinal",
    "SyntheticFlow",
    "get_dataset",
    "DataLoader",
    "device_prefetch",
]
