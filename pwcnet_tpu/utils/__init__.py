"""I/O, visualization, and experiment utilities."""

from pwcnet_tpu.utils.config import (
    ExperimentSaver,
    save_config,
    show_progress,
    timestamp,
)
from pwcnet_tpu.utils.flo_io import FLO_MAGIC, load_flow, save_flow
from pwcnet_tpu.utils.profiling import device_timeit, flops_estimate, trace
from pwcnet_tpu.utils.flow_viz import (
    flow_to_color,
    make_colorwheel,
    vis_flow,
    vis_flow_pyramid,
)

__all__ = [
    "ExperimentSaver",
    "save_config",
    "show_progress",
    "timestamp",
    "FLO_MAGIC",
    "load_flow",
    "save_flow",
    "device_timeit",
    "flops_estimate",
    "trace",
    "flow_to_color",
    "make_colorwheel",
    "vis_flow",
    "vis_flow_pyramid",
]
