"""flax.linen model definitions for pwcnet_tpu."""

from pwcnet_tpu.models.context import ContextNetwork
from pwcnet_tpu.models.estimator import FlowEstimator, FlowEstimatorLegacy
from pwcnet_tpu.models.pwcnet import PWCDCNet, PWCNet, flow_scales
from pwcnet_tpu.models.pyramid import (
    FeaturePyramidExtractor,
    FeaturePyramidExtractorLegacy,
)

__all__ = [
    "ContextNetwork",
    "FlowEstimator",
    "FlowEstimatorLegacy",
    "PWCDCNet",
    "PWCNet",
    "flow_scales",
    "FeaturePyramidExtractor",
    "FeaturePyramidExtractorLegacy",
]
