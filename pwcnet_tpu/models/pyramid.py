"""Feature pyramid extractors.

Two variants, mirroring the reference:

- `FeaturePyramidExtractor` (modules.py:42-71, the "custom" 3-conv variant
  used by PWCDCNet): per level, convs with strides (2,1,1), LeakyReLU(0.1),
  filters [16,32,64,96,128,192]; pyramid returned deep -> shallow.
- `FeaturePyramidExtractorLegacy` (modules.py:19-39): 2 convs/level
  (strides 2,1), otherwise identical.

Conv layers are named ``conv2d``, ``conv2d_1``, ... in TF auto-numbering
order so the parameter tree maps 1:1 onto the reference checkpoints
(``pwcdcnet/fp_extractor/conv2d_k/{kernel,bias}``; see
train_lib/tf_converter.py). Kernels are HWIO 3x3 exactly like TF, so
converted checkpoints load layout-identically.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

DEFAULT_FILTERS = (16, 32, 64, 96, 128, 192)


def _conv_name(idx: int) -> str:
    return "conv2d" if idx == 0 else f"conv2d_{idx}"


class FeaturePyramidExtractor(nn.Module):
    """3-conv-per-level feature pyramid (the PWCDCNet extractor)."""

    num_levels: int = 6
    filters: Sequence[int] = DEFAULT_FILTERS
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> list[jnp.ndarray]:
        x = images
        pyramid = []
        idx = 0
        for level in range(self.num_levels):
            for stride in (2, 1, 1):
                x = nn.Conv(
                    self.filters[level],
                    (3, 3),
                    strides=(stride, stride),
                    padding="SAME",
                    name=_conv_name(idx),
                    dtype=self.dtype,
                    precision=self.precision,
                    kernel_init=nn.initializers.glorot_uniform(),
                )(x)
                x = nn.leaky_relu(x, 0.1)
                idx += 1
            pyramid.append(x)
        return pyramid[::-1]  # deep -> shallow


class FeaturePyramidExtractorLegacy(nn.Module):
    """2-conv-per-level pyramid (the reference's original variant)."""

    num_levels: int = 6
    filters: Sequence[int] = DEFAULT_FILTERS
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> list[jnp.ndarray]:
        x = images
        pyramid = []
        idx = 0
        for level in range(self.num_levels):
            for stride in (2, 1):
                x = nn.Conv(
                    self.filters[level],
                    (3, 3),
                    strides=(stride, stride),
                    padding="SAME",
                    name=_conv_name(idx),
                    dtype=self.dtype,
                    precision=self.precision,
                    kernel_init=nn.initializers.glorot_uniform(),
                )(x)
                x = nn.leaky_relu(x, 0.1)
                idx += 1
            pyramid.append(x)
        return pyramid[::-1]
