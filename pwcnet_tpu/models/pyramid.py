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


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's exact tree (kernel HWIO + bias)
    for levels computed by the fused Pallas kernel — keeps the TF
    checkpoint mapping (`conv2d_k/{kernel,bias}`) unchanged."""

    features: int
    in_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (3, 3, self.in_features, self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        return kernel.astype(self.dtype), bias.astype(self.dtype)


class FeaturePyramidExtractor(nn.Module):
    """3-conv-per-level feature pyramid (the PWCDCNet extractor).

    ``fused_levels``: compute the first N (finest) levels with the fused
    Pallas kernel (`ops.pallas.pyramid_conv`) instead of three XLA convs —
    same math and the same parameter tree; see docs/DESIGN.md."""

    num_levels: int = 6
    filters: Sequence[int] = DEFAULT_FILTERS
    dtype: Any = jnp.float32
    precision: Any = None
    fused_levels: int = 0
    # override for the fused 3-conv chain, e.g. the spatially-sharded
    # shard_map wrapper (parallel.make_spatial_pyramid_level); same
    # (x, k1, b1, k2, b2, k3, b3) signature as pyramid_level_fused
    level_fn: Any = None
    # spatial-sharding guard (parallel.make_spatial_guard): unshards a
    # level's input when the level's OUTPUT (input H / 2) would hold
    # fewer than 4 rows per spatial shard — GSPMD miscompiles tiny-level
    # conv gradients on (data x spatial) meshes (parallel/spatial.py)
    level_guard_fn: Any = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> list[jnp.ndarray]:
        x = images
        pyramid = []
        idx = 0
        for level in range(self.num_levels):
            if self.level_guard_fn is not None:
                x = self.level_guard_fn(x, 8)
            # the fused kernel always multiplies model-dtype operands with
            # f32 accumulation; an explicit `precision` request (e.g.
            # 'highest') must keep the nn.Conv path so it takes effect
            if level < self.fused_levels and self.precision is None:
                from pwcnet_tpu.ops.pallas.pyramid_conv import (
                    pyramid_level_fused,
                )

                level_fn = self.level_fn or pyramid_level_fused
                kbs = []
                cin = x.shape[-1]
                for _ in range(3):
                    kbs.extend(
                        _ConvParams(
                            features=self.filters[level],
                            in_features=cin,
                            dtype=self.dtype,
                            name=_conv_name(idx),
                        )()
                    )
                    cin = self.filters[level]
                    idx += 1
                x = level_fn(x.astype(self.dtype), *kbs)
                pyramid.append(x)
                continue
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
