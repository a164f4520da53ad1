"""Dilated-convolution context network (reference modules.py:290-326).

concat(flows, features) -> 7 3x3 convs with filters [128,128,128,96,64,32,2]
and dilation rates [1,2,4,8,16,1,1], LeakyReLU(0.1) on all but the last,
then a residual add onto the input flow.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

CONTEXT_FILTERS = (128, 128, 128, 96, 64, 32, 2)
CONTEXT_DILATIONS = (1, 2, 4, 8, 16, 1, 1)


class ContextNetwork(nn.Module):
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, flows: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([flows, features], axis=3)
        n = len(CONTEXT_FILTERS)
        for idx, (f, d) in enumerate(zip(CONTEXT_FILTERS, CONTEXT_DILATIONS)):
            x = nn.Conv(
                f,
                (3, 3),
                padding="SAME",
                kernel_dilation=(d, d),
                name="conv2d" if idx == 0 else f"conv2d_{idx}",
                dtype=self.dtype,
                precision=self.precision,
                kernel_init=nn.initializers.glorot_uniform(),
            )(x)
            if idx < n - 1:
                x = nn.leaky_relu(x, 0.1)
        return flows + x
