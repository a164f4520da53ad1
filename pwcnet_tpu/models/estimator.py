"""Per-level optical-flow estimator CNNs.

- `FlowEstimator` mirrors the reference's `OpticalFlowEstimator_custom`
  (modules.py:227-285): concat(cv, features_0, flows_up_prev,
  features_up_prev — skipping absent inputs), 5 convs [128,128,96,64,32]
  with LeakyReLU(0.1) and optional dense connections, a 2-channel flow conv,
  and a residual add of the upsampled previous flow. The reference's
  in-estimator 2x upsampling (modules.py:282-285) is hoisted into PWCDCNet
  so this module stays jax.checkpoint-able.
- `FlowEstimatorLegacy` mirrors `OpticalFlowEstimator` (modules.py:208-224):
  conv blocks with LeakyReLU(0.2) and optional BatchNorm.

Conv naming follows TF auto-numbering within each estimator scope
(conv2d .. conv2d_5) for checkpoint-tree parity.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


DEFAULT_EST_FILTERS = (128, 128, 96, 64, 32)


def _conv_name(idx: int) -> str:
    return "conv2d" if idx == 0 else f"conv2d_{idx}"


class FlowEstimator(nn.Module):
    """Dense-connectable flow estimator (PWCDCNet variant).

    ``fused``: compute the whole 6-conv chain with the fused Pallas
    kernel (`ops.pallas.estimator_conv`) instead of six XLA convs —
    same math, same parameter tree; see docs/DESIGN.md. Ignored (XLA
    path) when ``use_dc`` or an explicit ``precision`` is set, which the
    kernel does not implement."""

    use_dc: bool = False
    filters: Sequence[int] = DEFAULT_EST_FILTERS
    dtype: Any = jnp.float32
    precision: Any = None
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        cv: jnp.ndarray,
        features_0: Optional[jnp.ndarray] = None,
        flows_up_prev: Optional[jnp.ndarray] = None,
        features_up_prev: Optional[jnp.ndarray] = None,
    ):
        """Returns ``(flows, features)``; the caller upsamples both by 2x
        at non-output levels (the reference folded that upsampling into the
        estimator, modules.py:282-285 — hoisting it keeps this module free
        of boolean-shaped control flow so it can be jax.checkpoint-ed)."""
        features = cv
        for extra in (features_0, flows_up_prev, features_up_prev):
            if extra is not None:
                features = jnp.concatenate([features, extra], axis=3)

        if self.fused and not self.use_dc and self.precision is None:
            from pwcnet_tpu.models.pyramid import _ConvParams
            from pwcnet_tpu.ops.pallas.estimator_conv import (
                estimator_chain_fused,
            )

            kbs = []
            cin = features.shape[-1]
            for i, f in enumerate((*self.filters, 2)):
                kbs.extend(
                    _ConvParams(
                        features=f,
                        in_features=cin,
                        dtype=self.dtype,
                        name=_conv_name(i),
                    )()
                )
                cin = f
            flows, features = estimator_chain_fused(
                features.astype(self.dtype), *kbs
            )
            if flows_up_prev is not None:
                flows = flows + flows_up_prev
            return flows, features

        idx = 0
        for f in self.filters:
            conv = nn.Conv(
                f,
                (3, 3),
                padding="SAME",
                name=_conv_name(idx),
                dtype=self.dtype,
                precision=self.precision,
                kernel_init=nn.initializers.glorot_uniform(),
            )(features)
            conv = nn.leaky_relu(conv, 0.1)
            features = (
                jnp.concatenate([conv, features], axis=3) if self.use_dc else conv
            )
            idx += 1

        flows = nn.Conv(
            2,
            (3, 3),
            padding="SAME",
            name=_conv_name(idx),
            dtype=self.dtype,
            precision=self.precision,
            kernel_init=nn.initializers.glorot_uniform(),
        )(features)
        if flows_up_prev is not None:
            flows = flows + flows_up_prev  # residual coarse-to-fine refinement
        return flows, features


class FlowEstimatorLegacy(nn.Module):
    """Original-variant estimator: LeakyReLU(0.2) conv blocks, optional BN."""

    batch_norm: bool = False
    filters: Sequence[int] = DEFAULT_EST_FILTERS
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(
        self,
        cost: jnp.ndarray,
        x: jnp.ndarray,
        flow: jnp.ndarray,
        train: bool = False,
    ):
        h = jnp.concatenate([cost, x, flow.astype(self.dtype)], axis=3)
        idx = 0
        for f in self.filters:
            h = nn.Conv(
                f,
                (3, 3),
                padding="SAME",
                name=_conv_name(idx),
                dtype=self.dtype,
                precision=self.precision,
                kernel_init=nn.initializers.glorot_uniform(),
            )(h)
            if self.batch_norm:
                h = nn.BatchNorm(
                    use_running_average=not train,
                    name=f"bn_{idx}",
                    dtype=self.dtype,
                )(h)
            h = nn.leaky_relu(h, 0.2)
            idx += 1
        feature = h
        flow_out = nn.Conv(
            2,
            (3, 3),
            padding="SAME",
            name=_conv_name(idx),
            dtype=self.dtype,
            precision=self.precision,
            kernel_init=nn.initializers.glorot_uniform(),
        )(feature)
        return feature, flow_out
