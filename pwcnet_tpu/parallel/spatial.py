"""Spatial (H-axis) parallelism with explicit ICI halo exchange.

Under plain jit, GSPMD partitions the XLA cost volume across the mesh's
``spatial`` axis automatically. This module provides the *explicit*
shard_map formulation so the fused Pallas cost-volume kernel (which GSPMD
cannot partition) also runs spatially sharded:

- each shard holds H/n rows of f0/f1;
- the d halo rows needed by the +-d vertical correlation taps are
  exchanged with the two ring neighbors via `jax.lax.ppermute` over ICI;
- shards at the global top/bottom receive zeros from ppermute's
  non-participating edges — which is exactly the reference cost volume's
  zero-padding boundary condition (modules.py:158-181);
- gradients flow back through the halos automatically (ppermute's
  transpose is the reverse permute; the H-prepadded kernel's custom VJP
  returns uncropped halo-row gradients).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["make_spatial_cost_volume"]


def make_spatial_cost_volume(
    mesh: Mesh,
    axis: str = "spatial",
    batch_axis: Optional[str] = "data",
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Build a cost_volume_fn for H-sharded NHWC activations.

    The returned function is a drop-in for ``PWCDCNet.cost_volume_fn``:
    it shard_maps over (batch_axis, axis) and computes each shard's cost
    volume locally after a two-neighbor halo exchange.
    """
    n_shards = mesh.shape[axis]

    def cv_fn(f0, f1, search_range: int = 4):
        d = int(search_range)
        # Adapt the specs to the actual shapes: replicate the batch when it
        # doesn't divide the data axis (e.g. batch-1 parameter init), and
        # fall back to the GSPMD-partitionable XLA cost volume when a
        # pyramid level's H doesn't divide the spatial axis.
        if f0.shape[1] % n_shards != 0:
            from pwcnet_tpu.ops.cost_volume import cost_volume

            return cost_volume(f0, f1, search_range)
        b_axis = batch_axis
        if b_axis is not None and (
            b_axis not in mesh.shape or f0.shape[0] % mesh.shape[b_axis]
        ):
            b_axis = None
        spec = P(b_axis, axis, None, None)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=spec,
            check_vma=False,
        )
        def _sharded(f0_l, f1_l):
            h_l = f1_l.shape[1]
            if n_shards == 1:
                f1_ext = jnp.pad(f1_l, ((0, 0), (d, d), (0, 0), (0, 0)))
            elif h_l >= d:
                # halo_above = previous shard's last d rows; shard 0 gets
                # zeros (ppermute drops at the ring edge) == global zero pad
                halo_above = jax.lax.ppermute(
                    f1_l[:, -d:],
                    axis,
                    perm=[(r, r + 1) for r in range(n_shards - 1)],
                )
                halo_below = jax.lax.ppermute(
                    f1_l[:, :d],
                    axis,
                    perm=[(r + 1, r) for r in range(n_shards - 1)],
                )
                f1_ext = jnp.concatenate(
                    [halo_above, f1_l, halo_below], axis=1
                )
            else:
                # halo reach exceeds the neighbor shard (coarse pyramid
                # levels hold fewer rows than d): gather the full H and
                # slice this shard's haloed window; the gradient routes
                # back via all_gather's reduce-scatter transpose.
                f1_full = jax.lax.all_gather(
                    f1_l, axis, axis=1, tiled=True
                )
                f1_pad = jnp.pad(f1_full, ((0, 0), (d, d), (0, 0), (0, 0)))
                start = jax.lax.axis_index(axis) * h_l
                f1_ext = jax.lax.dynamic_slice_in_dim(
                    f1_pad, start, h_l + 2 * d, axis=1
                )
            if use_pallas:
                from pwcnet_tpu.ops.pallas.cost_volume import (
                    cost_volume_pallas_hpad,
                )

                return cost_volume_pallas_hpad(
                    f0_l, f1_ext, d, None, interpret
                )
            return _cv_hpad_xla(f0_l, f1_ext, d)

        return _sharded(f0, f1)

    return cv_fn


def _cv_hpad_xla(f0, f1_ext, d):
    """XLA slice formulation over an H-prepadded f1 (autodiff-friendly)."""
    b, h, w, c = f0.shape
    f1p = jnp.pad(f1_ext, ((0, 0), (0, 0), (d, d), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, f0.dtype)
    costs = []
    for v in range(2 * d + 1):
        for u in range(2 * d + 1):
            win = jax.lax.slice(f1p, (0, v, u, 0), (b, v + h, u + w, c))
            costs.append(jnp.sum(f0 * win, axis=3) * inv_c)
    cv = jnp.stack(costs, axis=3)
    return jax.nn.leaky_relu(cv, 0.1)
