"""Mesh construction and batch sharding.

The reference is strictly single-device (SURVEY.md §2.5). Here scaling is
first-class: a `jax.sharding.Mesh` with a ``data`` axis (data parallelism —
gradients all-reduce over ICI via XLA-inserted psum) and an optional
``spatial`` axis (H-dimension sharding of the input images, the CNN
analogue of sequence/context parallelism; XLA inserts halo exchanges for
the 3x3 convs and cost-volume shifts automatically under jit).

Everything runs through `jax.jit` with NamedSharding constraints — no
hand-written collectives are needed for the standard paths.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "replicate",
    "shard_batch",
    "put_global",
]


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    spatial: int = 1,
) -> Mesh:
    """Build a (data, spatial) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // spatial
    if data * spatial != n:
        raise ValueError(
            f"data({data}) * spatial({spatial}) != #devices({n})"
        )
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for a batch-leading array; optionally shard H over 'spatial'.

    ``spatial_dim`` is the index of the H axis in the array (e.g. 2 for
    (B, 2, H, W, 3) image pairs, 1 for (B, H, W, 2) flow).
    """
    if spatial_dim is None or mesh.shape.get("spatial", 1) == 1:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (spatial_dim + 1)
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Pin a pytree (e.g. the TrainState) replicated onto the mesh.

    Explicitly placing the state (instead of letting GSPMD infer it from
    single-device inputs) keeps the train step's SPMD log free of
    involuntary-rematerialization reshardings on data x spatial meshes.
    Multi-process: each process holds the identical full value, so the
    global array is assembled from the process-local copy."""
    rep = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, rep)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(x)
        ),
        tree,
    )


def put_global(x, sharding: NamedSharding):
    """Place a host batch under ``sharding``, multi-process aware.

    Single process: plain ``device_put``. Multi-process (after
    ``jax.distributed.initialize``): ``x`` is this process's share of the
    global batch — the loader already yields a disjoint per-process slice
    (`data/pipeline.py` process_index/process_count) — and the global
    array is assembled with ``make_array_from_process_local_data`` (batch
    grows by process_count along axis 0; processes own contiguous device
    blocks in ``make_mesh``'s jax.devices() ordering).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    global_shape = (x.shape[0] * jax.process_count(),) + tuple(x.shape[1:])
    return jax.make_array_from_process_local_data(sharding, x, global_shape)


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """device_put an (images, flows) host batch into its mesh layout."""
    images, flows = batch
    img_sh = batch_sharding(mesh, 2 if spatial else None)
    flo_sh = batch_sharding(mesh, 1 if spatial else None)
    return (
        put_global(images, img_sh),
        put_global(flows, flo_sh),
    )
