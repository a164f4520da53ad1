"""Device-mesh and sharding utilities."""

from pwcnet_tpu.parallel.spatial import (
    make_spatial_cost_volume,
    make_spatial_guard,
    make_spatial_pyramid_level,
    make_spatial_warped_cv,
)
from pwcnet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    put_global,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_spatial_cost_volume",
    "make_spatial_guard",
    "make_spatial_pyramid_level",
    "make_spatial_warped_cv",
    "make_mesh",
    "batch_sharding",
    "put_global",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
