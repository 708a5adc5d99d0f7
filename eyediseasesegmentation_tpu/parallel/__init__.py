from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_device_count,
)
from .spatial import (
    halo_exchange,
    conv3x3_spatial,
    pool2x_spatial,
    upsample2x_spatial,
    spatial_predict,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_device_count",
    "halo_exchange",
    "conv3x3_spatial",
    "pool2x_spatial",
    "upsample2x_spatial",
    "spatial_predict",
]
