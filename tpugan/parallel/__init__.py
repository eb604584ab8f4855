from tpugan.parallel.mesh import (
    auto_mesh,
    make_mesh,
    shard_batch,
    replicate,
    DATA_AXIS,
    SPACE_AXIS,
)

__all__ = [
    "auto_mesh",
    "make_mesh",
    "shard_batch",
    "replicate",
    "DATA_AXIS",
    "SPACE_AXIS",
]
