from .mesh import (  # noqa: F401
    DATA_AXIS,
    data_sharding,
    make_mesh,
    replicated,
    replicated_shardings,
    shard_batch,
    zero_shardings,
)
