"""Parallelism: device mesh construction and sharding rules."""
from .mesh import (  # noqa: F401
    batch_sharding,
    constrain_tokens,
    make_mesh,
    pad_batch_to_dp,
    param_sharding,
    replicated,
    shard_batch,
    sp_size,
    token_sharding,
)
from .distributed import (  # noqa: F401
    global_batch_from_local,
    init_distributed,
    make_global_mesh,
)
