from dahitra_tpu.core.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from dahitra_tpu.core.state import TrainState

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
    "TrainState",
]
