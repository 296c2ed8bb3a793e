from matinvent_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
from matinvent_tpu.parallel.train import FinetuneStep

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding", "FinetuneStep"]
