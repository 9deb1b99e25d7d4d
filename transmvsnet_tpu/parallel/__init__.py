from transmvsnet_tpu.parallel.mesh import make_mesh, local_batch_slice
from transmvsnet_tpu.parallel.sharding import (
    sharding_rules,
    constrain,
    shard_batch,
    replicate,
)
