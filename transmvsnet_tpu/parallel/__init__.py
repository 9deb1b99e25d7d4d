from transmvsnet_tpu.parallel.mesh import initialize_distributed, make_mesh
from transmvsnet_tpu.parallel.sharding import (
    sharding_rules,
    constrain,
    shard_batch,
    replicate,
)
