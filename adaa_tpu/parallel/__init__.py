"""Device-mesh parallelism (SPMD data parallel)."""
from adaa_tpu.parallel.mesh import (  # noqa: F401
    data_parallel_attack_fn,
    make_mesh,
    replicate,
    shard_batch,
)
