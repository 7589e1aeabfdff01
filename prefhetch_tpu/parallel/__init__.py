from prefhetch_tpu.parallel.mesh import make_mesh  # noqa: F401
from prefhetch_tpu.parallel.sharded import (  # noqa: F401
    shard_index,
    sharded_coarse_scan,
    sharded_rerank,
    sharded_fetch,
    sharded_kmeans_step,
)
