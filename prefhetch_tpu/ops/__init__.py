from prefhetch_tpu.ops.distances import (  # noqa: F401
    pairwise_sq_l2,
    rank_centroids,
)
from prefhetch_tpu.ops.topk import masked_topk_smallest, topk_select  # noqa: F401
from prefhetch_tpu.ops.kmeans import train_kmeans  # noqa: F401
from prefhetch_tpu.ops.scan import coarse_scan_flat, coarse_scan_pq  # noqa: F401
from prefhetch_tpu.ops.rerank import exact_rerank, fetch_vectors  # noqa: F401
