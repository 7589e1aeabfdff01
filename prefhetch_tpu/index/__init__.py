from prefhetch_tpu.index.types import IVFIndex  # noqa: F401
from prefhetch_tpu.index.build import (  # noqa: F401
    build_ivf_index,
    encode_pq,
    load_index,
    save_index,
    train_pq_codebooks,
)
