from prefhetch_tpu.data.io import read_fvecs, read_ivecs, write_fvecs, write_ivecs, vecs_read  # noqa: F401
from prefhetch_tpu.data.synthetic import make_clustered_dataset, write_sift_style_dataset  # noqa: F401
