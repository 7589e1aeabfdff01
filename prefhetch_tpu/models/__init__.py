from prefhetch_tpu.models.flat import FlatL2  # noqa: F401
from prefhetch_tpu.models.ivf import IVFFlat, IVFPQ  # noqa: F401
