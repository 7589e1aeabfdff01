from prefhetch_tpu.models.flat import FlatL2  # noqa: F401
from prefhetch_tpu.models.ivf import IVFFlat, IVFPQ, IVFSQ8  # noqa: F401
