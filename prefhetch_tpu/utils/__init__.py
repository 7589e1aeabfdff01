from prefhetch_tpu.utils.config import (  # noqa: F401
    IndexParams,
    ProtocolParams,
    PipelineConfig,
    REFERENCE_PRESET,
    SIFT1M_PRESET,
)
from prefhetch_tpu.utils.timer import Timer  # noqa: F401
