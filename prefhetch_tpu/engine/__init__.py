from prefhetch_tpu.engine.server import QueryEngine  # noqa: F401
