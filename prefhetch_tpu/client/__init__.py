from prefhetch_tpu.client.pipeline import ClientPipeline, DistanceIndexData  # noqa: F401
