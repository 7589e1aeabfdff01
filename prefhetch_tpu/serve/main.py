"""Server entrypoint — the reference's ``PreFHEtch_server`` main
(reference: src/server/server.cpp:6-13): init logger → build engine →
train/load index → run web server. Configuration is runtime (JSON file /
flags) instead of compile-time constants.
"""

from __future__ import annotations

import argparse
import os

from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.serve.http_server import serve_forever
from prefhetch_tpu.utils.config import PipelineConfig, REFERENCE_PRESET
from prefhetch_tpu.utils.logging import init_logger


def build_config(args) -> PipelineConfig:
    if args.config:
        with open(args.config) as f:
            cfg = PipelineConfig.from_json(f.read())
    else:
        cfg = REFERENCE_PRESET
    if args.dataset_dir:
        prefix = args.dataset_prefix
        cfg = PipelineConfig(
            index=cfg.index,
            protocol=cfg.protocol,
            nbase=cfg.nbase,
            train_path=os.path.join(args.dataset_dir, f"{prefix}_learn.fvecs"),
            base_path=os.path.join(args.dataset_dir, f"{prefix}_base.fvecs"),
            query_path=os.path.join(args.dataset_dir, f"{prefix}_query.fvecs"),
            groundtruth_path=os.path.join(
                args.dataset_dir, f"{prefix}_groundtruth.ivecs"
            ),
            host=cfg.host,
            port=args.port or cfg.port,
        )
    return cfg


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="prefhetch_tpu server")
    parser.add_argument("--config", help="PipelineConfig JSON file")
    parser.add_argument("--dataset-dir", help="directory with fvecs/ivecs files")
    parser.add_argument("--dataset-prefix", default="siftsmall")
    parser.add_argument("--index-dir", default=".", help="index artifact cache dir")
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument(
        "--batching", action="store_true",
        help="coalesce concurrent requests into shared device batches",
    )
    parser.add_argument(
        "--shard", action="store_true",
        help="shard the index across all visible devices (mesh mode)",
    )
    parser.add_argument(
        "--frontend", choices=("auto", "threaded", "aio", "native"),
        default="auto",
        help="web layer: auto picks the fastest available (native C++ "
             "epoll frontend, falling back to the asyncio event loop); "
             "explicit choices pin one (threaded = reference-parity "
             "stdlib server, native = native/pfh_http.cpp per-batch "
             "Python, highest throughput)",
    )
    args = parser.parse_args(argv)

    init_logger("prefhetch")  # parent logger: engine/serve children propagate
    logger = init_logger("prefhetch.server")
    cfg = build_config(args)
    logger.info(
        "Preparing index with precise dimension d=%d", cfg.index.d
    )
    engine = QueryEngine.get_instance(cfg, index_dir=args.index_dir)
    engine.init_index()
    if args.shard:
        engine.enable_sharding()
    port = args.port or cfg.port
    frontend = args.frontend
    if frontend == "auto":
        # fastest available: native C++ epoll → asyncio → stdlib threaded
        from prefhetch_tpu import native as _native

        if _native.get_http_lib() is not None:
            frontend = "native"
        else:
            frontend = "aio"
        logger.info("frontend auto-selected: %s", frontend)
    if frontend == "native":
        from prefhetch_tpu.serve.native_server import serve_forever_native

        serve_forever_native(engine, cfg.host, port)
    elif frontend == "aio":
        from prefhetch_tpu.serve.aio_server import serve_forever_aio

        serve_forever_aio(
            engine, cfg.host, port, batching=args.batching
        )
    else:
        serve_forever(engine, cfg.host, port, batching=args.batching)


if __name__ == "__main__":
    main()
