from prefhetch_tpu.serve.http_server import make_server, serve_forever  # noqa: F401
