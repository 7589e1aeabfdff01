#!/usr/bin/env bash
# One-command end-to-end demo: generate data, start the server, run the
# client (plaintext triage + benchmark report), then the encrypted variant.
# Mirrors the reference's README run flow (server then client in one box).
set -euo pipefail
cd "$(dirname "$0")/.."

DIR=${DIR:-/tmp/prefhetch_demo}
PORT=${PORT:-18080}

echo "== dataset =="
python scripts/make_dataset.py --out "$DIR/ds" --prefix siftsmall \
    --nbase 10000 --ntrain 20000 --nquery 100 --d 128

echo "== server (background) =="
python -m prefhetch_tpu.serve.main \
    --dataset-dir "$DIR/ds" --index-dir "$DIR" --port "$PORT" &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT

# index build + first compiles can take several minutes through the remote
# XLA compiler — wait up to ~10 min and fail loudly instead of proceeding
UP=0
for i in $(seq 1 150); do
    if curl -sf --max-time 2 "http://localhost:$PORT/healthz" >/dev/null 2>&1; then
        UP=1
        break
    fi
    sleep 4
done
if [ "$UP" != "1" ]; then
    echo "server failed to come up on port $PORT" >&2
    exit 1
fi

echo "== client (plaintext pipeline) =="
python -m prefhetch_tpu.client.driver --dataset-dir "$DIR/ds" \
    --server "http://localhost:$PORT/"

echo "== client (encrypted re-rank) =="
python - <<EOF
import json
from prefhetch_tpu.serve.main import build_config
import argparse
ns = argparse.Namespace(config=None, dataset_dir="$DIR/ds",
                        dataset_prefix="siftsmall", port=$PORT)
cfg = build_config(ns)
import dataclasses
cfg = dataclasses.replace(
    cfg, protocol=dataclasses.replace(cfg.protocol, encrypted_rerank=True)
)
open("$DIR/enc.json", "w").write(cfg.to_json())
EOF
python -m prefhetch_tpu.client.driver --config "$DIR/enc.json" \
    --server "http://localhost:$PORT/"

echo "== server stats =="
curl -s "http://localhost:$PORT/stats"
echo
