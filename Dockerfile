# Container build — parity with the reference's Docker flow
# (reference: Dockerfile builds Drogon+cpr then the project; run flow in
# README.md:36-52 starts server then client in one container).
#
# Compute note: inside a plain container this runs on CPU; on a TPU VM use a
# jax[tpu]-enabled base image instead.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY prefhetch_tpu ./prefhetch_tpu
COPY native ./native
COPY scripts ./scripts
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir "jax[cpu]" numpy flax ml_dtypes && \
    pip install --no-cache-dir -e . --no-deps && \
    mkdir -p native/build && \
    g++ -O3 -std=c++17 -shared -fPIC -pthread \
        native/prefhetch_native.cpp -o native/build/libprefhetch_native.so

# generate a synthetic dataset at the reference operating point
RUN python scripts/make_dataset.py --out sift/siftsmall --prefix siftsmall

EXPOSE 8080
CMD ["python", "-m", "prefhetch_tpu.serve.main", "--dataset-dir", "sift/siftsmall"]
