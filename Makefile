# Build plane for prefhetch_tpu (replaces the reference's CMake build,
# reference: CMakeLists.txt — two C++ binaries there; here a python package
# plus a native C++ runtime library).

NATIVE_SRC := native/prefhetch_native.cpp
NATIVE_SO  := native/build/libprefhetch_native.so

.PHONY: all native test bench lint dataset clean

all: native

native: $(NATIVE_SO)

$(NATIVE_SO): $(NATIVE_SRC)
	mkdir -p native/build
	g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread $< -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

lint:
	python scripts/lint.py

dataset:
	python scripts/make_dataset.py --out sift/siftsmall --prefix siftsmall

clean:
	rm -rf native/build bench_cache .jax_cache
