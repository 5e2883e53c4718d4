# Build/test/bench automation (reference analog: /root/reference/Makefile).

PY ?= python

.PHONY: build test bench benchmark microbench clean lint

# Build the native host runtime (libfqruntime.so); JAX kernels are jitted
# at run time.
build:
	$(PY) fastqpacker_tpu/runtime/build.py

# Profile-guided build: instrument, run a compress/decompress workload
# over both container formats, recompile with the profile (reference
# analog: Makefile:7-10 build-pgo).
build-pgo:
	$(PY) fastqpacker_tpu/runtime/build.py --pgo

test:
	$(PY) -m pytest tests/ -x -q

lint:
	$(PY) -m compileall -q fastqpacker_tpu tests bench.py __graft_entry__.py

# Headline benchmark: prints one JSON line (see bench.py).
bench: build
	$(PY) bench.py --mb 256

# Full metric sweep: compress, decompress, kernel.
benchmark: build
	$(PY) bench.py --mb 256 --metric compress
	$(PY) bench.py --mb 256 --metric decompress
	$(PY) bench.py --mb 64 --metric kernel

# Round-trip verification on generated data (reference: scripts/benchmark.sh
# always verifies with cmp before reporting).
verify: build
	$(PY) scripts/verify_roundtrip.py

clean:
	rm -f fastqpacker_tpu/runtime/libfqruntime.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
