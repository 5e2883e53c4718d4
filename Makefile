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

# Sanitizer legs for the 3k-line MT C++ runtime — the analog of the
# reference's `go test -race` (Makefile:13-14, ci.yml:22). Each builds an
# instrumented libfqruntime.so, hammers the MT + fuzz suites under the
# preloaded sanitizer runtime, then restores the production build.
CXXBIN ?= g++
test-tsan:
	$(PY) fastqpacker_tpu/runtime/build.py --tsan
	LD_PRELOAD=$$($(CXXBIN) -print-file-name=libtsan.so) \
	TSAN_OPTIONS="halt_on_error=1 report_signal_unsafe=0 allocator_may_return_null=1" \
	JAX_PLATFORMS=cpu FQZ_SANITIZE=1 \
	$(PY) -m pytest tests/test_mt_pipeline.py tests/test_fuzz.py -x -q
	$(PY) fastqpacker_tpu/runtime/build.py --pgo  # restore the production (PGO) build

test-asan:
	$(PY) fastqpacker_tpu/runtime/build.py --asan
	LD_PRELOAD=$$($(CXXBIN) -print-file-name=libasan.so) \
	ASAN_OPTIONS="detect_leaks=0 halt_on_error=1 allocator_may_return_null=1" \
	JAX_PLATFORMS=cpu FQZ_SANITIZE=1 \
	$(PY) -m pytest tests/test_mt_pipeline.py tests/test_fuzz.py -x -q
	$(PY) fastqpacker_tpu/runtime/build.py --pgo  # restore the production (PGO) build

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
