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
# The leg PASSES iff pytest passes AND no sanitizer report involves
# libfqruntime.so. jaxlib's uninstrumented Eigen/llvm thread pools emit
# reports TSan cannot always attribute (a destroyed pool mutex has no
# creation stack for a mutex: suppression to match), so halting on every
# report makes the leg flaky on noise that says nothing about our MT
# runtime. External reports are counted and ignored; any report that
# names our library fails the build. The PGO restore ALWAYS runs — a
# failed leg must not leave the instrumented .so behind.
test-tsan:
	$(PY) fastqpacker_tpu/runtime/build.py --tsan
	rm -f /tmp/fqz_tsan_log.*
	-LD_PRELOAD=$$($(CXXBIN) -print-file-name=libtsan.so) \
	TSAN_OPTIONS="halt_on_error=0 exitcode=0 report_signal_unsafe=0 allocator_may_return_null=1 suppressions=tests/tsan.supp log_path=/tmp/fqz_tsan_log" \
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu FQZ_SANITIZE=1 \
	$(PY) -m pytest tests/test_mt_pipeline.py tests/test_fuzz.py tests/test_native_format.py -x -q; \
	echo $$? > /tmp/fqz_tsan_rc
	$(PY) fastqpacker_tpu/runtime/build.py --pgo  # ALWAYS restore production build
	@rc=$$(cat /tmp/fqz_tsan_rc); if [ "$$rc" != "0" ]; then echo "test-tsan: pytest failed ($$rc)"; exit 1; fi
	@if grep -l libfqruntime /tmp/fqz_tsan_log.* >/dev/null 2>&1; then \
	  echo "test-tsan: sanitizer report involves libfqruntime:"; \
	  grep -l libfqruntime /tmp/fqz_tsan_log.*; exit 1; fi
	@echo "test-tsan OK ($$(ls /tmp/fqz_tsan_log.* 2>/dev/null | wc -l) external-library reports ignored)"

test-asan:
	$(PY) fastqpacker_tpu/runtime/build.py --asan
	rm -f /tmp/fqz_asan_log.*
	-LD_PRELOAD=$$($(CXXBIN) -print-file-name=libasan.so) \
	ASAN_OPTIONS="detect_leaks=0 halt_on_error=0 allocator_may_return_null=1 log_path=/tmp/fqz_asan_log exitcode=0" \
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu FQZ_SANITIZE=1 \
	$(PY) -m pytest tests/test_mt_pipeline.py tests/test_fuzz.py tests/test_native_format.py -x -q; \
	echo $$? > /tmp/fqz_asan_rc
	$(PY) fastqpacker_tpu/runtime/build.py --pgo  # ALWAYS restore production build
	@rc=$$(cat /tmp/fqz_asan_rc); if [ "$$rc" != "0" ]; then echo "test-asan: pytest failed ($$rc)"; exit 1; fi
	@if grep -l libfqruntime /tmp/fqz_asan_log.* >/dev/null 2>&1; then \
	  echo "test-asan: sanitizer report involves libfqruntime:"; \
	  grep -l libfqruntime /tmp/fqz_asan_log.*; exit 1; fi
	@echo "test-asan OK ($$(ls /tmp/fqz_asan_log.* 2>/dev/null | wc -l) external-library reports ignored)"

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
