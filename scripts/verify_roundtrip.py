#!/usr/bin/env python
"""Round-trip verification harness.

The reference's benchmark scripts refuse to report numbers without a
byte-exact round-trip check (scripts/benchmark.sh:103-107,
benchmark_fqpack_9gb.sh:73-77); this is the same gate for the TPU build:
compress -> decompress -> byte compare, for both container flavors and
both backends, on generated and sample data.
"""

import io
import os
import sys

# Correctness gate, not a perf gate: run on CPU so it is fast everywhere
# (first-time TPU compiles through a remote compiler can take minutes).
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import fastqpacker_tpu as fq  # noqa: E402
from fastqpacker_tpu.format import container  # noqa: E402
from fastqpacker_tpu.pipeline import native  # noqa: E402


def check(name: str, data: bytes, comp: bytes) -> bool:
    out = fq.decompress_bytes(comp)
    ok = out == data
    ratio = len(data) / max(len(comp), 1)
    status = "OK " if ok else "FAIL"
    print(f"[{status}] {name}: {len(data)} -> {len(comp)} bytes ({ratio:.2f}x)")
    return ok


def main() -> int:
    from bench import synth_fastq

    sample = open("/root/reference/testdata/sample.fq", "rb").read() if os.path.exists(
        "/root/reference/testdata/sample.fq"
    ) else None
    synthetic = synth_fastq(16)

    ok = True
    if sample:
        ok &= check("sample.fq v2/zstd", sample, fq.compress_bytes(sample))
    ok &= check("synthetic 16MB v2/zstd", synthetic, fq.compress_bytes(synthetic))

    out = io.BytesIO()
    native.compress_native(
        io.BytesIO(synthetic),
        out,
        fq.Options(version=container.VERSION_3_NATIVE),
    )
    ok &= check("synthetic 16MB v3/native-rANS", synthetic, out.getvalue())

    print("ALL OK" if ok else "VERIFICATION FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
