"""Fresh-seed fuzz campaign over the container and parser surfaces.

tests/test_fuzz.py pins its seeds so CI is deterministic; formats
evolve, so each round re-runs the same mutation classes with a FRESH
random seed at higher volume (ROADMAP "periodic re-fuzz" item). Any
non-typed exception (everything except the codec's own error types) or
a decode that dwells past the time box (the E048 retry-bomb class) is a
failure.

Usage: python scripts/fuzz_campaign.py [--trials 400] [--seed N]
       (seed defaults to entropy; it is PRINTED so failures reproduce)
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TYPED = None  # set in main after imports


def _fastq(rng, n, long_reads=False):
    recs = []
    for i in range(n):
        ln = int(rng.integers(1, 3000 if long_reads else 200))
        seq = rng.choice(
            np.frombuffer(b"ACGTNacgtn", np.uint8), ln
        ).tobytes()
        qual = (33 + rng.integers(0, 70, ln).astype(np.uint8)).tobytes()
        plus = b"+x" if rng.random() < 0.2 else b"+"
        recs.append(b"@r%d\n%s\n%s\n%s\n" % (i, seq, plus, qual))
    return b"".join(recs)


def _decode_expect_typed(fq, comp, budget_s=20.0):
    t0 = time.perf_counter()
    try:
        fq.decompress_bytes(comp)
    except TYPED:
        pass
    dt = time.perf_counter() - t0
    if dt > budget_s:
        raise AssertionError(
            f"decode dwelled {dt:.1f}s on a mutated container "
            "(retry-bomb class)"
        )


def main() -> int:
    global TYPED
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=400)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()
    seed = (
        args.seed
        if args.seed is not None
        else int.from_bytes(os.urandom(4), "little")
    )
    print(f"fuzz campaign seed={seed}", flush=True)
    rng = np.random.default_rng(seed)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import fastqpacker_tpu as fq
    from fastqpacker_tpu.format import container
    from fastqpacker_tpu.ops import rans, wctx
    from fastqpacker_tpu.parser import fastq as fqparser

    TYPED = (
        container.FormatError,
        fq.FastqError if hasattr(fq, "FastqError") else ValueError,
        ValueError,
        RuntimeError,
        rans.RansError,
        wctx.WctxError,
        EOFError,
    )

    n_mut = 0
    t_start = time.perf_counter()
    for trial in range(args.trials):
        kind = trial % 5
        if kind == 0:
            # v2 container mutations
            data = _fastq(rng, int(rng.integers(1, 400)))
            comp = fq.compress_bytes(data)
            for _ in range(8):
                b = bytearray(comp)
                for _ in range(int(rng.integers(1, 5))):
                    b[int(rng.integers(0, len(b)))] = int(
                        rng.integers(0, 256)
                    )
                _decode_expect_typed(fq, bytes(b))
                n_mut += 1
        elif kind == 1:
            # v3 container mutations (context coders engaged for some)
            data = _fastq(rng, int(rng.integers(1, 400)))
            comp = fq.compress_bytes(
                data,
                fq.Options(version=container.VERSION_3_NATIVE),
            )
            for _ in range(8):
                b = bytearray(comp)
                for _ in range(int(rng.integers(1, 5))):
                    b[int(rng.integers(0, len(b)))] = int(
                        rng.integers(0, 256)
                    )
                _decode_expect_typed(fq, bytes(b))
                n_mut += 1
        elif kind == 2:
            # truncations at random points, both formats
            data = _fastq(rng, int(rng.integers(1, 200)))
            for ver in (
                container.CURRENT_VERSION,
                container.VERSION_3_NATIVE,
            ):
                comp = fq.compress_bytes(data, fq.Options(version=ver))
                for _ in range(6):
                    cut = int(rng.integers(0, len(comp)))
                    _decode_expect_typed(fq, comp[:cut])
                    n_mut += 1
        elif kind == 3:
            # malformed FASTQ text: typed parse errors only
            data = bytearray(_fastq(rng, int(rng.integers(1, 200))))
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256)
                )
            try:
                comp = fq.compress_bytes(bytes(data))
                # a mutation that stayed valid must round-trip
                out = fq.decompress_bytes(comp)
                norm = fq.compress_bytes(out)
                assert fq.decompress_bytes(norm) == out
            except TYPED:
                pass
            n_mut += 1
        else:
            # big text -> resync framing path; mutations must either
            # fail typed or round-trip byte-exactly
            data = bytearray(_fastq(rng, 2500, long_reads=True))
            if len(data) < (4 << 20):
                data = bytearray(bytes(data) * ((4 << 20) // len(data) + 1))
            for _ in range(int(rng.integers(0, 4))):
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256)
                )
            try:
                comp = fq.compress_bytes(bytes(data))
                assert fq.compress_bytes is not None
                out = fq.decompress_bytes(comp)
                # compressing the decode again must be stable
                assert fq.decompress_bytes(fq.compress_bytes(out)) == out
            except TYPED:
                pass
            n_mut += 1
        if trial and trial % 50 == 0:
            print(
                f"  trial {trial}/{args.trials} ({n_mut} mutations, "
                f"{time.perf_counter() - t_start:.0f}s)",
                flush=True,
            )
    print(
        f"PASS: {n_mut} mutations across {args.trials} trials, seed={seed}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
