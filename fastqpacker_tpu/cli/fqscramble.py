"""fqscramble CLI: anonymize FASTQ for benchmarking.

Shuffles bases within each read — preserving base composition, quality
distribution, read lengths, and headers while destroying genomic content —
with a seeded RNG for reproducibility (reference: cmd/fqscramble/main.go).

The shuffle here is vectorized: reads are batched into padded matrices and
permuted with a single argsort of masked random keys per batch, replacing
the reference's per-read Fisher-Yates loop (main.go:152-158). The RNG
differs from Go's PCG, so outputs are not byte-identical to the reference
tool — it is a benchmark-data generator, not a codec — but determinism per
seed is preserved.
"""

from __future__ import annotations

import argparse
import gzip
import io
import sys
from typing import BinaryIO

import numpy as np

from ..parser.fastq import FastqStreamParser


def scramble_stream(
    r: BinaryIO, w: BinaryIO, seed: int = 42, block_size: int = 20000
) -> None:
    rng = np.random.default_rng(seed)
    parser = FastqStreamParser(r, block_size=block_size)
    for blk in parser.blocks():
        if blk.n == 0:
            continue
        L = blk.max_len
        lengths = blk.lengths.astype(np.int64)
        if L > 0:
            keys = rng.random((blk.n, L))
            col = np.arange(L, dtype=np.int64)[None, :]
            keys[col >= lengths[:, None]] = 2.0  # padding sorts last
            perm = np.argsort(keys, axis=1, kind="stable")
            shuffled = np.take_along_axis(blk.seq, perm, axis=1)
        else:
            shuffled = blk.seq

        out = io.BytesIO()
        for i in range(blk.n):
            h, _, p, q = blk.record(i)
            ln = int(lengths[i])
            out.write(b"@" + h + b"\n")
            out.write(shuffled[i, :ln].tobytes() + b"\n")
            out.write(b"+" + p + b"\n")
            out.write(q + b"\n")
        w.write(out.getvalue())


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="fqscramble",
        description="Scramble FASTQ files for privacy-preserving benchmarks",
    )
    p.add_argument("-i", dest="input", default="",
                   help="input FASTQ file (supports .gz)")
    p.add_argument("-o", dest="output", default="",
                   help="output FASTQ file (default: stdout)")
    p.add_argument("-seed", "--seed", type=int, default=42,
                   help="random seed for reproducibility")
    p.add_argument("positional", nargs="*", default=[])
    args = p.parse_args(argv)

    if not args.input and args.positional:
        args.input = args.positional[0]

    if args.input in ("", "-"):
        inp: BinaryIO = sys.stdin.buffer
        close_in = lambda: None  # noqa: E731
    else:
        f = open(args.input, "rb")
        if args.input.endswith(".gz"):
            inp = gzip.GzipFile(fileobj=f)  # type: ignore[assignment]
        else:
            inp = f
        close_in = f.close

    if args.output in ("", "-"):
        out: BinaryIO = sys.stdout.buffer
        close_out = out.flush
    else:
        fo = open(args.output, "wb")
        out = fo
        close_out = fo.close

    try:
        scramble_stream(inp, out, seed=args.seed)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        close_out()
        close_in()
    return 0


if __name__ == "__main__":
    sys.exit(main())
