"""Whole-file native v3 MT compress (fq_compress_mt with version=3, E080).

The MT path must produce byte-identical containers to the Python
per-block path under equal framing (FQZ_MT_SEQ_FRAMING=1 pins the exact
newline-count scanner to the parser's record framing), must round-trip
under its own default resync framing, must FALLBACK — writing nothing —
whenever block 0's coverage probe would make the Python path build a
FLAG_SEQ_DICT container, and must surface the same typed errors as the
per-block path (reference error strings: parser.go:70,88,180).
"""

import io
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container
from fastqpacker_tpu.pipeline import api, native
from fastqpacker_tpu.runtime import bindings

pytestmark = pytest.mark.skipif(
    not (
        bindings.available()
        and bindings.mt_available()
        and bindings.compress_mt_v3_available()
    ),
    reason="native v3 MT compress not built",
)


def _v3_opts(**kw):
    return api.Options(version=container.VERSION_3_NATIVE, **kw)


def _fastq(n: int, seed: int = 0, read_len: int = 60) -> bytes:
    """IID bases incl. N runs, varying lengths, random-ish qualities."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    out = []
    for i in range(n):
        ln = read_len + int(rng.integers(-5, 6))
        seq = bases[rng.integers(0, 5, ln)].tobytes()
        qual = (rng.integers(33, 74, ln).astype(np.uint8)).tobytes()
        out.append(b"@read%d x:%d\n%s\n+\n%s\n" % (i, i % 7, seq, qual))
    return b"".join(out)


def _context_fastq(n: int, seed: int = 1, read_len: int = 120) -> bytes:
    """Correlated corpus where the context models (sctx/qctx) win the
    picks: order-1 Markov-ish bases + per-record random-walk qualities —
    the bench.py markov fixture's statistics, locally generated."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    # strongly biased next-base transition: 70% "stay", rest spread
    total = n * read_len
    steps = rng.integers(0, 10, total)
    delta = np.where(steps < 7, 0, steps - 6).astype(np.uint8)  # 0..3
    codes = np.cumsum(delta, dtype=np.uint64).astype(np.uint8) & 3
    seqmat = bases[codes.reshape(n, read_len)]
    qsteps = rng.integers(-2, 3, size=(n, read_len)).astype(np.int32)
    qual = np.clip(33 + 30 + np.cumsum(qsteps, axis=1) // 3, 33, 74).astype(
        np.uint8
    )
    out = []
    for i in range(n):
        out.append(
            b"@ctx%d\n%s\n+\n%s\n"
            % (i, seqmat[i].tobytes(), qual[i].tobytes())
        )
    return b"".join(out)


def _coverage_fastq(n: int, seed: int = 2, read_len: int = 100) -> bytes:
    """Genome-sampled reads at high coverage: the block-0 probe fires."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    glen = max(n * read_len // 15, read_len + 1)
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    out = []
    for i in range(n):
        s = int(rng.integers(0, glen - read_len))
        seq = bases[genome[s : s + read_len]].tobytes()
        qual = (rng.integers(33, 74, read_len).astype(np.uint8)).tobytes()
        out.append(b"@cov%d\n%s\n+\n%s\n" % (i, seq, qual))
    return b"".join(out)


def _python_compress(data: bytes, opts=None) -> bytes:
    """Reference output: the per-block v3 path with MT routing disabled."""
    out = io.BytesIO()
    real = bindings.compress_mt_v3_available
    bindings.compress_mt_v3_available = lambda: False
    try:
        native.compress_native(io.BytesIO(data), out, opts or _v3_opts())
    finally:
        bindings.compress_mt_v3_available = real
    return out.getvalue()


def _mt_compress(data: bytes, opts=None, exact_framing=True) -> bytes:
    out = io.BytesIO()
    if exact_framing:
        os.environ["FQZ_MT_SEQ_FRAMING"] = "1"
    try:
        native.compress_native(io.BytesIO(data), out, opts or _v3_opts())
    finally:
        os.environ.pop("FQZ_MT_SEQ_FRAMING", None)
    return out.getvalue()


@pytest.mark.parametrize(
    "gen", [_fastq, _context_fastq], ids=["iid", "context"]
)
def test_mt_v3_byte_identical_to_python_path(gen):
    # workers=1 pins the PickMemo probe sequence on both paths
    data = gen(30000)
    opts = _v3_opts(workers=1)
    py = _python_compress(data, opts)
    mt = _mt_compress(data, opts)
    assert mt == py
    assert fq.decompress_bytes(mt) == data


def test_mt_v3_default_framing_round_trips():
    data = _fastq(120000, seed=3)
    comp = _mt_compress(data, _v3_opts(), exact_framing=False)
    assert fq.decompress_bytes(comp) == data


def test_mt_v3_fd_and_buffer_sinks_identical(tmp_path):
    data = _fastq(20000, seed=4)
    buf = _mt_compress(data, _v3_opts(workers=1))
    path = tmp_path / "out.fqz"
    os.environ["FQZ_MT_SEQ_FRAMING"] = "1"
    try:
        with open(path, "wb") as w:
            native.compress_native(
                io.BytesIO(data), w, _v3_opts(workers=1)
            )
    finally:
        os.environ.pop("FQZ_MT_SEQ_FRAMING", None)
    assert path.read_bytes() == buf


def test_mt_v3_dict_probe_falls_back():
    """Multi-block coverage data: the native call returns None without
    writing a byte (the Python path owns FLAG_SEQ_DICT containers); a
    SINGLE-block coverage file builds no dict on any path, so the
    native call keeps it (E086)."""
    data = _coverage_fastq(40000)
    sink1 = io.BytesIO()
    res = bindings.compress_mt(
        np.frombuffer(data, np.uint8),
        100000,  # one block: no dict possible -> accepted
        container.VERSION_3_NATIVE,
        0,
        2,
        -1,
        sink=sink1,
    )
    assert res is not None and res == len(sink1.getvalue())
    assert fq.decompress_bytes(sink1.getvalue()) == data
    res = bindings.compress_mt(
        np.frombuffer(data, np.uint8),
        8000,  # multi-block: the dict probe must bounce to Python
        container.VERSION_3_NATIVE,
        0,
        2,
        -1,
        sink=io.BytesIO(),
    )
    assert res is None
    # multi-block (-b 8000): the Python path builds the dict section
    opts = _v3_opts(workers=1, block_size=8000)
    mt = _mt_compress(data, opts)
    py = _python_compress(data, opts)
    assert mt == py
    fh = container.read_file_header(io.BytesIO(mt))
    assert fh.flags & container.FLAG_SEQ_DICT
    assert fq.decompress_bytes(mt) == data


def test_mt_v3_dict_mode_byte_identical(monkeypatch):
    """E087: the whole-file MT dict-mode compress (Python decides the
    dict, C++ runs the parallel per-block encode with the prefix) is
    byte-identical to the per-block Python dict path."""
    data = _coverage_fastq(12000)
    opts = _v3_opts(workers=2, block_size=3000)  # 4 blocks -> dict
    mt = _mt_compress(data, opts)  # routes through compress_native
    fh = container.read_file_header(io.BytesIO(mt))
    assert fh.flags & container.FLAG_SEQ_DICT
    monkeypatch.setattr(
        bindings, "compress_mt_dict_available", lambda: False
    )
    py = _python_compress(data, opts)
    assert mt == py
    assert fq.decompress_bytes(mt) == data


def test_mt_v3_phred64():
    rng = np.random.default_rng(5)
    ab = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(3000):
        seq = ab[rng.integers(0, 4, 80)].tobytes()
        qual = rng.integers(64, 100, 80, dtype=np.uint8).tobytes()
        recs.append(b"@p%d\n%s\n+\n%s\n" % (i, seq, qual))
    data = b"".join(recs)
    opts = _v3_opts(workers=1)
    mt = _mt_compress(data, opts)
    assert mt == _python_compress(data, opts)
    fh = container.read_file_header(io.BytesIO(mt))
    assert fh.flags & container.FLAG_PHRED64
    assert fq.decompress_bytes(mt) == data


def test_mt_v3_long_read_wide_npos():
    """v3 has no 65,536 bp N-tracking cap (u32 npos layout)."""
    seq = (b"ACGT" * 20000) + b"N" + (b"ACGT" * 2000)
    qual = b"I" * len(seq)
    data = b"".join(
        b"@long%d\n%s\n+\n%s\n" % (i, seq, qual) for i in range(30)
    )
    opts = _v3_opts(workers=1)
    mt = _mt_compress(data, opts)
    assert mt == _python_compress(data, opts)
    assert fq.decompress_bytes(mt) == data


def test_mt_v3_lossless_stays_on_python_path():
    data = b"@a\nacGTn\n+\nIIIII\n"
    opts = _v3_opts(lossless=True)
    out = io.BytesIO()
    native.compress_native(io.BytesIO(data), out, opts)
    comp = out.getvalue()
    fh = container.read_file_header(io.BytesIO(comp))
    assert fh.flags & container.FLAG_LOSSLESS
    assert fq.decompress_bytes(comp) == data


def test_mt_v3_empty_and_tiny():
    for data in (b"", b"@a\nACGT\n+\nIIII\n"):
        opts = _v3_opts(workers=1)
        mt = _mt_compress(data, opts)
        assert mt == _python_compress(data, opts)
        assert fq.decompress_bytes(mt) == data


def test_mt_v3_parse_errors_verbatim():
    from fastqpacker_tpu.parser.fastq import FastqParseError

    cases = [
        (b"ACGT\nACGT\n+\nIIII\n", "header line must start with @"),
        (b"@a\nACGT\n+\nIII\n", "sequence and quality lengths must match"),
        (b"@a\nACGT\nIIII\n+\n", "separator line must start with"),
    ]
    for data, msg in cases:
        with pytest.raises(FastqParseError, match=msg):
            native.compress_native(io.BytesIO(data), io.BytesIO(), _v3_opts())


def test_mt_v3_multiworker_matches_singleworker_decode():
    """Default framing with many workers: containers may differ from the
    single-worker layout (framing + memo timing) but must decode to the
    same FASTQ."""
    data = _context_fastq(50000, seed=6)
    for workers in (1, 4):
        comp = _mt_compress(
            data, _v3_opts(workers=workers), exact_framing=False
        )
        assert fq.decompress_bytes(comp) == data
