"""Phred-detection window parity with the Go reference (VERDICT r2 #7).

The Go tool detects the Phred offset from the first min(DefaultBlockSize,
file) = min(100k, file) records REGARDLESS of -b: its detection batch
comes from a pool fixed at NewRecordBatch(DefaultBlockSize)
(compress.go:48-52,137-154). With ``-b 100`` and a file whose
offset-deciding bytes sit past record 100, a first-block-only detector
sets a different file flag than the reference. These tests pin the
fixed-window behavior on every compress path.
"""

import io
import os
import tempfile

import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container
from fastqpacker_tpu.pipeline import api


def _late_phred33_corpus() -> bytes:
    """First 100 records look Phred+64 (min byte 70); records 100+ carry
    a byte < 59. The Go window (100k records) sees the whole file and
    says Phred+33; a first-block-only detector at -b 100 says +64."""
    recs = []
    for i in range(100):
        recs.append(f"@r{i}\nACGTACGT\n+\n{chr(70) * 8}\n")
    for i in range(100, 400):
        recs.append(f"@r{i}\nACGTACGT\n+\n{chr(70) * 7}{chr(40)}\n")
    return "".join(recs).encode()


def _flag_phred64(blob: bytes) -> bool:
    return bool(blob[9] & container.FLAG_PHRED64)


@pytest.fixture
def corpus():
    return _late_phred33_corpus()


def test_python_v2_path_uses_fixed_window(corpus, monkeypatch):
    from fastqpacker_tpu.runtime import bindings

    monkeypatch.setattr(bindings, "mt_available", lambda: False)
    out = io.BytesIO()
    api.compress(io.BytesIO(corpus), out, fq.Options(block_size=100))
    blob = out.getvalue()
    assert not _flag_phred64(blob)
    assert fq.decompress_bytes(blob) == corpus


def test_native_mt_v2_path_uses_fixed_window(corpus):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "in.fq")
        with open(path, "wb") as f:
            f.write(corpus)
        out = io.BytesIO()
        with open(path, "rb") as r:  # file source -> native MT path
            fq.compress(r, out, fq.Options(block_size=100))
    blob = out.getvalue()
    assert not _flag_phred64(blob)
    assert fq.decompress_bytes(blob) == corpus


def test_v3_native_path_uses_fixed_window(corpus):
    blob = fq.compress_bytes(
        corpus,
        fq.Options(block_size=100, version=container.VERSION_3_NATIVE),
    )
    assert not _flag_phred64(blob)
    assert fq.decompress_bytes(blob) == corpus


def test_mesh_path_uses_fixed_window(corpus):
    from fastqpacker_tpu.pipeline import meshpipe

    blob = meshpipe.compress_mesh_bytes(
        corpus, fq.Options(block_size=100)
    )
    assert not _flag_phred64(blob)
    assert fq.decompress_bytes(blob) == corpus


def test_phred64_file_still_detects_phred64():
    # all bytes >= 64 across the whole window -> flag set (both paths)
    recs = "".join(
        f"@q{i}\nACGTACGT\n+\n{chr(70 + i % 20) * 8}\n" for i in range(300)
    ).encode()
    blob = fq.compress_bytes(recs, fq.Options(block_size=100))
    assert _flag_phred64(blob)
    assert fq.decompress_bytes(blob) == recs


def test_window_cap_is_default_block_size():
    # peek_detection must stop the min at record 100k even when a block
    # crosses the boundary (Go ignores bytes past the fixed batch)
    import numpy as np

    from fastqpacker_tpu.parser.fastq import FastqStreamParser

    n = 120
    api_default = api.DEFAULT_BLOCK_SIZE
    try:
        api.DEFAULT_BLOCK_SIZE = 100  # shrink the window for the test
        recs = []
        for i in range(n):
            q = chr(70) if i < 100 else chr(40)
            recs.append(f"@r{i}\nAC\n+\n{q * 2}\n")
        data = "".join(recs).encode()
        parser = FastqStreamParser(io.BytesIO(data), block_size=150)
        peeked, qual_offset = api.peek_detection(parser.blocks())
        # byte 40 lives at records 100-119, past the window: +64 wins
        from fastqpacker_tpu.ops import reference as refops

        assert qual_offset == refops.PHRED64_OFFSET
        assert sum(b.n for b in peeked) == n
    finally:
        api.DEFAULT_BLOCK_SIZE = api_default
