"""Golden-container regression tests: wire-format stability across rounds.

The committed `.fqz` fixtures were produced by this framework; every
future revision must keep decoding them byte-identically (and, for the
v2/zstd flavor, keep producing structurally compatible containers). Any
failure here means a format-breaking change — which is only acceptable
with a version bump, never silently.
"""

import os

import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container

GOLDEN = os.path.join(os.path.dirname(__file__), "testdata", "golden")


def _read(name):
    with open(os.path.join(GOLDEN, name), "rb") as f:
        return f.read()


def test_golden_v2_decodes():
    assert fq.decompress_bytes(_read("golden_v2.fqz")) == _read("golden.fq")


def test_golden_v3_decodes():
    assert fq.decompress_bytes(_read("golden_v3.fqz")) == _read("golden.fq")


def test_golden_phred64_decodes():
    comp = _read("golden_p64_v2.fqz")
    assert container.parse_file_header(comp[:10]).phred64
    assert fq.decompress_bytes(comp) == _read("golden_p64.fq")


def test_golden_v2_structure():
    comp = _read("golden_v2.fqz")
    fh = container.parse_file_header(comp[:10])
    assert fh.version == container.VERSION_2
    assert fh.block_size == 50
    # walk all block headers
    import io

    r = io.BytesIO(comp)
    container.read_file_header(r)
    total = 0
    while True:
        hdr = container.read_block_header(r, fh.version)
        if hdr is None:
            break
        r.read(sum(hdr.stream_sizes(fh.version)))
        total += hdr.num_records
    assert total == 137


def test_recompression_is_deterministic():
    """Same input + options -> byte-identical v2 container (single worker)."""
    data = _read("golden.fq")
    a = fq.compress_bytes(data, fq.Options(block_size=50, workers=1))
    b = fq.compress_bytes(data, fq.Options(block_size=50, workers=1))
    assert a == b


def _golden_ctx_fastq() -> bytes:
    """Deterministic source of golden_ctx_v3.fqz (regenerated here
    instead of committing the 7 MB FASTQ): correlated DNA with Ns,
    sticky binned qualities, structured headers — picked so the fixture
    exercises TAG_SCTX, TAG_QCTX (model 1), TAG_TOK and the 4x4
    interleaved-state chunk layout."""
    import numpy as np

    rng = np.random.default_rng(20260818)
    nrec, L = 16_000, 151
    sym = np.frombuffer(b"ACGTN", np.uint8)
    cur = rng.integers(0, 4, nrec)
    m = np.empty((nrec, L), np.uint8)
    for p in range(L):
        stay = rng.random(nrec) < 0.62
        cur = np.where(stay, cur, rng.integers(0, 4, nrec))
        m[:, p] = cur
    m[rng.integers(0, nrec, 400), rng.integers(0, L, 400)] = 4
    levels = np.array([2, 12, 23, 37], np.uint8)
    q = levels[
        np.clip(
            (np.cumsum(rng.integers(-1, 2, (nrec, L)), axis=1) // 6) % 4,
            0, 3,
        )
    ] + 33
    recs = []
    for i in range(nrec):
        recs.append(
            b"@GCTX.%d 1:N:0:ACGT\n" % i + sym[m[i]].tobytes()
            + b"\n+\n" + q[i].tobytes() + b"\n"
        )
    return b"".join(recs)


def test_golden_ctx_v3_decodes():
    """Wire-stability guard for the context-coder layouts (the plain
    golden_v3.fqz is too small to engage them): sctx (order pick), qctx
    model 1, tok headers, interleaved chunk states."""
    comp = _read("golden_ctx_v3.fqz")
    expected = _golden_ctx_fastq()
    # the committed container must carry the context-coder tags ...
    import io

    buf = io.BytesIO(comp)
    fh = container.read_file_header(buf)
    hdr = container.read_block_header(buf, fh.version)
    payload = buf.read(sum(hdr.stream_sizes(container.VERSION_2)))
    sizes = hdr.stream_sizes(container.VERSION_2)
    assert payload[0] == container.TAG_SCTX
    assert payload[sizes[0]] == container.TAG_QCTX
    assert payload[sizes[0] + 1 + 5] == 1  # qctx model byte
    assert payload[sizes[0] + sizes[1]] == container.TAG_TOK
    # ... and keep decoding byte-identically forever
    assert fq.decompress_bytes(comp) == expected
