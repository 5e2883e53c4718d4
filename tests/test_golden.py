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
