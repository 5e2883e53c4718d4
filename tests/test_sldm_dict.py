"""Cross-block sequence dictionary (FLAG_SEQ_DICT, journal E044)."""

import io

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container
from fastqpacker_tpu.pipeline import ranges


def _coverage_fastq(mb: int = 24, seed: int = 3) -> bytes:
    from bench import synth_fastq

    return synth_fastq(mb, genomic=True, seed=seed)


def _v3(data: bytes, **kw) -> bytes:
    return fq.compress_bytes(
        data, fq.Options(version=container.VERSION_3_NATIVE, **kw)
    )


@pytest.fixture(scope="module")
def coverage_container():
    data = _coverage_fastq()
    comp = _v3(data, block_size=40000)
    return data, comp


def test_dict_flag_set_and_roundtrip(coverage_container):
    data, comp = coverage_container
    fh = container.parse_file_header(comp[:10])
    assert fh.flags & container.FLAG_SEQ_DICT
    assert fq.decompress_bytes(comp) == data


def test_dict_improves_ratio_vs_blockwise(coverage_container):
    """Blocks after the first must shrink vs the no-dict encoding."""
    data, comp = coverage_container
    from fastqpacker_tpu.ops import sldm

    real = sldm.DUP_THRESHOLD
    sldm.DUP_THRESHOLD = 2.0  # force the probe off -> no dict
    try:
        nodict = _v3(data, block_size=40000)
    finally:
        sldm.DUP_THRESHOLD = real
    fh = container.parse_file_header(nodict[:10])
    assert not (fh.flags & container.FLAG_SEQ_DICT)
    assert fq.decompress_bytes(nodict) == data
    assert len(comp) < 0.93 * len(nodict)


def test_dict_absent_on_iid_data():
    from bench import synth_fastq

    data = synth_fastq(8)
    comp = _v3(data)
    fh = container.parse_file_header(comp[:10])
    assert not (fh.flags & container.FLAG_SEQ_DICT)
    assert fq.decompress_bytes(comp) == data


def test_dict_random_access(coverage_container):
    data, comp = coverage_container
    idx = ranges.build_index(io.BytesIO(comp))
    assert idx.seq_dict is not None
    total = idx.total_records
    # decode a range covered by a non-first block
    start = total - 1000
    import tempfile, os

    fd, path = tempfile.mkstemp(suffix=".fqz")
    os.write(fd, comp)
    os.close(fd)
    try:
        text = ranges.read_record_range(path, start, total)
    finally:
        os.unlink(path)
    # compare against the tail of the original
    nl = np.flatnonzero(np.frombuffer(data, np.uint8) == 0x0A)
    cut = int(nl[4 * start - 1]) + 1 if start else 0
    assert text == data[cut:]


def test_dict_corrupt_section_rejected(coverage_container):
    _, comp = coverage_container
    mut = bytearray(comp)
    mut[14] ^= 0xFF  # inside the dict section payload/size fields
    with pytest.raises((container.FormatError, ValueError, RuntimeError)):
        fq.decompress_bytes(bytes(mut))


def test_dict_truncated_section_rejected(coverage_container):
    _, comp = coverage_container
    with pytest.raises(container.FormatError):
        fq.decompress_bytes(comp[:12])


def test_dict_info_and_check(coverage_container, capsys):
    import os
    import tempfile

    _, comp = coverage_container
    fd, path = tempfile.mkstemp(suffix=".fqz")
    os.write(fd, comp)
    os.close(fd)
    try:
        from fastqpacker_tpu.cli import inspect as insp

        buf = io.StringIO()
        assert insp.info(path, out=buf) == 0
        assert "seq-dict" in buf.getvalue()
        buf = io.StringIO()
        assert insp.check(path, out=buf) == 0
    finally:
        os.unlink(path)


def test_dict_max_ratio_roundtrip(coverage_container):
    data, _ = coverage_container
    comp = _v3(data, block_size=40000, order1_qual=True)
    fh = container.parse_file_header(comp[:10])
    assert fh.flags & container.FLAG_SEQ_DICT
    assert fq.decompress_bytes(comp) == data


def test_dict_with_paired_end():
    """FLAG_SEQ_DICT composes with FLAG_PAIRED_END: interleaved mates
    from coverage-redundant data engage the dictionary and split back
    byte-identically."""
    from bench import synth_fastq

    from fastqpacker_tpu.pipeline import api

    r1 = synth_fastq(6, genomic=True, seed=3)
    r2 = synth_fastq(6, genomic=True, seed=4)
    out = io.BytesIO()
    api.compress_paired(
        io.BytesIO(r1), io.BytesIO(r2), out,
        fq.Options(version=container.VERSION_3_NATIVE, block_size=20000),
    )
    comp = out.getvalue()
    fh = container.parse_file_header(comp[:10])
    assert fh.flags & container.FLAG_SEQ_DICT
    assert fh.flags & container.FLAG_PAIRED_END
    w1, w2 = io.BytesIO(), io.BytesIO()
    api.decompress_paired(io.BytesIO(comp), w1, w2)
    assert w1.getvalue() == r1
    assert w2.getvalue() == r2
