"""Container format unit tests (reference analog: container_test.go)."""

import io

import pytest

from fastqpacker_tpu.format import container


def test_file_header_roundtrip():
    h = container.FileHeader(version=2, block_size=100000, flags=container.FLAG_PHRED64)
    buf = h.to_bytes()
    assert len(buf) == container.FILE_HEADER_SIZE
    assert buf[:4] == b"FQZ\x00"
    got = container.read_file_header(io.BytesIO(buf))
    assert got == h
    assert got.phred64


def test_file_header_bad_magic():
    with pytest.raises(container.FormatError, match="invalid magic"):
        container.read_file_header(io.BytesIO(b"NOPE\x02\x00\x00\x00\x00\x00"))


def test_file_header_truncated():
    with pytest.raises(container.FormatError, match="truncated"):
        container.read_file_header(io.BytesIO(b"FQZ\x00\x02"))


def _full_header():
    return container.BlockHeader(
        num_records=7,
        seq_data_size=11,
        qual_data_size=22,
        header_data_size=33,
        plus_data_size=44,
        npositions_size=55,
        seq_lengths_size=66,
        original_seq_size=77,
        original_qual_size=88,
        crc32=0xDEADBEEF,
    )


def test_block_header_v2_roundtrip():
    h = _full_header()
    buf = h.to_bytes(container.VERSION_2)
    assert len(buf) == container.BLOCK_HEADER_SIZE_V2
    got = container.parse_block_header(buf, container.VERSION_2)
    assert got.plus_data_size == 44
    assert got.crc32 == 0  # not carried in v2
    assert got.num_records == 7
    assert got.original_qual_size == 88


def test_block_header_v1_wire_compat():
    """v1 drops PlusDataSize and shifts fields (container.go:83-95)."""
    h = _full_header()
    buf = h.to_bytes(container.VERSION_1)
    assert len(buf) == container.BLOCK_HEADER_SIZE_V1
    got = container.parse_block_header(buf, container.VERSION_1)
    assert got.plus_data_size == 0
    assert got.npositions_size == 55
    assert got.seq_lengths_size == 66
    assert got.original_seq_size == 77
    # wire layout check: field 5 (offset 16..20) is NPositionsSize in v1
    import struct

    assert struct.unpack("<I", buf[16:20])[0] == 55


def test_block_header_v3_carries_crc():
    h = _full_header()
    buf = h.to_bytes(container.VERSION_3_NATIVE)
    assert len(buf) == container.BLOCK_HEADER_SIZE_V3
    got = container.parse_block_header(buf, container.VERSION_3_NATIVE)
    assert got.crc32 == 0xDEADBEEF


def test_block_header_eof_returns_none():
    assert container.read_block_header(io.BytesIO(b""), 2) is None


def test_block_header_truncated():
    with pytest.raises(container.FormatError, match="truncated"):
        container.read_block_header(io.BytesIO(b"\x01\x02"), 2)


def test_stream_sizes_order():
    h = _full_header()
    assert h.stream_sizes(container.VERSION_2) == [11, 22, 33, 44, 55, 66]
    assert h.stream_sizes(container.VERSION_1) == [11, 22, 33, 55, 66]
