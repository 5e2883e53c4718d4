"""Parser unit tests (reference analog: parser_test.go)."""

import io

import numpy as np
import pytest

from fastqpacker_tpu.parser import fastq as fqp


def parse(data: bytes, block_size: int = 100000):
    return list(
        fqp.FastqStreamParser(io.BytesIO(data), block_size=block_size).blocks()
    )


def records(data: bytes, block_size: int = 100000):
    out = []
    for blk in parse(data, block_size):
        for i in range(blk.n):
            out.append(blk.record(i))
    return out


def test_basic_record():
    recs = records(b"@r1 desc\nACGT\n+\nIIII\n")
    assert recs == [(b"r1 desc", b"ACGT", b"", b"IIII")]


def test_plus_payload_kept():
    recs = records(b"@r1\nACGT\n+again r1\nIIII\n")
    assert recs == [(b"r1", b"ACGT", b"again r1", b"IIII")]


def test_crlf_tolerated():
    recs = records(b"@r1\r\nACGT\r\n+\r\nIIII\r\n")
    assert recs == [(b"r1", b"ACGT", b"", b"IIII")]


def test_missing_at_sign_errors():
    with pytest.raises(fqp.FastqParseError, match="header line must start with @"):
        records(b"r1\nACGT\n+\nIIII\n")


def test_missing_plus_errors():
    with pytest.raises(
        fqp.FastqParseError, match="separator line must start with \\+"
    ):
        records(b"@r1\nACGT\nxx\nIIII\n")


def test_length_mismatch_errors():
    with pytest.raises(
        fqp.FastqParseError, match="sequence and quality lengths must match"
    ):
        records(b"@r1\nACGT\n+\nIII\n")


def test_error_precedence_matches_sequential_read():
    """First failing line wins, like record-at-a-time parsing."""
    data = b"@r1\nACGT\n+\nIII\n" + b"r2\nACGT\n+\nIIII\n"
    with pytest.raises(
        fqp.FastqParseError, match="sequence and quality lengths must match"
    ):
        records(data)


def test_empty_header_line_errors():
    with pytest.raises(fqp.FastqParseError, match="header line must start with @"):
        records(b"\nACGT\n+\nIIII\n")


def test_trailing_partial_record_dropped():
    """EOF mid-record drops the partial record (parser.go readLine EOF)."""
    data = b"@r1\nACGT\n+\nIIII\n@r2\nACGT\n"
    recs = records(data)
    assert len(recs) == 1


def test_trailing_unterminated_line_dropped():
    data = b"@r1\nACGT\n+\nIIII\n@r2"
    assert len(records(data)) == 1


def test_trailing_partial_with_bad_header_errors():
    """Complete lines of a partial record are still validated."""
    with pytest.raises(fqp.FastqParseError, match="header line must start with @"):
        records(b"@r1\nACGT\n+\nIIII\nbad\n")


def test_batch_iteration_partial_final_block():
    data = b"".join(
        f"@r{i}\nACGT\n+\nIIII\n".encode() for i in range(10)
    )
    blks = parse(data, block_size=4)
    assert [b.n for b in blks] == [4, 4, 2]
    assert blks[2].record(1)[0] == b"r9"


def test_empty_input():
    assert parse(b"") == []


def test_block_arrays_padded_correctly():
    data = b"@a\nACGTACGT\n+\nIIIIIIII\n@b\nAC\n+\nII\n"
    blk = parse(data)[0]
    assert blk.seq.shape == (2, 8)
    assert blk.lengths.tolist() == [8, 2]
    assert blk.seq[1, 2:].tolist() == [fqp.SEQ_PAD] * 6
    assert blk.qual[1, 2:].tolist() == [fqp.QUAL_PAD] * 6


def test_chunked_reads_small_chunks():
    data = b"".join(
        f"@read{i} x\nACGTN\n+p{i}\nIIIII\n".encode() for i in range(100)
    )
    p = fqp.FastqStreamParser(io.BytesIO(data), block_size=7, chunk_bytes=13)
    total = 0
    for blk in p.blocks():
        total += blk.n
        assert blk.n <= 7
    assert total == 100


def test_header_and_plus_streams():
    data = b"@hdr1\nAC\n+pp\nII\n"
    blk = parse(data)[0]
    assert blk.header_stream() == b"\x04\x00hdr1"
    assert blk.plus_stream() == b"\x02\x00pp"
