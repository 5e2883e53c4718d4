"""End-to-end compress->decompress round trips.

The dominant test pattern of the reference (compress_test.go): compress,
decompress, assert byte-identical FASTQ text.
"""

import io
import struct

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container
from fastqpacker_tpu.entropy import zstd as zstd_entropy


def roundtrip(data: bytes, copts=None, dopts=None) -> bytes:
    comp = fq.compress_bytes(data, copts)
    return fq.decompress_bytes(comp, dopts)


def fastq(*records) -> bytes:
    out = []
    for h, s, p, q in records:
        out.append(f"@{h}\n{s}\n+{p}\n{q}\n")
    return "".join(out).encode()


SAMPLE = open("/root/reference/testdata/sample.fq", "rb").read()


def test_sample_file_roundtrip():
    assert roundtrip(SAMPLE) == SAMPLE


def test_single_record():
    data = fastq(("r1 desc", "ACGTACGT", "", "IIIIIIII"))
    assert roundtrip(data) == data


def test_multi_record():
    data = fastq(
        ("r1", "ACGT", "", "IIII"),
        ("r2 extra stuff", "GGGGCCCC", "", "!!!!!!!!"),
        ("r3", "T", "", "F"),
    )
    assert roundtrip(data) == data


def test_n_bases():
    data = fastq(("r1", "ACGTNNNACGTNNNN", "", "IIIIIII!!!!IIII"))
    assert roundtrip(data) == data


def test_all_n_record():
    data = fastq(("r1", "NNNNNNNN", "", "!!!!!!!!"))
    assert roundtrip(data) == data


def test_plus_line_payload_preserved():
    data = fastq(("r1", "ACGT", "r1 again", "IIII"))
    assert roundtrip(data) == data


def test_empty_sequence_record():
    data = fastq(("r1", "", "", ""))
    assert roundtrip(data) == data


def test_empty_input():
    comp = fq.compress_bytes(b"")
    # File header only (compress.go:157-174 with empty first batch).
    assert len(comp) == container.FILE_HEADER_SIZE
    assert fq.decompress_bytes(comp) == b""


def test_lowercase_normalized():
    data = fastq(("r1", "acgtACGT", "", "IIIIIIII"))
    out = roundtrip(data)
    assert out == fastq(("r1", "ACGTACGT", "", "IIIIIIII"))


def test_exotic_bases_become_n():
    data = fastq(("r1", "ACGTRYKM", "", "IIIIIIII"))
    out = roundtrip(data)
    assert out == fastq(("r1", "ACGTNNNN", "", "IIIIIIII"))


def test_crlf_input_normalized_to_lf():
    data = b"@r1\r\nACGT\r\n+\r\nIIII\r\n"
    out = roundtrip(data)
    assert out == b"@r1\nACGT\n+\nIIII\n"


def test_1000_records_compresses():
    rng = np.random.default_rng(42)
    recs = []
    for i in range(1000):
        seq = "".join("ACGT"[b] for b in rng.integers(0, 4, 150))
        qual = "".join(chr(33 + int(b)) for b in rng.integers(0, 40, 150))
        recs.append((f"read_{i} pos={i*7}", seq, "", qual))
    data = fastq(*recs)
    comp = fq.compress_bytes(data)
    assert roundtrip(data) == data
    assert len(comp) < len(data)  # ratio sanity (compress_test.go:125-158)


def test_multi_block_parallel():
    recs = [
        (f"r{i}", "ACGTACGTACGT", "", "IIIIIIIIIIII") for i in range(1000)
    ]
    data = fastq(*recs)
    comp = fq.compress_bytes(data, fq.Options(block_size=100, workers=4))
    assert fq.decompress_bytes(comp, fq.DecompressOptions(workers=4)) == data
    # verify block structure: 10 blocks of 100
    r = io.BytesIO(comp)
    fh = container.read_file_header(r)
    assert fh.block_size == 100
    nblocks = 0
    while True:
        hdr = container.read_block_header(r, fh.version)
        if hdr is None:
            break
        assert hdr.num_records == 100
        r.read(sum(hdr.stream_sizes(fh.version)))
        nblocks += 1
    assert nblocks == 10


@pytest.mark.parametrize("workers", [1, 2, 16])
def test_worker_count_edge_cases(workers):
    recs = [(f"r{i}", "ACGT", "", "IIII") for i in range(50)]
    data = fastq(*recs)
    comp = fq.compress_bytes(data, fq.Options(block_size=10, workers=workers))
    assert fq.decompress_bytes(comp, fq.DecompressOptions(workers=workers)) == data


def test_variable_length_records():
    rng = np.random.default_rng(7)
    recs = []
    for i in range(300):
        ln = int(rng.integers(1, 400))
        seq = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        qual = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append((f"var_{i}", seq, "", qual))
    data = fastq(*recs)
    assert roundtrip(data, fq.Options(block_size=64)) == data


def test_phred64_detection_and_roundtrip():
    qual = "".join(chr(64 + i % 40) for i in range(60))
    data = fastq(("r1", "A" * 60, "", qual))
    comp = fq.compress_bytes(data)
    fh = container.read_file_header(io.BytesIO(comp))
    assert fh.phred64
    assert fq.decompress_bytes(comp) == data


def test_phred64_multi_block():
    recs = [
        (f"r{i}", "ACGT" * 10, "", "h" * 40) for i in range(250)
    ]
    data = fastq(*recs)
    comp = fq.compress_bytes(data, fq.Options(block_size=50))
    assert io.BytesIO(comp).read(10)[9] & container.FLAG_PHRED64
    assert fq.decompress_bytes(comp) == data


def test_mixed_phred_detected_from_first_block_only():
    """Detection uses the first block only (compress.go:137-154)."""
    low = [("lo", "ACGT", "", "!!!!")]  # byte 33 -> Phred+33
    high = [(f"hi{i}", "ACGT", "", "hhhh") for i in range(10)]
    data = fastq(*(low + high))
    comp = fq.compress_bytes(data, fq.Options(block_size=5))
    fh = container.read_file_header(io.BytesIO(comp))
    assert not fh.phred64
    assert fq.decompress_bytes(comp) == data


def test_long_read_overflow_reject():
    """Ambiguous base beyond 65536 bp must fail fast (compress.go:477-488)."""
    ln = 65536 + 100
    seq = "A" * (ln - 1) + "N"
    data = fastq(("long1", seq, "", "I" * ln))
    with pytest.raises(ValueError, match="ambiguous bases beyond"):
        fq.compress_bytes(data)


def test_long_read_overflow_accept_clean():
    ln = 65536 + 100
    seq = "N" + "ACGT" * ((ln - 1) // 4 + 1)
    seq = seq[:ln]
    data = fastq(("long1", seq, "", "I" * ln))
    assert roundtrip(data) == data


def test_fused_decode_matches_per_stream_path(monkeypatch):
    """The fused native block decode (fq_decode_block_v2) must emit
    byte-identical FASTQ to the per-stream zstd + assembly path, for both
    container versions."""
    from fastqpacker_tpu.runtime import bindings

    if not (bindings.available() and bindings.decode_block_v2_available()):
        pytest.skip("native runtime unavailable")
    data = fastq(
        ("r1 some desc", "ACGTNNACGTacgt", "plus payload", "IIIIIIIIIIIIII"),
        ("r2", "GGGCCC", "", "ABCDEF"),
        ("r3", "", "", ""),
    ) * 50
    for version in (container.VERSION_1, container.VERSION_2):
        comp = fq.compress_bytes(
            data, fq.Options(version=version, block_size=16)
        )
        fused = fq.decompress_bytes(comp)
        monkeypatch.setattr(
            bindings, "decode_block_v2_available", lambda: False
        )
        unfused = fq.decompress_bytes(comp)
        monkeypatch.undo()
        assert fused == unfused


def test_unsupported_version_rejected():
    comp = bytearray(fq.compress_bytes(SAMPLE))
    comp[4] = 99
    with pytest.raises(container.FormatError, match="unsupported file version"):
        fq.decompress_bytes(bytes(comp))


def test_truncated_payload_rejected():
    comp = fq.compress_bytes(SAMPLE)
    with pytest.raises(container.FormatError, match="truncated"):
        fq.decompress_bytes(comp[:-5])


def test_corrupt_magic_rejected():
    comp = bytearray(fq.compress_bytes(SAMPLE))
    comp[0] = ord("X")
    with pytest.raises(container.FormatError, match="invalid magic"):
        fq.decompress_bytes(bytes(comp))


# --- v1 back-compat ----------------------------------------------------------


def build_v1_container(records) -> bytes:
    """Hand-build a v1 container (compress_test.go:519-592 analog)."""
    codec = zstd_entropy.ZstdCodec()
    seq_stream = bytearray()
    qual_stream = bytearray()
    hdr_stream = bytearray()
    npos_stream = bytearray()
    len_stream = bytearray()
    oseq = oqual = 0
    for h, s, q in records:
        codes = {"A": 0, "C": 1, "G": 2, "T": 3}
        packed = bytearray((len(s) + 3) // 4)
        npos = []
        for i, ch in enumerate(s):
            c = codes.get(ch.upper(), 0)
            if ch.upper() not in codes:
                npos.append(i)
            packed[i // 4] |= c << (2 * (i % 4))
        seq_stream += packed
        npos_stream += struct.pack("<H", len(npos))
        for p in npos:
            npos_stream += struct.pack("<H", p)
        len_stream += struct.pack("<I", len(s))
        qn = [(ord(c) - 33) & 0xFF for c in q]
        delta = [qn[0]] + [(qn[i] - qn[i - 1]) & 0xFF for i in range(1, len(qn))] if qn else []
        qual_stream += bytes(delta)
        hdr_stream += struct.pack("<H", len(h)) + h.encode()
        oseq += len(s)
        oqual += len(q)

    comp = [
        codec.compress(bytes(x))
        for x in (seq_stream, qual_stream, hdr_stream, npos_stream, len_stream)
    ]
    out = io.BytesIO()
    container.FileHeader(version=1, block_size=100, flags=0).write(out)
    hdr = container.BlockHeader(
        num_records=len(records),
        seq_data_size=len(comp[0]),
        qual_data_size=len(comp[1]),
        header_data_size=len(comp[2]),
        npositions_size=len(comp[3]),
        seq_lengths_size=len(comp[4]),
        original_seq_size=oseq,
        original_qual_size=oqual,
    )
    hdr.write(out, container.VERSION_1)
    for c in comp:
        out.write(c)
    return out.getvalue()


def test_v1_container_backcompat():
    records = [
        ("read1 v1", "ACGTNNNA", "IIIIIII!"),
        ("read2", "GGCC", "FFFF"),
    ]
    v1 = build_v1_container(records)
    out = fq.decompress_bytes(v1)
    # v1 has no plus payload: bare '+' lines (compress.go:995-998)
    expected = fastq(*[(h, s, "", q) for h, s, q in records])
    assert out == expected


@pytest.mark.parametrize(
    "version", [container.VERSION_2, container.VERSION_3_NATIVE]
)
def test_output_deterministic_across_worker_counts(version):
    """The ordered collector must make container bytes independent of
    worker count (the reference's seqNum collector invariant,
    compress.go:365-403) — for both wire formats."""
    rng = np.random.default_rng(23)
    recs = []
    for i in range(700):
        ln = int(rng.integers(1, 160))
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append((f"det_{i}", s, "", q))
    data = fastq(*recs)
    outs = [
        fq.compress_bytes(
            data, fq.Options(block_size=64, workers=w, version=version)
        )
        for w in (1, 2, 5)
    ]
    assert outs[0] == outs[1] == outs[2]
    assert fq.decompress_bytes(outs[0]) == data


def test_single_record_blocks_both_formats():
    """block_size=1 (every record its own block): degenerate header
    overhead path, all tags falling back to zstd, many tiny blocks
    through the worker pool."""
    rng = np.random.default_rng(31)
    recs = []
    for i in range(50):
        ln = int(rng.integers(1, 40))
        s = "".join("ACGT"[b] for b in rng.integers(0, 4, ln))
        recs.append((f"b1_{i}", s, "", "I" * ln))
    data = fastq(*recs)
    for ver in (container.VERSION_2, container.VERSION_3_NATIVE):
        comp = fq.compress_bytes(
            data, fq.Options(block_size=1, version=ver, workers=3)
        )
        assert fq.decompress_bytes(comp) == data


def test_single_huge_record_v3():
    """One 300 kbp record (beyond the reference's 65,536 bp N-tracking
    cap) through the v3 context-coder path: chunk bounds degenerate to
    one record spanning all chunks."""
    rng = np.random.default_rng(32)
    n = 300_000
    seq = "".join("ACGTN"[b] for b in rng.integers(0, 5, n))
    qual = "".join(chr(33 + int(b)) for b in rng.integers(0, 40, n))
    data = fastq(("long read", seq, "", qual))
    comp = fq.compress_bytes(
        data, fq.Options(version=container.VERSION_3_NATIVE)
    )
    assert fq.decompress_bytes(comp) == data
