"""Multi-host orchestration tests (simulated hosts, no cluster).

The analog of the reference's "tests pass without a cluster": byte-range
alignment, section compression, and ordered parallel writes are exercised
by running every simulated host's logic in one process.
"""

import io
import os

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.parallel import multihost as mh


def _fastq(n, seed=0, tricky_quals=False):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        ln = int(rng.integers(5, 180))
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        if tricky_quals:
            # qualities full of '@' and '+' to stress record alignment
            q = "".join("@+" [int(b)] for b in rng.integers(0, 2, ln))
        else:
            q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append(f"@mh_{i} r={i}\n{s}\n+\n{q}\n")
    return "".join(recs).encode()


@pytest.mark.parametrize("tricky", [False, True])
@pytest.mark.parametrize("hosts", [1, 2, 4, 7])
def test_host_ranges_align_to_records(tmp_path, hosts, tricky):
    data = _fastq(300, seed=1, tricky_quals=tricky)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ranges = mh.host_ranges(str(p), hosts)
    assert ranges[0][0] == 0
    assert ranges[-1][1] == len(data)
    # contiguous, non-overlapping
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 == s2
    # every boundary is a true record start
    for s, e in ranges:
        if s < len(data):
            assert data[s:s+1] == b"@"
            # the line must be a real header: parse one record from here
            chunk = data[s : s + 4096]
            lines = chunk.split(b"\n")
            assert lines[2][:1] == b"+"
            assert len(lines[1]) == len(lines[3])


def test_multihost_output_matches_single_host(tmp_path):
    data = _fastq(500, seed=2)
    fin = tmp_path / "in.fq"
    fin.write_bytes(data)
    fout = tmp_path / "out.fqz"

    mh.simulate_multihost(str(fin), str(fout), 4, fq.Options(block_size=64))
    comp = fout.read_bytes()
    assert fq.decompress_bytes(comp) == data


def test_multihost_single_host_equivalent(tmp_path):
    data = _fastq(200, seed=3)
    fin = tmp_path / "in.fq"
    fin.write_bytes(data)
    fout = tmp_path / "out1.fqz"
    mh.simulate_multihost(str(fin), str(fout), 1, fq.Options(block_size=50))
    single = fq.compress_bytes(data, fq.Options(block_size=50, workers=1))
    assert fout.read_bytes() == single


def test_phred64_flag_via_broadcast(tmp_path):
    q64 = "".join(chr(64 + i % 40) for i in range(60))
    recs = "".join(f"@p{i}\n{'ACGT' * 15}\n+\n{q64}\n" for i in range(50))
    data = recs.encode()
    fin = tmp_path / "in.fq"
    fin.write_bytes(data)
    fout = tmp_path / "out.fqz"
    mh.simulate_multihost(str(fin), str(fout), 2, fq.Options(block_size=10))
    comp = fout.read_bytes()
    from fastqpacker_tpu.format import container

    assert container.parse_file_header(comp[:10]).phred64
    assert fq.decompress_bytes(comp) == data


def test_align_rejects_quality_at_lines(tmp_path):
    """A '@' quality line must not be mistaken for a record start."""
    # record whose quality line starts with '@' right after a newline
    data = (
        b"@r1\nACGTA\n+\n@@@@@\n"
        b"@r2\nGGGTT\n+\nIIIII\n"
        b"@r3\nCCCAA\n+\nJJJJJ\n"
    )
    p = tmp_path / "t.fq"
    p.write_bytes(data)
    # force a split point landing inside record 1
    with open(p, "rb") as f:
        pos = mh.align_to_record(f, 5, len(data))
    assert data[pos:].startswith(b"@r2\n")


@pytest.mark.parametrize("hosts", [1, 3, 5])
def test_multihost_decompress(tmp_path, hosts):
    data = _fastq(400, seed=9)
    fin = tmp_path / "in.fq"
    fz = tmp_path / "c.fqz"
    fout = tmp_path / "out.fq"
    fin.write_bytes(data)
    comp = fq.compress_bytes(data, fq.Options(block_size=37))
    fz.write_bytes(comp)
    mh.simulate_multihost_decompress(str(fz), str(fout), hosts)
    assert fout.read_bytes() == data


def test_multihost_decompress_native(tmp_path):
    import io
    from fastqpacker_tpu.format import container
    from fastqpacker_tpu.pipeline import native

    data = _fastq(200, seed=10)
    out = io.BytesIO()
    native.compress_native(
        io.BytesIO(data), out,
        fq.Options(block_size=50, version=container.VERSION_3_NATIVE),
    )
    fz = tmp_path / "c3.fqz"
    fz.write_bytes(out.getvalue())
    fout = tmp_path / "out.fq"
    mh.simulate_multihost_decompress(str(fz), str(fout), 3)
    assert fout.read_bytes() == data


def test_index_blocks(tmp_path):
    data = _fastq(100, seed=11)
    comp = fq.compress_bytes(data, fq.Options(block_size=30))
    fz = tmp_path / "c.fqz"
    fz.write_bytes(comp)
    fh, blocks = mh.index_blocks(str(fz))
    assert len(blocks) == 4  # 30+30+30+10
    assert blocks[0][0] == 10  # first block after file header
    assert sum(b[1] for b in blocks) == len(comp) - 10


def test_simulate_multihost_v3_roundtrip(tmp_path):
    """v3 sections must carry tagged streams (encode_block_native), not
    the untagged compress_raw_streams path."""
    from fastqpacker_tpu.format import container
    from fastqpacker_tpu.pipeline import api

    data = _fastq(1200, seed=9)
    src = tmp_path / "in.fq"
    src.write_bytes(data)
    out = tmp_path / "out.fqz"
    mh.simulate_multihost(
        str(src), str(out), num_hosts=3,
        opts=api.Options(
            version=container.VERSION_3_NATIVE, block_size=100
        ),
    )
    comp = out.read_bytes()
    assert api.decompress_bytes(comp) == data

    plain = tmp_path / "plain.fq"
    mh.simulate_multihost_decompress(str(out), str(plain), 2)
    assert plain.read_bytes() == data


def test_multihost_decompress_dict_container(tmp_path):
    """The E044 dictionary section must not be parsed as a block header
    by the multihost indexer/stripe reader (E049)."""
    from bench import synth_fastq

    import fastqpacker_tpu as fq
    from fastqpacker_tpu.format import container
    from fastqpacker_tpu.parallel import multihost as mh

    data = synth_fastq(8, genomic=True, seed=5)
    comp = fq.compress_bytes(
        data, fq.Options(version=container.VERSION_3_NATIVE,
                         block_size=5000)
    )
    fh = container.parse_file_header(comp[:10])
    assert fh.flags & container.FLAG_SEQ_DICT
    src = tmp_path / "in.fqz"
    src.write_bytes(comp)
    fh2, blocks = mh.index_blocks(str(src))
    assert all(size < len(comp) for _, size in blocks)
    out = tmp_path / "out.fq"
    mh.simulate_multihost_decompress(str(src), str(out), num_hosts=3)
    assert out.read_bytes() == data


def test_detection_block_only_in_host0_range(tmp_path):
    """The file-wide Phred flag comes from the FILE's fixed detection
    window — the first min(100k, file) records, like the reference's
    detection batch (compress.go:48-52,137-154) — never from whatever
    range a host happens to own. A file whose window says +64 but whose
    tail (host 3's range) contains sub-59 bytes must still encode EVERY
    host against +64: per-host detection would silently corrupt the
    tail's qualities against the host-0 header flag (VERDICT r1 missing
    #3; window semantics per r3 VERDICT #7)."""
    n = 110_000  # window = first 100k records; the tail sits past it
    seq = "ACGTACGTAA"
    hi = chr(70) * len(seq)   # >= 64 everywhere inside the window -> +64
    lo = chr(40) * len(seq)   # < 59, only PAST the window -> ignored
    recs = [f"@r{i}\n{seq}\n+\n{hi}\n" for i in range(100_000)]
    recs += [f"@r{i}\n{seq}\n+\n{lo}\n" for i in range(100_000, n)]
    data = "".join(recs).encode()
    src = tmp_path / "in.fq"
    src.write_bytes(data)

    # sanity: a host-local detect on the tail really would disagree
    from fastqpacker_tpu.ops import reference as refops
    from fastqpacker_tpu.parser.fastq import FastqStreamParser

    tail_text = "".join(recs[100_000:]).encode()
    blk = next(
        FastqStreamParser(io.BytesIO(tail_text), block_size=100).blocks()
    )
    assert refops.detect_encoding(blk.qual, blk.lengths) == 33

    # the file-level (window) rule says +64
    assert mh._detect_file_qual_offset(str(src), fq.Options(block_size=100)) == 64

    multi = tmp_path / "multi.fqz"
    mh.simulate_multihost(str(src), str(multi), 4, fq.Options(block_size=100))
    comp = multi.read_bytes()
    from fastqpacker_tpu.format import container

    assert container.parse_file_header(comp[:10]).phred64
    # every host encoded against +64: qualities survive byte-exactly
    assert fq.decompress_bytes(comp) == data

    out = tmp_path / "rt.fq"
    mh.simulate_multihost_decompress(str(multi), str(out), 3)
    assert out.read_bytes() == data
