"""FQZ v3 native format tests: round trips, CRC verification, CLI."""

import io

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container
from fastqpacker_tpu.pipeline import api, native


def _fastq(n, seed=0, varlen=False, maxlen=120):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        ln = int(rng.integers(1, maxlen)) if varlen else maxlen
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append(f"@nat_{i} x={i}\n{s}\n+p{i}\n{q}\n")
    return "".join(recs).encode()


def compress_native_bytes(data: bytes, block_size=100000) -> bytes:
    out = io.BytesIO()
    native.compress_native(
        io.BytesIO(data),
        out,
        fq.Options(block_size=block_size, version=container.VERSION_3_NATIVE),
    )
    return out.getvalue()


def test_native_roundtrip():
    data = _fastq(300, seed=1)
    comp = compress_native_bytes(data)
    fh = container.parse_file_header(comp[:10])
    assert fh.version == container.VERSION_3_NATIVE
    assert fq.decompress_bytes(comp) == data


def test_native_roundtrip_varlen_multiblock():
    data = _fastq(500, seed=2, varlen=True)
    comp = compress_native_bytes(data, block_size=64)
    assert fq.decompress_bytes(comp) == data


def test_native_compresses():
    # realistic skew: mostly-ACGT sequences, peaked quality distribution
    rng = np.random.default_rng(3)
    recs = []
    for i in range(2000):
        s = "".join("ACGT"[b] for b in rng.integers(0, 4, 120))
        q = "".join(
            chr(33 + int(np.clip(rng.normal(35, 3), 2, 40))) for b in range(120)
        )
        recs.append(f"@c_{i}\n{s}\n+\n{q}\n")
    data = "".join(recs).encode()
    comp = compress_native_bytes(data)
    assert len(comp) < len(data) // 2


def test_native_crc_catches_corruption():
    from fastqpacker_tpu.entropy.zstd import ZstdError

    data = _fastq(200, seed=4)
    comp = bytearray(compress_native_bytes(data))
    # flip a byte deep in the payload (past file+block header); depending
    # on which stream it lands in, either the zstd frame checksum, the
    # rANS validity checks, or the block CRC32 must catch it
    comp[len(comp) // 2] ^= 0x01
    with pytest.raises((container.FormatError, ZstdError)):
        fq.decompress_bytes(bytes(comp))


def test_native_phred64():
    q = "".join(chr(64 + i % 40) for i in range(80))
    data = f"@p64\n{'ACGT' * 20}\n+\n{q}\n".encode()
    comp = compress_native_bytes(data)
    assert container.parse_file_header(comp[:10]).phred64
    assert fq.decompress_bytes(comp) == data


def test_native_empty_input():
    comp = compress_native_bytes(b"")
    assert len(comp) == container.FILE_HEADER_SIZE
    assert fq.decompress_bytes(comp) == b""


def test_native_cli(tmp_path):
    import subprocess, sys, os

    data = _fastq(100, seed=5)
    fin = tmp_path / "in.fq"
    fz = tmp_path / "out.fqz"
    fout = tmp_path / "out.fq"
    fin.write_bytes(data)
    env = {**os.environ, "FQZ_FORCE_CPU": "1", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": "/root/repo"}
    p = subprocess.run(
        [sys.executable, "-m", "fastqpacker_tpu.cli.fqpack",
         "--format", "native", "-i", str(fin), "-o", str(fz)],
        capture_output=True, env=env, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr
    assert fz.read_bytes()[4] == container.VERSION_3_NATIVE
    p = subprocess.run(
        [sys.executable, "-m", "fastqpacker_tpu.cli.fqpack",
         "-d", "-i", str(fz), "-o", str(fout)],
        capture_output=True, env=env, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr
    assert fout.read_bytes() == data


def test_native_long_read_with_far_n():
    """v3 u32 N positions: ambiguous bases beyond 65,536 bp round-trip
    (the v2 path must still fail fast, preserving reference semantics)."""
    ln = 70000
    seq = "A" * (ln - 2) + "NC"
    data = f"@long\n{seq}\n+\n{'I' * ln}\n".encode()
    comp = compress_native_bytes(data)
    assert fq.decompress_bytes(comp) == data
    with pytest.raises(ValueError, match="ambiguous bases beyond"):
        fq.compress_bytes(data)  # v2 keeps the reference fail-fast


def test_model_registry():
    from fastqpacker_tpu import models

    assert models.get_model("native").version == container.VERSION_3_NATIVE
    assert models.get_model("zstd") is models.FLAGSHIP
    assert models.get_model("fqz-v3-native").wide_npos
    with pytest.raises(KeyError, match="unknown codec model"):
        models.get_model("nope")
    opts = models.FLAGSHIP.options(block_size=10)
    assert opts.version == container.VERSION_2


def test_small_streams_fall_back_to_zstd():
    """Tiny rANS-eligible streams carry the zstd tag (overhead guard)."""
    data = _fastq(3, seed=20)
    comp = compress_native_bytes(data)
    # small input -> whole container stays small (no kB-scale state tables)
    assert len(comp) < 900  # ~250B/stream zstd frames, no kB state tables
    assert fq.decompress_bytes(comp) == data


def _first_block_streams(comp):
    hdr = container.parse_block_header(
        comp[10 : 10 + container.BLOCK_HEADER_SIZE_V3],
        container.VERSION_3_NATIVE,
    )
    payload = comp[10 + container.BLOCK_HEADER_SIZE_V3 :]
    sizes = hdr.stream_sizes(container.VERSION_2)
    out = []
    off = 0
    for s in sizes:
        out.append(payload[off : off + s])
        off += s
    return out


def test_empirical_pick_chooses_rans_on_skewed_bytes():
    """Skewed, match-free bytes: zstd's Huffman literal floor (1 bit)
    loses to rANS's fractional bits and the pick tags the stream rANS;
    the size estimate must also be faithful (within 10%)."""
    from fastqpacker_tpu.entropy import zstd as z
    from fastqpacker_tpu.ops import rans as rans_mod

    rng = np.random.default_rng(21)
    q = np.where(
        rng.random(90000) < 0.93, ord("I"), 34 + rng.integers(0, 8, 90000)
    ).astype(np.uint8)
    s = q.tobytes()
    est = native._rans_size_estimate(s)
    actual = len(rans_mod.encode_stream(s))
    assert abs(est - actual) < actual * 0.10
    tagged = native._encode_tagged(s, z.get_codec())
    assert tagged[0] == native.TAG_RANS
    assert len(tagged) - 1 < len(z.compress(s))
    assert native._decode_tagged(tagged, z.get_codec()) == s


def test_zstd_picked_for_lz_structured_streams():
    """Repeating records: LZ wins and the pick keeps zstd (v3 should
    never lose to v2 by much on any input)."""
    data = b"".join(b"@r%d\nACGTACGTAAAA\n+\nIIIIIIIIIIII\n" % i
                    for i in range(5000))
    comp = compress_native_bytes(data)
    streams = _first_block_streams(comp)
    assert streams[0][0] == native.TAG_ZSTD
    # constant quality: qctx's single-context table beats zstd by actual
    # bytes since the r3 gate widening (sampled pre-gate +
    # SCTX_WIN_MARGIN policy on the qual slot); either pick is a
    # by-size win here
    assert streams[1][0] in (native.TAG_ZSTD, native.TAG_QCTX)
    v2 = fq.compress_bytes(data)
    assert len(comp) < len(v2) * 1.05
    assert fq.decompress_bytes(comp) == data


def test_model_registry_mirrors_pipeline_codecs():
    """models/flagship.py documents the wire policy; it must stay in
    sync with the pipeline's actual per-stream codec table."""
    from fastqpacker_tpu.models import flagship

    assert flagship.FQZ_V3_NATIVE.stream_codecs == native.STREAM_CODECS


def test_inspect_tag_slots_mirror_stream_codecs():
    """cli/inspect._V3_TAGGED_SLOTS is a light-import mirror of the
    pipeline's per-stream codec table; they must agree."""
    from fastqpacker_tpu.cli import inspect as fqinspect

    tagged = tuple(
        i for i, pol in enumerate(native.STREAM_CODECS) if pol != "zstd"
    )
    assert fqinspect._V3_TAGGED_SLOTS == tagged


def test_pick_memo_streak_and_reprobe_semantics():
    """E072: after STREAK hopeless probes the memo skips, but re-probes
    every PROBE_EVERY-th block; any positive outcome resets the streak
    so probing resumes for every block."""
    m = native.PickMemo()
    # first STREAK blocks always probe
    for _ in range(native.PickMemo.STREAK):
        assert m.sctx_should_probe()
        m.sctx_outcome(True)
    # in skip mode: only every PROBE_EVERY-th call probes
    decisions = [m.sctx_should_probe() for _ in range(8)]
    assert sum(decisions) == 2  # 8 / PROBE_EVERY
    # a positive outcome resets: everything probes again
    m.sctx_outcome(False)
    assert m.sctx_should_probe() is True
    # coverage memo: same machinery
    c = native.PickMemo()
    for _ in range(native.PickMemo.STREAK):
        assert c.cov_should_probe()
        c.cov_outcome(False)
    assert sum(c.cov_should_probe() for _ in range(8)) == 2
    c.cov_outcome(True)
    assert c.cov_should_probe() is True


def test_pick_memo_output_identical_on_homogeneous_corpus():
    """On statistics-homogeneous data a skipped probe reaches the same
    verdict as a run probe, so the memoized pipeline's container must be
    byte-identical to per-block encoding with no memo."""
    rng = np.random.default_rng(99)
    n, L = 30000, 100
    seq = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, size=(n, L))
    ]
    qual = (33 + rng.integers(0, 41, size=(n, L))).astype(np.uint8)
    recs = []
    for i in range(n):
        recs.append(
            b"@r%d\n%s\n+\n%s\n"
            % (i, seq[i].tobytes(), qual[i].tobytes())
        )
    data = b"".join(recs)
    # exact framing: the MT path's resync framing legitimately re-frames
    # blocks (the wire is indifferent), but this test compares per-block
    # bytes, so block extents must match the parser's. The memoized path
    # under test is then the C++ MT one (E080).
    import os as _os

    _os.environ["FQZ_MT_SEQ_FRAMING"] = "1"
    try:
        comp_memo = compress_native_bytes(data, block_size=5000)
    finally:
        _os.environ.pop("FQZ_MT_SEQ_FRAMING", None)
    # per-block path with memo disabled: parse into the same blocks and
    # encode each with memo=None, then compare payload bytes block-wise
    from fastqpacker_tpu.parser.fastq import FastqStreamParser
    import io as _io

    parser = FastqStreamParser(_io.BytesIO(data), block_size=5000)
    payload = b"".join(
        native.encode_block_native(blk, 33, memo=None)
        for blk in parser.blocks()
    )
    assert payload in comp_memo  # same block bytes after the header
    assert fq.decompress_bytes(comp_memo) == data


def _mt_v3_decode(comp: bytes):
    """Drive the whole-file native v3 decoder directly (no fallback)."""
    from fastqpacker_tpu.runtime import bindings

    if not (bindings.available() and bindings.decompress_mt_v3_available()):
        pytest.skip("native v3 MT decoder unavailable")
    fh = container.read_file_header(io.BytesIO(comp))
    qoffset = 64 if fh.flags & container.FLAG_PHRED64 else 33
    sink = io.BytesIO()
    res = bindings.decompress_mt_v3(
        np.frombuffer(comp[10:], np.uint8), qoffset, 2, -1, sink=sink
    )
    return res, sink.getvalue()


def _zstd_tag_corpus(n=20000, seed=5) -> bytes:
    """Corpus whose v3 streams stay in the native decode envelope
    (zstd/rans/tok tags — pooled qualities keep qctx out)."""
    rng = np.random.default_rng(seed)
    pool = (33 + rng.integers(0, 41, (64, 120)).astype(np.uint8))
    recs = []
    for i in range(n):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), 120).tobytes()
        recs.append(
            b"@q%d z:%d\n%s\n+\n%s\n"
            % (i, i % 3, seq, pool[i % 64].tobytes())
        )
    return b"".join(recs)


def test_mt_v3_decode_engages_and_matches(tmp_path):
    """E078: the whole-file native v3 decoder handles zstd/rANS/tok
    containers byte-exactly; context-coded containers fall back."""
    data = _zstd_tag_corpus()
    comp = compress_native_bytes(data, block_size=5000)
    res, out = _mt_v3_decode(comp)
    assert res == len(data) and out == data
    # public API end-to-end (routes through the MT path)
    assert fq.decompress_bytes(comp) == data


def _markov_corpus(nrec=30_000, L=151, sticky=0.65, seed=3) -> bytes:
    """Correlated DNA: the picks choose TAG_SCTX for the seq stream."""
    g = np.random.default_rng(seed)
    sym = np.frombuffer(b"ACGT", np.uint8)
    steps = g.random((nrec, L))
    jumps = g.integers(1, 4, (nrec, L))
    bases = np.zeros((nrec, L), np.uint8)
    bases[:, 0] = g.integers(0, 4, nrec)
    for p in range(1, L):
        stay = steps[:, p] < sticky
        bases[:, p] = np.where(
            stay, bases[:, p - 1], (bases[:, p - 1] + jumps[:, p]) % 4
        )
    recs = []
    for i in range(nrec):
        recs.append(
            b"@r%d\n%s\n+\n%s\n"
            % (i, sym[bases[i]].tobytes(), b"I" * L)
        )
    return b"".join(recs)


def _genome_corpus(nrec=4000, L=151, genome_len=40_000, seed=5) -> bytes:
    """Coverage-redundant reads: the picks choose TAG_SLDM / the
    cross-block container dictionary."""
    g = np.random.default_rng(seed)
    sym = np.frombuffer(b"ACGT", np.uint8)
    genome = g.integers(0, 4, genome_len).astype(np.uint8)
    starts = g.integers(0, genome_len - L, nrec)
    rows = sym[genome[starts[:, None] + np.arange(L)]]
    return b"".join(
        b"@c%d\n%s\n+\n%s\n" % (i, rows[i].tobytes(), b"F" * L)
        for i in range(nrec)
    )


def _first_seq_tag(comp: bytes) -> int:
    buf = io.BytesIO(comp)
    fh = container.read_file_header(buf)
    if fh.flags & container.FLAG_SEQ_DICT:
        container.read_seq_dict_section(buf)
    hdr = container.read_block_header(buf, fh.version)
    payload = buf.read(sum(hdr.stream_sizes(container.VERSION_2)))
    return payload[0]


def test_mt_v3_decode_sctx_envelope():
    """E081: TAG_SCTX containers decode through the whole-file native
    path byte-exactly (no per-block fallback)."""
    data = _markov_corpus()
    comp = compress_native_bytes(data)
    assert _first_seq_tag(comp) == native.TAG_SCTX
    res, out = _mt_v3_decode(comp)
    assert res == len(data) and out == data
    assert fq.decompress_bytes(comp) == data


def test_mt_v3_decode_sldm_envelope():
    """E081: TAG_SLDM containers (single block, no dict section) decode
    through the whole-file native path byte-exactly."""
    data = _genome_corpus()
    comp = compress_native_bytes(data)  # one 100k-record block: no dict
    fh = container.read_file_header(io.BytesIO(comp))
    assert not (fh.flags & container.FLAG_SEQ_DICT)
    assert _first_seq_tag(comp) == native.TAG_SLDM
    res, out = _mt_v3_decode(comp)
    assert res == len(data) and out == data
    assert fq.decompress_bytes(comp) == data


def test_mt_v3_decode_wctx_container():
    """E081: TAG_WCTX (device-mesh context coded) containers decode
    through the whole-file native path byte-exactly — block-level MT
    over the AVX2 lockstep twin."""
    from fastqpacker_tpu.parallel import mesh as pmesh
    from fastqpacker_tpu.pipeline import meshpipe

    data = _markov_corpus(nrec=6000)
    mesh = pmesh.make_mesh(8)
    comp = meshpipe.compress_mesh_bytes(
        data, fq.Options(block_size=700), mesh
    )
    # the corpus must actually exercise the wctx tag somewhere
    buf = io.BytesIO(comp)
    fh = container.read_file_header(buf)
    if fh.flags & container.FLAG_SEQ_DICT:
        container.read_seq_dict_section(buf)
    tags = set()
    while True:
        bh = container.read_block_header(buf, fh.version)
        if bh is None:
            break
        payload = buf.read(sum(bh.stream_sizes(container.VERSION_2)))
        sizes = bh.stream_sizes(container.VERSION_2)
        off = 0
        for k in range(3):
            if sizes[k]:
                tags.add(payload[off])
            off += sizes[k]
        for k in range(3, 6):
            off += sizes[k]
    assert container.TAG_WCTX in tags, tags
    if not (fh.flags & container.FLAG_SEQ_DICT):
        res, out = _mt_v3_decode(comp)
        assert res == len(data) and out == data
    assert fq.decompress_bytes(comp) == data


def test_mt_v3_compress_accepts_single_block_coverage(monkeypatch):
    """E086: a single-block coverage file builds no dict on any path,
    so the whole-file MT compress keeps it (byte-identical to the
    per-block Python path) instead of bouncing to Python."""
    from fastqpacker_tpu.pipeline import native as native_mod
    from fastqpacker_tpu.runtime import bindings

    data = _genome_corpus(nrec=30000)  # ~9 MB: one block on every path
    comp = fq.compress_bytes(
        data, fq.Options(version=container.VERSION_3_NATIVE)
    )
    fh = container.read_file_header(io.BytesIO(comp))
    assert not (fh.flags & container.FLAG_SEQ_DICT)
    assert _first_seq_tag(comp) == native.TAG_SLDM
    # true per-block Python path (whole-file MT disabled)
    monkeypatch.setattr(bindings, "compress_mt_v3_available", lambda: False)
    py = io.BytesIO()
    native_mod.compress_native(
        io.BytesIO(data), py,
        fq.Options(version=container.VERSION_3_NATIVE),
    )
    assert py.getvalue() == comp
    assert fq.decompress_bytes(comp) == data


def test_mt_v3_decode_dict_container():
    """E081: FLAG_SEQ_DICT containers decode through the whole-file
    native path — the container dictionary is referenced as the
    TAG_SLDM match prefix for every block."""
    from fastqpacker_tpu.ops import sldm
    from fastqpacker_tpu.runtime import bindings

    if not (bindings.available() and bindings.decompress_mt_v3_ex_available()):
        pytest.skip("native v3 MT dict decoder unavailable")
    data = _genome_corpus(nrec=6000)
    comp = compress_native_bytes(data, block_size=1500)  # 4 blocks
    buf = io.BytesIO(comp)
    fh = container.read_file_header(buf)
    assert fh.flags & container.FLAG_SEQ_DICT
    raw_len, dcomp = container.read_seq_dict_section(buf)
    seq_dict = sldm.decompress_dict(dcomp, raw_len)
    body = comp[buf.tell():]
    qoffset = 64 if fh.flags & container.FLAG_PHRED64 else 33
    sink = io.BytesIO()
    res = bindings.decompress_mt_v3_ex(
        np.frombuffer(body, np.uint8), qoffset, 2, seq_dict, -1, sink=sink
    )
    assert res == len(data) and sink.getvalue() == data
    # public API end-to-end (routes through the MT path)
    assert fq.decompress_bytes(comp) == data


def test_mt_v3_decode_hostile_containers():
    """Mutated v3 containers through the MT decoder: typed failure or
    clean fallback, never a crash, and hostile declared sizes must not
    allocate absurd memory (E048/E038 classes)."""
    from fastqpacker_tpu.runtime import bindings

    if not (bindings.available() and bindings.decompress_mt_v3_available()):
        pytest.skip("native v3 MT decoder unavailable")
    data = _zstd_tag_corpus(4000, seed=6)
    comp = bytearray(compress_native_bytes(data, block_size=1000))
    # CRC flip -> typed CRC mismatch through the public API
    flipped = bytearray(comp)
    # find first block header (after 10-byte file header): crc is the
    # 10th u32 of the 40-byte header
    flipped[10 + 36] ^= 0xFF
    with pytest.raises(container.FormatError, match="CRC32 mismatch"):
        fq.decompress_bytes(bytes(flipped))
    # hostile num_records / stream sizes: every mutation of the first
    # header must fail typed or fall back, within a time box
    import time

    rng = np.random.default_rng(11)
    for _ in range(200):
        b = bytearray(comp)
        off = 10 + int(rng.integers(0, 40))
        b[off] = int(rng.integers(0, 256))
        t0 = time.perf_counter()
        try:
            fq.decompress_bytes(bytes(b))
        except (container.FormatError, ValueError, RuntimeError, OSError):
            pass
        assert time.perf_counter() - t0 < 20
    # random payload mutations
    for _ in range(200):
        b = bytearray(comp)
        b[int(rng.integers(50, len(b)))] = int(rng.integers(0, 256))
        try:
            fq.decompress_bytes(bytes(b))
        except (container.FormatError, ValueError, RuntimeError, OSError):
            pass


def test_mt_v3_decode_qctx_envelope(tmp_path):
    """E078 follow-up: TAG_QCTX quality streams decode through the
    whole-file native path (wire parse + table deserialization + the
    fq_qctx_decode twin), byte-exact, and hostile mutations stay typed."""
    rng = np.random.default_rng(12)
    recs = []
    for i in range(30000):
        ln = int(rng.integers(1, 160))
        s = rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln).tobytes()
        q = (33 + rng.integers(0, 41, ln).astype(np.uint8)).tobytes()
        recs.append(b"@sr%d f:%d\n%s\n+\n%s\n" % (i, i % 11, s, q))
    data = b"".join(recs)
    comp = compress_native_bytes(data, block_size=8000)
    # the corpus must actually route qual to qctx for this test to bite
    tags = [row for row in _all_block_tags(comp)]
    assert any(t[1] == native.TAG_QCTX for t in tags), tags
    res, out = _mt_v3_decode(comp)
    assert res == len(data) and out == data
    assert fq.decompress_bytes(comp) == data
    # hostile mutations across header/tables/words: typed or fallback
    import time

    base = bytearray(comp)
    for _ in range(150):
        b = bytearray(base)
        b[int(rng.integers(50, len(b)))] = int(rng.integers(0, 256))
        t0 = time.perf_counter()
        try:
            fq.decompress_bytes(bytes(b))
        except (container.FormatError, ValueError, RuntimeError, OSError):
            pass
        assert time.perf_counter() - t0 < 20


def _all_block_tags(comp):
    bio = io.BytesIO(comp)
    container.read_file_header(bio)
    out = []
    while True:
        bh = container.read_block_header(bio, container.VERSION_3_NATIVE)
        if bh is None:
            break
        row = []
        for i, sz in enumerate(bh.stream_sizes(container.VERSION_2)):
            chunk = bio.read(sz)
            row.append(chunk[0] if (i < 3 and sz) else None)
        out.append(row)
    return out
