"""FQZ v3 through the mesh entropy coder (pipeline/meshpipe.py).

VERDICT r1 item 2: the sharded TPU rANS stage must be a production path
that writes real containers, not just a tested kernel. These tests
compress files to v3 *through the mesh coder* on the 8-virtual-device
CPU mesh (tests/conftest.py) and decode them with the ordinary decoder.
"""

import io
import struct

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container
from fastqpacker_tpu.ops import rans
from fastqpacker_tpu.pipeline import api, meshpipe
from fastqpacker_tpu.parallel import mesh as pmesh


def _fastq(n: int, seed: int = 0, read_len: int = 80) -> bytes:
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    out = []
    for i in range(n):
        ln = read_len + int(rng.integers(-4, 5))
        seq = bases[rng.integers(0, 5, ln)].tobytes()
        qual = (rng.integers(33, 74, ln).astype(np.uint8)).tobytes()
        out.append(b"@r%d d:%d\n%s\n+\n%s\n" % (i, i % 5, seq, qual))
    return b"".join(out)


def _stream_tags(comp: bytes) -> list[list[int]]:
    bio = io.BytesIO(comp)
    fh = container.read_file_header(bio)
    tags = []
    while True:
        bh = container.read_block_header(bio, fh.version)
        if bh is None:
            break
        row = []
        for i, sz in enumerate(bh.stream_sizes(fh.version)):
            chunk = bio.read(sz)
            if i < 3:
                row.append(chunk[0] if sz else -1)
        tags.append(row)
    return tags


def test_mesh_v3_roundtrip_standard_decoder():
    """Multi-round file (blocks > devices): compress through the mesh,
    decode with the ordinary pipeline. On IID-noise quals the empirical
    pick sends the quality slot to the device order-0 coder; random seq
    (near-incompressible packed) stays zstd — the r3 pick policy
    (VERDICT r2 #1: the mesh must never lose to the host candidates)."""
    data = _fastq(12000, seed=1)
    mesh = pmesh.make_mesh(8)
    opts = fq.Options(block_size=700)  # ~18 blocks -> 3 rounds
    comp = meshpipe.compress_mesh_bytes(data, opts, mesh)
    assert api.decompress_bytes(comp) == data
    tags = _stream_tags(comp)
    assert len(tags) >= 17
    valid = (
        container.TAG_RANS, container.TAG_ZSTD, container.TAG_WCTX,
        container.TAG_SLDM,
    )
    for row in tags:
        assert row[0] in valid and row[1] in valid
    # the empirical pick must never lose to the host v3 pick by more
    # than per-stream device overhead (lane states)
    hostv3 = api.compress_bytes(
        data, fq.Options(
            block_size=700, version=container.VERSION_3_NATIVE
        )
    )
    assert len(comp) <= int(len(hostv3) * 1.05)


def test_mesh_v3_partial_round_and_single_block():
    mesh = pmesh.make_mesh(8)
    # fewer blocks than devices (partial round padded with empty streams)
    data = _fastq(900, seed=2)
    comp = meshpipe.compress_mesh_bytes(
        data, fq.Options(block_size=400), mesh
    )
    assert api.decompress_bytes(comp) == data
    # single block
    data1 = _fastq(50, seed=3)
    comp1 = meshpipe.compress_mesh_bytes(data1, fq.Options(), mesh)
    assert api.decompress_bytes(comp1) == data1


def test_mesh_v3_empty_and_edge_records():
    mesh = pmesh.make_mesh(8)
    assert meshpipe.compress_mesh_bytes(b"", fq.Options(), mesh)[:4] == b"FQZ\0"
    assert api.decompress_bytes(
        meshpipe.compress_mesh_bytes(b"", fq.Options(), mesh)
    ) == b""
    # empty sequences, plus payloads, CRLF, lowercase normalization
    data = (
        b"@a\r\n\r\n+\r\n\r\n"
        b"@b\nACGT\n+pay\nIIII\n"
        b"@c\nacgtn\n+\nIIIII\n"
    )
    comp = meshpipe.compress_mesh_bytes(data, fq.Options(), mesh)
    out = api.decompress_bytes(comp)
    assert out == b"@a\n\n+\n\n@b\nACGT\n+pay\nIIII\n@c\nACGTN\n+\nIIIII\n"


def test_mesh_v3_phred64_flag():
    mesh = pmesh.make_mesh(8)
    n = 30
    seq = b"ACGTACGT"
    qual = bytes([70] * 8)  # min 70 >= 64 -> Phred+64
    data = b"".join(
        b"@r%d\n%s\n+\n%s\n" % (i, seq, qual) for i in range(n)
    )
    comp = meshpipe.compress_mesh_bytes(data, fq.Options(), mesh)
    fh = container.read_file_header(io.BytesIO(comp))
    assert fh.phred64
    assert api.decompress_bytes(comp) == data


def test_mesh_streams_decode_with_host_twin(monkeypatch):
    """Every mesh-emitted device payload (TAG_RANS / TAG_WCTX) must
    decode byte-identically on the sequential C++ backend too
    (backend-equivalence invariant). Streams are produced through the
    SAME sharded encode programs the production path dispatches
    (pmesh.entropy_encode_streams / wctx_encode_streams) — constructing
    them directly keeps the test independent of the per-stream pick,
    which since r3 legitimately routes small/structured streams to host
    coders (qctx on tiny blocks) by actual size."""
    from fastqpacker_tpu.ops import rans, wctx
    from fastqpacker_tpu.runtime import bindings
    from fastqpacker_tpu.ops import qualctx

    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(4)
    checked = 0

    # TAG_RANS: skewed-IID byte streams through the sharded order-0
    # coder, decoded by both backends
    streams = [
        np.frombuffer(b"5AF", np.uint8)[
            rng.choice(3, 40000, p=[0.9, 0.05, 0.05])
        ].tobytes()
        for _ in range(4)
    ]
    payloads = pmesh.entropy_encode_streams(
        streams + [b""] * (8 - len(streams)), mesh
    )
    for s, pl in zip(streams, payloads):
        monkeypatch.setenv("FQZ_RANS_BACKEND", "host")
        out_host = rans.decode_stream(pl)
        monkeypatch.setenv("FQZ_RANS_BACKEND", "device")
        out_dev = rans.decode_stream(pl)
        assert out_host == out_dev == s
        checked += 1

    # TAG_WCTX: markov seq codes + walk quals through the sharded
    # context coder (both models), decoded by C++ twin and XLA kernel
    n_rec, L = 1200, 90
    lengths = np.full(n_rec, L, np.int64)
    jobs = []
    seq_syms = rng.integers(0, 4, n_rec * L).astype(np.uint8)
    # data histogram via the matrix path (what _wctx_block_prep needs)
    sb, S = wctx.lane_bounds(lengths, 256)
    seg = (sb[1:] - sb[:-1]).astype(np.int32)
    startm = wctx.start_matrix(lengths, sb, S)
    symm = wctx.to_matrix(seq_syms, sb, S, 0)
    ctxm = wctx.context_matrix(symm, startm, wctx.MODEL_SEQ, 2)
    hist6 = wctx.matrix_histogram(symm, ctxm, 16, seg)
    qual_syms = np.clip(
        30 + np.cumsum(rng.integers(-2, 3, n_rec * L)) // 2, 0, 46
    ).astype(np.uint8)
    _, hist2 = qualctx.prepare(
        _integrated_to_delta(qual_syms, lengths), lengths
    )
    for model, order, syms, hist in (
        (wctx.MODEL_SEQ, 2, seq_syms, hist6),
        (wctx.MODEL_QUAL, 0, qual_syms, qualctx.hist_for_model(hist2, 0)),
        (wctx.MODEL_QUAL, 1, qual_syms, hist2),
    ):
        payloads = pmesh.wctx_encode_streams(
            [(syms, lengths, hist)] * 2, model, order, mesh, lanes=256
        )
        for pl in payloads:
            if pl is None:  # padded group slots
                continue
            assert bindings.wctx_available()
            out_nat = wctx.decode_stream(pl, lengths, use_native=True)
            out_dev = wctx.decode_stream(pl, lengths, use_native=False)
            assert np.array_equal(out_nat, out_dev)
            assert np.array_equal(out_nat, syms)
            checked += 1
    assert checked >= 6


def _integrated_to_delta(raw: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    n_rec = len(lengths)
    L = int(lengths[0])
    q = raw.reshape(n_rec, L).astype(np.int16)
    d = np.zeros_like(q)
    d[:, 0] = q[:, 0]
    d[:, 1:] = (q[:, 1:] - q[:, :-1]) % 256
    return d.astype(np.uint8).reshape(-1)


def test_entropy_encode_streams_lengths_and_empties():
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(5)
    lens = [0, 1, 255, 256, 257, 65536, 12345, 99999]
    streams = [
        rng.integers(0, 40, size=l).astype(np.uint8).tobytes() for l in lens
    ]
    payloads = pmesh.entropy_encode_streams(streams, mesh)
    for s, p in zip(streams, payloads):
        assert rans.decode_stream(p) == s
    # empty payload is the canonical empty-stream header
    assert payloads[0] == struct.pack(rans.HEADER_FMT, 0, 0)


def test_mesh_lossless_rejected():
    mesh = pmesh.make_mesh(8)
    with pytest.raises(ValueError, match="lossless"):
        meshpipe.compress_mesh_bytes(
            b"@r\nACGT\n+\nIIII\n", fq.Options(lossless=True), mesh
        )


def test_mesh_decode_batched_roundtrip():
    """decompress_mesh batch-decodes mesh-written containers on the mesh
    and falls back per-block elsewhere — both byte-exact."""
    data = _fastq(9000, seed=8)
    mesh = pmesh.make_mesh(8)
    opts = fq.Options(block_size=500)  # 18 blocks: full + partial groups
    comp = meshpipe.compress_mesh_bytes(data, opts, mesh)
    out = io.BytesIO()
    meshpipe.decompress_mesh(io.BytesIO(comp), out, mesh)
    assert out.getvalue() == data
    # host-written v3 (per-stream tables / other tags): must fall back
    # and still round-trip
    hostv3 = api.compress_bytes(
        data, fq.Options(
            block_size=500, version=container.VERSION_3_NATIVE
        )
    )
    out2 = io.BytesIO()
    meshpipe.decompress_mesh(io.BytesIO(hostv3), out2, mesh)
    assert out2.getvalue() == data
    # v2 containers are rejected upstream of this entry in the CLI; here
    # the function itself only takes v3 — sanity: corrupt container fails
    bad = bytearray(comp)
    bad[len(bad) // 2] ^= 0x10
    with pytest.raises(Exception):
        meshpipe.decompress_mesh(io.BytesIO(bytes(bad)), io.BytesIO(), mesh)


def _markov_fastq(n: int, read_len: int = 100, seed: int = 7) -> bytes:
    """Context-model corpus: order-1 Markov bases (no LZ-matchable
    repeats) + per-record fresh random-walk quals — the shape where the
    v3 context models are the honest winners (bench.synth_fastq markov)."""
    rng = np.random.default_rng(seed)
    probs = np.array(
        [
            [0.17, 0.45, 0.25, 0.13],
            [0.13, 0.17, 0.45, 0.25],
            [0.45, 0.25, 0.13, 0.17],
            [0.25, 0.13, 0.17, 0.45],
        ]
    )
    cum = np.cumsum(probs, axis=1)
    total = n * read_len
    u = rng.random(total)
    codes = np.empty(total, np.uint8)
    prev = 0
    for i in range(total):
        prev = int(np.searchsorted(cum[prev], u[i], side="right"))
        prev = min(prev, 3)
        codes[i] = prev
    bases = np.frombuffer(b"ACGT", np.uint8)[codes].reshape(n, read_len)
    qsteps = rng.integers(-2, 3, size=(n, read_len)).astype(np.int32)
    qual = np.clip(
        33 + 30 + np.cumsum(qsteps, axis=1) // 3, 33, 74
    ).astype(np.uint8)
    out = []
    for i in range(n):
        out.append(
            b"@m%d\n%s\n+\n%s\n"
            % (i, bases[i].tobytes(), qual[i].tobytes())
        )
    return b"".join(out)


def test_mesh_context_coder_engages_and_matches_host_ratio():
    """On the context-model corpus the mesh picks TAG_WCTX for the
    dominant streams (the thesis path carries them on-device) and the
    container stays within 5% of the host v3 size (VERDICT r2 #1
    done-criterion), decoding byte-exact through BOTH the ordinary and
    the batched mesh decoder."""
    data = _markov_fastq(2200)
    mesh = pmesh.make_mesh(8)
    opts = fq.Options(block_size=1100)
    comp = meshpipe.compress_mesh_bytes(data, opts, mesh)
    assert api.decompress_bytes(comp) == data
    out = io.BytesIO()
    meshpipe.decompress_mesh(io.BytesIO(comp), out, mesh)
    assert out.getvalue() == data
    tags = _stream_tags(comp)
    assert any(row[1] == container.TAG_WCTX for row in tags), tags
    hostv3 = api.compress_bytes(
        data, fq.Options(
            block_size=1100, version=container.VERSION_3_NATIVE
        )
    )
    assert len(comp) <= int(len(hostv3) * 1.05), (len(comp), len(hostv3))


def test_mesh_decode_crc_catches_batch_corruption():
    """Flipping bytes inside a TAG_RANS seq/qual stream must surface as
    a typed error (CRC mismatch or rANS error), never wrong output."""
    data = _fastq(2000, seed=9)
    mesh = pmesh.make_mesh(8)
    comp = bytearray(
        meshpipe.compress_mesh_bytes(data, fq.Options(block_size=300), mesh)
    )
    import numpy as np

    rng = np.random.default_rng(0)
    hits = 0
    for _ in range(12):
        b = bytearray(comp)
        b[int(rng.integers(100, len(b)))] ^= int(rng.integers(1, 256))
        out = io.BytesIO()
        try:
            meshpipe.decompress_mesh(io.BytesIO(bytes(b)), out, mesh)
            assert out.getvalue() == data  # mutation hit dead bytes only
        except Exception:
            hits += 1
    assert hits >= 6  # most mutations must be caught, none accepted wrong


def test_mesh_seq_dict_on_coverage_data():
    """Cross-block sequence dictionary (E044) in mesh mode (r3): on
    multi-block coverage data the flag is set, the container stays
    standard v3 (ordinary decoder round-trips it), and the dict shrinks
    the output vs the same data compressed without a second block's
    worth of cross-block matches."""
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 20000)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = []
    for i in range(6000):  # 15x coverage of a 20 kb genome
        start = int(rng.integers(0, len(genome) - 60))
        seq = bases[genome[start:start + 60]].tobytes().decode()
        reads.append(f"@r{i}\n{seq}\n+\n{'I' * 60}\n")
    data = "".join(reads).encode()
    mesh = pmesh.make_mesh(8)
    comp = meshpipe.compress_mesh_bytes(
        data, fq.Options(block_size=1500), mesh
    )
    fh = container.read_file_header(io.BytesIO(comp))
    assert fh.flags & container.FLAG_SEQ_DICT
    assert fq.decompress_bytes(comp) == data
    # parity with the host v3 pipeline at the same framing (both use
    # the dict; the mesh pick must not regress materially)
    host = io.BytesIO()
    fq.compress(
        io.BytesIO(data),
        host,
        fq.Options(
            version=container.VERSION_3_NATIVE, block_size=1500
        ),
    )
    assert len(comp) <= int(len(host.getvalue()) * 1.05)
