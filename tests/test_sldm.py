"""Coverage-redundancy sequence candidate (ops/sldm.py, v3 TAG_SLDM).

Same shape as test_seqctx.py: the numpy reference defines the pack/unpack
semantics, the C++ twin must match byte-for-byte, the pipeline pick must
engage exactly on coverage-redundant data, and corrupt payloads must fail
typed.
"""

import io

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container
from fastqpacker_tpu.ops import seqctx, sldm
from fastqpacker_tpu.pipeline import api, native

rng = np.random.default_rng(99)


def genome_reads(nrec=2000, L=151, genome_len=40_000, seed=5):
    """Reads sampled from one small genome: block-local coverage, the
    structure TAG_SLDM exists for."""
    g = np.random.default_rng(seed)
    genome = g.integers(0, 4, genome_len).astype(np.uint8)
    starts = g.integers(0, genome_len - L, nrec)
    return genome[starts[:, None] + np.arange(L)]


def _packed(bases_2d):
    nrec, L = bases_2d.shape
    lengths = np.full(nrec, L, np.int64)
    packed = seqctx.pack_stream(bases_2d.reshape(-1), lengths)
    return packed, lengths


# --- pack/unpack semantics ---------------------------------------------------

VARLENS = rng.integers(0, 90, 60).astype(np.int64)
CASES = [
    (np.array([7, 3, 4], np.int64), rng.integers(0, 4, 14).astype(np.uint8)),
    (np.array([0, 5, 0, 1], np.int64), rng.integers(0, 4, 6).astype(np.uint8)),
    (np.array([151] * 30, np.int64), rng.integers(0, 4, 30 * 151).astype(np.uint8)),
    (VARLENS, rng.integers(0, 4, int(VARLENS.sum())).astype(np.uint8)),
]


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_native_pack_unpack_match_reference(idx):
    from fastqpacker_tpu.runtime import bindings

    if not bindings.sctx_available():
        pytest.skip("native runtime unavailable")
    lengths, bases = CASES[idx]
    packed_ref = seqctx.pack_stream(bases, lengths)
    assert bindings.sldm_pack(bases, lengths).tobytes() == packed_ref.tobytes()
    assert (
        bindings.sldm_unpack(packed_ref, lengths).tobytes()
        == seqctx.unpack_stream(packed_ref, lengths).tobytes()
    )
    assert bindings.sldm_unpack(packed_ref, lengths).tobytes() == bases.tobytes()


def test_native_pack_masks_hostile_codes():
    from fastqpacker_tpu.runtime import bindings

    if not bindings.sctx_available():
        pytest.skip("native runtime unavailable")
    lengths = np.array([5, 3], np.int64)
    hostile = np.array([0xFF, 2, 0x83, 1, 0, 3, 0x40, 2], np.uint8)
    ref = seqctx.pack_stream(hostile & 3, lengths)
    assert bindings.sldm_pack(hostile, lengths).tobytes() == ref.tobytes()


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_encode_decode_roundtrip(idx):
    lengths, bases = CASES[idx]
    packed = seqctx.pack_stream(bases, lengths)
    payload = sldm.encode(packed, lengths)
    assert sldm.decode(payload, lengths) == packed.tobytes()


def test_encode_bases_equals_encode():
    lengths, bases = CASES[3]
    packed = seqctx.pack_stream(bases, lengths)
    assert sldm.encode_bases(bases) == sldm.encode(packed, lengths)


# --- coverage probe ----------------------------------------------------------


def test_probe_fires_on_coverage_and_not_on_iid():
    reads = genome_reads(nrec=4000, L=151, genome_len=40_000)
    packed_cov, _ = _packed(reads)
    iid = rng.integers(0, 4, reads.shape).astype(np.uint8)
    packed_iid, _ = _packed(iid)
    assert sldm.coverage_probe(packed_cov) >= sldm.DUP_THRESHOLD
    assert sldm.coverage_probe(packed_iid) < sldm.DUP_THRESHOLD


def test_probe_small_stream_returns_zero():
    assert sldm.coverage_probe(np.zeros(64, np.uint8)) == 0.0


# --- pipeline pick -----------------------------------------------------------


def _fastq_from(reads):
    am = np.frombuffer(b"ACGT", np.uint8)
    seqs = np.asarray(am[reads])
    out = []
    for i in range(len(reads)):
        out.append(b"@sldm_%d\n" % i + seqs[i].tobytes() + b"\n+\n" + b"I" * reads.shape[1] + b"\n")
    return b"".join(out)


def _seq_tag(comp: bytes) -> int:
    # the seq stream (and so its codec tag byte) starts right after the
    # first block header
    fh = container.parse_file_header(comp[:10])
    assert fh.version == container.VERSION_3_NATIVE
    hdr_size = container.block_header_size(container.VERSION_3_NATIVE)
    return comp[10 + hdr_size]


def test_pipeline_picks_sldm_on_coverage_data():
    data = _fastq_from(genome_reads())
    out = io.BytesIO()
    native.compress_native(io.BytesIO(data), out, fq.Options())
    comp = out.getvalue()
    assert _seq_tag(comp) == container.TAG_SLDM
    assert fq.decompress_bytes(comp) == data


def test_max_ratio_also_picks_sldm_and_roundtrips():
    data = _fastq_from(genome_reads(seed=11))
    out = io.BytesIO()
    native.compress_native(
        io.BytesIO(data), out, fq.Options(order1_qual=True)
    )
    comp = out.getvalue()
    assert _seq_tag(comp) == container.TAG_SLDM
    assert fq.decompress_bytes(comp) == data


def test_pipeline_skips_sldm_on_iid_dna():
    iid = rng.integers(0, 4, (3000, 151)).astype(np.uint8)
    data = _fastq_from(iid)
    out = io.BytesIO()
    native.compress_native(io.BytesIO(data), out, fq.Options())
    comp = out.getvalue()
    assert _seq_tag(comp) != container.TAG_SLDM
    assert fq.decompress_bytes(comp) == data


def test_sldm_beats_v2_on_coverage_data():
    data = _fastq_from(genome_reads(nrec=4000))
    out = io.BytesIO()
    native.compress_native(io.BytesIO(data), out, fq.Options())
    v3 = len(out.getvalue())
    v2 = len(fq.compress_bytes(data))
    assert v3 < 0.8 * v2


# --- hostile payloads --------------------------------------------------------


def test_decode_rejects_truncated_payload():
    lengths, bases = CASES[3]
    packed = seqctx.pack_stream(bases, lengths)
    payload = sldm.encode(packed, lengths)
    with pytest.raises(ValueError):
        sldm.decode(payload[: len(payload) // 2], lengths)


def test_decode_rejects_wrong_total():
    lengths, bases = CASES[3]
    packed = seqctx.pack_stream(bases, lengths)
    payload = sldm.encode(packed, lengths)
    short = lengths.copy()
    short[0] += 1
    with pytest.raises(ValueError):
        sldm.decode(payload, short)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        sldm.decode(b"\x13\x37not a zstd frame", np.array([16], np.int64))


def test_container_decode_rejects_corrupt_sldm_block():
    data = _fastq_from(genome_reads(seed=13))
    out = io.BytesIO()
    native.compress_native(io.BytesIO(data), out, fq.Options())
    comp = bytearray(out.getvalue())
    hdr_size = container.block_header_size(container.VERSION_3_NATIVE)
    comp[10 + hdr_size + 10] ^= 0xFF  # flip a byte inside the sldm frame
    with pytest.raises(container.FormatError):
        fq.decompress_bytes(bytes(comp))
