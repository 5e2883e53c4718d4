"""Order-k context sequence coder (ops/seqctx.py, v3 TAG_SCTX).

Same test shape as test_qualctx.py: the numpy reference defines the
semantics, the C++ runtime must be byte-identical, the pipeline pick
must engage exactly where the model wins, and corrupt payloads must
fail typed.
"""

import io

import numpy as np
import pytest

from fastqpacker_tpu.ops import seqctx


rng = np.random.default_rng(42)


def markov_bases(nrec, L, sticky=0.6):
    cur = rng.integers(0, 4, nrec)
    m = np.empty((nrec, L), np.uint8)
    for p in range(L):
        stay = rng.random(nrec) < sticky
        cur = np.where(stay, cur, rng.integers(0, 4, nrec))
        m[:, p] = cur
    return m.reshape(-1)


def _case(lengths, bases):
    lengths = np.asarray(lengths, np.int64)
    packed = seqctx.pack_stream(bases, lengths).tobytes()
    return packed, lengths


_varlens = rng.integers(0, 90, 100).astype(np.int64)
CASES = [
    _case([7, 3, 4], rng.integers(0, 4, 14).astype(np.uint8)),
    _case([0, 5, 0, 1], rng.integers(0, 4, 6).astype(np.uint8)),
    _case([151] * 40, markov_bases(40, 151)),
    _case(_varlens, rng.integers(0, 4, int(_varlens.sum())).astype(np.uint8)),
]


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_reference_roundtrip(idx):
    packed, lengths = CASES[idx]
    enc = seqctx.encode_reference(packed, lengths)
    assert seqctx.decode_reference(enc, lengths) == packed


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_native_matches_reference(idx):
    from fastqpacker_tpu.runtime import bindings

    if not bindings.sctx_available():
        pytest.skip("native runtime unavailable")
    packed, lengths = CASES[idx]
    enc_ref = seqctx.encode_reference(packed, lengths)
    enc_nat = seqctx.encode(packed, lengths)
    assert enc_nat == enc_ref
    assert seqctx.decode(enc_ref, lengths) == packed


def test_unpack_pack_inverse():
    lengths = np.array([5, 0, 13, 151, 1], np.int64)
    bases = rng.integers(0, 4, int(lengths.sum())).astype(np.uint8)
    packed = seqctx.pack_stream(bases, lengths)
    assert np.array_equal(seqctx.unpack_stream(packed, lengths), bases)


def test_padding_bits_zero():
    """Wire packed rows zero their padding bits (CRC is computed over
    the packed stream, so decode must reproduce them exactly)."""
    lengths = np.array([3], np.int64)
    bases = np.array([3, 3, 3], np.uint8)
    packed = seqctx.pack_stream(bases, lengths)
    assert packed[0] == 0b00111111


def test_order_pick_prefers_low_order_on_order1_data():
    bases = markov_bases(200, 151, sticky=0.7)
    lengths = np.full(200, 151, np.int64)
    packed = np.frombuffer(
        seqctx.pack_stream(bases, lengths).tobytes(), np.uint8
    )
    _, hist6 = seqctx.prepare(packed, lengths)
    order, est = seqctx.pick_order(hist6)
    assert order == 2
    # estimate within 12% of the real payload
    enc = seqctx.encode(packed.tobytes(), lengths)
    assert abs(len(enc) - est) < 0.12 * len(enc) + 256


def test_estimate_marginalization_consistency():
    bases = markov_bases(50, 80)
    lengths = np.full(50, 80, np.int64)
    hist6 = seqctx.histogram(bases, lengths)
    for k in (2, 4):
        hk = seqctx.marginalize(hist6, k)
        direct = seqctx.histogram(bases, lengths, order=k)
        np.testing.assert_array_equal(hk, direct)


def test_truncated_and_corrupt_rejected():
    packed, lengths = CASES[2]
    enc = seqctx.encode_reference(packed, lengths)
    with pytest.raises(ValueError):
        seqctx.decode(enc[: len(enc) // 2], lengths)
    bad = bytearray(enc)
    bad[4] ^= 0x01  # order byte -> invalid
    with pytest.raises(ValueError):
        seqctx.decode(bytes(bad), lengths)
    with pytest.raises(ValueError):
        seqctx.decode(enc, lengths[:-1])  # totals mismatch


def _seq_tag(container_bytes: bytes) -> int:
    from fastqpacker_tpu.format import container as c

    buf = io.BytesIO(container_bytes)
    fh = c.read_file_header(buf)
    hdr = c.read_block_header(buf, fh.version)
    payload = buf.read(sum(hdr.stream_sizes(c.VERSION_2)))
    return payload[0]


def test_pipeline_picks_sctx_on_correlated_dna():
    from fastqpacker_tpu.pipeline import api, native
    from fastqpacker_tpu.format import container

    sym = np.frombuffer(b"ACGT", np.uint8)
    bases = markov_bases(30_000, 151, sticky=0.65)
    m = bases.reshape(30_000, 151)
    recs = []
    for i in range(m.shape[0]):
        recs.append(
            b"@r%d\n" % i + sym[m[i]].tobytes() + b"\n+\nIIIIIIIIII"
            + b"I" * 141 + b"\n"
        )
    raw = b"".join(recs)
    comp = api.compress_bytes(
        raw, api.Options(version=container.VERSION_3_NATIVE, workers=1)
    )
    assert _seq_tag(comp) == native.TAG_SCTX
    assert api.decompress_bytes(comp) == raw


def test_pipeline_never_loses_on_random_dna():
    """Random DNA has no order-k structure; whatever the pick chooses
    (sctx still wins by the padding bits + zstd framing it avoids), the
    v3 container must not exceed v2's and must round-trip."""
    from fastqpacker_tpu.pipeline import api
    from fastqpacker_tpu.format import container

    sym = np.frombuffer(b"ACGT", np.uint8)
    m = rng.integers(0, 4, (30_000, 151))
    recs = []
    for i in range(m.shape[0]):
        recs.append(
            b"@r%d\n" % i + sym[m[i]].tobytes() + b"\n+\nIIIIIIIIII"
            + b"I" * 141 + b"\n"
        )
    raw = b"".join(recs)
    comp3 = api.compress_bytes(
        raw, api.Options(version=container.VERSION_3_NATIVE, workers=1)
    )
    comp2 = api.compress_bytes(
        raw, api.Options(version=container.VERSION_2, workers=1)
    )
    assert len(comp3) <= len(comp2) * 1.01
    assert api.decompress_bytes(comp3) == raw
