"""Unit tests for the numpy codec transforms.

Reference analogs: sequence_test.go (pack/unpack, N positions, lowercase
normalization) and quality_test.go (delta wraparound, Phred detection
boundary table).
"""

import numpy as np
import pytest

from fastqpacker_tpu.ops import reference as refops
from fastqpacker_tpu.parser.fastq import QUAL_PAD


def _pad(rows: list[bytes], fill: int = 0) -> tuple[np.ndarray, np.ndarray]:
    lens = np.array([len(r) for r in rows], dtype=np.int32)
    width = int(lens.max()) if len(rows) else 0
    out = np.full((len(rows), width), fill, dtype=np.uint8)
    for i, r in enumerate(rows):
        out[i, : len(r)] = np.frombuffer(r, np.uint8)
    return out, lens


def pack_one(seq: bytes) -> tuple[bytes, list[int]]:
    mat, lens = _pad([seq])
    codes = refops.base_codes(mat)
    packed = refops.pack_codes(codes)
    nmask = refops.ambiguity_mask(mat, lens)
    plen = (len(seq) + 3) // 4
    return packed[0, :plen].tobytes(), list(np.flatnonzero(nmask[0]))


def unpack_one(packed: bytes, npos: list[int], seq_len: int) -> bytes:
    mat = np.frombuffer(packed, np.uint8)[None, :]
    ascii_mat = refops.codes_to_ascii(refops.unpack_codes(mat, seq_len))
    out = ascii_mat[0, :seq_len].copy()
    for p in npos:
        out[p] = ord("N")
    return out.tobytes()


def test_pack_basic_acgt():
    packed, npos = pack_one(b"ACGT")
    # A=00,C=01,G=10,T=11 LSB-first: 0b11100100 (sequence.go:70-73)
    assert packed == bytes([0b11100100])
    assert npos == []


def test_pack_lowercase_case_insensitive():
    packed, _ = pack_one(b"acgt")
    assert packed == bytes([0b11100100])


def test_pack_remainder_bases():
    for n in range(1, 9):
        seq = (b"ACGTACGTT")[:n]
        packed, _ = pack_one(seq)
        assert len(packed) == (n + 3) // 4
        assert unpack_one(packed, [], n) == seq.upper()


def test_n_positions_recorded():
    packed, npos = pack_one(b"ACGTNNNACGT")
    assert npos == [4, 5, 6]
    assert unpack_one(packed, npos, 11) == b"ACGTNNNACGT"


def test_every_non_acgt_byte_is_n():
    """Exotic ambiguity codes normalize to N (sequence.go:44-51)."""
    seq = b"ACGTRYKMSWBDHVacgtn-."
    packed, npos = pack_one(seq)
    out = unpack_one(packed, npos, len(seq))
    assert out == b"ACGTNNNNNNNNNNACGTNNN"


def test_lowercase_normalized_to_uppercase():
    packed, npos = pack_one(b"acgtACGT")
    assert unpack_one(packed, npos, 8) == b"ACGTACGT"


def test_empty_sequence():
    mat = np.zeros((1, 0), dtype=np.uint8)
    lens = np.array([0], dtype=np.int32)
    packed = refops.pack_codes(refops.base_codes(mat))
    assert packed.shape == (1, 0)


def test_nmask_capped_at_max_length():
    ln = refops.MAX_SEQUENCE_LENGTH + 8
    row = bytearray(b"A" * ln)
    row[5] = ord("N")
    row[refops.MAX_SEQUENCE_LENGTH + 2] = ord("N")  # beyond cap: untracked
    mat, lens = _pad([bytes(row)])
    nmask = refops.ambiguity_mask(mat, lens)
    assert list(np.flatnonzero(nmask[0])) == [5]


def test_overflow_guard_rejects_ambiguous_tail():
    ln = refops.MAX_SEQUENCE_LENGTH + 4
    row = bytearray(b"A" * ln)
    row[-1] = ord("N")
    mat, lens = _pad([bytes(row)])
    with pytest.raises(ValueError, match="ambiguous bases beyond"):
        refops.check_ambiguous_overflow(mat, lens)


def test_overflow_guard_accepts_clean_tail():
    ln = refops.MAX_SEQUENCE_LENGTH + 4
    row = bytes(b"N" + b"ACGT" * ((ln - 1) // 4 + 1))[:ln]
    mat, lens = _pad([row])
    refops.check_ambiguous_overflow(mat, lens)  # no raise


# --- quality -----------------------------------------------------------------


def test_delta_roundtrip_with_wraparound():
    """Descending qualities produce wrapped deltas (quality_test.go:9-103)."""
    q = np.array([[40, 39, 41, 0, 255, 1]], dtype=np.uint8)
    lens = np.array([6], dtype=np.int32)
    d = refops.quality_normalize_delta(q, lens, 0)
    assert list(d[0]) == [40, 255, 2, 215, 255, 2]
    back = refops.quality_delta_decode(d, lens, 0)
    assert np.array_equal(back, q)


def test_quality_offset_roundtrip():
    rng = np.random.default_rng(0)
    q = (rng.integers(0, 42, size=(20, 151)) + 33).astype(np.uint8)
    lens = np.full(20, 151, dtype=np.int32)
    d = refops.quality_normalize_delta(q, lens, 33)
    back = refops.quality_delta_decode(d, lens, 33)
    assert np.array_equal(back, q)


def test_phred64_roundtrip():
    q = (np.arange(40, dtype=np.uint8) + 64).reshape(1, 40)
    lens = np.array([40], dtype=np.int32)
    d = refops.quality_normalize_delta(q, lens, 64)
    assert d[0, 0] == 0  # normalized to 0-based
    back = refops.quality_delta_decode(d, lens, 64)
    assert np.array_equal(back, q)


@pytest.mark.parametrize(
    "min_byte,expected",
    [
        (33, refops.PHRED33_OFFSET),
        (58, refops.PHRED33_OFFSET),
        (59, refops.PHRED33_OFFSET),  # ambiguous range -> +33
        (63, refops.PHRED33_OFFSET),
        (64, refops.PHRED64_OFFSET),
        (75, refops.PHRED64_OFFSET),
    ],
)
def test_detect_encoding_boundaries(min_byte, expected):
    """Boundary table from quality_test.go:203-265."""
    q = np.full((3, 10), 80, dtype=np.uint8)
    q[1, 4] = min_byte
    lens = np.full(3, 10, dtype=np.int32)
    assert refops.detect_encoding(q, lens) == expected


def test_detect_encoding_empty_defaults_phred33():
    q = np.full((0, 0), QUAL_PAD, dtype=np.uint8)
    assert refops.detect_encoding(q, np.zeros(0, np.int32)) == refops.PHRED33_OFFSET


def test_detect_encoding_ignores_padding():
    q = np.full((2, 8), QUAL_PAD, dtype=np.uint8)
    q[0, :4] = 70
    q[1, :2] = 70
    lens = np.array([4, 2], dtype=np.int32)
    assert refops.detect_encoding(q, lens) == refops.PHRED64_OFFSET


def test_native_fused_encode_matches_reference():
    from fastqpacker_tpu.runtime import bindings as rt

    if not rt.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(77)
    for r, l in [(20, 151), (7, 3), (50, 64), (5, 1)]:
        rows = []
        lens = rng.integers(0, l + 1, r)
        lens[0] = l
        seq = np.zeros((r, l), np.uint8)
        qual = np.full((r, l), QUAL_PAD, np.uint8)
        ab = np.frombuffer(b"ACGTNacgt.x", np.uint8)
        for i in range(r):
            seq[i, : lens[i]] = ab[rng.integers(0, len(ab), lens[i])]
            qual[i, : lens[i]] = rng.integers(33, 100, lens[i])
        lens = lens.astype(np.int32)
        for off in (33, 64):
            ref = refops.encode_block_arrays(seq, qual, lens, off)
            got = rt.encode_block_arrays(seq, qual, lens, off)
            np.testing.assert_array_equal(got.packed, ref.packed)
            np.testing.assert_array_equal(got.nmask_bits, ref.nmask_bits)
            np.testing.assert_array_equal(got.n_counts, ref.n_counts)
            col = np.arange(l)[None, :]
            m = col < lens[:, None]
            np.testing.assert_array_equal(got.qual_delta[m], ref.qual_delta[m])
