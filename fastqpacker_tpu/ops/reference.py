"""Numpy reference implementations of the codec array transforms.

These are the semantics-defining, kernel-level golden references: the
JAX/Pallas device kernels in :mod:`fastqpacker_tpu.ops.device` are
equivalence-tested against this module, and the CPU pipeline uses it
directly.

Wire semantics mirrored from the reference implementation:

- 2-bit base packing A=00 C=01 G=10 T=11, 4 bases/byte LSB-first,
  case-insensitive, every non-ACGT byte packs as A with its position
  recorded separately (internal/encoder/sequence.go:58-98).
- N-position tracking capped at ``MAX_SEQUENCE_LENGTH`` = 65536
  (sequence.go:11, compress.go:477-488).
- Quality: subtract Phred offset then per-record byte-wrapping delta
  (internal/encoder/quality.go:53-103).
- Unpack restores uppercase ACGT and writes ``N`` at recorded positions
  (sequence.go:103-135): lowercase input and exotic ambiguity codes are
  intentionally normalized, everything else round-trips exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_SEQUENCE_LENGTH = 1 << 16  # 65536 (sequence.go:11)

PHRED33_OFFSET = 33
PHRED64_OFFSET = 64

_A, _C, _G, _T = ord("A"), ord("C"), ord("G"), ord("T")


@dataclass
class EncodedArrays:
    """Dense per-block encode results (device/host agnostic)."""

    packed: np.ndarray  # (R, ceil(L/4)) uint8, 2-bit codes LSB-first
    nmask_bits: np.ndarray  # (R, ceil(L/8)) uint8, little-endian bitmask of non-ACGT
    n_counts: np.ndarray  # (R,) int32 count of non-ACGT positions (capped at 65536)
    qual_delta: np.ndarray  # (R, L) uint8 normalized+delta quality


def base_codes(seq: np.ndarray) -> np.ndarray:
    """ASCII bases -> 2-bit codes; non-ACGT (any case) -> 0 ('A')."""
    upper = seq & 0xDF  # fold lowercase acgt to uppercase
    code = (
        (upper == _C).astype(np.uint8)
        + 2 * (upper == _G).astype(np.uint8)
        + 3 * (upper == _T).astype(np.uint8)
    )
    return code


def ambiguity_mask(
    seq: np.ndarray, lengths: np.ndarray, npos_cap: int | None = None
) -> np.ndarray:
    """True where the byte is not ACGT/acgt and within the record length.

    Positions >= the tracking cap are excluded — MAX_SEQUENCE_LENGTH for
    the v1/v2 u16 wire encoding (sequence.go:89-96); FQZ v3 passes an
    unbounded cap (u32 positions, no 65,536 bp limit).
    """
    upper = seq & 0xDF
    valid = (upper == _A) | (upper == _C) | (upper == _G) | (upper == _T)
    col = np.arange(seq.shape[1], dtype=np.int64)[None, :]
    in_range = col < lengths[:, None].astype(np.int64)
    cap = MAX_SEQUENCE_LENGTH if npos_cap is None else npos_cap
    tracked = col < cap
    return (~valid) & in_range & tracked


def pack_codes(codes: np.ndarray) -> np.ndarray:
    """(R, L) 2-bit codes -> (R, ceil(L/4)) bytes, LSB-first within byte."""
    r, l = codes.shape
    l4 = -(-l // 4) * 4
    if l4 != l:
        codes = np.pad(codes, ((0, 0), (0, l4 - l)))
    g = codes.reshape(r, l4 // 4, 4).astype(np.uint8)
    return g[:, :, 0] | (g[:, :, 1] << 2) | (g[:, :, 2] << 4) | (g[:, :, 3] << 6)


def unpack_codes(packed: np.ndarray, out_len: int) -> np.ndarray:
    """(R, P) packed bytes -> (R, out_len) 2-bit codes."""
    r = packed.shape[0]
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
    codes = (packed[:, :, None] >> shifts[None, None, :]) & 3
    return codes.reshape(r, -1)[:, :out_len]


def codes_to_ascii(codes: np.ndarray) -> np.ndarray:
    """2-bit codes -> ASCII 'ACGT' without a lookup table.

    65 + 2c + 2*[c>=2] + 11*[c==3] maps 0,1,2,3 -> A,C,G,T.
    """
    c = codes.astype(np.uint8)
    return (
        65 + 2 * c + 2 * (c >= 2).astype(np.uint8) + 11 * (c == 3).astype(np.uint8)
    )


def pack_nmask_bits(mask: np.ndarray) -> np.ndarray:
    """(R, L) bool -> (R, ceil(L/8)) little-endian packed bits."""
    if mask.shape[1] == 0:
        return np.zeros((mask.shape[0], 0), dtype=np.uint8)
    return np.packbits(mask, axis=1, bitorder="little")


def quality_normalize_delta(
    qual: np.ndarray, lengths: np.ndarray, offset: int
) -> np.ndarray:
    """(q - offset) then per-record delta, byte-wrapping (quality.go:53-103).

    Padding columns produce garbage values but are never emitted (length
    masks exclude them downstream).
    """
    qn = (qual.astype(np.uint8) - np.uint8(offset)).astype(np.uint8)
    d = qn.copy()
    if qn.shape[1] > 1:
        d[:, 1:] = qn[:, 1:] - qn[:, :-1]
    return d


def quality_delta_decode(
    qual_delta: np.ndarray, lengths: np.ndarray, offset: int
) -> np.ndarray:
    """Inverse of :func:`quality_normalize_delta` -> ASCII quality bytes."""
    acc = np.cumsum(qual_delta.astype(np.int64), axis=1)
    return ((acc % 256) + offset).astype(np.uint8)


def detect_offset_from_min(m: int) -> int:
    """Phred offset from the window's minimum quality byte
    (quality.go:22-49 thresholds): < 59 -> +33, >= 64 -> +64,
    ambiguous 59-63 -> +33."""
    if m < 59:
        return PHRED33_OFFSET
    if m >= 64:
        return PHRED64_OFFSET
    return PHRED33_OFFSET


def detect_encoding(qual: np.ndarray, lengths: np.ndarray) -> int:
    """Phred offset detection over a quality matrix (quality.go:22-49).

    min byte < 59 -> Phred+33; min >= 64 -> Phred+64; ambiguous or empty
    -> Phred+33. Padding must be QUAL_PAD (0xFF) so it never wins the min.
    """
    if qual.size == 0 or int(lengths.sum()) == 0:
        return PHRED33_OFFSET
    return detect_offset_from_min(int(qual.min()))


def encode_block_arrays(
    seq: np.ndarray,
    qual: np.ndarray,
    lengths: np.ndarray,
    qual_offset: int,
    npos_cap: int | None = None,
) -> EncodedArrays:
    """Full dense encode of a block (the numpy twin of the Pallas kernel)."""
    codes = base_codes(seq)
    nmask = ambiguity_mask(seq, lengths, npos_cap)
    return EncodedArrays(
        packed=pack_codes(codes),
        nmask_bits=pack_nmask_bits(nmask),
        n_counts=nmask.sum(axis=1).astype(np.int32),
        qual_delta=quality_normalize_delta(qual, lengths, qual_offset),
    )


def decode_block_arrays(
    packed: np.ndarray,
    qual_delta: np.ndarray,
    lengths: np.ndarray,
    qual_offset: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Dense decode: packed codes + delta quality -> ASCII seq/qual matrices.

    N restoration is a separate (host) scatter of the rare recorded
    positions; lowercase is intentionally not restored (sequence.go:44-51).
    """
    out_len = qual_delta.shape[1]
    seq_ascii = codes_to_ascii(unpack_codes(packed, out_len))
    qual_ascii = quality_delta_decode(qual_delta, lengths, qual_offset)
    return seq_ascii, qual_ascii


def check_ambiguous_overflow(
    seq: np.ndarray, lengths: np.ndarray, headers: list[bytes] | None = None
) -> None:
    """Fail-fast guard against silent N loss on very long reads.

    Mirrors compress.go:477-488: a record longer than 65536 bp whose tail
    contains any non-ACGT byte cannot be represented (u16 N positions) and
    must be rejected rather than silently corrupted.
    """
    L = seq.shape[1]
    if L <= MAX_SEQUENCE_LENGTH:
        return
    upper = seq[:, MAX_SEQUENCE_LENGTH:] & 0xDF
    valid = (upper == _A) | (upper == _C) | (upper == _G) | (upper == _T)
    col = np.arange(MAX_SEQUENCE_LENGTH, L, dtype=np.int64)[None, :]
    in_range = col < lengths[:, None].astype(np.int64)
    bad = (~valid) & in_range
    if bad.any():
        row = int(np.flatnonzero(bad.any(axis=1))[0])
        name = headers[row].decode("latin-1") if headers else f"record {row}"
        raise ValueError(
            f'record "{name}": sequence length {int(lengths[row])} has '
            f"ambiguous bases beyond position {MAX_SEQUENCE_LENGTH}; "
            f"N-position tracking is limited to {MAX_SEQUENCE_LENGTH} bp"
        )
