"""Block-level encode/decode: dense arrays <-> FQZ wire streams.

This module glues the dense array transforms (numpy reference or TPU
kernels) to the irregular byte-stream bookkeeping of the FQZ format. The
irregular parts (variable-length stream concatenation, u16 N-position
lists, length-prefixed header/plus payloads) live on host where they are
cheap; the dense transforms are backend-pluggable.

Wire layout per block (reference: internal/compress/compress.go:471-555):
  block header, then zstd streams in order seq, qual, headers, plus (v2+),
  npos, lengths.
Stream encodings (compress.go:490-519):
  seq     = concat of ceil(len/4) packed bytes per record
  qual    = concat of normalized+delta bytes per record
  headers = u16le length + bytes per record ('@' stripped)
  plus    = u16le length + bytes per record ('+' stripped)
  npos    = u16le count + u16le positions per record
  lengths = u32le sequence length per record
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..format import container
from ..ops import reference as refops
from ..parser.fastq import RecordBlock
from ..utils import varlen


@dataclass
class RawStreams:
    """Uncompressed per-block streams in wire order."""

    seq: bytes
    qual: bytes
    headers: bytes
    plus: bytes
    npos: bytes
    lengths: bytes
    num_records: int
    original_seq_size: int
    original_qual_size: int

    def ordered(self, version: int) -> list[bytes]:
        if version == container.VERSION_1:
            return [self.seq, self.qual, self.headers, self.npos, self.lengths]
        return [
            self.seq,
            self.qual,
            self.headers,
            self.plus,
            self.npos,
            self.lengths,
        ]


def _native():
    from ..runtime import bindings

    return bindings if bindings.available() else None


def _exclusive_cumsum(x: np.ndarray) -> np.ndarray:
    out = np.zeros(len(x), dtype=np.int64)
    if len(x) > 1:
        np.cumsum(x[:-1], out=out[1:])
    return out


def _build_npos_numpy(
    nmask_bits: np.ndarray, n_counts: np.ndarray, max_len: int, dtype: str
) -> bytes:
    """Numpy fallback for the wide (u32) npos stream build."""
    r = len(n_counts)
    counts = n_counts.astype(np.int64)
    total = r + int(counts.sum())
    out = np.zeros(total, dtype=dtype)
    if r == 0:
        return out.tobytes()
    count_pos = np.arange(r, dtype=np.int64) + _exclusive_cumsum(counts)
    out[count_pos] = counts.astype(dtype)
    nz = np.flatnonzero(counts > 0)
    if len(nz):
        bits = np.unpackbits(
            nmask_bits[nz], axis=1, bitorder="little", count=max_len
        )
        rows, cols = np.nonzero(bits)
        per_row = counts[nz]
        first = _exclusive_cumsum(per_row)
        rank = np.arange(len(rows), dtype=np.int64) - np.repeat(first, per_row)
        dst = count_pos[nz][rows] + 1 + rank
        out[dst] = cols.astype(dtype)
    return out.tobytes()


def _parse_npos_numpy_wide(
    data: np.ndarray, count: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    # Trailing bytes after the last record are tolerated, matching the
    # C++ twin (fq_parse_npos32): FLAG_LOSSLESS appends its side data
    # to this slot (E052), and the parse is self-delimiting.
    usable = len(data) - (len(data) % 4)
    u32 = data[:usable].view("<u4")
    counts = np.zeros(count, dtype=np.int64)
    rows_list, pos_list = [], []
    off = 0
    n = len(u32)
    for i in range(count):
        if off >= n:
            raise container.FormatError("truncated N position data")
        c = int(u32[off])
        off += 1
        counts[i] = c
        if c:
            if off + c > n:
                raise container.FormatError("truncated N position data")
            pos_list.append(u32[off : off + c].astype(np.int64))
            rows_list.append(np.full(c, i, dtype=np.int64))
            off += c
    if pos_list:
        return counts, np.concatenate(rows_list), np.concatenate(pos_list)
    return counts, np.empty(0, np.int64), np.empty(0, np.int64)


def build_npos_stream(
    nmask_bits: np.ndarray, n_counts: np.ndarray, max_len: int,
    wide: bool = False,
) -> bytes:
    """N-position stream: u16 count + u16 positions per record
    (compress.go:495-498) for v1/v2; u32 variants for the v3 long-read
    extension (``wide=True``)."""
    nat = _native()
    if nat is not None:
        if wide:
            return nat.build_npos32(nmask_bits, n_counts, max_len)
        return nat.build_npos(nmask_bits, n_counts, max_len)
    if wide:
        return _build_npos_numpy(nmask_bits, n_counts, max_len, "<u4")
    r = len(n_counts)
    counts = n_counts.astype(np.int64)
    total = r + int(counts.sum())
    out = np.zeros(total, dtype="<u2")
    if r == 0:
        return out.tobytes()
    count_pos = np.arange(r, dtype=np.int64) + _exclusive_cumsum(counts)
    out[count_pos] = counts.astype("<u2")
    nz = np.flatnonzero(counts > 0)
    if len(nz):
        bits = np.unpackbits(
            nmask_bits[nz], axis=1, bitorder="little", count=max_len
        )
        rows, cols = np.nonzero(bits)
        per_row = counts[nz]
        first = _exclusive_cumsum(per_row)
        rank = np.arange(len(rows), dtype=np.int64) - np.repeat(first, per_row)
        dst = count_pos[nz][rows] + 1 + rank
        out[dst] = cols.astype("<u2")
    return out.tobytes()


def parse_npos_stream(
    data: np.ndarray, count: int, wide: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse npos stream -> (counts, flat_rows, flat_positions).

    Fast path: no N anywhere (stream is exactly `count` zero u16s).
    Otherwise falls back to a sequential walk (compress.go:1055-1078).
    ``wide=True`` parses the v3 u32 layout.
    """
    nat = _native()
    if nat is not None:
        try:
            if wide:
                return nat.parse_npos32(np.ascontiguousarray(data), count)
            return nat.parse_npos(np.ascontiguousarray(data), count)
        except ValueError:
            raise container.FormatError("truncated N position data") from None
    if wide:
        return _parse_npos_numpy_wide(data, count)
    if len(data) % 2 != 0:
        raise container.FormatError("truncated N position data")
    u16 = data.view("<u2") if data.dtype == np.uint8 else data
    if len(u16) < count:
        raise container.FormatError("truncated N position data")
    if len(u16) == count:
        counts = u16.astype(np.int64)
        if counts.sum() == 0:
            return (
                counts,
                np.empty(0, np.int64),
                np.empty(0, np.int64),
            )
    counts = np.zeros(count, dtype=np.int64)
    rows_list = []
    pos_list = []
    off = 0
    n = len(u16)
    for i in range(count):
        if off >= n:
            raise container.FormatError("truncated N position data")
        c = int(u16[off])
        off += 1
        counts[i] = c
        if c:
            if off + c > n:
                raise container.FormatError("truncated N position data")
            pos_list.append(u16[off : off + c].astype(np.int64))
            rows_list.append(np.full(c, i, dtype=np.int64))
            off += c
    if pos_list:
        return counts, np.concatenate(rows_list), np.concatenate(pos_list)
    return counts, np.empty(0, np.int64), np.empty(0, np.int64)


def parse_len16_stream(
    data: np.ndarray, count: int, what: str
) -> tuple[np.ndarray, np.ndarray]:
    """Parse u16-length-prefixed stream -> (starts, lengths).

    Fast path for uniform-length records (vectorized verify), Python walk
    otherwise; the C++ runtime supplies the general vectorized version.
    """
    nd = len(data)
    if count == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if nd >= 2 * count and (nd - 2 * count) % count == 0:
        uniform = (nd - 2 * count) // count
        if uniform <= 0xFFFF:
            stride = 2 + uniform
            offs = np.arange(count, dtype=np.int64) * stride
            lens = data[offs].astype(np.int64) | (
                data[offs + 1].astype(np.int64) << 8
            )
            if np.all(lens == uniform):
                return offs + 2, lens
    return varlen.parse_len16_stream(data, count, what)


def packed_lengths(lengths: np.ndarray) -> np.ndarray:
    return (lengths.astype(np.int64) + 3) >> 2


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

EncodeArraysFn = Callable[..., refops.EncodedArrays]


def block_to_raw_streams(
    block: RecordBlock,
    qual_offset: int,
    encode_arrays: EncodeArraysFn = refops.encode_block_arrays,
    wide_npos: bool = False,
) -> RawStreams:
    """Dense transforms + host stream assembly for one block.

    ``wide_npos`` selects the v3 u32 N-position layout: no 65,536 bp
    tracking cap and no overflow fail-fast (SURVEY.md §5: "do not inherit
    the u16 cap").
    """
    lengths = block.lengths.astype(np.int64)

    nat = _native()
    if (
        nat is not None
        and getattr(block, "offsets", None) is not None
        and encode_arrays in (refops.encode_block_arrays, nat.encode_block_arrays)
    ):
        # single-pass native fast path: text+offsets -> streams directly
        if not wide_npos and block.max_len > refops.MAX_SEQUENCE_LENGTH:
            refops.check_ambiguous_overflow(block.seq, lengths)
        return nat.build_raw_streams(block, qual_offset, wide_npos)

    if wide_npos:
        enc = encode_arrays(
            block.seq, block.qual, block.lengths, qual_offset,
            npos_cap=1 << 62,
        )
    else:
        refops.check_ambiguous_overflow(block.seq, lengths)
        enc = encode_arrays(block.seq, block.qual, block.lengths, qual_offset)

    packed = np.asarray(enc.packed)
    nmask_bits = np.asarray(enc.nmask_bits)
    n_counts = np.asarray(enc.n_counts)
    qual_delta = np.asarray(enc.qual_delta)

    plens = packed_lengths(lengths)
    seq_stream = varlen.flatten_rows(packed, plens).tobytes()
    qual_stream = varlen.flatten_rows(qual_delta, lengths).tobytes()
    npos_stream = build_npos_stream(
        nmask_bits, n_counts, block.max_len, wide=wide_npos
    )
    lengths_stream = lengths.astype("<u4").tobytes()

    return RawStreams(
        seq=seq_stream,
        qual=qual_stream,
        headers=block.header_stream(),
        plus=block.plus_stream(),
        npos=npos_stream,
        lengths=lengths_stream,
        num_records=block.n,
        original_seq_size=int(lengths.sum()),
        original_qual_size=int(lengths.sum()),
    )


def compress_raw_streams(
    raw: RawStreams,
    codec,
    version: int = container.CURRENT_VERSION,
    crc32: int = 0,
) -> bytes:
    """Entropy-code streams and serialize block header + payload."""
    ordered = raw.ordered(version)
    # streams an on-the-fly probe shows to be incompressible (packed
    # high-entropy DNA) skip the match search (E028)
    compress_one = getattr(codec, "compress_adaptive", codec.compress)
    comp = [compress_one(s) for s in ordered]
    hdr = container.BlockHeader(
        num_records=raw.num_records,
        original_seq_size=raw.original_seq_size,
        original_qual_size=raw.original_qual_size,
        crc32=crc32,
    )
    if version == container.VERSION_1:
        (
            hdr.seq_data_size,
            hdr.qual_data_size,
            hdr.header_data_size,
            hdr.npositions_size,
            hdr.seq_lengths_size,
        ) = [len(c) for c in comp]
    else:
        (
            hdr.seq_data_size,
            hdr.qual_data_size,
            hdr.header_data_size,
            hdr.plus_data_size,
            hdr.npositions_size,
            hdr.seq_lengths_size,
        ) = [len(c) for c in comp]
    return hdr.to_bytes(version) + b"".join(comp)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

DecodeArraysFn = Callable[..., tuple[np.ndarray, np.ndarray]]


@dataclass
class DecodedStreams:
    """Zstd-decoded raw streams of one block."""

    seq: np.ndarray
    qual: np.ndarray
    headers: np.ndarray
    plus: np.ndarray  # empty for v1
    npos: np.ndarray
    lengths: np.ndarray
    num_records: int


def decode_streams(
    header: container.BlockHeader,
    payload: bytes,
    version: int,
    codec,
) -> DecodedStreams:
    sizes = header.stream_sizes(version)
    offs = np.concatenate(([0], np.cumsum(sizes)))
    if offs[-1] != len(payload):
        raise container.FormatError("truncated block payload")
    parts = [
        np.frombuffer(codec.decompress(payload[offs[i] : offs[i + 1]]), np.uint8)
        for i in range(len(sizes))
    ]
    if version == container.VERSION_1:
        seq, qual, hdrs, npos, lens = parts
        plus = np.empty(0, np.uint8)
    else:
        seq, qual, hdrs, plus, npos, lens = parts
    return DecodedStreams(
        seq=seq,
        qual=qual,
        headers=hdrs,
        plus=plus,
        npos=npos,
        lengths=lens,
        num_records=header.num_records,
    )


def host_decode_arrays(
    packed: np.ndarray,
    qual_delta: np.ndarray,
    lengths: np.ndarray,
    qual_offset: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Fast host decode: vectorized unpack + native in-place quality
    integration (falls back to the numpy reference cumsum)."""
    out_len = qual_delta.shape[1]
    nat = _native()
    if nat is not None:
        seq_ascii = nat.decode_block_ascii(packed, lengths, out_len)
    else:
        seq_ascii = refops.codes_to_ascii(refops.unpack_codes(packed, out_len))
    if nat is not None:
        qd = np.ascontiguousarray(qual_delta)
        if qd is qual_delta:
            qd = qual_delta.copy()
        nat.qual_integrate_rows(qd, qual_offset)
        return seq_ascii, qd
    return seq_ascii, refops.quality_delta_decode(
        qual_delta, lengths, qual_offset
    )


def streams_to_fastq(
    ds: DecodedStreams,
    qual_offset: int,
    decode_arrays: DecodeArraysFn = host_decode_arrays,
    wide_npos: bool = False,
) -> bytes:
    """Reconstruct the block's FASTQ text (compress.go:944-1078)."""
    r = ds.num_records

    nat = _native()
    if nat is not None and decode_arrays is host_decode_arrays:
        # single-pass native decode: streams -> FASTQ text directly
        try:
            return nat.decode_block_full(ds, qual_offset, wide_npos)
        except ValueError as e:
            raise container.FormatError(str(e)) from None

    if len(ds.lengths) < 4 * r:
        raise container.FormatError("truncated length data")
    lengths = ds.lengths[: 4 * r].view("<u4").astype(np.int64)

    plens = packed_lengths(lengths)
    if int(plens.sum()) > len(ds.seq):
        raise container.FormatError("truncated sequence data")
    if int(lengths.sum()) > len(ds.qual):
        raise container.FormatError("truncated quality data")

    n_counts, n_rows, n_pos = parse_npos_stream(ds.npos, r, wide=wide_npos)

    max_len = int(lengths.max()) if r else 0
    packed_w = -(-max_len // 4)
    packed = varlen.gather_rows(
        ds.seq, _exclusive_cumsum(plens), plens, pad_to=packed_w
    )
    qual_delta = varlen.gather_rows(
        ds.qual, _exclusive_cumsum(lengths), lengths, pad_to=max_len
    )

    seq_ascii, qual_ascii = decode_arrays(
        packed, qual_delta, lengths.astype(np.int32), qual_offset
    )
    seq_ascii = np.asarray(seq_ascii)
    qual_ascii = np.asarray(qual_ascii)
    if len(n_rows):
        if np.any(n_pos >= lengths[n_rows]):
            raise container.FormatError("invalid N position data")
        if not seq_ascii.flags.writeable:  # device-backed arrays are read-only
            seq_ascii = seq_ascii.copy()
        seq_ascii[n_rows, n_pos] = ord("N")

    hdr_starts, hdr_lens = parse_len16_stream(ds.headers, r, "header")
    if len(ds.plus):
        plus_starts, plus_lens = parse_len16_stream(
            ds.plus, r, "plus-line payload"
        )
    else:
        # v1 containers carry no plus payload: emit bare '+' (compress.go:995-998)
        plus_starts = np.zeros(r, dtype=np.int64)
        plus_lens = np.zeros(r, dtype=np.int64)

    nat = _native()
    if nat is not None:
        return nat.assemble_fastq(
            ds.headers, hdr_starts, hdr_lens,
            ds.plus, plus_starts, plus_lens, int(len(ds.plus) > 0),
            seq_ascii, qual_ascii, lengths,
        )

    # Assemble '@hdr\nseq\n+plus\nqual\n' per record with one scatter pass
    # per component.
    l_hdr = hdr_lens + 2  # '@' + '\n'
    l_seq = lengths + 1
    l_plus = plus_lens + 2  # '+' + '\n'
    l_qual = lengths + 1
    rec_sizes = l_hdr + l_seq + l_plus + l_qual
    rec_offs = _exclusive_cumsum(rec_sizes)
    total = int(rec_sizes.sum())
    out = np.empty(total, dtype=np.uint8)

    at_pos = rec_offs
    out[at_pos] = ord("@")
    varlen.scatter_rows(
        out,
        varlen.flatten_rows(
            varlen.gather_rows(ds.headers, hdr_starts, hdr_lens), hdr_lens
        ),
        at_pos + 1,
        hdr_lens,
    )
    out[at_pos + 1 + hdr_lens] = ord("\n")

    at_pos = rec_offs + l_hdr
    varlen.scatter_rows(
        out, varlen.flatten_rows(seq_ascii, lengths), at_pos, lengths
    )
    out[at_pos + lengths] = ord("\n")

    at_pos = rec_offs + l_hdr + l_seq
    out[at_pos] = ord("+")
    if len(ds.plus):
        varlen.scatter_rows(
            out,
            varlen.flatten_rows(
                varlen.gather_rows(ds.plus, plus_starts, plus_lens), plus_lens
            ),
            at_pos + 1,
            plus_lens,
        )
    out[at_pos + 1 + plus_lens] = ord("\n")

    at_pos = rec_offs + l_hdr + l_seq + l_plus
    varlen.scatter_rows(
        out, varlen.flatten_rows(qual_ascii, lengths), at_pos, lengths
    )
    out[at_pos + lengths] = ord("\n")

    return out.tobytes()


def block_crc32(fastq_text: bytes) -> int:
    """CRC32 (IEEE) of the block's reconstructed FASTQ text (v3 header)."""
    return zlib.crc32(fastq_text) & 0xFFFFFFFF
