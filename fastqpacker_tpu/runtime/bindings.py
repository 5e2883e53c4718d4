"""ctypes bindings for libfqruntime with graceful numpy fallback.

``available()`` reports whether the native runtime loaded; every wrapper
has the same contract as its numpy twin in :mod:`fastqpacker_tpu.utils.varlen`
/ :mod:`fastqpacker_tpu.pipeline.blocks`, so callers can branch once.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from . import build

_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_ll = ctypes.c_longlong
_u8 = ctypes.c_uint8


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("FQZ_NO_NATIVE"):
        return None
    path = build.ensure_built()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.fq_scan_records.restype = _ll
    lib.fq_scan_records.argtypes = [
        _u8p, _ll, _ll, _i64p,
        ctypes.POINTER(_ll), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fq_gather_rows.restype = None
    lib.fq_gather_rows.argtypes = [_u8p, _i64p, _i64p, _ll, _ll, _u8, _u8p]
    lib.fq_flatten_rows.restype = _ll
    lib.fq_flatten_rows.argtypes = [_u8p, _i64p, _ll, _ll, _u8p]
    lib.fq_scatter_rows.restype = None
    lib.fq_scatter_rows.argtypes = [_u8p, _u8p, _i64p, _i64p, _ll]
    lib.fq_build_len16.restype = _ll
    lib.fq_build_len16.argtypes = [_u8p, _i64p, _i64p, _ll, _u8p]
    lib.fq_parse_len16.restype = _ll
    lib.fq_parse_len16.argtypes = [_u8p, _ll, _ll, _i64p, _i64p]
    lib.fq_build_npos.restype = _ll
    lib.fq_build_npos.argtypes = [_u8p, _i32p, _ll, _ll, _ll, _u8p]
    lib.fq_parse_npos.restype = _ll
    lib.fq_parse_npos.argtypes = [_u8p, _ll, _ll, _i32p, _i32p, _i32p, _ll]
    lib.fq_assemble.restype = _ll
    lib.fq_assemble.argtypes = [
        _u8p, _i64p, _i64p, _u8p, _i64p, _i64p, ctypes.c_int,
        _u8p, _u8p, _ll, _i64p, _ll, _u8p,
    ]
    lib.fq_qual_integrate_rows.restype = None
    lib.fq_qual_integrate_rows.argtypes = [_u8p, _ll, _ll, _u8]
    lib.fq_qual_delta_rows.restype = None
    lib.fq_qual_delta_rows.argtypes = [_u8p, _ll, _ll, _u8, _u8p]
    lib.fq_pack2_rows.restype = None
    lib.fq_pack2_rows.argtypes = [_u8p, _ll, _ll, _u8p]
    lib.fq_hist256.restype = None
    lib.fq_hist256.argtypes = [_u8p, _ll, _i64p]
    lib.fq_crc32.restype = ctypes.c_uint32
    lib.fq_crc32.argtypes = [ctypes.c_uint32, _u8p, _ll]
    lib.fq_qctx_sample_bits.restype = ctypes.c_double
    lib.fq_qctx_sample_bits.argtypes = [
        _u8p, _i64p, _ll, ctypes.POINTER(ctypes.c_longlong),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


_EMPTY_U8 = np.zeros(1, dtype=np.uint8)
_EMPTY_I64 = np.zeros(1, dtype=np.int64)


def _nz_u8(a: np.ndarray) -> np.ndarray:
    """ctypes ndpointer rejects zero-size arrays; give it a 1-byte stand-in."""
    return a if a.size else _EMPTY_U8


def _nz_i64(a: np.ndarray) -> np.ndarray:
    return a if a.size else _EMPTY_I64


SCAN_ERRORS = {
    1: "invalid FASTQ: header line must start with @",
    2: "invalid FASTQ: separator line must start with +",
    3: "invalid FASTQ: sequence and quality lengths must match",
}


def qctx_sample_bits(delta: np.ndarray, lengths: np.ndarray):
    """-> (empirical conditional bits, present cells) for the model-0
    quality contexts of a record-aligned delta prefix, or None without
    the native library (caller falls back to the numpy probe)."""
    lib = _load()
    if lib is None:
        return None
    cells = ctypes.c_longlong(0)
    bits = lib.fq_qctx_sample_bits(
        _nz_u8(np.ascontiguousarray(delta, np.uint8)),
        np.ascontiguousarray(lengths, np.int64),
        len(lengths), ctypes.byref(cells),
    )
    return float(bits), int(cells.value)


def crc32(data, crc: int = 0) -> int:
    """zlib-compatible CRC32 (PCLMUL folding when the host supports it,
    self-checked against the table path at first use)."""
    lib = _load()
    arr = (
        data
        if isinstance(data, np.ndarray)
        else np.frombuffer(data, np.uint8)
    )
    return int(lib.fq_crc32(crc & 0xFFFFFFFF, _nz_u8(arr), len(arr)))


def hist256(data) -> np.ndarray:
    """256-bin byte histogram (int64); GIL-released native sweep.

    ``data`` is any contiguous uint8 buffer (bytes or ndarray)."""
    lib = _load()
    arr = (
        data
        if isinstance(data, np.ndarray)
        else np.frombuffer(data, np.uint8)
    )
    out = np.zeros(256, np.int64)
    lib.fq_hist256(_nz_u8(arr), len(arr), out)
    return out


def scan_records(data: np.ndarray, max_records: int):
    """-> (offsets (n,8) int64, consumed, error_code). error_code 0 = OK."""
    lib = _load()
    assert lib is not None
    offsets = np.empty((max_records, 8), dtype=np.int64)
    consumed = _ll(0)
    error = ctypes.c_int(0)
    n = lib.fq_scan_records(
        _nz_u8(data), len(data), max_records,
        offsets.reshape(-1) if offsets.size else _EMPTY_I64,
        ctypes.byref(consumed), ctypes.byref(error),
    )
    if n < 0:
        return None, 0, error.value
    return offsets[:n], consumed.value, 0


def gather_rows(data, starts, lengths, pad_to=None, fill=0):
    lib = _load()
    r = len(starts)
    max_len = int(lengths.max()) if r else 0
    width = max_len if pad_to is None else pad_to
    out = np.empty((r, width), dtype=np.uint8)
    if r == 0 or width == 0:
        out.fill(fill)
        return out
    lib.fq_gather_rows(
        _nz_u8(data), np.ascontiguousarray(starts, np.int64),
        np.ascontiguousarray(lengths, np.int64), r, width, fill,
        out.reshape(-1),
    )
    return out


def flatten_rows(padded, lengths):
    lib = _load()
    r, w = padded.shape
    lengths = np.ascontiguousarray(lengths, np.int64)
    total = int(lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    if r == 0 or w == 0 or total == 0:
        return out
    lib.fq_flatten_rows(
        np.ascontiguousarray(padded).reshape(-1), lengths, r, w, _nz_u8(out)
    )
    return out


def scatter_rows(out, flat, dst_starts, lengths):
    lib = _load()
    r = len(dst_starts)
    if r == 0:
        return
    lib.fq_scatter_rows(
        _nz_u8(out), _nz_u8(np.ascontiguousarray(flat)),
        np.ascontiguousarray(dst_starts, np.int64),
        np.ascontiguousarray(lengths, np.int64), r,
    )


def build_len16(data, starts, lengths) -> bytes:
    lib = _load()
    r = len(starts)
    lengths = np.ascontiguousarray(lengths, np.int64)
    total = int(2 * r + lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    if r == 0:
        return b""
    n = lib.fq_build_len16(
        _nz_u8(data), np.ascontiguousarray(starts, np.int64), lengths, r,
        _nz_u8(out),
    )
    if n < 0:
        raise ValueError("record field longer than 65535 bytes")
    return out[:n].tobytes()


def parse_len16(data: np.ndarray, count: int, what: str):
    lib = _load()
    starts = np.empty(count, dtype=np.int64)
    lengths = np.empty(count, dtype=np.int64)
    if count == 0:
        return starts, lengths
    n = lib.fq_parse_len16(
        _nz_u8(data), len(data), count, starts, lengths
    )
    if n < 0:
        raise ValueError(f"truncated {what} data")
    return starts, lengths


def build_npos(nmask_bits: np.ndarray, n_counts: np.ndarray, max_len: int) -> bytes:
    lib = _load()
    r, stride = nmask_bits.shape
    n_counts = np.ascontiguousarray(n_counts, np.int32)
    total = int(2 * r + 2 * n_counts.sum())
    out = np.empty(total, dtype=np.uint8)
    if r == 0:
        return b""
    n = lib.fq_build_npos(
        _nz_u8(np.ascontiguousarray(nmask_bits).reshape(-1)),
        n_counts, r, stride, max_len, _nz_u8(out),
    )
    return out[:n].tobytes()


def parse_npos(data: np.ndarray, count: int):
    lib = _load()
    counts = np.zeros(count, dtype=np.int32)
    if count == 0:
        return (
            counts.astype(np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    max_out = max((len(data) // 2) - count + 1, 1)
    rows = np.empty(max_out, dtype=np.int32)
    poss = np.empty(max_out, dtype=np.int32)
    n = lib.fq_parse_npos(
        _nz_u8(data), len(data), count, counts, rows, poss, max_out
    )
    if n < 0:
        raise ValueError("truncated N position data")
    return (
        counts.astype(np.int64),
        rows[:n].astype(np.int64),
        poss[:n].astype(np.int64),
    )


def assemble_fastq(
    hdr_data, hdr_starts, hdr_lens,
    plus_data, plus_starts, plus_lens, has_plus,
    seq_mat, qual_mat, lengths,
) -> bytes:
    lib = _load()
    r = len(lengths)
    lengths = np.ascontiguousarray(lengths, np.int64)
    hdr_lens = np.ascontiguousarray(hdr_lens, np.int64)
    plus_lens = np.ascontiguousarray(plus_lens, np.int64)
    total = int(
        r * 5  # '@' + 4 newlines... ('@', 3x '\n' after hdr/seq/qual, '+', '\n')
    )
    # exact: per record: 1 + hl + 1 + l + 1 + 1 + pl + 1 + l + 1
    total = int(
        5 * r + hdr_lens.sum() + (plus_lens.sum() if has_plus else 0)
        + 2 * lengths.sum() + r
    )
    out = np.empty(total, dtype=np.uint8)
    if r == 0:
        return b""
    w = seq_mat.shape[1] if seq_mat.ndim == 2 else 0
    n = lib.fq_assemble(
        _nz_u8(hdr_data), _nz_i64(np.ascontiguousarray(hdr_starts, np.int64)),
        _nz_i64(hdr_lens),
        _nz_u8(plus_data), _nz_i64(np.ascontiguousarray(plus_starts, np.int64)),
        _nz_i64(plus_lens), int(has_plus),
        _nz_u8(np.ascontiguousarray(seq_mat).reshape(-1)),
        _nz_u8(np.ascontiguousarray(qual_mat).reshape(-1)),
        w, lengths, r, _nz_u8(out),
    )
    return out[:n].tobytes()


def qual_integrate_rows(qual: np.ndarray, offset: int) -> None:
    """In-place per-row delta-decode + denormalize."""
    lib = _load()
    r, w = qual.shape
    if r == 0 or w == 0:
        return
    if not qual.flags.c_contiguous:
        raise ValueError("qual_integrate_rows requires a C-contiguous array")
    lib.fq_qual_integrate_rows(qual.reshape(-1), r, w, offset)


def qual_delta_rows(qual: np.ndarray, offset: int) -> np.ndarray:
    lib = _load()
    r, w = qual.shape
    out = np.empty_like(qual)
    if r and w:
        lib.fq_qual_delta_rows(
            np.ascontiguousarray(qual).reshape(-1), r, w, offset,
            out.reshape(-1),
        )
    return out


def _bind_encode_block(lib):
    lib.fq_encode_block.restype = None
    lib.fq_encode_block.argtypes = [
        _u8p, _u8p, _i64p, _ll, _ll, _ll, _u8, _u8p, _u8p, _i32p, _u8p,
    ]


def encode_block_arrays(seq, qual, lengths, qual_offset, npos_cap=None):
    """Fused CPU dense encode (drop-in for refops.encode_block_arrays)."""
    from ..ops import reference as refops

    lib = _load()
    if not hasattr(lib, "_enc_bound"):
        _bind_encode_block(lib)
        lib._enc_bound = True
    r, w = seq.shape
    cap = refops.MAX_SEQUENCE_LENGTH if npos_cap is None else npos_cap
    pw = -(-w // 4) if w else 0
    mw = -(-w // 8) if w else 0
    packed = np.zeros((r, max(pw, 1)), dtype=np.uint8)
    nmask = np.zeros((r, max(mw, 1)), dtype=np.uint8)
    ncnt = np.zeros(r, dtype=np.int32)
    delta = np.zeros((r, max(w, 1)), dtype=np.uint8)
    if r and w:
        lib.fq_encode_block(
            np.ascontiguousarray(seq).reshape(-1),
            np.ascontiguousarray(qual).reshape(-1),
            np.ascontiguousarray(lengths, np.int64), r, w, cap,
            qual_offset, packed.reshape(-1), nmask.reshape(-1), ncnt,
            delta.reshape(-1),
        )
    return refops.EncodedArrays(
        packed=packed[:, :pw],
        nmask_bits=nmask[:, :mw],
        n_counts=ncnt,
        qual_delta=delta[:, :w],
    )


def _bind_npos32(lib):
    lib.fq_build_npos32.restype = _ll
    lib.fq_build_npos32.argtypes = [_u8p, _i32p, _ll, _ll, _ll, _u8p]
    lib.fq_parse_npos32.restype = _ll
    lib.fq_parse_npos32.argtypes = [_u8p, _ll, _ll, _i32p, _i32p, _i32p, _ll]


def build_npos32(nmask_bits, n_counts, max_len) -> bytes:
    lib = _load()
    if not hasattr(lib, "_npos32_bound"):
        _bind_npos32(lib)
        lib._npos32_bound = True
    r, stride = nmask_bits.shape
    n_counts = np.ascontiguousarray(n_counts, np.int32)
    total = int(4 * r + 4 * n_counts.sum())
    out = np.empty(max(total, 1), dtype=np.uint8)
    if r == 0:
        return b""
    n = lib.fq_build_npos32(
        _nz_u8(np.ascontiguousarray(nmask_bits).reshape(-1)),
        n_counts, r, stride, max_len, out,
    )
    return out[:n].tobytes()


def parse_npos32(data: np.ndarray, count: int):
    lib = _load()
    if not hasattr(lib, "_npos32_bound"):
        _bind_npos32(lib)
        lib._npos32_bound = True
    counts = np.zeros(max(count, 1), dtype=np.int32)
    if count == 0:
        return (
            np.zeros(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    max_out = max(len(data) // 4, 1)
    rows = np.empty(max_out, dtype=np.int32)
    poss = np.empty(max_out, dtype=np.int32)
    n = lib.fq_parse_npos32(
        _nz_u8(np.ascontiguousarray(data)), len(data), count, counts, rows,
        poss, max_out,
    )
    if n < 0:
        raise ValueError("truncated N position data")
    return (
        counts[:count].astype(np.int64),
        rows[:n].astype(np.int64),
        poss[:n].astype(np.int64),
    )


def decode_block_ascii(packed, lengths, out_width):
    """Packed rows -> ASCII base rows (r, out_width); N restore is the
    caller's sparse scatter."""
    lib = _load()
    if not hasattr(lib, "_dec_bound"):
        lib.fq_decode_block.restype = None
        lib.fq_decode_block.argtypes = [_u8p, _i64p, _ll, _ll, _ll, _u8p]
        lib._dec_bound = True
    r, pw = packed.shape
    out = np.zeros((r, max(out_width, 1)), dtype=np.uint8)
    if r and out_width:
        lib.fq_decode_block(
            np.ascontiguousarray(packed).reshape(-1),
            np.ascontiguousarray(lengths, np.int64), r, pw, out_width,
            out.reshape(-1),
        )
    return out[:, :out_width]


def _bind_build_streams(lib):
    lib.fq_build_streams.restype = ctypes.c_int
    lib.fq_build_streams.argtypes = [
        _u8p, _i64p, _ll, _u8, ctypes.c_int, _ll,
        _u8p, _u8p, _u8p, _u8p, _u8p, _u8p,
        _i64p, ctypes.POINTER(ctypes.c_int32),
    ]


def build_raw_streams(block, qual_offset: int, wide_npos: bool):
    """Single-pass: FASTQ text + scan offsets -> RawStreams (no padded
    matrices, no intermediate copies)."""
    from ..ops import reference as refops
    from ..pipeline.blocks import RawStreams

    lib = _load()
    if not hasattr(lib, "_bs_bound"):
        _bind_build_streams(lib)
        lib._bs_bound = True

    offs = np.ascontiguousarray(block.offsets, np.int64)
    n = block.n
    lens = offs[:, 3]
    cap = (1 << 62) if wide_npos else refops.MAX_SEQUENCE_LENGTH
    total_len = int(lens.sum())
    seq_cap = int(((lens + 3) // 4).sum())
    hdr_cap = int(2 * n + offs[:, 1].sum())
    plus_cap = int(2 * n + offs[:, 5].sum())
    unit = 4 if wide_npos else 2
    npos_cap_bytes = int(unit * (n + np.minimum(lens, cap).sum()))

    seq_out = np.empty(max(seq_cap, 1), np.uint8)
    qual_out = np.empty(max(total_len, 1), np.uint8)
    hdr_out = np.empty(max(hdr_cap, 1), np.uint8)
    plus_out = np.empty(max(plus_cap, 1), np.uint8)
    npos_out = np.empty(max(npos_cap_bytes, 1), np.uint8)
    len_out = np.empty(max(4 * n, 1), np.uint8)
    sizes = np.zeros(6, np.int64)
    minq = ctypes.c_int32(255)

    rc = lib.fq_build_streams(
        _nz_u8(np.ascontiguousarray(block.text)), offs.reshape(-1), n,
        qual_offset, int(wide_npos), cap,
        seq_out, qual_out, hdr_out, plus_out, npos_out, len_out,
        sizes, ctypes.byref(minq),
    )
    if rc != 0:
        raise ValueError("record field longer than 65535 bytes")
    # views, not .tobytes(): the six copies doubled the memory traffic
    # of the whole stream build (E042); every consumer accepts buffers
    return RawStreams(
        seq=seq_out[: sizes[0]],
        qual=qual_out[: sizes[1]],
        headers=hdr_out[: sizes[2]],
        plus=plus_out[: sizes[3]],
        npos=npos_out[: sizes[4]],
        lengths=len_out[: sizes[5]],
        num_records=n,
        original_seq_size=total_len,
        original_qual_size=total_len,
    )


_DECODE_STREAM_ERRORS = {
    -1: "truncated sequence data",
    -2: "truncated quality data",
    -3: "truncated header data",
    -4: "truncated plus-line payload data",
    -5: "truncated N position data",
    -6: "truncated length data",
}


def _bind_decode_full(lib):
    lib.fq_decode_block_full.restype = _ll
    lib.fq_decode_block_full.argtypes = [
        _u8p, _ll, _u8p, _ll, _u8p, _ll, _u8p, _ll, _u8p, _ll, _u8p, _ll,
        _ll, _u8, ctypes.c_int, ctypes.c_int, _u8p,
    ]


def decode_block_full(ds, qual_offset: int, wide: bool) -> bytes:
    """Six raw streams -> FASTQ text in one native pass.

    ``ds`` is a pipeline.blocks.DecodedStreams; raises ValueError with
    the reference-style "truncated ..." message on malformed data
    (an N position past the record length also reports as N-position
    data corruption).
    """
    lib = _load()
    if not hasattr(lib, "_df_bound"):
        _bind_decode_full(lib)
        lib._df_bound = True
    n = ds.num_records
    cap = (
        6 * n + len(ds.headers) + len(ds.plus) + 2 * len(ds.qual) + 16
    )
    out = np.empty(max(cap, 1), np.uint8)
    written = lib.fq_decode_block_full(
        _nz_u8(np.ascontiguousarray(ds.seq)), len(ds.seq),
        _nz_u8(np.ascontiguousarray(ds.qual)), len(ds.qual),
        _nz_u8(np.ascontiguousarray(ds.headers)), len(ds.headers),
        _nz_u8(np.ascontiguousarray(ds.plus)), len(ds.plus),
        _nz_u8(np.ascontiguousarray(ds.npos)), len(ds.npos),
        _nz_u8(np.ascontiguousarray(ds.lengths)), len(ds.lengths),
        n, qual_offset, int(wide), int(len(ds.plus) > 0), out,
    )
    if written < 0:
        raise ValueError(
            _DECODE_STREAM_ERRORS.get(int(written), "corrupted block data")
        )
    return out[:written].tobytes()


def _bind_decode_block_v2(lib):
    lib.fq_zstd_content_sizes.restype = ctypes.c_int
    lib.fq_zstd_content_sizes.argtypes = [_u8p, _i64p, ctypes.c_int, _i64p]
    lib.fq_decode_block_v2.restype = _ll
    lib.fq_decode_block_v2.argtypes = [
        _u8p, _ll, _i64p, _i64p, _ll, _u8, ctypes.c_int, _u8p, _ll,
    ]
    lib._dbv2_bound = True


def decode_block_v2_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fq_decode_block_v2")


def decode_block_v2(hdr, payload, version: int, qual_offset: int):
    """Fused per-block v1/v2 decode: one GIL-released native call runs
    5/6x zstd decode + FASTQ reassembly (reference analog:
    decompressJobToPooledBuffer + blockReader, compress.go:780-835,
    944-1078); Python only computes the exact output capacity from the
    zstd frame content sizes.

    Returns the FASTQ text as a writable memoryview, or ``None`` when a
    frame does not declare its content size (foreign encoders) — the
    caller falls back to the per-stream path. Raises ValueError with the
    reference-style "truncated ..." message on malformed data and
    ZstdError on frame corruption.
    """
    lib = _load()
    if not hasattr(lib, "_dbv2_bound"):
        _bind_decode_block_v2(lib)

    sizes = hdr.stream_sizes(version)
    comp = np.zeros(6, np.int64)
    if len(sizes) == 5:  # v1: no plus stream on the wire
        comp[[0, 1, 2, 4, 5]] = sizes
    else:
        comp[:] = sizes
    pay = np.frombuffer(payload, np.uint8)
    raw = np.zeros(6, np.int64)
    # v1 wire order skips the plus slot; pass per-slot frame offsets by
    # probing the 5 frames then scattering (slot 3 stays 0)
    if len(sizes) == 5:
        raw5 = np.zeros(5, np.int64)
        rc = lib.fq_zstd_content_sizes(
            _nz_u8(pay), np.ascontiguousarray(comp[[0, 1, 2, 4, 5]]),
            5, raw5,
        )
        if rc != 0:
            return None
        raw[[0, 1, 2, 4, 5]] = raw5
    else:
        rc = lib.fq_zstd_content_sizes(_nz_u8(pay), comp, 6, raw)
        if rc != 0:
            return None
    n = hdr.num_records
    # declared frame content sizes are untrusted: anything past the native
    # per-stream cap (2^34) falls back to the per-stream path, whose
    # allocation failures surface as catchable Python errors
    if int(raw.max(initial=0)) > (1 << 34):
        return None
    out_need = int(
        raw[2] + raw[3] + 2 * raw[1] + (4 if len(sizes) == 5 else 2) * n
    )
    out = np.empty(max(out_need, 1), np.uint8)
    written = lib.fq_decode_block_v2(
        _nz_u8(pay), len(pay), comp, raw, n, qual_offset,
        1 if version == 1 else 2, out, out_need,
    )
    if written == -7:
        from ..entropy.zstd import ZstdError

        raise ZstdError("corrupted zstd frame in block payload")
    if written < 0:
        raise ValueError(
            _DECODE_STREAM_ERRORS.get(int(written), "corrupted block data")
        )
    return memoryview(out.data)[:written]


def _bind_encode_block_v2(lib):
    lib.fq_encode_block_v2.restype = _ll
    lib.fq_encode_block_v2.argtypes = [
        _u8p, _i64p, _ll, _u8, ctypes.c_int, _ll, _u8p, _ll, _i64p, _i64p,
    ]
    lib._ebv2_bound = True


def encode_block_v2_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fq_encode_block_v2")


def encode_block_v2(block, qual_offset: int, version: int) -> bytes:
    """Fused per-block v1/v2 encode: one GIL-released native call runs
    stream build + 6x zstd (reference analog: compressBlockWithBuffers,
    compress.go:471-552); Python only prepends the block header.

    The long-read ambiguous-base fail-fast (compress.go:477-488) happens
    here, before the native call, so the error message matches the numpy
    path verbatim.
    """
    from ..format import container
    from ..ops import reference as refops

    lib = _load()
    if not hasattr(lib, "_ebv2_bound"):
        _bind_encode_block_v2(lib)

    if block.max_len > refops.MAX_SEQUENCE_LENGTH:
        refops.check_ambiguous_overflow(
            block.seq, block.lengths.astype(np.int64)
        )

    offs = np.ascontiguousarray(block.offsets, np.int64)
    n = block.n
    # raw caps (sum of per-stream builds) + zstd headroom per stream
    raw = int(
        ((offs[:, 3] + 3) // 4).sum()  # seq
        + 3 * offs[:, 3].sum()         # qual + worst-case u16 npos
        + offs[:, 1].sum() + offs[:, 5].sum() + 10 * n + 64
    )
    hdr_size = (
        container.BLOCK_HEADER_SIZE_V1
        if version == container.VERSION_1
        else container.BLOCK_HEADER_SIZE_V2
    )
    out_cap = hdr_size + raw + (raw >> 7) + 8 * 1024
    out = np.empty(out_cap, np.uint8)
    comp_sizes = np.zeros(6, np.int64)
    total_len = np.zeros(1, np.int64)
    payload = lib.fq_encode_block_v2(
        _nz_u8(np.ascontiguousarray(block.text)), offs.reshape(-1), n,
        qual_offset, version, hdr_size, out, out_cap, comp_sizes, total_len,
    )
    if payload == -1:
        raise ValueError("record field longer than 65535 bytes")
    if payload < 0:
        raise RuntimeError(f"native block encode failed ({payload})")
    hdr = container.BlockHeader(
        num_records=n,
        original_seq_size=int(total_len[0]),
        original_qual_size=int(total_len[0]),
    )
    if version == container.VERSION_1:
        (
            hdr.seq_data_size,
            hdr.qual_data_size,
            hdr.header_data_size,
            hdr.npositions_size,
            hdr.seq_lengths_size,
        ) = [int(c) for c in comp_sizes[:5]]
    else:
        (
            hdr.seq_data_size,
            hdr.qual_data_size,
            hdr.header_data_size,
            hdr.plus_data_size,
            hdr.npositions_size,
            hdr.seq_lengths_size,
        ) = [int(c) for c in comp_sizes]
    out[:hdr_size] = np.frombuffer(hdr.to_bytes(version), np.uint8)
    # writable view, not .tobytes(): the collector writes it straight to
    # the output stream; skipping the copy keeps the GIL window small
    return memoryview(out.data)[: hdr_size + payload]


def _bind_tok(lib):
    lib.fq_tok_encode.restype = _ll
    lib.fq_tok_encode.argtypes = [_u8p, _ll, _ll, _u8p, _ll]
    lib.fq_tok_decoded_size.restype = _ll
    lib.fq_tok_decoded_size.argtypes = [_u8p, _ll]
    lib.fq_tok_decode.restype = _ll
    lib.fq_tok_decode.argtypes = [_u8p, _ll, _ll, _u8p, _ll]


def tok_encode(stream: bytes, count: int) -> bytes:
    """Header token-delta encode (native twin of ops/tokenize.encode)."""
    from ..ops import tokenize

    lib = _load()
    if not hasattr(lib, "_tok_bound"):
        _bind_tok(lib)
        lib._tok_bound = True
    data = np.frombuffer(stream, np.uint8)
    cap = tokenize.encode_bound(len(stream), count)
    out = np.empty(cap, np.uint8)
    n = lib.fq_tok_encode(_nz_u8(data), len(data), count, out, cap)
    if n < 0:
        raise ValueError("malformed header stream")
    return out[:n].tobytes()


def tok_decode(data: bytes, count: int) -> bytes:
    """Inverse of tok_encode; raises ValueError on corrupt input."""
    lib = _load()
    if not hasattr(lib, "_tok_bound"):
        _bind_tok(lib)
        lib._tok_bound = True
    arr = np.frombuffer(data, np.uint8)
    cap = lib.fq_tok_decoded_size(_nz_u8(arr), len(arr))
    # structural maximum: count records of <= 65535 bytes + u16 prefixes
    if cap < 0 or cap > count * 0xFFFF + 2 * count + 16:
        raise ValueError("corrupted tokenized header data")
    out = np.empty(max(cap, 1), np.uint8)
    n = lib.fq_tok_decode(_nz_u8(arr), len(arr), count, out, cap)
    if n < 0:
        raise ValueError("corrupted tokenized header data")
    return out[:n].tobytes()


def _bind_qctx(lib):
    _u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    _u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.fq_qctx_prepare.restype = ctypes.c_int
    lib.fq_qctx_prepare.argtypes = [_u8p, _ll, _i64p, _ll, _u8p, _i64p]
    lib.fq_qctx_encode.restype = ctypes.c_int
    lib.fq_qctx_encode.argtypes = [
        _u8p, _ll, _i64p, _ll, _u16p, _u32p, _u16p, _u32p, _i64p,
        ctypes.c_int,
    ]
    lib.fq_qctx_decode.restype = ctypes.c_int
    lib.fq_qctx_decode.argtypes = [
        _u16p, _i64p, _i64p, _u32p, _ll, _i64p, _ll, _u16p, _u8p,
        ctypes.c_int,
    ]
    lib._qctx_bound = True


def _qctx_lib():
    lib = _load()
    if lib is not None and not hasattr(lib, "_qctx_bound"):
        _bind_qctx(lib)
    return lib


def qctx_prepare(delta: np.ndarray, lengths: np.ndarray):
    """Integrate + max-model context histogram:
    -> (raw u8[n], hist (3072, 256) i64)."""
    from ..ops import qualctx

    lib = _qctx_lib()
    n = len(delta)
    raw = np.empty(max(n, 1), np.uint8)
    hist = np.zeros((qualctx.NUM_CTX2, 256), dtype=np.int64)
    rc = lib.fq_qctx_prepare(
        _nz_u8(delta), n, _nz_i64(lengths), len(lengths),
        raw, hist.reshape(-1),
    )
    if rc != 0:
        raise ValueError("qual stream length does not match record lengths")
    return raw[:n], hist


def qctx_encode_chunks(
    raw: np.ndarray, lengths: np.ndarray,
    freq: np.ndarray, cum: np.ndarray, model: int = 0,
):
    """Backward-encode all chunks: -> (states (4,4) u32, word_runs list)."""
    from ..ops import qualctx

    lib = _qctx_lib()
    n = len(raw)
    words = np.empty(max(n, 1), np.uint16)
    states = np.zeros(qualctx.NUM_CHUNKS * qualctx.NUM_STATES, np.uint32)
    nwords = np.zeros(qualctx.NUM_CHUNKS, np.int64)
    rc = lib.fq_qctx_encode(
        _nz_u8(raw), n, _nz_i64(lengths), len(lengths),
        np.ascontiguousarray(freq.reshape(-1)),
        np.ascontiguousarray(cum.reshape(-1).astype(np.uint32)),
        words, states, nwords, model,
    )
    if rc != 0:
        raise ValueError("invalid qctx frequency table")
    _, sb = qualctx.chunk_bounds(lengths)
    runs = [
        words[sb[k + 1] - int(nwords[k]) : sb[k + 1]].copy()
        for k in range(qualctx.NUM_CHUNKS)
    ]
    return states.reshape(qualctx.NUM_CHUNKS, qualctx.NUM_STATES), runs


def qctx_decode(
    words_cat: np.ndarray, wcounts: np.ndarray, states: np.ndarray,
    total: int, lengths: np.ndarray, freq: np.ndarray, model: int = 0,
) -> bytes:
    """Forward-decode to the delta stream; raises on corrupt input."""
    lib = _qctx_lib()
    wstarts = np.zeros(len(wcounts), np.int64)
    np.cumsum(wcounts[:-1], out=wstarts[1:])
    out = np.empty(max(total, 1), np.uint8)
    rc = lib.fq_qctx_decode(
        words_cat if words_cat.size else np.zeros(1, np.uint16),
        wstarts, np.ascontiguousarray(wcounts.astype(np.int64)),
        np.ascontiguousarray(states.astype(np.uint32)),
        total, _nz_i64(lengths), len(lengths),
        np.ascontiguousarray(freq.reshape(-1)), out, model,
    )
    if rc != 0:
        raise ValueError("corrupted qctx quality data")
    return out[:total].tobytes()


def _bind_rans(lib):
    _u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    _u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.fq_rans_encode.restype = _ll
    lib.fq_rans_encode.argtypes = [
        _u8p, _ll, ctypes.c_int, ctypes.c_int, _u16p, _u32p, _u16p, _u32p,
    ]
    lib.fq_rans_decode.restype = ctypes.c_int
    lib.fq_rans_decode.argtypes = [
        _u16p, _ll, _u32p, ctypes.c_int, _u16p, _ll, _u8p,
    ]
    lib._rans_bound = True


def _rans_lib():
    lib = _load()
    if lib is not None and not hasattr(lib, "_rans_bound"):
        _bind_rans(lib)
    return lib


def rans_encode_kernel(
    raw: np.ndarray, lanes: int, pad_sym: int,
    freq: np.ndarray, cum: np.ndarray,
):
    """Sequential host twin of ops/rans.py's XLA encode kernels.

    Returns (words u16[total] in global (step, lane) order, states u32[N]);
    byte-identical to the device path for the same table.
    """
    lib = _rans_lib()
    n = len(raw)
    steps = -(-n // lanes)
    words = np.empty(max(steps * lanes, 1), np.uint16)
    states = np.zeros(lanes, np.uint32)
    total = lib.fq_rans_encode(
        _nz_u8(np.ascontiguousarray(raw)), n, lanes, pad_sym,
        np.ascontiguousarray(freq.astype(np.uint16)),
        np.ascontiguousarray(cum.astype(np.uint32)),
        words, states,
    )
    if total < 0:
        raise ValueError("invalid rANS frequency table")
    return words[:total], states


def rans_decode_kernel(
    words: np.ndarray, states: np.ndarray, lanes: int,
    freq: np.ndarray, raw_len: int,
) -> np.ndarray:
    """Sequential host rANS decode; raises ValueError on corrupt input."""
    lib = _rans_lib()
    out = np.empty(max(raw_len, 1), np.uint8)
    rc = lib.fq_rans_decode(
        words if words.size else np.zeros(1, np.uint16),
        len(words),
        np.ascontiguousarray(states.astype(np.uint32)), lanes,
        np.ascontiguousarray(freq.astype(np.uint16)), raw_len, out,
    )
    if rc != 0:
        raise ValueError("corrupted rANS stream data")
    return out[:raw_len]


def _bind_sctx(lib):
    _u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    _u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.fq_sctx_prepare.restype = ctypes.c_int
    lib.fq_sctx_prepare.argtypes = [_u8p, _ll, _i64p, _ll, _u8p, _i64p]
    lib.fq_sctx_encode.restype = ctypes.c_int
    lib.fq_sctx_encode.argtypes = [
        _u8p, _ll, _i64p, _ll, ctypes.c_int, _u16p, _u32p, _u16p, _u32p,
        _i64p,
    ]
    lib.fq_sctx_decode.restype = ctypes.c_int
    lib.fq_sctx_decode.argtypes = [
        _u16p, _i64p, _i64p, _u32p, _ll, _i64p, _ll, ctypes.c_int, _u16p,
        _u8p, _ll,
    ]
    lib.fq_sldm_unpack.restype = ctypes.c_int
    lib.fq_sldm_unpack.argtypes = [_u8p, _ll, _i64p, _ll, _u8p]
    lib.fq_sldm_pack.restype = ctypes.c_int
    lib.fq_sldm_pack.argtypes = [_u8p, _ll, _i64p, _ll, _u8p]
    lib._sctx_bound = True


def _sctx_lib():
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_sctx_bound"):
        try:
            _bind_sctx(lib)
        except AttributeError:
            return None
    return lib


def sctx_available() -> bool:
    return _sctx_lib() is not None


def sctx_prepare(packed: np.ndarray, lengths: np.ndarray):
    """Unpack + max-order context histogram: -> (bases u8[n], hist
    (4**6, 4) i64)."""
    from ..ops import seqctx

    lib = _sctx_lib()
    n = int(lengths.sum())
    bases = np.empty(max(n, 1), np.uint8)
    hist = np.zeros((4**seqctx.MAX_ORDER, 4), dtype=np.int64)
    rc = lib.fq_sctx_prepare(
        _nz_u8(np.ascontiguousarray(packed)), len(packed),
        _nz_i64(lengths), len(lengths), bases, hist.reshape(-1),
    )
    if rc != 0:
        raise ValueError("packed sequence data does not match lengths")
    return bases[:n], hist


def sctx_encode_chunks(
    bases: np.ndarray, lengths: np.ndarray, order: int,
    freq: np.ndarray, cum: np.ndarray,
):
    """Backward-encode all chunks: -> (states u32[4], word run list)."""
    from ..ops import seqctx
    from ..ops.qualctx import chunk_bounds

    lib = _sctx_lib()
    n = len(bases)
    words = np.empty(max(n, 1), np.uint16)
    states = np.zeros(seqctx.NUM_CHUNKS * seqctx.NUM_STATES, np.uint32)
    nwords = np.zeros(seqctx.NUM_CHUNKS, np.int64)
    rc = lib.fq_sctx_encode(
        _nz_u8(bases), n, _nz_i64(lengths), len(lengths), order,
        np.ascontiguousarray(freq.reshape(-1).astype(np.uint16)),
        np.ascontiguousarray(cum.reshape(-1).astype(np.uint32)),
        words, states, nwords,
    )
    if rc != 0:
        raise ValueError("invalid sctx frequency table")
    _, sb = chunk_bounds(lengths, seqctx.NUM_CHUNKS)
    runs = [
        words[sb[k + 1] - int(nwords[k]) : sb[k + 1]].copy()
        for k in range(seqctx.NUM_CHUNKS)
    ]
    return states.reshape(seqctx.NUM_CHUNKS, seqctx.NUM_STATES), runs


def sctx_decode(
    words_cat: np.ndarray, wcounts: np.ndarray, states: np.ndarray,
    total: int, lengths: np.ndarray, order: int, freq: np.ndarray,
) -> bytes:
    """Forward-decode straight to packed seq stream bytes."""
    from ..ops import seqctx

    lib = _sctx_lib()
    wstarts = np.zeros(len(wcounts), np.int64)
    np.cumsum(wcounts[:-1], out=wstarts[1:])
    plen = int(seqctx.packed_row_lengths(lengths).sum())
    out = np.zeros(max(plen, 1), np.uint8)
    rc = lib.fq_sctx_decode(
        words_cat if words_cat.size else np.zeros(1, np.uint16),
        wstarts, np.ascontiguousarray(wcounts.astype(np.int64)),
        np.ascontiguousarray(states.astype(np.uint32)),
        total, _nz_i64(lengths), len(lengths), order,
        np.ascontiguousarray(freq.reshape(-1).astype(np.uint16)),
        out, plen,
    )
    if rc != 0:
        raise ValueError("corrupted sctx sequence data")
    return out[:plen].tobytes()


def sldm_unpack(packed: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flat packed seq stream -> flat base codes (ops/sldm.py twin)."""
    lib = _sctx_lib()
    n = int(lengths.sum())
    bases = np.empty(max(n, 1), np.uint8)
    rc = lib.fq_sldm_unpack(
        _nz_u8(np.ascontiguousarray(packed)), len(packed),
        _nz_i64(lengths), len(lengths), bases,
    )
    if rc != 0:
        raise ValueError("packed sequence data does not match lengths")
    return bases[:n]


def sldm_pack(bases: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flat base codes -> flat packed seq stream, zero padding bits."""
    lib = _sctx_lib()
    plen = int(((lengths.astype(np.int64) + 3) >> 2).sum())
    out = np.zeros(max(plen, 1), np.uint8)
    rc = lib.fq_sldm_pack(
        _nz_u8(np.ascontiguousarray(bases)), len(bases),
        _nz_i64(lengths), len(lengths), out,
    )
    if rc != 0:
        raise ValueError("sequence codes do not match lengths")
    return out[:plen]


def _bind_rans_compact(lib):
    lib.fq_rans_compact.restype = ctypes.c_longlong
    lib.fq_rans_compact.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), _u8p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_uint16),
    ]


def rans_compact(emits: np.ndarray, mask_bits: np.ndarray) -> np.ndarray:
    """Compact a dense (slots,) u16 emit matrix by its LSB-first bitmask
    into the flat word stream (decoder consumption order) — the host
    finish of the device rANS encode (E057). Falls back to numpy when
    the native runtime is absent."""
    emits = np.ascontiguousarray(emits.reshape(-1), dtype=np.uint16)
    mask_bits = np.ascontiguousarray(mask_bits.reshape(-1), dtype=np.uint8)
    n = emits.shape[0]
    lib = _load()
    if lib is None:
        bits = np.unpackbits(mask_bits, bitorder="little")[:n]
        return emits[bits.astype(bool)]
    if not hasattr(lib.fq_rans_compact, "argtypes") or (
        lib.fq_rans_compact.argtypes is None
    ):
        _bind_rans_compact(lib)
    out = np.empty(n, np.uint16)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    total = lib.fq_rans_compact(
        emits.ctypes.data_as(u16p), _nz_u8(mask_bits), n,
        out.ctypes.data_as(u16p),
    )
    return out[:total]


# ---------------------------------------------------------------------------
# Whole-file multithreaded pipeline (fq_compress_mt / fq_decompress_mt):
# one GIL-released native call per file; a native scanner thread + encode
# workers + ordered collector replace the Python ThreadPoolExecutor loop
# (the reference's produceCompressJobs/runCompressionWorker/
# collectAndWriteResults, internal/compress/compress.go:240-443, as one
# native unit).
# ---------------------------------------------------------------------------

MT_FALLBACK = -20  # decode: foreign frames without content sizes etc.


def _bind_mt(lib):
    lib.fq_compress_mt.restype = _ll
    lib.fq_compress_mt.argtypes = [
        _u8p, _ll, _ll, ctypes.c_int, ctypes.c_uint8, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), _i64p,
    ]
    lib.fq_decompress_mt.restype = _ll
    lib.fq_decompress_mt.argtypes = [
        _u8p, _ll, ctypes.c_int, ctypes.c_uint8, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), _i64p,
    ]
    lib.fq_buf_free.restype = None
    lib.fq_buf_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "fq_decompress_mt_v3"):
        lib.fq_decompress_mt_v3.restype = _ll
        lib.fq_decompress_mt_v3.argtypes = [
            _u8p, _ll, ctypes.c_uint8, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), _i64p,
        ]
    if hasattr(lib, "fq_compress_mt_dict"):
        lib.fq_compress_mt_dict.restype = _ll
        lib.fq_compress_mt_dict.argtypes = [
            _u8p, _ll, _ll, ctypes.c_uint8, ctypes.c_int, _u8p, _ll,
            _u8p, _ll, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), _i64p,
        ]
    if hasattr(lib, "fq_decompress_mt_v3_ex"):
        lib.fq_decompress_mt_v3_ex.restype = _ll
        lib.fq_decompress_mt_v3_ex.argtypes = [
            _u8p, _ll, ctypes.c_uint8, ctypes.c_int, _u8p, _ll,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), _i64p,
        ]
    lib._mt_bound = True


def mt_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fq_compress_mt")


def scramble_pcg_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fq_scramble_pcg")


def markov_gen(n: int, prob16: np.ndarray, seed: int) -> np.ndarray:
    """Order-1 Markov base-code stream (synthetic context-model corpus;
    see fq_markov_gen)."""
    lib = _load()
    if not hasattr(lib, "_markov_bound"):
        lib.fq_markov_gen.restype = None
        lib.fq_markov_gen.argtypes = [
            _u8p, _ll, ctypes.POINTER(ctypes.c_uint16), ctypes.c_uint64,
        ]
        lib._markov_bound = True
    out = np.empty(n, np.uint8)
    p = np.ascontiguousarray(prob16, dtype=np.uint16)
    lib.fq_markov_gen(
        out, n, p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_uint64(seed),
    )
    return out


def wctx_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fq_wctx_decode")


def wctx_decode(
    words: np.ndarray,
    states: np.ndarray,
    lengths: np.ndarray,
    model: int,
    order: int,
    present: np.ndarray,
    freq_p: np.ndarray,
) -> np.ndarray:
    """TAG_WCTX lockstep decode (C++ twin of ops/wctx.py decode) ->
    flat unpacked symbols."""
    lib = _load()
    if not hasattr(lib, "_wctx_bound"):
        lib.fq_wctx_decode.restype = ctypes.c_int
        lib.fq_wctx_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), _ll,
            ctypes.POINTER(ctypes.c_uint32), _ll,
            _i64p, _ll, ctypes.c_int, ctypes.c_int,
            _u8p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16), _ll,
            _u8p, _ll,
        ]
        lib._wctx_bound = True
    words = np.ascontiguousarray(words, dtype=np.uint16)
    states = np.ascontiguousarray(states, dtype=np.uint32)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    present = np.ascontiguousarray(present, dtype=np.uint8)
    freq_p = np.ascontiguousarray(freq_p, dtype=np.uint16)
    total = int(lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    rc = lib.fq_wctx_decode(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        len(words),
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(states),
        lengths, len(lengths),
        int(model), int(order),
        present, len(present),
        freq_p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        freq_p.shape[0],
        out, total,
    )
    if rc == -2:
        raise ValueError("truncated wctx words")
    if rc == -3:
        raise ValueError("trailing wctx words")
    if rc in (-1, -4):
        raise ValueError("corrupted wctx stream")
    if rc == -12:
        raise MemoryError("wctx decode allocation failed")
    if rc != 0:
        raise ValueError(f"wctx decode failed ({rc})")
    return out


def scramble_pcg(
    data: bytes | np.ndarray, seed: int = 42, state: np.ndarray | None = None
) -> bytes:
    """Go-fqscramble-exact PCG scramble of a FASTQ text chunk (C++ twin
    of utils/gopcg.scramble_text). ``state``: optional 2-element uint64
    array carrying the PCG state {hi, lo} across chunked calls (cut
    chunks at 4-line-group boundaries); defaults to a fresh
    ``NewPCG(seed, seed)``."""
    lib = _load()
    if not hasattr(lib, "_scramble_bound"):
        lib.fq_scramble_pcg.restype = _ll
        lib.fq_scramble_pcg.argtypes = [
            _u8p, _ll, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib._scramble_bound = True
    src = (
        np.frombuffer(data, np.uint8)
        if isinstance(data, (bytes, bytearray))
        else data
    )
    if state is None:
        s = seed & ((1 << 64) - 1)
        state = np.array([s, s], dtype=np.uint64)
    handle = ctypes.c_void_p(None)
    ptr = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.fq_scramble_pcg(
        _nz_u8(src), len(src),
        state.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.byref(handle), ctypes.byref(ptr),
    )
    if n < 0:
        raise MemoryError("native scramble allocation failed")
    try:
        if n == 0:
            return b""
        return bytes(np.ctypeslib.as_array(ptr, shape=(int(n),)))
    finally:
        lib.fq_buf_free(handle)


def _mt_raise_compress(code: int, info) -> None:
    from ..ops.reference import MAX_SEQUENCE_LENGTH
    from ..parser.fastq import FastqParseError

    if code == -10:
        raise FastqParseError(SCAN_ERRORS[int(info[0])])
    if code == -1:
        raise ValueError("record field longer than 65535 bytes")
    if code == -6:
        row, length = int(info[0]), int(info[1])
        raise ValueError(
            f'record "record {row}": sequence length {length} has '
            f"ambiguous bases beyond position {MAX_SEQUENCE_LENGTH}; "
            f"N-position tracking is limited to {MAX_SEQUENCE_LENGTH} bp"
        )
    if code == -11:
        raise OSError(int(info[0]), os.strerror(int(info[0])))
    raise RuntimeError(f"native compress pipeline failed ({code})")


def _mt_raise_decompress(code: int, info) -> None:
    from ..entropy.zstd import ZstdError
    from ..format.container import FormatError

    if code == -21:
        raise FormatError("truncated block header")
    if code == -22:
        raise FormatError("truncated block payload")
    if code == -7:
        raise ZstdError("corrupted zstd frame in block payload")
    # v3 MT decode extensions (fq_decompress_mt_v3)
    if code == -8:
        raise FormatError("truncated or corrupted rANS stream")
    if code == -9:
        raise FormatError("corrupted tokenized header stream")
    if code == -13:
        raise FormatError("block CRC32 mismatch: corrupted data")
    if code == -14:
        raise FormatError("corrupted qctx quality data")
    if code == -15:
        raise FormatError("corrupted sctx sequence data")
    if code == -16:
        raise FormatError("corrupted sldm sequence data")
    if code == -17:
        raise FormatError("corrupted sequence dictionary")
    if code == -18:
        raise FormatError("corrupted wctx stream")
    if -6 <= code <= -1:
        raise FormatError(
            _DECODE_STREAM_ERRORS.get(code, "corrupted block data")
        )
    if code == -11:
        raise OSError(int(info[0]), os.strerror(int(info[0])))
    raise RuntimeError(f"native decompress pipeline failed ({code})")


def _mt_call(fn, src: np.ndarray, args: tuple, out_fd: int, sink):
    """Shared tail: run an MT entry point; fd mode streams inside the
    native call, buffer mode hands the owned result to ``sink.write`` as
    a zero-copy view before freeing it. Returns the byte count; negative
    codes come back unraised."""
    handle = ctypes.c_void_p(None)
    ptr = ctypes.POINTER(ctypes.c_uint8)()
    info = np.zeros(2, np.int64)
    n = fn(
        _nz_u8(src), len(src), *args, out_fd,
        ctypes.byref(handle), ctypes.byref(ptr), info,
    )
    if n < 0:
        return int(n), info
    if out_fd < 0:
        try:
            if n:
                view = np.ctypeslib.as_array(ptr, shape=(int(n),))
                sink.write(memoryview(view))
        finally:
            _load().fq_buf_free(handle)
    return int(n), None


def compress_mt(
    src: np.ndarray,
    block_records: int,
    version: int,
    extra_flags: int,
    workers: int,
    out_fd: int = -1,
    sink=None,
):
    """Whole-file v1/v2/v3 compress: streams to ``out_fd`` when >= 0,
    else writes the container into ``sink`` as one zero-copy view.
    Returns the byte count. Output is byte-identical to the per-block
    pipeline (same scan, same fq_encode_block_v2 / fqv3 pick policy).
    v3 (E080) returns ``None`` when the input is outside the native
    envelope (block-0 coverage probe fired — the Python path builds the
    FLAG_SEQ_DICT container); nothing has been written to the sink."""
    lib = _load()
    if not hasattr(lib, "_mt_bound"):
        _bind_mt(lib)
    res, info = _mt_call(
        lib.fq_compress_mt, src,
        (block_records, version, extra_flags, workers), out_fd, sink,
    )
    if res < 0:
        if res == MT_FALLBACK:
            return None
        _mt_raise_compress(res, info)
    return res


def compress_mt_dict_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fq_compress_mt_dict")


def compress_mt_dict(
    src: np.ndarray,
    block_records: int,
    extra_flags: int,
    workers: int,
    seq_dict: np.ndarray,
    dict_comp: bytes,
    out_fd: int = -1,
    sink=None,
):
    """FLAG_SEQ_DICT whole-file v3 compress (E087): the caller decides
    the dict (decoded codes + the compressed section payload, written
    verbatim); the native call runs the parallel per-block encode with
    the TAG_SLDM prefix under exact Python-framing parity.
    ``extra_flags`` must include FLAG_SEQ_DICT. Byte-identical to the
    per-block Python dict path."""
    lib = _load()
    if not hasattr(lib, "_mt_bound"):
        _bind_mt(lib)
    seq_dict = np.ascontiguousarray(seq_dict, np.uint8)
    comp_arr = np.frombuffer(dict_comp, np.uint8)
    res, info = _mt_call(
        lib.fq_compress_mt_dict, src,
        (block_records, extra_flags, workers, _nz_u8(seq_dict),
         len(seq_dict), _nz_u8(comp_arr), len(comp_arr)),
        out_fd, sink,
    )
    if res < 0:
        if res == MT_FALLBACK:
            return None
        _mt_raise_compress(res, info)
    return res


def compress_mt_v3_available() -> bool:
    """The wide-npos fused scan is exported by the same build that
    taught fq_compress_mt version 3 (E080)."""
    lib = _load()
    return lib is not None and hasattr(
        lib, "fq_encode_block_fused_scan_wide"
    )


def decompress_mt(
    src: np.ndarray,
    version: int,
    qual_offset: int,
    workers: int,
    out_fd: int = -1,
    sink=None,
):
    """Whole-file v1/v2 decompress of a container body (file header
    already consumed): streams to ``out_fd`` when >= 0, else writes the
    FASTQ text into ``sink`` as one zero-copy view. Returns the byte
    count, or ``None`` when the container needs the per-block fallback
    path (foreign zstd frames without declared content sizes)."""
    lib = _load()
    if not hasattr(lib, "_mt_bound"):
        _bind_mt(lib)
    res, info = _mt_call(
        lib.fq_decompress_mt, src, (version, qual_offset, workers), out_fd,
        sink,
    )
    if res < 0:
        if res == MT_FALLBACK:
            return None
        _mt_raise_decompress(res, info)
    return res


def decompress_mt_v3_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fq_decompress_mt_v3")


def decompress_mt_v3(
    src: np.ndarray,
    qual_offset: int,
    workers: int,
    out_fd: int = -1,
    sink=None,
):
    """Whole-file v3 (native format) decompress of a container body
    (file header already consumed) — E078. Returns the byte count, or
    ``None`` for containers outside the native envelope (seq-dict/
    lossless flags are the CALLER's check from the file header;
    context-coded streams and foreign frames fall back here)."""
    lib = _load()
    if not hasattr(lib, "_mt_bound"):
        _bind_mt(lib)
    res, info = _mt_call(
        lib.fq_decompress_mt_v3, src, (qual_offset, workers), out_fd, sink
    )
    if res < 0:
        if res == MT_FALLBACK:
            return None
        _mt_raise_decompress(res, info)
    return res


def decompress_mt_v3_ex_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fq_decompress_mt_v3_ex")


def decompress_mt_v3_ex(
    src: np.ndarray,
    qual_offset: int,
    workers: int,
    seq_dict: "np.ndarray | None" = None,
    out_fd: int = -1,
    sink=None,
):
    """As :func:`decompress_mt_v3` with the container sequence
    dictionary (decoded unpacked codes, FLAG_SEQ_DICT) referenced as
    the TAG_SLDM match prefix (E081). ``src`` starts at the first block
    header — the caller already consumed the dict section."""
    lib = _load()
    if not hasattr(lib, "_mt_bound"):
        _bind_mt(lib)
    if seq_dict is None:
        # dict_len 0 -> the native side never dereferences the pointer
        dict_ptr, dict_len = _EMPTY_U8, 0
    else:
        seq_dict = np.ascontiguousarray(seq_dict, np.uint8)
        dict_ptr, dict_len = _nz_u8(seq_dict), len(seq_dict)
    res, info = _mt_call(
        lib.fq_decompress_mt_v3_ex, src,
        (qual_offset, 0, dict_ptr, dict_len, workers), out_fd, sink,
    )
    if res < 0:
        if res == MT_FALLBACK:
            return None
        _mt_raise_decompress(res, info)
    return res
