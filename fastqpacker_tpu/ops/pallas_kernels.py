"""Pallas TPU kernels: fused single-pass block encode.

The dense encode (base codes + 2-bit pack + ambiguity mask + quality
delta + N counts) is one HBM-bandwidth-bound pass. The XLA version in
:mod:`fastqpacker_tpu.ops.device` relies on the fuser; this module is the
hand-fused Pallas equivalent with explicit tiling, written so every
operation is elementwise on the VPU:

- Inputs arrive as ``(R, W)`` uint32 rows — each u32 holds 4 consecutive
  bases/qualities (little-endian), so "pack 4 bases into one byte" and
  "delta against the previous byte" are in-lane bit arithmetic plus one
  lane roll, never a cross-lane reshape.
- The ambiguity mask is produced as one nibble per u32 (bit k = byte k is
  non-ACGT); the host pairs nibbles into the wire bitmask.
- Per-record N counts reduce along the lane axis inside the kernel.

Grid: one program per row tile; rows are independent records.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import reference as refops

_u32 = jnp.uint32

ROW_TILE = 256


def _byte(x, k):
    return (x >> _u32(8 * k)) & _u32(0xFF)


def _encode_tile_kernel(
    seq_ref, qual_ref, len_ref, packed_ref, nmnib_ref, delta_ref, ncnt_ref,
    *, qual_offset: int, width: int
):
    seq = seq_ref[:]
    qual = qual_ref[:]
    lengths = len_ref[:]  # (TR, 1) int32

    tr = seq.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, width), 1)

    packed = jnp.zeros(seq.shape, dtype=_u32)
    nmnib = jnp.zeros(seq.shape, dtype=_u32)
    ncnt = jnp.zeros((tr, 1), dtype=jnp.int32)

    # previous u32 in the row (for byte 0's delta neighbor); lane 0 -> 0
    qual_prev = pltpu.roll(qual, 1, axis=1)
    qual_prev = jnp.where(col == 0, _u32(0), qual_prev)
    delta = jnp.zeros(seq.shape, dtype=_u32)

    for k in range(4):
        b = _byte(seq, k)
        upper = b & _u32(0xDF)
        code = (
            (upper == 67).astype(_u32)
            + _u32(2) * (upper == 71).astype(_u32)
            + _u32(3) * (upper == 84).astype(_u32)
        )
        valid = (
            (upper == 65) | (upper == 67) | (upper == 71) | (upper == 84)
        )
        pos = col * 4 + k
        in_range = pos < lengths
        nm = (
            (~valid) & in_range & (pos < refops.MAX_SEQUENCE_LENGTH)
        ).astype(_u32)
        packed = packed | (code << _u32(2 * k))
        nmnib = nmnib | (nm << _u32(k))
        ncnt = ncnt + jnp.sum(nm.astype(jnp.int32), axis=1, keepdims=True)

        q = _byte(qual, k)
        prev = _byte(qual, k - 1) if k > 0 else _byte(qual_prev, 3)
        d = jnp.where(pos == 0, q - _u32(qual_offset), q - prev) & _u32(0xFF)
        delta = delta | (d << _u32(8 * k))

    packed_ref[:] = packed.astype(jnp.uint8)
    nmnib_ref[:] = nmnib.astype(jnp.uint8)
    delta_ref[:] = delta
    ncnt_ref[:] = ncnt


@partial(jax.jit, static_argnames=("qual_offset", "interpret"))
def encode_arrays_pallas(
    seq32: jax.Array,  # (R, W) uint32: 4 bases per element, LE
    qual32: jax.Array,  # (R, W) uint32
    lengths: jax.Array,  # (R,) int32
    qual_offset: int,
    interpret: bool = False,
):
    """Fused encode over u32-packed rows.

    Returns (packed (R, W) u8, nmask_nibbles (R, W) u8,
    qual_delta32 (R, W) u32, n_counts (R,) i32).
    """
    r, w = seq32.shape
    tile = min(ROW_TILE, r)
    grid = (pl.cdiv(r, tile),)

    row_spec = pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    packed, nmnib, delta, ncnt = pl.pallas_call(
        partial(_encode_tile_kernel, qual_offset=qual_offset, width=w),
        out_shape=(
            jax.ShapeDtypeStruct((r, w), jnp.uint8),
            jax.ShapeDtypeStruct((r, w), jnp.uint8),
            jax.ShapeDtypeStruct((r, w), jnp.uint32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ),
        grid=grid,
        in_specs=[row_spec, row_spec, len_spec],
        out_specs=(
            pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(seq32, qual32, lengths.reshape(r, 1))
    return packed, nmnib, delta, ncnt.reshape(r)


def encode_block_arrays(
    seq: np.ndarray,
    qual: np.ndarray,
    lengths: np.ndarray,
    qual_offset: int,
    interpret: bool = False,
) -> refops.EncodedArrays:
    """Backend adapter matching refops.encode_block_arrays via Pallas.

    Pads the read length to a multiple of 8 (so u32 lanes and nibble
    pairs align), views rows as u32, runs the fused kernel, and restores
    the wire-layout outputs.
    """
    r, l = seq.shape
    l8 = max(8, -(-l // 8) * 8)
    if l8 != l:
        seq = np.pad(seq, ((0, 0), (0, l8 - l)))
        qual = np.pad(qual, ((0, 0), (0, l8 - l)), constant_values=0)
    w = l8 // 4
    seq32 = np.ascontiguousarray(seq).view("<u4")
    qual32 = np.ascontiguousarray(qual).view("<u4")

    packed, nmnib, delta32, ncnt = encode_arrays_pallas(
        jnp.asarray(seq32),
        jnp.asarray(qual32),
        jnp.asarray(lengths.astype(np.int32)),
        qual_offset,
        interpret=interpret,
    )
    packed = np.asarray(packed)[:, : -(-l // 4)]
    nmnib = np.asarray(nmnib)
    # pair nibbles -> little-endian bitmask bytes
    nmask_bits = (nmnib[:, 0::2] | (nmnib[:, 1::2] << 4))[:, : -(-l // 8)]
    qual_delta = np.ascontiguousarray(delta32).view(np.uint8)[:, :l]
    return refops.EncodedArrays(
        packed=packed,
        nmask_bits=nmask_bits,
        n_counts=np.asarray(ncnt).astype(np.int32),
        qual_delta=qual_delta,
    )


# ---------------------------------------------------------------------------
# Fused single-pass block decode: the kernel twin of the encode above
# (journal E045). packed 2-bit bytes -> ACGT ASCII, quality deltas ->
# absolute Phred bytes. Everything stays elementwise on the VPU: the
# per-record running quality sum is 4 in-lane byte cumsums plus a
# Hillis-Steele log-roll prefix scan across lanes (O(log W) pltpu.roll
# steps) — no gathers, no cross-lane reshapes. N restoration stays on
# host (the npos side stream is irregular), matching host_decode_arrays.
# ---------------------------------------------------------------------------


def _decode_tile_kernel(
    packed_ref, delta_ref, seq_ref, qual_ref, *, qual_offset: int,
    width: int
):
    p = packed_ref[:].astype(_u32)  # (TR, W): one packed byte per lane
    d = delta_ref[:]                # (TR, W) u32: 4 delta bytes per lane
    tr = p.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, width), 1)

    seq_out = jnp.zeros(p.shape, dtype=_u32)
    for k in range(4):
        code = (p >> _u32(2 * k)) & _u32(3)
        ascii_ = jnp.where(
            code == 0,
            _u32(65),
            jnp.where(code == 1, _u32(67), jnp.where(code == 2, _u32(71), _u32(84))),
        )
        seq_out = seq_out | (ascii_ << _u32(8 * k))

    # in-lane cumulative delta bytes
    c0 = _byte(d, 0)
    c1 = c0 + _byte(d, 1)
    c2 = c1 + _byte(d, 2)
    c3 = c2 + _byte(d, 3)
    # inclusive prefix of lane totals (Hillis-Steele), then exclusive
    s = c3
    sh = 1
    while sh < width:
        s = s + jnp.where(col >= sh, pltpu.roll(s, sh, axis=1), _u32(0))
        sh *= 2
    base = (s - c3) + _u32(qual_offset)
    q = (base + c0) & _u32(0xFF)
    q = q | (((base + c1) & _u32(0xFF)) << _u32(8))
    q = q | (((base + c2) & _u32(0xFF)) << _u32(16))
    q = q | (((base + c3) & _u32(0xFF)) << _u32(24))

    seq_ref[:] = seq_out
    qual_ref[:] = q


@partial(jax.jit, static_argnames=("qual_offset", "interpret"))
def decode_arrays_pallas(
    packed8: jax.Array,  # (R, W) uint8: one packed byte per output u32
    delta32: jax.Array,  # (R, W) uint32: 4 quality-delta bytes per lane
    qual_offset: int,
    interpret: bool = False,
):
    """Fused decode over u32 lanes; returns (seq32, qual32) u32 rows."""
    r, w = packed8.shape
    tile = min(ROW_TILE, r)
    grid = (pl.cdiv(r, tile),)
    spec8 = pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec32 = pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_decode_tile_kernel, qual_offset=qual_offset, width=w),
        out_shape=(
            jax.ShapeDtypeStruct((r, w), jnp.uint32),
            jax.ShapeDtypeStruct((r, w), jnp.uint32),
        ),
        grid=grid,
        in_specs=[spec8, spec32],
        out_specs=(spec32, spec32),
        interpret=interpret,
    )(packed8, delta32)


def decode_block_arrays(
    packed: np.ndarray,
    qual_delta: np.ndarray,
    lengths: np.ndarray,
    qual_offset: int,
    interpret: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Backend adapter matching pipeline.blocks.host_decode_arrays via
    Pallas: (packed rows, delta rows) -> (seq ASCII, qual ASCII).

    N restoration and per-record trimming happen in the caller
    (streams_to_fastq), exactly as with the host backend.
    """
    r, out_len = qual_delta.shape
    l8 = max(8, -(-out_len // 8) * 8)
    w = l8 // 4
    if packed.shape[1] < w:
        packed = np.pad(packed, ((0, 0), (0, w - packed.shape[1])))
    else:
        packed = packed[:, :w]
    if out_len != l8:
        qual_delta = np.pad(qual_delta, ((0, 0), (0, l8 - out_len)))
    delta32 = np.ascontiguousarray(qual_delta).view("<u4")

    seq32, qual32 = decode_arrays_pallas(
        jnp.asarray(np.ascontiguousarray(packed)),
        jnp.asarray(delta32),
        qual_offset,
        interpret=interpret,
    )
    seq = np.ascontiguousarray(np.asarray(seq32)).view(np.uint8)[:, :out_len]
    qual = np.ascontiguousarray(np.asarray(qual32)).view(np.uint8)[:, :out_len]
    return seq, qual
