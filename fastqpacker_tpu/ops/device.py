"""JAX device implementations of the codec array transforms.

The dense, bandwidth-bound per-block transforms (2-bit base packing,
ambiguity-bitmask extraction, quality normalize+delta, and their inverses)
run on TPU as fused XLA programs; :mod:`fastqpacker_tpu.ops.pallas_kernels`
provides hand-fused Pallas variants for the hot path. Semantics are defined
by :mod:`fastqpacker_tpu.ops.reference` (numpy) and checked by equivalence
tests on random inputs.

All functions take/return dense arrays with static shapes: the pipeline
pads records-per-block and read length to shape buckets so each (R, L)
pair compiles once (XLA traces and compiles a fixed-shape program; dynamic
shapes would defeat tiling).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import reference as refops

_A, _C, _G, _T = 65, 67, 71, 84


class DeviceEncoded(NamedTuple):
    """Device-side encode outputs (mirrors refops.EncodedArrays)."""

    packed: jax.Array  # (R, ceil(L/4)) uint8
    nmask_bits: jax.Array  # (R, ceil(L/8)) uint8
    n_counts: jax.Array  # (R,) int32
    qual_delta: jax.Array  # (R, L) uint8


def _pad_cols(x: jax.Array, multiple: int) -> jax.Array:
    l = x.shape[1]
    lp = -(-l // multiple) * multiple
    if lp == l:
        return x
    return jnp.pad(x, ((0, 0), (0, lp - l)))


def base_codes(seq: jax.Array) -> jax.Array:
    """ASCII -> 2-bit codes, case-insensitive, non-ACGT -> 0 (sequence.go:23-32)."""
    upper = seq & jnp.uint8(0xDF)
    return (
        (upper == _C).astype(jnp.uint8)
        + jnp.uint8(2) * (upper == _G).astype(jnp.uint8)
        + jnp.uint8(3) * (upper == _T).astype(jnp.uint8)
    )


def valid_base_mask(seq: jax.Array) -> jax.Array:
    upper = seq & jnp.uint8(0xDF)
    return (upper == _A) | (upper == _C) | (upper == _G) | (upper == _T)


def pack_2bit(codes: jax.Array) -> jax.Array:
    """(R, L) codes -> (R, ceil(L/4)) bytes, LSB-first (sequence.go:70-73)."""
    r = codes.shape[0]
    c = _pad_cols(codes, 4)
    g = c.reshape(r, -1, 4)
    return (
        g[:, :, 0]
        | (g[:, :, 1] << 2)
        | (g[:, :, 2] << 4)
        | (g[:, :, 3] << 6)
    )


def pack_bits_le(bits: jax.Array) -> jax.Array:
    """(R, L) {0,1} -> (R, ceil(L/8)) little-endian packed bytes."""
    r = bits.shape[0]
    b = _pad_cols(bits.astype(jnp.uint8), 8).reshape(r, -1, 8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint8)


@partial(jax.jit, static_argnames=("qual_offset",))
def encode_arrays_jit(
    seq: jax.Array,
    qual: jax.Array,
    lengths: jax.Array,
    qual_offset: int,
) -> DeviceEncoded:
    """Fused single-pass block encode (XLA).

    The TPU twin of the reference's per-record hot loop
    (compress.go:490-511): one elementwise pass over the block computes
    base codes, the ambiguity mask (length-limited and capped at the u16
    tracking bound, sequence.go:89-96), packed bases, packed N bitmask,
    per-record N counts, and delta-coded qualities.
    """
    r, l = seq.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    in_range = col < lengths[:, None]

    codes = base_codes(seq)
    nmask = (
        (~valid_base_mask(seq))
        & in_range
        & (col < refops.MAX_SEQUENCE_LENGTH)
    )

    # non-ACGT bytes already map to code 0 ('A'), matching sequence.go:56-57
    packed = pack_2bit(codes)
    nmask_bits = pack_bits_le(nmask)
    n_counts = jnp.sum(nmask, axis=1, dtype=jnp.int32)

    qn = qual - jnp.uint8(qual_offset)
    prev = jnp.pad(qn[:, :-1], ((0, 0), (1, 0)))
    qual_delta = jnp.where(col == 0, qn, qn - prev)

    return DeviceEncoded(packed, nmask_bits, n_counts, qual_delta)


def codes_to_ascii(codes: jax.Array) -> jax.Array:
    """2-bit codes -> 'ACGT' arithmetically (no LUT gather on device)."""
    c = codes.astype(jnp.uint8)
    return (
        jnp.uint8(65)
        + (c << 1)
        + jnp.uint8(2) * (c >= 2).astype(jnp.uint8)
        + jnp.uint8(11) * (c == 3).astype(jnp.uint8)
    )


def unpack_2bit(packed: jax.Array, out_len: int) -> jax.Array:
    r = packed.shape[0]
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    codes = (packed[:, :, None] >> shifts) & jnp.uint8(3)
    return codes.reshape(r, -1)[:, :out_len]


@partial(jax.jit, static_argnames=("qual_offset",))
def decode_arrays_jit(
    packed: jax.Array,
    qual_delta: jax.Array,
    lengths: jax.Array,
    qual_offset: int,
) -> tuple[jax.Array, jax.Array]:
    """Fused block decode: unpack bases + integrate quality deltas.

    Mirror of compress.go:1017-1044 as one device program; N restoration
    is a rare host-side scatter applied afterwards.
    """
    out_len = qual_delta.shape[1]
    seq_ascii = codes_to_ascii(unpack_2bit(packed, out_len))
    acc = jnp.cumsum(qual_delta.astype(jnp.uint32), axis=1)
    qual_ascii = (acc + qual_offset).astype(jnp.uint8)
    return seq_ascii, qual_ascii


# ---------------------------------------------------------------------------
# numpy-facing adapters (the backend interface used by pipeline.blocks)
# ---------------------------------------------------------------------------


def encode_block_arrays(
    seq: np.ndarray,
    qual: np.ndarray,
    lengths: np.ndarray,
    qual_offset: int,
) -> refops.EncodedArrays:
    """Backend adapter: host arrays in, host arrays out, compute on device."""
    enc = encode_arrays_jit(
        jnp.asarray(seq), jnp.asarray(qual), jnp.asarray(lengths), qual_offset
    )
    return refops.EncodedArrays(
        packed=np.asarray(enc.packed),
        nmask_bits=np.asarray(enc.nmask_bits),
        n_counts=np.asarray(enc.n_counts),
        qual_delta=np.asarray(enc.qual_delta),
    )


def decode_block_arrays(
    packed: np.ndarray,
    qual_delta: np.ndarray,
    lengths: np.ndarray,
    qual_offset: int,
) -> tuple[np.ndarray, np.ndarray]:
    seq_ascii, qual_ascii = decode_arrays_jit(
        jnp.asarray(packed),
        jnp.asarray(qual_delta),
        jnp.asarray(lengths),
        qual_offset,
    )
    return np.asarray(seq_ascii), np.asarray(qual_ascii)
