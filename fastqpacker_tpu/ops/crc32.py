"""On-chip CRC32 (IEEE 802.3, reflected poly 0xEDB88320).

CRC is bit-serial per byte stream, so the TPU formulation splits the data
into N contiguous chunks (one per vector lane), computes every chunk's
CRC in lockstep — the per-byte update is the 8-step bitwise recurrence,
pure elementwise VPU work, no lookup-table gathers — and combines the
lane CRCs on host with the standard GF(2) carry-less "shift by 8*len"
matrix trick (the same math as zlib's crc32_combine).

Masked updates make ragged tails exact: lanes freeze once their chunk
ends, so one compiled shape serves every input length.

Verified bit-identical to ``zlib.crc32`` (tests/test_crc32.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

POLY = 0xEDB88320

_u32 = jnp.uint32


# ---------------------------------------------------------------------------
# GF(2) combine (host)
# ---------------------------------------------------------------------------


def _gf2_matrix_times(mat: np.ndarray, vec: int) -> int:
    total = 0
    i = 0
    while vec:
        if vec & 1:
            total ^= int(mat[i])
        vec >>= 1
        i += 1
    return total


def _gf2_matrix_square(mat: np.ndarray) -> np.ndarray:
    return np.array(
        [_gf2_matrix_times(mat, int(m)) for m in mat], dtype=np.uint64
    )


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """CRC of A||B from crc32(A), crc32(B), len(B) (zlib combine math)."""
    if len2 == 0:
        return crc1
    # operator for one zero bit
    odd = np.zeros(32, dtype=np.uint64)
    odd[0] = POLY
    for i in range(1, 32):
        odd[i] = 1 << (i - 1)
    even = _gf2_matrix_square(odd)  # two zero bits
    odd = _gf2_matrix_square(even)  # four zero bits

    crc1 = int(crc1)
    len2 = int(len2)
    while True:
        even = _gf2_matrix_square(odd)
        if len2 & 1:
            crc1 = _gf2_matrix_times(even, crc1)
        len2 >>= 1
        if len2 == 0:
            break
        odd = _gf2_matrix_square(even)
        if len2 & 1:
            crc1 = _gf2_matrix_times(odd, crc1)
        len2 >>= 1
        if len2 == 0:
            break
    return (crc1 ^ crc2) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(2, 3))
def _crc_lanes_kernel(
    data_t: jax.Array,  # (K, N) uint8: row t = byte t of every lane chunk
    valid_len: jax.Array,  # (N,) int32 true chunk lengths
    K: int,
    N: int,
) -> jax.Array:
    """Per-lane CRC32 of N contiguous chunks, lockstep over K steps."""

    def step(crc, inp):
        row, t = inp
        live = t < valid_len
        c = crc ^ row.astype(_u32)
        for _ in range(8):
            mask = jnp.where((c & _u32(1)) != 0, _u32(POLY), _u32(0))
            c = (c >> 1) ^ mask
        # only the low byte was folded in; rebuild full update:
        # standard byte update is crc = (crc>>8) ^ table[(crc^b)&0xFF];
        # the 8-step bitwise loop above on (crc ^ b) computes exactly that
        # when applied to the full register.
        crc = jnp.where(live, c, crc)
        return crc, None

    rows = data_t
    ts = jnp.arange(K, dtype=jnp.int32)
    crc0 = jnp.full((N,), 0xFFFFFFFF, dtype=_u32)
    crc, _ = jax.lax.scan(step, crc0, (rows, ts))
    return crc ^ _u32(0xFFFFFFFF)


def crc32_device(data: bytes | np.ndarray, lanes: int = 256) -> int:
    """CRC32 of ``data`` computed chunk-parallel on the accelerator."""
    import zlib

    raw = np.frombuffer(data, np.uint8) if isinstance(
        data, (bytes, bytearray)
    ) else data
    n = len(raw)
    if n == 0:
        return 0
    if n < lanes * 64:
        return zlib.crc32(raw.tobytes()) & 0xFFFFFFFF  # too small to fan out

    K = -(-n // lanes)
    padded = np.zeros(lanes * K, dtype=np.uint8)
    padded[:n] = raw
    chunks = padded.reshape(lanes, K)
    lens = np.full(lanes, K, dtype=np.int32)
    # ragged tail: lane holding the end has a short chunk; later lanes empty
    last = n // K
    if last < lanes:
        lens[last] = n - last * K
        if last + 1 < lanes:
            lens[last + 1 :] = 0

    crcs = np.asarray(
        _crc_lanes_kernel(
            jnp.asarray(np.ascontiguousarray(chunks.T)),
            jnp.asarray(lens),
            K,
            lanes,
        )
    )

    total = 0
    total_len = 0
    for l in range(lanes):
        if lens[l] == 0:
            break
        if total_len == 0:
            total = int(crcs[l])
        else:
            total = crc32_combine(total, int(crcs[l]), int(lens[l]))
        total_len += int(lens[l])
    return total & 0xFFFFFFFF
