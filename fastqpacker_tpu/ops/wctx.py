"""Wide-interleaved context-modeled rANS coder (FQZ v3 ``TAG_WCTX``).

The host context coders (ops/seqctx.py order-k sequences, ops/qualctx.py
order-1 qualities) buy the v3 ratio wins but run 4-16 sequential rANS
states — useless on a VPU that wants thousands of lanes. This module is
the **device-mesh** context coder (VERDICT r2 #1): the same static
two-pass models evaluated over N (256-16384) record-aligned lanes in
lockstep, so the entropy stage of ``fqpack --mesh`` keeps context
modeling ON the accelerator instead of regressing to order-0.

Design (TPU-first; reference analog: the entropy stage is the Go tool's
dominant cost, internal/compress/compress.go:523-528):

- **Segment lanes, not stride lanes.** Lane ``l`` codes a *contiguous*,
  record-aligned run of records (``qualctx.chunk_bounds(lengths, N)``),
  one symbol per step. Contexts look backward *within* a lane, so the
  per-step context update is an elementwise carry — stride interleaving
  (ops/rans.py) would need cross-lane context at the same step.
- **Context models** are exactly the host coders' (bit-equal tables):
  model 0 = seq order-k (ctx = previous k base codes in-record,
  seqctx.contexts); model 1 = qual order-1 (ctx = position bucket x
  previous-quality bin, qualctx.contexts model 0).
- **Table lookups without gathers**: per-step rows of the per-context
  cumulative table are fetched with a factorized one-hot matmul
  (``ctx = hi*L + lo``; two int8 MXU dots with int32 accumulation — bit
  exact — then a one-hot select over ``L``), turning the E005 gather
  trap into MXU work. Symbol resolution and (f, c) fall out of monotone
  telescoping sums over the fetched row (the E010/E021 pattern).
- **Everything else reuses the ops/rans.py machinery**: 32-bit states,
  16-bit renorm, 12-bit probabilities, backward-scan encode with
  emit-bitmask outputs, host word compaction, global (step, lane) word
  order, roll-ladder renorm distribution on decode.

Wire format (little-endian), one standalone stream:

  u8 model | u8 order | u8 lanes_log2 | u8 reserved | u32 total_syms
  | u16 npres | u8 present[npres]
  | u32 blob_len | blob = zstd(dense (C, npres) u16 freq table)
  | u32 nwords | u32 states[N] | u16 words[nwords]

Symbols are the *unpacked* representation (base codes for model 0, raw
integrated qualities for model 1); callers convert to/from the v3 wire
streams (packed rows / per-record deltas). Lane layout, step count and
the per-(step, lane) record-start mask are all derived deterministically
from ``lengths`` + ``lanes`` on both sides.

This module is the numpy/XLA definition of the semantics; the C++
runtime implements the identical walk (``fq_wctx_decode``) for the
host CLI path and is equivalence-tested against this file.
"""

from __future__ import annotations

import struct
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import rans
from .qualctx import chunk_bounds

PROB_BITS = rans.PROB_BITS
PROB_SCALE = rans.PROB_SCALE
RANS_L = rans.RANS_L

MODEL_SEQ = 0
MODEL_QUAL = 1
SEQ_ORDERS = (2, 4, 6)

# qual context geometry (must mirror ops/qualctx.py)
NUM_QBINS = 48
NUM_PBUCKETS = 8
NUM_Q2B = 8  # model-1 prev2 buckets: min(prev2,46)>>3, sentinel 7 at p<2
QUAL_NUM_CTX = NUM_PBUCKETS * NUM_QBINS  # 384 (model 1 order 0)
QUAL2_NUM_CTX = QUAL_NUM_CTX * NUM_Q2B  # 3072 (model 1 order 1)
QUAL_CTX_PAD = 512  # pow2 padding for the factorized lookup (H=32, L=16)

HEADER_FMT = "<BBBxI"
B_MAX = 64  # hard gate on present-symbol width (device cost ~ B)

_u32 = jnp.uint32
_u16 = jnp.uint16


class WctxError(ValueError):
    pass


def model_geometry(model: int, order: int) -> tuple[int, int, int]:
    """-> (C contexts, H, L) with H*L = pow2ceil(C), ctx = hi*L + lo."""
    if model == MODEL_SEQ:
        if order not in SEQ_ORDERS:
            raise WctxError(f"unsupported wctx seq order {order}")
        c = 4**order
        h = 1 << order  # H = L = 2**order
        return c, h, h
    if model == MODEL_QUAL:
        if order == 0:
            return QUAL_NUM_CTX, 32, 16
        if order == 1:  # qualctx model 1: x prev2 bucket (4096 padded)
            return QUAL2_NUM_CTX, 64, 64
        raise WctxError(f"unsupported wctx qual order {order}")
    raise WctxError(f"unknown wctx model {model}")


def pick_lanes(n: int) -> int:
    """Lane count by stream size: wider = fewer sequential steps (the
    E057 lesson), but 4 B/lane of wire state caps the useful width."""
    if n >= (8 << 20):
        return 8192
    if n >= (2 << 20):
        return 4096
    if n >= (256 << 10):
        return 1024
    return 256


def pick_lanes_for(hist: np.ndarray, n: int) -> int:
    """Ratio-aware lane pick (E085, ROADMAP lane-count/ratio tradeoff):
    start from the speed tier and halve while the 4 B/lane states
    exceed 0.5% of the ESTIMATED coded size — on high-ratio context
    streams (the configurations wctx exists for) the raw-size tier
    otherwise spends 1-2% of the container on states. Floor 1024: the
    E057 lane sweep puts 1024 lanes at roughly half the 8192-lane
    device throughput, the documented cost cap for this trade. The
    states are ~half real payload (encode starts each lane at RANS_L =
    2^16 and stores a 32-bit state), so shrinking the lane count — not
    state compression — is the only real lever."""
    N = pick_lanes(n)
    while N > 1024 and 4 * N > estimate_size(hist, N) * 0.005:
        N //= 2
    return N


def _pick_smax(steps: int) -> int:
    s = 256
    while s < steps:
        s *= 2
    return s


# ---------------------------------------------------------------------------
# Lane layout (host, deterministic from lengths + lanes)
# ---------------------------------------------------------------------------


def lane_bounds(lengths: np.ndarray, lanes: int) -> tuple[np.ndarray, int]:
    """-> (symbol bounds (lanes+1,), S = max lane segment length)."""
    _, sb = chunk_bounds(lengths.astype(np.int64), lanes)
    sb = np.asarray(sb, np.int64)
    seg = np.diff(sb)
    return sb, int(seg.max()) if len(seg) else 0


def to_matrix(
    flat: np.ndarray, sb: np.ndarray, S: int, fill: int
) -> np.ndarray:
    """Flat per-symbol array -> (S, N) lane matrix (lane l's segment in
    column l, padded with ``fill``)."""
    n_lanes = len(sb) - 1
    seg = np.diff(sb)
    out = np.full((n_lanes, S), fill, dtype=flat.dtype)
    mask = np.arange(S, dtype=np.int64)[None, :] < seg[:, None]
    out[mask] = flat  # row-major: lane 0's segment, then lane 1's, ...
    return np.ascontiguousarray(out.T)


def from_matrix(mat: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """Inverse of :func:`to_matrix` (drops padding)."""
    seg = np.diff(sb)
    S = mat.shape[0]
    mask = np.arange(S, dtype=np.int64)[None, :] < seg[:, None]
    return mat.T[mask]


def start_matrix(
    lengths: np.ndarray, sb: np.ndarray, S: int
) -> np.ndarray:
    """(S, N) bool: position (t, l) begins a record. Row 0 is forced True
    and EVERY padding cell is True (each pad symbol is its own
    pseudo-record), so padding always codes under one fixed, known
    context (0 for seq, the record-start sentinel context for qual) —
    production table building then needs only the data histogram plus a
    single (pad ctx, pad sym) count, no padded context matrix. The
    decoder derives the identical matrix from lengths, so the context
    recurrence agrees by construction."""
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    marks = np.zeros(total, dtype=bool)
    if total:
        starts = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        marks[starts[lengths > 0]] = True
    m = to_matrix(marks, sb, S, 1)  # padding cells -> True
    if S:
        m[0, :] = True
    return m


def _shift_down(mat: np.ndarray, i: int, fill: int = 0) -> np.ndarray:
    out = np.full_like(mat, fill)
    if i < mat.shape[0]:
        out[i:] = mat[:-i] if i else mat
    return out


def position_matrix(startm: np.ndarray) -> np.ndarray:
    """(S, N) int32 in-record positions; padding continues counting past
    its record's end (the decode carry does the same: p = start?0:p+1)."""
    S, n_lanes = startm.shape
    idx = np.arange(S, dtype=np.int64)[:, None]
    last = np.maximum.accumulate(np.where(startm, idx, -1), axis=0)
    return (idx - last).astype(np.int32)


def context_matrix(
    symm: np.ndarray, startm: np.ndarray, model: int, order: int
) -> np.ndarray:
    """(S, N) int32 context ids from the symbol + start matrices — the
    vectorized twin of the decoder's per-step carry recurrence (and, on
    data positions, of seqctx.contexts / qualctx.contexts model 0)."""
    p = position_matrix(startm)
    if model == MODEL_SEQ:
        ctx = np.zeros(symm.shape, dtype=np.int32)
        s32 = symm.astype(np.int32)
        for i in range(1, order + 1):
            prev = _shift_down(s32, i)
            ctx |= np.where(p >= i, prev, 0) << (2 * (i - 1))
        return ctx
    # qual: ctx0 = min(p>>4, 7)*48 + qbin; order 1 appends the prev2
    # bucket (qualctx.contexts model 1): ctx1 = ctx0*8 + q2b
    prev = _shift_down(symm.astype(np.int32), 1)
    qbin = np.where(p == 0, NUM_QBINS - 1, np.minimum(prev, 46))
    pb = np.minimum(p >> 4, NUM_PBUCKETS - 1)
    ctx = (pb * NUM_QBINS + qbin).astype(np.int32)
    if order == 0:
        return ctx
    prev2 = _shift_down(symm.astype(np.int32), 2)
    q2b = np.where(p >= 2, np.minimum(prev2, 46) >> 3, NUM_Q2B - 1)
    return (ctx * NUM_Q2B + q2b).astype(np.int32)


# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------


def matrix_histogram(
    symm: np.ndarray, ctxm: np.ndarray, C: int,
    seg: np.ndarray | None = None,
) -> np.ndarray:
    """(C, 256) int64 histogram. With ``seg`` (real symbols per lane),
    only data cells count — pad cells are skipped by the coders (r3),
    so the tables are exactly the host prepare histograms."""
    if seg is not None:
        S = symm.shape[0]
        mask = np.arange(S, dtype=np.int64)[:, None] < seg[None, :]
        flat = (
            ctxm[mask].astype(np.int64) * 256 + symm[mask].astype(np.int64)
        )
    else:
        flat = ctxm.astype(np.int64).reshape(-1) * 256 + symm.reshape(-1)
    return np.bincount(flat, minlength=C * 256).reshape(C, 256)


def normalize_tables(hist: np.ndarray) -> np.ndarray:
    """Per-context largest-remainder normalization to PROB_SCALE,
    vectorized across contexts (any alphabet width)."""
    hist = hist.astype(np.int64)
    totals = hist.sum(axis=1, keepdims=True)
    used = totals[:, 0] > 0
    freq = np.zeros(hist.shape, dtype=np.int64)
    safe = np.maximum(totals, 1)
    freq[used] = (hist[used] * PROB_SCALE) // safe[used]
    bump = (hist > 0) & (freq == 0)
    freq[bump] = 1
    diff = PROB_SCALE - freq.sum(axis=1)
    # settle the residual on each used context's largest bucket; with
    # width-256 rows the bump deficit can exceed the largest bucket's
    # slack only if > PROB_SCALE/2 symbols are present — impossible at
    # 12-bit scale for <= 256 symbols? No: 256 bumps of 1 against a
    # largest bucket >= 16 — safe since diff >= -255 and top >=
    # PROB_SCALE/256 = 16... not always > 255. Iterate until settled.
    top = np.argmax(freq, axis=1)
    rows = np.flatnonzero(used)
    freq[rows, top[rows]] += diff[rows]
    bad = np.flatnonzero(used & (freq.min(axis=1) < 0))
    for c in bad:  # rare: redo exactly with the scalar reference
        freq[c] = rans.normalize_freqs(hist[c].copy())
    return freq.astype(np.uint16)


def estimate_size(
    hist: np.ndarray, lanes: int, freq: np.ndarray | None = None
) -> int:
    """Coded-size estimate from the (C, A) data histogram: exact payload
    bits + lane states + the EXACT compressed table bytes (the dense
    present-column table is <= 32 KB, so compressing it for the estimate
    costs ~nothing and removes the pick's main error source)."""
    if freq is None:
        freq = normalize_tables(hist)
    nz = hist > 0
    f = freq.astype(np.float64)
    bits = float(
        np.sum(hist[nz] * (PROB_BITS - np.log2(np.maximum(f[nz], 1))))
    )
    present = np.flatnonzero(nz.any(axis=0))
    npres = len(present)
    from ..entropy import zstd as zstd_entropy

    table_bytes = len(
        zstd_entropy.get_codec().compress(
            np.ascontiguousarray(
                freq[:, present].astype("<u2")
            ).tobytes()
        )
    )
    return (
        int(bits / 8) + 12 + table_bytes + 4 * lanes + 4 + 2 + npres
    )


# ---------------------------------------------------------------------------
# numpy reference walks (semantics; vectorized over lanes per step)
# ---------------------------------------------------------------------------


def _ctx_step(
    ctx, p, prev_sym, prev2_sym, start_row, model: int, order: int, xp=np
):
    """One step of the context recurrence shared by encode-matrix
    construction and decode (here in its per-step carry form)."""
    if model == MODEL_SEQ:
        mask = (1 << (2 * order)) - 1
        ctx = xp.where(
            start_row, 0, ((ctx << 2) | prev_sym.astype(ctx.dtype)) & mask
        )
        p = xp.where(start_row, 0, p + 1)
        return ctx, p
    p = xp.where(start_row, 0, p + 1)
    qbin = xp.where(
        start_row,
        NUM_QBINS - 1,
        xp.minimum(prev_sym.astype(ctx.dtype), 46),
    )
    pb = xp.minimum(p >> 4, NUM_PBUCKETS - 1)
    ctx = pb * NUM_QBINS + qbin
    if order == 0:
        return ctx, p
    q2b = xp.where(
        p >= 2,
        xp.minimum(prev2_sym.astype(ctx.dtype), 46) >> 3,
        NUM_Q2B - 1,
    )
    return ctx * NUM_Q2B + q2b, p


def encode_reference(
    symm: np.ndarray,
    ctxm: np.ndarray,
    freq: np.ndarray,
    cum: np.ndarray,
    seg: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Backward lockstep encode. ``freq``/``cum``: (C, 256) u32 views;
    ``seg``: (N,) real symbols per lane (pad cells are skipped).
    Returns (words ascending (step, lane) order, final states (N,))."""
    S, N = symm.shape
    x = np.full(N, RANS_L, dtype=np.uint64)
    step_words: list[np.ndarray] = []
    for t in range(S - 1, -1, -1):
        live = t < seg
        s = symm[t].astype(np.int64)
        c = ctxm[t].astype(np.int64)
        f = freq[c, s].astype(np.uint64)
        if (f[live] == 0).any():
            raise WctxError("invalid wctx frequency table")
        f = np.where(live, f, 1)
        cm = cum[c, s].astype(np.uint64)
        emit = (x >= (f << 20)) & live
        step_words.append((x[emit] & 0xFFFF).astype(np.uint16))
        x1 = np.where(emit, x >> 16, x)
        x = np.where(live, ((x1 // f) << PROB_BITS) + (x1 % f) + cm, x)
    words = (
        np.concatenate(step_words[::-1])
        if step_words
        else np.zeros(0, np.uint16)
    )
    return words, x.astype(np.uint32)


def decode_reference(
    words: np.ndarray,
    states: np.ndarray,
    startm: np.ndarray,
    freq: np.ndarray,
    cum: np.ndarray,
    model: int,
    order: int,
    seg: np.ndarray,
) -> np.ndarray:
    """Forward lockstep decode -> (S, N) symbol matrix (pad cells
    skipped; their output is zero)."""
    S, N = startm.shape
    x = states.astype(np.uint64).copy()
    ctx = np.zeros(N, dtype=np.int64)
    p = np.full(N, -1, dtype=np.int64)
    prev = np.zeros(N, dtype=np.int64)
    prev2 = np.zeros(N, dtype=np.int64)
    out = np.zeros((S, N), dtype=np.uint8)
    cum_full = np.concatenate(
        [cum, np.full((cum.shape[0], 1), PROB_SCALE, np.uint32)], axis=1
    ).astype(np.int64)
    wi = 0
    for t in range(S):
        live = t < seg
        ctx, p = _ctx_step(ctx, p, prev, prev2, startm[t], model, order)
        slot = (x & (PROB_SCALE - 1)).astype(np.int64)
        # symbol = rightmost cum boundary <= slot
        sym = (
            np.sum(cum_full[ctx, 1:-1] <= slot[:, None], axis=1)
        ).astype(np.int64)
        f = freq[ctx, sym].astype(np.uint64)
        if (f[live] == 0).any():
            raise WctxError("corrupted wctx stream")
        f = np.where(live, f, 1)
        c = cum[ctx, sym].astype(np.uint64)
        x1 = f * (x >> PROB_BITS) + slot.astype(np.uint64) - c
        need = (x1 < RANS_L) & live
        k = int(need.sum())
        if k:
            if wi + k > len(words):
                raise WctxError("truncated wctx words")
            x1[need] = (x1[need] << 16) | words[wi : wi + k].astype(
                np.uint64
            )
            wi += k
        x = np.where(live, x1, x)
        out[t] = np.where(live, sym, 0).astype(np.uint8)
        prev2 = np.where(live, prev, prev2)
        prev = np.where(live, sym, prev)
    if wi != len(words):
        raise WctxError("trailing wctx words")
    return out


# ---------------------------------------------------------------------------
# Device kernels (XLA; shared by the single-stream path and parallel/mesh)
# ---------------------------------------------------------------------------


def pack_planes(tab: np.ndarray, H: int, L: int) -> np.ndarray:
    """(C, B) integer table (< 2**14) -> (2, H, L*B) int8 planes for the
    bit-exact two-dot int8 lookup (lo 7 bits, high bits)."""
    C, B = tab.shape
    padded = np.zeros((H * L, B), np.int32)
    padded[:C] = tab
    t = padded.reshape(H, L * B)
    return np.stack(
        [(t & 127).astype(np.int8), (t >> 7).astype(np.int8)]
    )


def _ctx_fetch(ctx, planes, L: int, B: int):
    """Fetch rows[ctx] of a (C, B) table from int8 planes: (N,) int32
    ctx -> (N, B) int32, bit-exact on the MXU.

    Two strategies over the SAME plane memory ((H, L*B) C-order ==
    (H*L, B) C-order, so the reshape is free):

    - fused single-dot (E084): one-hot over the full padded context,
      (N, C_pad) int8 @ (C_pad, B). The factorized path materialized an
      (N, L*B) int32 intermediate per scan step — 64 MB/step for the
      qual model at N=16384 — and the kernel was HBM-traffic-bound on
      exactly that tensor (measured ~137 us/step ~= the 130 MB/step
      traffic at HBM speed). The fused dot's traffic is the (N, C_pad)
      int8 one-hot + the (N, B) result. Used when the one-hot is
      smaller than the old intermediate (H <= 4B: every qual model).
    - factorized two-dot + select (E066): hi/lo split keeps the one-hot
      narrow when C_pad is large relative to L*B (seq order 4/6, B=4).
    """
    H = planes.shape[1]
    C_pad = H * L
    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if H <= 4 * B:
        p = planes.reshape(2, C_pad, B)
        oh = (
            ctx[:, None] == jax.lax.iota(jnp.int32, C_pad)[None, :]
        ).astype(jnp.int8)
        return dot(oh, p[0]) + (dot(oh, p[1]) << 7)
    hi = ctx // L
    lo = ctx - hi * L
    oh_hi = (
        hi[:, None] == jax.lax.iota(jnp.int32, H)[None, :]
    ).astype(jnp.int8)
    tmp = dot(oh_hi, planes[0]) + (dot(oh_hi, planes[1]) << 7)
    sel = (
        lo[:, None] == jax.lax.iota(jnp.int32, L)[None, :]
    ).astype(jnp.int32)
    return jnp.sum(
        tmp.reshape(-1, L, B) * sel[:, :, None], axis=1
    )


@partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _encode_kernel(
    symm: jax.Array,  # (S, N) uint8 present-index symbols (sym in [0, B))
    ctxm: jax.Array,  # (S, N) int32 context matrix
    steps: jax.Array,  # i32 scalar: valid rows
    planes: jax.Array,  # (2, H, L*B) int8: pcum rows (cum-before, present order)
    seg: jax.Array,  # (N,) int32 real symbols per lane (cells past are pads)
    S: int,
    N: int,
    L: int,
    B: int,
):
    """Backward-walk context rANS encode; mirrors rans._encode_kernel's
    scan/roll machinery with the (f, c) pair fetched per step from the
    per-context cumulative table. Pad cells (row >= seg[lane]; trailing
    only, by construction of the lane layout) are skipped entirely — the
    decoder reconstructs the same mask from the lengths, so pads cost no
    bits and never pollute the context tables. Returns (emits, emask,
    states)."""
    # In-scan fetch with the fused single-dot _ctx_fetch (E085). Two
    # hoisted-fetch variants were built and measured SLOWER on-chip
    # (PERFORMANCE.md E085: lax.map batched prelude 70 MB/s, statically
    # unrolled 8-segment matmul prelude 114, in-scan fused 120): the
    # cost scales with per-symbol one-hot/select elements, which the
    # hoist does not reduce — it only moves them.
    sym_rev = jnp.roll(jnp.flip(symm, axis=0), -(S - steps), axis=0)
    ctx_rev = jnp.roll(jnp.flip(ctxm, axis=0), -(S - steps), axis=0)
    row_rev = jnp.roll(
        jnp.flip(jax.lax.iota(jnp.int32, S), axis=0), -(S - steps), axis=0
    )
    valid = jax.lax.iota(jnp.int32, S) < steps

    def body(x, inp):
        sym, ctx, v, t = inp
        live = (t < seg) & v
        prow = _ctx_fetch(ctx, planes, L, B)  # (N, B) cum-before
        nrow = jnp.concatenate(
            [prow[:, 1:], jnp.full((prow.shape[0], 1), PROB_SCALE,
                                   jnp.int32)], axis=1,
        )
        oh = (
            sym.astype(jnp.int32)[:, None]
            == jax.lax.iota(jnp.int32, B)[None, :]
        ).astype(jnp.int32)
        c = jnp.sum(prow * oh, axis=1).astype(_u32)
        f = jnp.sum(nrow * oh, axis=1).astype(_u32) - c
        f = jnp.where(live, f, _u32(1))  # pad cells: keep divmod defined
        emit = ((x >> 20) >= f) & live
        word = (x & _u32(0xFFFF)).astype(_u16)
        x1 = jnp.where(emit, x >> 16, x)
        q, r = rans._divmod_state(x1, f)
        x = jnp.where(live, (q << PROB_BITS) + r + c, x)
        return x, (word, emit)

    x0 = jnp.full((N,), RANS_L, dtype=_u32)
    # unroll: several symbols per scan iteration — the per-step overhead
    # of a tiny sequential body dominates at thousands of steps (the
    # E057 lesson re-learned for the context kernels; measured on-chip)
    x, (words_rev, emask_rev) = jax.lax.scan(
        body, x0, (sym_rev, ctx_rev, valid, row_rev), unroll=4
    )
    emits = jnp.flip(jnp.roll(words_rev, S - steps, axis=0), axis=0)
    emask = jnp.flip(jnp.roll(emask_rev, S - steps, axis=0), axis=0)
    return emits, emask, x


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12))
def _decode_kernel(
    words: jax.Array,  # (W,) uint16, global (step, lane) order (+N zeros pad)
    states: jax.Array,  # (N,) uint32
    startm_bits: jax.Array,  # (S_pad, N//8) uint8 packed record-start mask
    steps: jax.Array,  # i32 scalar: valid rows
    planes: jax.Array,  # (2, H, L*B) int8 pcum rows
    dpres: jax.Array,  # (B,) int32 present-value deltas (0-padded tail):
    # raw symbol = telescoping sum, same ge pattern as c/f
    seg: jax.Array,  # (N,) int32 real symbols per lane (pads skipped)
    S: int,
    N: int,
    L: int,
    B: int,
    model: int,
    order: int,
):
    """Forward-walk context rANS decode. The context lives in the scan
    carry (elementwise update per model); symbol resolution and (f, c)
    come from monotone telescoping sums over the fetched pcum row; word
    distribution reuses the rans.py roll-ladder + monotonic shift
    network. Rows at scan index >= steps are masked no-ops (dynamic trip
    count, bounded recompiles). Returns ((S, N) present-index symbols,
    final states, words consumed)."""
    valid = jax.lax.iota(jnp.int32, S) < steps

    def body(carry, inp):
        x, base, ctx, p, prev, prev2 = carry
        srow_bits, v, t = inp
        live = (t < seg) & v
        start = (
            (srow_bits[:, None] >> jax.lax.iota(jnp.uint8, 8)[None, :])
            & 1
        ).reshape(-1)[:N].astype(jnp.int32)
        if model == MODEL_SEQ:
            mask = (1 << (2 * order)) - 1
            ctx = jnp.where(start == 1, 0, ((ctx << 2) | prev) & mask)
            p = jnp.where(start == 1, 0, p + 1)
        else:
            p = jnp.where(start == 1, 0, p + 1)
            qbin = jnp.where(
                start == 1, NUM_QBINS - 1, jnp.minimum(prev, 46)
            )
            ctx = jnp.minimum(p >> 4, NUM_PBUCKETS - 1) * NUM_QBINS + qbin
            if order == 1:  # qualctx model 1: x prev2 bucket
                q2b = jnp.where(
                    p >= 2, jnp.minimum(prev2, 46) >> 3, NUM_Q2B - 1
                )
                ctx = ctx * NUM_Q2B + q2b
        prow = _ctx_fetch(ctx, planes, L, B)  # (N, B) int32 cum-before
        slot = (x & _u32(PROB_SCALE - 1)).astype(jnp.int32)
        ge = (slot[:, None] >= prow).astype(jnp.int32)  # (N, B) monotone
        # telescoping deltas of the fetched row -> c, cumnext; the global
        # iota over B -> present-index symbol
        dcum = prow - jnp.concatenate(
            [jnp.zeros((prow.shape[0], 1), jnp.int32), prow[:, :-1]],
            axis=1,
        )
        nrow = jnp.concatenate(
            [prow[:, 1:], jnp.full((prow.shape[0], 1), PROB_SCALE,
                                   jnp.int32)], axis=1,
        )
        dnext = nrow - jnp.concatenate(
            [jnp.zeros((nrow.shape[0], 1), jnp.int32), nrow[:, :-1]],
            axis=1,
        )
        c = jnp.sum(ge * dcum, axis=1)
        cn = jnp.sum(ge * dnext, axis=1)
        sym = jnp.sum(ge, axis=1) - 1  # present index (ge[:,0] always 1)
        raw = jnp.sum(ge * dpres[None, :], axis=1)  # raw symbol value
        f = (cn - c).astype(_u32)
        x1 = f * (x >> PROB_BITS) + slot.astype(_u32) - jnp.asarray(
            c, _u32
        )
        need = (x1 < _u32(RANS_L)) & live
        ni = need.astype(jnp.int32)
        incl = rans._cumsum_rolls(ni, N)
        rank = incl - ni
        chunk = jax.lax.dynamic_slice(words, (base,), (N,))
        wv = rans._monotonic_gather(chunk, rank, N).astype(_u32)
        x1 = jnp.where(need, (x1 << 16) | wv, x1)
        x = jnp.where(live, x1, x)
        base = base + incl[-1]
        prev2 = jnp.where(live, prev, prev2)
        prev = jnp.where(live, raw, prev)  # contexts see raw values
        return (x, base, ctx, p, prev, prev2), sym.astype(jnp.uint8)

    carry0 = (
        states,
        jnp.int32(0),
        jnp.zeros((N,), jnp.int32),
        jnp.full((N,), -1, jnp.int32),
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N,), jnp.int32),
    )
    (x, base, _, _, _, _), out = jax.lax.scan(
        body, carry0,
        (startm_bits, valid, jax.lax.iota(jnp.int32, startm_bits.shape[0])),
        unroll=4,
    )
    return out, x, base


# ---------------------------------------------------------------------------
# Stream API (single device; parallel/mesh.py shards the same kernels)
# ---------------------------------------------------------------------------


def build_tables(
    symm: np.ndarray, ctxm: np.ndarray, C: int,
    seg: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (present (npres,) int, freq (C, npres) u16 in present order)."""
    hist = matrix_histogram(symm, ctxm, C, seg)
    present = np.flatnonzero(hist.sum(axis=0) > 0)
    freq_full = normalize_tables(hist)
    return present, np.ascontiguousarray(freq_full[:, present])


def _pcum_from_freq(freq_p: np.ndarray) -> np.ndarray:
    """(C, npres) freqs -> (C, npres) exclusive cumulative (int32)."""
    cum = np.zeros(freq_p.shape, np.int64)
    np.cumsum(freq_p[:, :-1].astype(np.int64), axis=1, out=cum[:, 1:])
    return cum.astype(np.int32)


def _sym_to_idx(present: np.ndarray) -> np.ndarray:
    m = np.zeros(256, np.uint8)
    m[present] = np.arange(len(present), dtype=np.uint8)
    return m


def _pack_startm(startm: np.ndarray) -> np.ndarray:
    """(S, N) bool -> (S, N//8) u8 LSB-first (N is a pow2 multiple of 8)."""
    return np.packbits(
        startm.astype(np.uint8), axis=1, bitorder="little"
    )


def encode_stream(
    flat_syms: np.ndarray,
    lengths: np.ndarray,
    model: int,
    order: int,
    lanes: int | None = None,
) -> bytes:
    """Encode one unpacked symbol stream on the accelerator; returns the
    standalone TAG_WCTX wire payload (decodable by :func:`decode_stream`
    and the C++ twin)."""
    lengths = np.asarray(lengths, np.int64)
    n = len(flat_syms)
    if n == 0 or int(lengths.sum()) != n:
        raise WctxError("wctx stream length does not match records")
    N = lanes or pick_lanes(n)
    C, H, L = model_geometry(model, order)
    sb, S = lane_bounds(lengths, N)
    seg = (sb[1:] - sb[:-1]).astype(np.int32)
    startm = start_matrix(lengths, sb, S)
    # pad fill value is arbitrary — pad cells are skipped by the coders
    # and excluded from the tables (r3); most-frequent keeps the matrix
    # content deterministic
    counts = np.bincount(flat_syms, minlength=256)
    pad_sym = int(np.argmax(counts))
    symm = to_matrix(flat_syms, sb, S, pad_sym)
    ctxm = context_matrix(symm, startm, model, order)
    present, freq_p = build_tables(symm, ctxm, C, seg)
    if len(present) > B_MAX and model == MODEL_QUAL:
        raise WctxError(
            f"wctx present alphabet {len(present)} exceeds {B_MAX}"
        )
    B = 1
    while B < len(present):
        B *= 2
    B = max(B, 2)
    pcum = _pcum_from_freq(freq_p)
    pcum_b = np.zeros((C, B), np.int32)
    pcum_b[:, : pcum.shape[1]] = pcum
    if pcum.shape[1] < B:
        # absent tail columns: boundary = end of last real symbol so the
        # decoder's ge-compares never select them
        tail = pcum[:, -1] + freq_p[:, -1].astype(np.int32)
        for j in range(pcum.shape[1], B):
            pcum_b[:, j] = tail
    planes = pack_planes(pcum_b, H, L)
    sym_idx = _sym_to_idx(present)[symm]

    S_pad = _pick_smax(S)
    symp = np.zeros((S_pad, N), np.uint8)
    symp[:S] = sym_idx
    ctxp = np.zeros((S_pad, N), np.int32)
    ctxp[:S] = ctxm

    emits, emask, states = _encode_kernel(
        jnp.asarray(symp), jnp.asarray(ctxp), jnp.int32(S),
        jnp.asarray(planes), jnp.asarray(seg), S_pad, N, L, B,
    )
    emits = np.asarray(emits[:S])
    emask = np.asarray(emask[:S])
    words = emits.reshape(-1)[emask.reshape(-1)]

    from ..entropy import zstd as zstd_entropy

    blob = zstd_entropy.get_codec().compress(
        np.ascontiguousarray(freq_p.astype("<u2")).tobytes()
    )
    out = bytearray()
    out += struct.pack(HEADER_FMT, model, order, N.bit_length() - 1, n)
    out += struct.pack("<H", len(present))
    out += present.astype(np.uint8).tobytes()
    out += struct.pack("<I", len(blob))
    out += blob
    out += struct.pack("<I", len(words))
    out += np.asarray(states).astype("<u4").tobytes()
    out += words.astype("<u2").tobytes()
    return bytes(out)


def parse_stream(payload: bytes | memoryview):
    """Wire parse -> dict of fields (shared by all decode backends)."""
    buf = memoryview(payload)
    hdr = struct.calcsize(HEADER_FMT)
    if len(buf) < hdr + 2:
        raise WctxError("truncated wctx stream")
    model, order, lanes_log2, total = struct.unpack_from(
        HEADER_FMT, buf, 0
    )
    C, H, L = model_geometry(model, order)  # validates model/order
    off = hdr
    (npres,) = struct.unpack_from("<H", buf, off)
    off += 2
    if npres == 0 or npres > 256 or len(buf) < off + npres + 4:
        raise WctxError("truncated wctx stream")
    present = np.frombuffer(buf[off : off + npres], np.uint8).astype(
        np.int64
    )
    if npres > 1 and not (np.diff(present) > 0).all():
        raise WctxError("invalid wctx present list")
    off += npres
    (blob_len,) = struct.unpack_from("<I", buf, off)
    off += 4
    if len(buf) < off + blob_len + 4:
        raise WctxError("truncated wctx stream")
    blob = bytes(buf[off : off + blob_len])
    off += blob_len
    (nwords,) = struct.unpack_from("<I", buf, off)
    off += 4
    N = 1 << lanes_log2
    if len(buf) < off + 4 * N + 2 * nwords:
        raise WctxError("truncated wctx stream")
    states = np.frombuffer(buf[off : off + 4 * N], "<u4").astype(
        np.uint32
    )
    off += 4 * N
    words = np.frombuffer(buf[off : off + 2 * nwords], "<u2")

    from ..entropy import zstd as zstd_entropy

    try:
        table_raw = zstd_entropy.get_codec().decompress(blob)
    except zstd_entropy.ZstdError as e:
        raise WctxError(f"corrupt wctx table blob: {e}") from None
    if len(table_raw) != C * npres * 2:
        raise WctxError("wctx table blob size mismatch")
    freq_p = (
        np.frombuffer(table_raw, "<u2").astype(np.uint16)
        .reshape(C, npres)
    )
    sums = freq_p.astype(np.int64).sum(axis=1)
    if not np.all((sums == 0) | (sums == PROB_SCALE)):
        raise WctxError("invalid wctx frequency table")
    return {
        "model": model,
        "order": order,
        "N": N,
        "total": total,
        "present": present,
        "freq_p": freq_p,
        "states": states,
        "words": words,
    }


def decode_stream(
    payload: bytes, lengths: np.ndarray, use_native: bool = True
) -> np.ndarray:
    """Decode a TAG_WCTX payload -> flat unpacked symbols (np.uint8)."""
    lengths = np.asarray(lengths, np.int64)
    p = parse_stream(payload)
    if int(lengths.sum()) != p["total"]:
        raise WctxError("wctx total does not match record lengths")
    if p["total"] == 0:
        return np.zeros(0, np.uint8)
    nat = _native() if use_native else None
    if nat is not None:
        try:
            return nat.wctx_decode(
                p["words"], p["states"], lengths, p["model"], p["order"],
                p["present"], p["freq_p"],
            )
        except ValueError as e:
            raise WctxError(str(e)) from None
    N = p["N"]
    C, H, L = model_geometry(p["model"], p["order"])
    sb, S = lane_bounds(lengths, N)
    seg = (sb[1:] - sb[:-1]).astype(np.int32)
    startm = start_matrix(lengths, sb, S)
    npres = len(p["present"])
    B = 1
    while B < npres:
        B *= 2
    B = max(B, 2)
    pcum = _pcum_from_freq(p["freq_p"])
    pcum_b = np.zeros((C, B), np.int32)
    pcum_b[:, :npres] = pcum
    if npres < B:
        tail = pcum[:, -1] + p["freq_p"][:, -1].astype(np.int32)
        for j in range(npres, B):
            pcum_b[:, j] = tail
    planes = pack_planes(pcum_b, H, L)
    w_pad = rans._pow2ceil(len(p["words"]) + N, 2 * N)
    words = np.zeros(w_pad, np.uint16)
    words[: len(p["words"])] = p["words"]
    S_pad = _pick_smax(S)
    startm_p = np.zeros((S_pad, N), bool)
    startm_p[:S] = startm
    dpres = np.zeros(B, np.int32)
    dpres[:npres] = np.diff(np.concatenate([[0], p["present"]]))
    out_mat, x, consumed = _decode_kernel(
        jnp.asarray(words), jnp.asarray(p["states"]),
        jnp.asarray(_pack_startm(startm_p)), jnp.int32(S),
        jnp.asarray(planes), jnp.asarray(dpres), jnp.asarray(seg),
        S_pad, N, L, B, p["model"], p["order"],
    )
    if int(np.asarray(consumed)) != len(p["words"]):
        raise WctxError("trailing wctx words")
    out_idx = from_matrix(np.asarray(out_mat)[:S], sb)
    if int(out_idx.max(initial=0)) >= npres:
        raise WctxError("corrupted wctx stream")
    return p["present"].astype(np.uint8)[out_idx]


def _native():
    from ..runtime import bindings

    return bindings if getattr(bindings, "wctx_available", lambda: False)() else None
