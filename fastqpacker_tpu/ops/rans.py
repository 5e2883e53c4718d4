"""TPU-resident interleaved rANS entropy coder (FQZ v3 native backend).

The reference delegates entropy coding to host zstd
(internal/compress/compress.go:113-122); a TPU-native codec must keep the
entropy stage on-chip. This module implements a wide-interleaved range
Asymmetric Numeral System coder designed for the VPU:

- **Interleaving**: N lanes (256-4096); lane ``l`` codes symbols
  ``l, l+N, l+2N, ...`` so a ``(steps, N)`` row-major matrix IS the byte
  stream — no transposes. All lanes step in lockstep under a
  ``lax.fori_loop`` whose trip count is dynamic (no recompile per length).
- **State**: 32-bit, 16-bit renormalization, 12-bit probabilities
  (table total 4096). Encode walks the data backwards, emitting 0/1 u16
  words per lane per step into a dense matrix; a prefix-sum + one-scatter
  compaction flattens them to **global (step, lane) order** — exactly the
  decoder's consumption order, so the forward-walking decoder reads one
  contiguous word run per step instead of chasing per-lane pointers
  through HBM.
- **Gather-free decode** (default): symbol resolution via 256
  broadcast-compare accumulations over the cumulative table (monotone
  cum => sym/f/c are telescoping sums), word distribution via roll-ladder
  prefix sums and a monotonic shift network — no per-lane table gathers,
  which de-vectorize on the VPU (PERFORMANCE.md E005/E010/E012).
  ``FQZ_RANS_DECODE=take`` selects the lookup-table variant.
- **Division-free encode**: the u32/freq divmod is computed as two small
  exact float32 divisions with integer fix-up (quotient error is provably
  bounded, then corrected) — TPUs have no integer divide or u64.
- **Per-stream tables**: 256-entry frequency table normalized to 4096 on
  host (largest-remainder), 4096-entry slot tables for decode built by
  ``np.repeat``.

Wire format per stream (little-endian):
  u32 raw_len | u8 lanes_log2 | u8[3] reserved | u16 freq[256]
  | u32 final_states[N] | u32 total_words | u16 words[total]

The padding needed to fill the last row is the stream's most frequent
byte (cheapest to code) and is included in the histogram.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS  # 4096
RANS_L = 1 << 16  # state lower bound
HEADER_FMT = "<IB3x"

_u32 = jnp.uint32
_u16 = jnp.uint16


class RansError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Frequency tables (host)
# ---------------------------------------------------------------------------


def normalize_freqs(hist: np.ndarray) -> np.ndarray:
    """Normalize a 256-bin histogram to sum exactly PROB_SCALE.

    Every present symbol gets freq >= 1; the residual is settled against
    the largest buckets (largest-remainder style).
    """
    hist = hist.astype(np.int64)
    total = int(hist.sum())
    if total == 0:
        raise RansError("cannot build table for empty stream")
    freq = (hist * PROB_SCALE // total).astype(np.int64)
    freq[(hist > 0) & (freq == 0)] = 1
    diff = PROB_SCALE - int(freq.sum())
    if diff != 0:
        order = np.argsort(-freq, kind="stable")
        i = 0
        step = 1 if diff > 0 else -1
        remaining = abs(diff)
        while remaining > 0:
            s = order[i % 256]
            if step > 0 and freq[s] > 0:
                freq[s] += 1
                remaining -= 1
            elif step < 0 and freq[s] > 1:
                freq[s] -= 1
                remaining -= 1
            i += 1
            if i > 100000:  # pragma: no cover - safety net
                raise RansError("failed to normalize frequency table")
    return freq.astype(np.uint16)


def cumulative(freq: np.ndarray) -> np.ndarray:
    cum = np.zeros(256, dtype=np.uint32)
    np.cumsum(freq[:-1], out=cum[1:])
    return cum


def slot_tables(freq: np.ndarray):
    """(slot_sym u8[4096], slot_freq u32[4096], slot_cum u32[4096])."""
    freq = freq.astype(np.int64)
    slot_sym = np.repeat(np.arange(256, dtype=np.int32), freq)
    cum = cumulative(freq.astype(np.uint16))
    return (
        slot_sym.astype(np.int32),
        freq[slot_sym].astype(np.uint32),
        cum[slot_sym].astype(np.uint32),
    )


# ---------------------------------------------------------------------------
# Division-free u32 // freq on device
# ---------------------------------------------------------------------------


def _div_small(a: jax.Array, f: jax.Array) -> jax.Array:
    """Exact floor(a / f) for 0 <= a < 2**28, 1 <= f <= 4096 (uint32 in/out).

    float32 quotient with error <= 17, then one exact small-fixup division.
    """
    af = a.astype(jnp.float32)
    ff = f.astype(jnp.float32)
    q0 = (af / ff).astype(jnp.int32) - 17
    q0 = jnp.maximum(q0, 0)
    r0 = a.astype(jnp.int32) - q0 * f.astype(jnp.int32)  # 0 <= r0 < ~35f < 2^18
    adj = (r0.astype(jnp.float32) / ff).astype(jnp.int32)
    q = q0 + adj
    # guard against the half-ulp edge: one conditional correction each way
    r = a.astype(jnp.int32) - q * f.astype(jnp.int32)
    q = jnp.where(r < 0, q - 1, q)
    r = a.astype(jnp.int32) - q * f.astype(jnp.int32)
    q = jnp.where(r >= f.astype(jnp.int32), q + 1, q)
    return q.astype(_u32)


def _divmod_state(x: jax.Array, f: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(x // f, x % f) for uint32 state x, 1 <= f <= 4096."""
    hi = x >> 16
    lo = x & _u32(0xFFFF)
    q1 = _div_small(hi, f)
    r1 = hi - q1 * f
    a2 = (r1 << 16) | lo
    q2 = _div_small(a2, f)
    r = a2 - q2 * f
    q = (q1 << 16) + q2
    return q, r


# ---------------------------------------------------------------------------
# Encode kernel
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(3, 4))
def _encode_kernel(
    data: jax.Array,  # (S, N) uint8 (interleaved stream, padded rows)
    steps: jax.Array,  # i32 scalar: number of valid rows
    freq_cum: jax.Array,  # (2, 256) uint32: freq row 0, cum row 1
    S: int,
    N: int,
):
    """Backward-walk rANS encode of all lanes.

    Returns (emits (S, N) u16, emask (S, N) bool, states (N,) u32).
    """
    # packed per-symbol table: (freq-1) in bits 0-11, cum in bits 12-23
    packed_tab = (freq_cum[0] - 1) | (freq_cum[1] << 12)
    # Table lookup WITHOUT a gather (takes de-vectorize to ~12 ns/element
    # on XLA:TPU, E005/E057): 256 broadcast-compare accumulation passes
    # over the whole matrix — bulk elementwise work the VPU streams.
    def tab_body(k, acc):
        return acc | jnp.where(
            data == k.astype(jnp.uint8), packed_tab[k], _u32(0)
        )

    e_all = jax.lax.fori_loop(
        0, 256, tab_body, jnp.zeros(data.shape, _u32)
    )  # (S, N) u32

    # lax.scan, NOT fori_loop with carried (S, N) buffers: on XLA:TPU the
    # dynamic-index updates into loop-carried emit matrices materialized
    # a copy of the whole carry every step (~48 MB x steps — the encode
    # ran at ~60 MB/s, E057). scan stacks per-step outputs instead. The
    # encoder walks BACKWARD from row steps-1; scan feeds rows in fixed
    # order, so rows are pre-reversed (flip + dynamic roll) and the
    # outputs un-reversed the same way. Rows at scan index >= steps are
    # masked no-ops (x and emit untouched), keeping dynamic `steps`.
    e_rev = jnp.roll(jnp.flip(e_all, axis=0), -(S - steps), axis=0)
    valid = jax.lax.iota(jnp.int32, S) < steps

    def body(x, inp):
        e, v = inp
        f = (e & _u32(0xFFF)) + 1
        c = (e >> 12) & _u32(0xFFF)
        # renorm: emit low 16 bits when x >= f << 20  (== x>>20 >= f)
        emit = ((x >> 20) >= f) & v
        word = (x & _u32(0xFFFF)).astype(_u16)
        x1 = jnp.where(emit, x >> 16, x)
        q, r = _divmod_state(x1, f)
        x = jnp.where(v, (q << PROB_BITS) + r + c, x)
        return x, (word, emit)

    x0 = jnp.full((N,), RANS_L, dtype=_u32)
    x, (words_rev, emask_rev) = jax.lax.scan(body, x0, (e_rev, valid))
    emits = jnp.flip(jnp.roll(words_rev, S - steps, axis=0), axis=0)
    emask = jnp.flip(jnp.roll(emask_rev, S - steps, axis=0), axis=0)
    return emits, emask, x


@partial(jax.jit, static_argnums=(2, 3))
def _compact_global(emits: jax.Array, emask: jax.Array, S: int, N: int):
    """Flatten emitted words to global (step, lane) order.

    The stream stores words in exactly the order the decoder consumes
    them (ascending step, then lane), so decoding reads a contiguous run
    per step instead of doing per-lane pointer gathers.
    Returns (flat (S*N,) u16, total i32).
    """
    # Two-level prefix sum: a flat cumsum over S*N elements runs at
    # ~16 ns/element on XLA:TPU (the E005 de-vectorization — 261 ms on a
    # 16M-slot matrix), while a row-wise cumsum vectorizes across rows
    # and the row-offset cumsum is only S long.
    mi = emask.astype(jnp.int32)
    incl_rows = jnp.cumsum(mi, axis=1)  # (S, N)
    row_tot = incl_rows[:, -1]  # (S,)
    row_off = jnp.cumsum(row_tot) - row_tot  # exclusive, length S
    total = row_tot.sum()
    m_flat = mi.reshape(-1)
    e_flat = emits.reshape(-1)
    rank = (incl_rows - mi + row_off[:, None]).reshape(-1)
    # Stream compaction via a log-depth monotone routing network — no
    # scatter (de-vectorizes to ~12 ns/element on XLA:TPU, E005/E057)
    # and no 16M-pair sort (~100 ms): each kept word's left-shift
    # distance d = position - rank is monotone non-decreasing, so
    # routing LSB-first by distance bits is collision-free for kept
    # elements (validated exhaustively against numpy in
    # tests/test_rans.py::test_compact_global_routing). Garbage slots
    # may be overwritten freely; log2(S*N) vectorized passes total.
    n = S * N
    lane = jax.lax.iota(jnp.int32, n)
    kept = m_flat > 0
    d = jnp.where(kept, lane - rank, 0)
    v = e_flat
    k = kept
    for b in range(max(n - 1, 1).bit_length()):
        sh = 1 << b
        sv = jnp.roll(v, -sh)
        sd = jnp.roll(d, -sh)
        sk = jnp.roll(k, -sh)
        move_in = sk & (((sd >> b) & 1) == 1)
        leaving = k & (((d >> b) & 1) == 1)
        v = jnp.where(move_in, sv, v)
        d = jnp.where(move_in, sd - sh, d)
        k = move_in | (k & ~leaving)
    return v, total


# ---------------------------------------------------------------------------
# Decode kernel
# ---------------------------------------------------------------------------


def _monotonic_gather(chunk: jax.Array, rank: jax.Array, n: int) -> jax.Array:
    """``chunk[rank]`` for monotone non-decreasing ``rank`` with steps in
    {0, 1} and ``rank[l] <= l``.

    Written as a log-depth shift network (rolls + selects) because an
    arbitrary N-wide gather de-vectorizes on the VPU: destination lane
    ``l`` needs source ``l - d_l`` with ``d = iota - rank`` monotone, so
    stage ``b`` rolls the vector right by ``2**b`` for lanes whose shift
    distance has bit ``b`` set.
    """
    lane = jax.lax.iota(jnp.int32, n)
    d = lane - rank  # monotone non-decreasing with unit steps, 0 <= d <= l
    w = chunk
    bits = max(n - 1, 1).bit_length()
    for b in reversed(range(bits)):  # MSB->LSB: required for correctness
        shifted = jnp.roll(w, 1 << b)
        w = jnp.where((d >> b) & 1 > 0, shifted, w)
    return w


@partial(jax.jit, static_argnums=(4, 5))
def _decode_kernel(
    words: jax.Array,  # (W,) uint16 words in global (step, lane) order
    states: jax.Array,  # (N,) uint32 initial (= encoder final) states
    steps: jax.Array,  # i32 scalar
    slot_tabs: jax.Array,  # (16, 256) uint32 packed: freq-1 | cum<<12 | sym<<24
    S: int,
    N: int,
):
    """Forward-walk rANS decode.

    Each step consumes a *contiguous* run of words (the lanes that renorm
    this step, in lane order): one dynamic slice + a monotonic shift
    network, no per-lane HBM pointers. The 4096-slot table is split into
    16 tables of 256 entries (select-combined) so every per-lane lookup
    stays in the small-table regime that the TPU vectorizes.
    Returns ((S, N) uint8 symbols, final states, words consumed).
    """

    slot_tab = slot_tabs.reshape(-1)
    # scan (per-step stacked outputs), not fori_loop carrying the (S, N)
    # symbol matrix: dynamic-index updates into a loop carry copy the
    # whole buffer every step on XLA:TPU (E057)
    valid = jax.lax.iota(jnp.int32, S) < steps

    def body(carry, v):
        x, base = carry
        slot = (x & _u32(PROB_SCALE - 1)).astype(jnp.int32)
        e = jnp.take(slot_tab, slot)
        f = (e & _u32(0xFFF)) + 1
        c = (e >> 12) & _u32(0xFFF)
        s = (e >> 24).astype(jnp.uint8)
        x1 = f * (x >> PROB_BITS) + slot.astype(_u32) - c
        need = (x1 < _u32(RANS_L)) & v
        ni = need.astype(jnp.int32)
        rank = jnp.cumsum(ni) - ni
        chunk = jax.lax.dynamic_slice(words, (base,), (N,))
        w = jnp.take(chunk, rank).astype(_u32)
        x1 = jnp.where(need, (x1 << 16) | w, x1)
        x = jnp.where(v, x1, x)
        base = base + jnp.sum(ni)
        return (x, base), s

    (x, base), out = jax.lax.scan(
        body, (states, jnp.int32(0)), valid
    )
    return out, x, base


def _cumsum_rolls(ni: jax.Array, n: int) -> jax.Array:
    """Inclusive prefix sum over a lane vector via a log-depth shift ladder
    (XLA's cumsum de-vectorizes in sequential loops on this backend)."""
    acc = ni
    shift = 1
    while shift < n:
        rolled = jnp.roll(acc, shift)
        lane = jax.lax.iota(jnp.int32, n)
        acc = acc + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    return acc


@partial(jax.jit, static_argnums=(4, 5, 6))
def _decode_kernel_nogather(
    words: jax.Array,  # (W,) uint16 words in global (step, lane) order
    states: jax.Array,  # (N,) uint32 initial states
    steps: jax.Array,  # i32 scalar
    tabs: jax.Array,  # (4, B) uint32: pcum, dcum, dsym, pfreq (present syms)
    S: int,
    N: int,
    B: int,
):
    """Gather-free forward decode (PERFORMANCE.md E010/E021 design).

    Symbol resolution never touches a lookup table: with the cumulative
    boundaries monotone, ``sym``, ``c`` and ``f`` fall out of the same
    broadcast-compare telescoping sums — pure elementwise work. The
    tables are compacted to the ``B`` *present* symbols (padded entries
    carry pcum = PROB_SCALE so their compares are always false): quality
    streams rarely use more than a few dozen of the 256 symbols, so the
    per-step compare matrix shrinks from (N, 256) to (N, B). The renorm
    word distribution uses the roll-ladder prefix sum and monotonic
    shift network instead of cumsum + in-register gather.
    """
    pcum = tabs[0]
    dcum = tabs[1]
    dsym = tabs[2]
    pfreq = tabs[3]
    # scan for the same reason as _decode_kernel: no (S, N) loop carry
    valid = jax.lax.iota(jnp.int32, S) < steps

    def body(carry, v):
        x, base = carry
        slot = x & _u32(PROB_SCALE - 1)
        ge = (slot[:, None] >= pcum[None, :]).astype(_u32)  # (N, B)
        sym = jnp.sum(ge * dsym[None, :], axis=1)
        c = jnp.sum(ge * dcum[None, :], axis=1)
        cnext = jnp.sum(ge * pfreq[None, :], axis=1)
        f = cnext - c
        x1 = f * (x >> PROB_BITS) + slot - c
        need = (x1 < _u32(RANS_L)) & v
        ni = need.astype(jnp.int32)
        incl = _cumsum_rolls(ni, N)
        rank = incl - ni
        chunk = jax.lax.dynamic_slice(words, (base,), (N,))
        w = _monotonic_gather(chunk, rank, N).astype(_u32)
        x1 = jnp.where(need, (x1 << 16) | w, x1)
        x = jnp.where(v, x1, x)
        base = base + incl[-1]
        return (x, base), sym.astype(jnp.uint8)

    (x, base), out = jax.lax.scan(
        body, (states, jnp.int32(0)), valid
    )
    return out, x, base


def compact_tables(freq: np.ndarray) -> np.ndarray:
    """(4, B) u32 present-symbol decode tables for the bucketed
    gather-free kernel: pcum (compare boundaries, padded with
    PROB_SCALE), dcum, dsym (telescoping deltas), pfreq."""
    present = np.flatnonzero(freq)
    npres = len(present)
    B = 8
    while B < npres:
        B *= 2
    cums = cumulative(freq)
    pcum = np.full(B, PROB_SCALE, dtype=np.uint32)
    dcum = np.zeros(B, dtype=np.uint32)
    dsym = np.zeros(B, dtype=np.uint32)
    pfreq = np.zeros(B, dtype=np.uint32)
    pcum[:npres] = cums[present]
    pfreq[:npres] = freq[present]
    dcum[:npres] = np.diff(np.concatenate([[0], cums[present]]))
    dsym[:npres] = np.diff(np.concatenate([[0], present]))
    return np.stack([pcum, dcum, dsym, pfreq])


# ---------------------------------------------------------------------------
# Host-facing stream API
# ---------------------------------------------------------------------------


def _pick_lanes(n: int) -> int:
    # wider interleave = fewer sequential steps on the device (E057 lane
    # sweep: 16384 lanes ~900 MB/s vs 4096 ~700 on v5e; 32768 falls off
    # a VMEM cliff). Lane-state wire overhead is 4 B/lane, so the wide
    # tiers only engage when that is <1% of the stream.
    if n >= (8 << 20):
        return 16384
    return 4096 if n >= (2 << 20) else 256


def _use_host_backend() -> bool:
    """Route stream coding to the sequential C++ twin when it will win.

    The XLA lane coder is the TPU path; run on host CPU it de-vectorizes
    catastrophically (~5 MB/s decode, PERFORMANCE.md E017). The C++
    backend produces byte-identical streams, so the choice is purely a
    speed decision. ``FQZ_RANS_BACKEND=host|device`` overrides.
    """
    import os

    force = os.environ.get("FQZ_RANS_BACKEND", "").lower()
    from ..runtime import bindings

    if force in ("host", "cpu", "native"):
        return bindings.available()
    if force in ("device", "tpu", "xla"):
        return False
    if not bindings.available():
        return False
    from ..pipeline import auto

    return not auto.device_worthwhile()


def _pick_smax(steps: int) -> int:
    # pow2 bucket for the kernel's static step capacity (bounds
    # recompiles); floor 1024 so wide-lane configs don't pay 4x their
    # step count in masked no-ops (E057)
    s = 1024
    while s < steps:
        s *= 2
    return s


def _pow2ceil(x: int, lo: int) -> int:
    return max(lo, 1 << max(x - 1, 0).bit_length())


def pack_slot_table(freq: np.ndarray) -> np.ndarray:
    """(4096,) u32 decode table: (freq-1) | cum<<12 | sym<<24."""
    sym, sfreq, scum = slot_tables(freq)
    return (
        (sfreq.astype(np.uint32) - 1)
        | (scum.astype(np.uint32) << 12)
        | (sym.astype(np.uint32) << 24)
    )


def encode_stream(data: bytes | np.ndarray, lanes: int | None = None) -> bytes:
    """rANS-encode one byte stream on the accelerator."""
    raw = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else data
    n = len(raw)
    if n == 0:
        return struct.pack(HEADER_FMT, 0, 0)
    N = lanes or _pick_lanes(n)
    steps = -(-n // N)
    S = _pick_smax(steps)

    from ..runtime import bindings as _rt

    if _rt.available():  # np.bincount is pathologically slow on this host
        hist = _rt.hist256(raw)
    else:
        hist = np.bincount(raw, minlength=256).astype(np.int64)
    pad_sym = int(np.argmax(hist))
    hist[pad_sym] += steps * N - n
    freq = normalize_freqs(hist)
    cum = cumulative(freq)

    if _use_host_backend():
        from ..runtime import bindings

        words_h, states_h = bindings.rans_encode_kernel(
            raw, N, pad_sym, freq, cum
        )
        total_h = len(words_h)
    else:
        mat = np.full(steps * N, pad_sym, dtype=np.uint8)
        mat[:n] = raw
        padded = np.zeros((S, N), dtype=np.uint8)
        padded[:steps] = mat.reshape(steps, N)

        freq_cum = np.stack([freq.astype(np.uint32), cum.astype(np.uint32)])
        emits, emask, states = _encode_kernel(
            jnp.asarray(padded), jnp.int32(steps), jnp.asarray(freq_cum), S, N
        )
        flat, total = _compact_global(emits, emask, S, N)
        total_h = int(np.asarray(total))
        words_h = (
            np.asarray(flat[:total_h]) if total_h else np.zeros(0, np.uint16)
        )
        states_h = np.asarray(states)

    out = bytearray()
    out += struct.pack(HEADER_FMT, n, N.bit_length() - 1)
    out += freq.astype("<u2").tobytes()
    out += states_h.astype("<u4").tobytes()
    out += struct.pack("<I", total_h)
    out += words_h.astype("<u2").tobytes()
    return bytes(out)


def decode_stream(payload: bytes | np.ndarray) -> bytes:
    """Decode an rANS stream produced by :func:`encode_stream`."""
    buf = np.frombuffer(payload, np.uint8) if isinstance(
        payload, (bytes, bytearray)
    ) else payload
    hdr_size = struct.calcsize(HEADER_FMT)
    if len(buf) < hdr_size:
        raise RansError("truncated rANS stream header")
    raw_len, lanes_log2 = struct.unpack(HEADER_FMT, buf[:hdr_size].tobytes())
    if raw_len == 0:
        return b""
    N = 1 << lanes_log2
    steps = -(-raw_len // N)
    S = _pick_smax(steps)

    off = hdr_size
    need = 512 + 4 * N + 4
    if len(buf) < off + need:
        raise RansError("truncated rANS stream tables")
    freq = buf[off : off + 512].view("<u2").astype(np.uint16)
    off += 512
    states = buf[off : off + 4 * N].view("<u4").astype(np.uint32)
    off += 4 * N
    (total_words,) = struct.unpack("<I", buf[off : off + 4].tobytes())
    off += 4
    if len(buf) < off + 2 * total_words:
        raise RansError("truncated rANS stream words")
    words_cat = buf[off : off + 2 * total_words].view("<u2")

    if int(freq.astype(np.int64).sum()) != PROB_SCALE:
        raise RansError("invalid rANS frequency table")

    if _use_host_backend():
        from ..runtime import bindings

        try:
            out = bindings.rans_decode_kernel(
                np.ascontiguousarray(words_cat),
                np.ascontiguousarray(states),
                N,
                freq,
                raw_len,
            )
        except ValueError as e:
            raise RansError(str(e)) from None
        return out.tobytes()

    w_pad = _pow2ceil(total_words + N, 2 * N)
    words = np.zeros(w_pad, dtype=np.uint16)
    words[:total_words] = words_cat

    import os

    if os.environ.get("FQZ_RANS_DECODE", "nogather") == "nogather":
        tabs = compact_tables(freq)
        out_mat, final_x, consumed = _decode_kernel_nogather(
            jnp.asarray(words),
            jnp.asarray(states),
            jnp.int32(steps),
            jnp.asarray(tabs),
            S,
            N,
            tabs.shape[1],
        )
    else:
        slot_tab = pack_slot_table(freq).reshape(16, 256)
        out_mat, final_x, consumed = _decode_kernel(
            jnp.asarray(words),
            jnp.asarray(states),
            jnp.int32(steps),
            jnp.asarray(slot_tab),
            S,
            N,
        )
    out = np.asarray(out_mat[:steps]).reshape(-1)[:raw_len]
    return out.tobytes()
