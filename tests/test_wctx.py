"""ops/wctx.py — wide-interleaved context-modeled rANS (TAG_WCTX).

Equivalence across all three backends (numpy reference defines the
semantics; the XLA kernels and the C++ lockstep twin must match it
bit-for-bit), wire-format robustness, and edge cases — the same test
shape every other codec backend in this repo has (CLAUDE.md invariant).
"""

import numpy as np
import pytest

from fastqpacker_tpu.ops import wctx
from fastqpacker_tpu.runtime import bindings


def _rand_lengths(rng, n, lo=0, hi=80):
    return rng.integers(lo, hi, n).astype(np.int64)


def _seq_syms(rng, total):
    return rng.integers(0, 4, total).astype(np.uint8)


def _walk_quals(rng, lengths):
    total = int(lengths.sum())
    vals = np.clip(
        30 + np.cumsum(rng.integers(-2, 3, total)) // 2, 0, 50
    ).astype(np.uint8)
    return vals


def _roundtrip(syms, lengths, model, order, lanes):
    payload = wctx.encode_stream(syms, lengths, model, order, lanes=lanes)
    dec_x = wctx.decode_stream(payload, lengths, use_native=False)
    assert np.array_equal(dec_x, syms)
    if bindings.wctx_available():
        dec_n = wctx.decode_stream(payload, lengths, use_native=True)
        assert np.array_equal(dec_n, syms)
    return payload


@pytest.mark.parametrize("order", wctx.SEQ_ORDERS)
def test_seq_roundtrip_all_orders(order):
    rng = np.random.default_rng(order)
    lengths = _rand_lengths(rng, 400)
    _roundtrip(
        _seq_syms(rng, int(lengths.sum())), lengths,
        wctx.MODEL_SEQ, order, 256,
    )


@pytest.mark.parametrize("order", (0, 1))
def test_qual_roundtrip(order):
    rng = np.random.default_rng(11)
    lengths = _rand_lengths(rng, 500)
    _roundtrip(
        _walk_quals(rng, lengths), lengths, wctx.MODEL_QUAL, order, 256
    )


def test_qual_model1_wins_on_momentum_quals():
    """The order-2 model (x prev2 bucket, qualctx model 1) must beat
    order-1 where the prev2 value carries slope information — and both
    must round-trip on all backends."""
    rng = np.random.default_rng(21)
    n_rec, L = 4000, 80
    dirs = np.where(rng.random((n_rec, L)) < 0.9, 0, 1)
    d0 = rng.integers(0, 2, (n_rec, 1)) * 2 - 1
    slope = d0 * np.where(np.cumsum(dirs, axis=1) % 2 == 0, 1, -1)
    q = np.clip(
        30 + np.cumsum(slope * rng.integers(1, 3, (n_rec, L)), axis=1),
        2, 41,
    ).astype(np.uint8).reshape(-1)
    lengths = np.full(n_rec, L, np.int64)
    p0 = _roundtrip(q, lengths, wctx.MODEL_QUAL, 0, 1024)
    p1 = _roundtrip(q, lengths, wctx.MODEL_QUAL, 1, 1024)
    assert len(p1) < len(p0)


def test_edge_shapes():
    rng = np.random.default_rng(12)
    # single record; record longer than lane balance; many empty records
    for lens in (
        np.array([37], np.int64),
        np.array([0, 0, 0, 5, 0, 0], np.int64),
        np.concatenate(
            [np.zeros(50, np.int64), [700], np.zeros(50, np.int64), [3]]
        ),
    ):
        total = int(lens.sum())
        _roundtrip(_seq_syms(rng, total), lens, wctx.MODEL_SEQ, 4, 256)
        _roundtrip(_walk_quals(rng, lens), lens, wctx.MODEL_QUAL, 0, 256)
        _roundtrip(_walk_quals(rng, lens), lens, wctx.MODEL_QUAL, 1, 256)


def test_sparse_present_alphabet():
    # non-dense present set: contexts see RAW values, not present
    # indices (the r3 prev-raw telescoping fix)
    rng = np.random.default_rng(13)
    lengths = _rand_lengths(rng, 300, 1, 40)
    vals = np.frombuffer(b"\x05\x1f\x33", np.uint8)[
        rng.integers(0, 3, int(lengths.sum()))
    ]
    _roundtrip(vals, lengths, wctx.MODEL_QUAL, 0, 256)


def test_device_encode_decodes_under_reference():
    """The XLA encoder's wire bytes must decode under the pure-numpy
    lockstep reference (cross-backend wire compatibility)."""
    rng = np.random.default_rng(14)
    lengths = _rand_lengths(rng, 200, 1, 50)
    syms = _seq_syms(rng, int(lengths.sum()))
    payload = wctx.encode_stream(syms, lengths, wctx.MODEL_SEQ, 2, lanes=256)
    p = wctx.parse_stream(payload)
    sb, S = wctx.lane_bounds(lengths, p["N"])
    startm = wctx.start_matrix(lengths, sb, S)
    C, _, _ = wctx.model_geometry(0, 2)
    freq_full = np.zeros((C, 256), np.uint32)
    freq_full[:, p["present"]] = p["freq_p"]
    cum_full = np.zeros_like(freq_full)
    np.cumsum(freq_full[:, :-1], axis=1, out=cum_full[:, 1:])
    seg = (sb[1:] - sb[:-1]).astype(np.int32)
    out = wctx.decode_reference(
        np.asarray(p["words"]).astype(np.uint16), p["states"], startm,
        freq_full, cum_full, 0, 2, seg,
    )
    assert np.array_equal(wctx.from_matrix(out, sb), syms)


def test_reference_encode_decodes_under_device_and_native():
    """And the reverse: reference-encoded words decode on both fast
    backends (three-way agreement)."""
    rng = np.random.default_rng(15)
    lengths = _rand_lengths(rng, 150, 1, 40)
    syms = _walk_quals(rng, lengths)
    N = 256
    sb, S = wctx.lane_bounds(lengths, N)
    startm = wctx.start_matrix(lengths, sb, S)
    counts = np.bincount(syms, minlength=256)
    pad = int(np.argmax(counts))
    symm = wctx.to_matrix(syms, sb, S, pad)
    ctxm = wctx.context_matrix(symm, startm, 1, 0)
    seg = (sb[1:] - sb[:-1]).astype(np.int32)
    hist = wctx.matrix_histogram(symm, ctxm, wctx.QUAL_NUM_CTX, seg)
    freq = wctx.normalize_tables(hist).astype(np.uint32)
    cum = np.zeros_like(freq)
    np.cumsum(freq[:, :-1], axis=1, out=cum[:, 1:])
    words, states = wctx.encode_reference(symm, ctxm, freq, cum, seg)
    # wrap into the wire format by hand
    import struct

    from fastqpacker_tpu.entropy import zstd as z

    present = np.flatnonzero(freq.sum(axis=0) > 0)
    freq_p = np.ascontiguousarray(freq[:, present].astype(np.uint16))
    blob = z.get_codec().compress(freq_p.astype("<u2").tobytes())
    payload = bytearray()
    payload += struct.pack(wctx.HEADER_FMT, 1, 0, 8, len(syms))
    payload += struct.pack("<H", len(present))
    payload += present.astype(np.uint8).tobytes()
    payload += struct.pack("<I", len(blob)) + blob
    payload += struct.pack("<I", len(words))
    payload += states.astype("<u4").tobytes()
    payload += words.astype("<u2").tobytes()
    payload = bytes(payload)
    assert np.array_equal(
        wctx.decode_stream(payload, lengths, use_native=False), syms
    )
    if bindings.wctx_available():
        assert np.array_equal(
            wctx.decode_stream(payload, lengths, use_native=True), syms
        )


def test_corrupt_streams_fail_typed():
    rng = np.random.default_rng(16)
    lengths = _rand_lengths(rng, 100, 1, 30)
    syms = _seq_syms(rng, int(lengths.sum()))
    payload = bytearray(
        wctx.encode_stream(syms, lengths, wctx.MODEL_SEQ, 2, lanes=256)
    )
    # truncations at every region must raise WctxError, never crash
    for cut in (0, 3, 7, 11, 20, len(payload) // 2, len(payload) - 1):
        with pytest.raises(wctx.WctxError):
            wctx.decode_stream(bytes(payload[:cut]), lengths)
    # wrong lengths
    with pytest.raises(wctx.WctxError):
        wctx.decode_stream(bytes(payload), lengths[:-1])
    # bad model byte
    bad = bytearray(payload)
    bad[0] = 9
    with pytest.raises(wctx.WctxError):
        wctx.decode_stream(bytes(bad), lengths)


def test_corrupt_words_fail_or_decode_wrong_never_crash():
    rng = np.random.default_rng(17)
    lengths = _rand_lengths(rng, 200, 1, 40)
    syms = _walk_quals(rng, lengths)
    payload = wctx.encode_stream(syms, lengths, wctx.MODEL_QUAL, 0, lanes=256)
    base = bytearray(payload)
    for _ in range(20):
        b = bytearray(base)
        b[int(rng.integers(12, len(b)))] ^= int(rng.integers(1, 256))
        for use_native in (
            (False, True) if bindings.wctx_available() else (False,)
        ):
            try:
                out = wctx.decode_stream(bytes(b), lengths, use_native)
                assert len(out) == len(syms)  # wrong data is OK (CRC
                # catches it one layer up); crashes are not
            except wctx.WctxError:
                pass


def test_estimate_tracks_actual_size():
    rng = np.random.default_rng(18)
    lengths = np.full(2000, 100, np.int64)
    syms = _walk_quals(rng, lengths)
    N = 256
    sb, S = wctx.lane_bounds(lengths, N)
    startm = wctx.start_matrix(lengths, sb, S)
    symm = wctx.to_matrix(syms, sb, S, 0)
    ctxm = wctx.context_matrix(symm, startm, 1, 0)
    hist = wctx.matrix_histogram(symm, ctxm, wctx.QUAL_NUM_CTX)
    est = wctx.estimate_size(hist, N)
    actual = len(wctx.encode_stream(syms, lengths, 1, 0, lanes=N))
    assert abs(est - actual) / actual < 0.05, (est, actual)


def test_pick_lanes_budget_scales_with_ratio():
    """E085: the ratio-aware lane pick halves the tier while 4 B/lane
    of states exceeds 0.5% of the ESTIMATED coded size (floor 1024);
    incompressible streams keep the speed tier."""
    C = wctx.QUAL_NUM_CTX
    n = 16 << 20  # speed tier: 8192 lanes
    # near-incompressible: uniform over 46 symbols -> est ~ 0.69n
    hist_flat = np.zeros((C, 256), np.int64)
    hist_flat[:, :46] = n // (C * 46)
    assert wctx.pick_lanes_for(hist_flat, n) == wctx.pick_lanes(n) == 8192
    # highly skewed: one dominant symbol -> tiny est -> states capped
    hist_skew = np.zeros((C, 256), np.int64)
    hist_skew[:, 40] = n // C
    N = wctx.pick_lanes_for(hist_skew, n)
    assert N < 8192 and N >= 1024
    assert 4 * N <= wctx.estimate_size(hist_skew, N) * 0.005 or N == 1024
