"""rANS entropy coder tests: exact round trips, ratio sanity, edge cases."""

import numpy as np
import pytest

from fastqpacker_tpu.ops import rans


def roundtrip(data: bytes, lanes=None) -> bytes:
    return rans.decode_stream(rans.encode_stream(data, lanes=lanes))


def test_empty():
    assert roundtrip(b"") == b""


def test_single_byte():
    assert roundtrip(b"A") == b"A"


def test_single_symbol_stream():
    data = b"\x42" * 10000
    enc = rans.encode_stream(data)
    assert roundtrip(data) == data
    assert len(enc) < 4000  # prob-1 symbols cost ~0 bits + table overhead


def test_two_symbols():
    data = b"AB" * 5000
    assert roundtrip(data) == data


def test_all_256_symbols():
    data = bytes(range(256)) * 40
    assert roundtrip(data) == data


def test_random_bytes_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 100_000).astype(np.uint8).tobytes()
    assert roundtrip(data) == data


def test_skewed_ratio_near_entropy():
    rng = np.random.default_rng(2)
    p = np.full(256, 0.0)
    p[:8] = [0.5, 0.2, 0.1, 0.08, 0.05, 0.04, 0.02, 0.01]
    vals = rng.choice(256, p=p, size=500_000).astype(np.uint8)
    data = vals.tobytes()
    enc = rans.encode_stream(data)
    probs = np.bincount(vals, minlength=256) / len(vals)
    H = -(probs[probs > 0] * np.log2(probs[probs > 0])).sum()
    ideal = len(data) * H / 8
    assert len(enc) < ideal * 1.05 + 30_000  # within 5% + table overhead
    assert roundtrip(data) == data


@pytest.mark.parametrize("n", [1, 255, 256, 257, 4095, 4096, 4097, 65536])
def test_length_edges(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 16, n).astype(np.uint8).tobytes()
    assert roundtrip(data) == data


@pytest.mark.parametrize("lanes", [256, 1024, 4096])
def test_lane_counts(lanes):
    rng = np.random.default_rng(lanes)
    data = rng.integers(0, 64, 50_000).astype(np.uint8).tobytes()
    assert roundtrip(data, lanes=lanes) == data


def test_truncated_stream_rejected():
    enc = rans.encode_stream(b"some data here" * 100)
    with pytest.raises(rans.RansError, match="truncated"):
        rans.decode_stream(enc[: len(enc) // 2])


def test_corrupt_table_rejected():
    enc = bytearray(rans.encode_stream(b"some data here" * 100))
    enc[10] ^= 0xFF  # corrupt freq table -> sum != 4096
    with pytest.raises(rans.RansError, match="frequency table"):
        rans.decode_stream(bytes(enc))


def test_normalize_freqs_properties():
    rng = np.random.default_rng(3)
    for _ in range(20):
        hist = rng.integers(0, 1000, 256)
        hist[rng.integers(0, 256, 100)] = 0
        if hist.sum() == 0:
            hist[0] = 1
        freq = rans.normalize_freqs(hist)
        assert int(freq.sum()) == rans.PROB_SCALE
        assert np.all(freq[hist > 0] >= 1)
        assert np.all(freq[hist == 0] == 0)


def test_div_small_exactness():
    """The float32 long-division must be exact over the operating range."""
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    a = rng.integers(0, 1 << 28, 200_000).astype(np.uint32)
    f = rng.integers(1, 4097, 200_000).astype(np.uint32)
    q = np.asarray(rans._div_small(jnp.asarray(a), jnp.asarray(f)))
    np.testing.assert_array_equal(q, a // f)
    # adversarial: exact multiples and off-by-one
    f2 = rng.integers(1, 4097, 50_000).astype(np.uint32)
    k = rng.integers(0, 1 << 15, 50_000).astype(np.uint32)
    a2 = (f2 * k).astype(np.uint32)
    for delta in (0, 1):
        av = np.minimum(a2 + delta, (1 << 28) - 1).astype(np.uint32)
        q2 = np.asarray(rans._div_small(jnp.asarray(av), jnp.asarray(f2)))
        np.testing.assert_array_equal(q2, av // f2)


def test_divmod_state_exactness():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    x = rng.integers(0, 1 << 32, 200_000, dtype=np.uint64).astype(np.uint32)
    f = rng.integers(1, 4097, 200_000).astype(np.uint32)
    q, r = rans._divmod_state(jnp.asarray(x), jnp.asarray(f))
    np.testing.assert_array_equal(np.asarray(q), x // f)
    np.testing.assert_array_equal(np.asarray(r), x % f)


def test_monotonic_gather_matches_take():
    import jax.numpy as jnp

    from fastqpacker_tpu.ops.rans import _monotonic_gather

    rng = np.random.default_rng(6)
    for n in (8, 128, 4096):
        for _ in range(5):
            need = rng.integers(0, 2, n)
            rank = np.cumsum(need) - need  # exclusive prefix of a 0/1 mask
            chunk = rng.integers(0, 1 << 16, n).astype(np.uint16)
            got = np.asarray(
                _monotonic_gather(jnp.asarray(chunk), jnp.asarray(rank.astype(np.int32)), n)
            )
            np.testing.assert_array_equal(got, chunk[rank])


# ---------------------------------------------------------------------------
# Host (C++) vs device (XLA) backend equivalence: the two coders must be
# byte-identical in both directions so containers written by either
# backend decode on the other (PERFORMANCE.md E018).
# ---------------------------------------------------------------------------


def _cases():
    rng = np.random.default_rng(7)
    yield b"A"
    yield b"\x00" * 5000
    yield bytes(range(256)) * 20
    yield rng.integers(0, 256, 100_000).astype(np.uint8).tobytes()
    yield rng.integers(0, 8, 4097).astype(np.uint8).tobytes()


@pytest.fixture
def _native_runtime():
    from fastqpacker_tpu.runtime import bindings

    if not bindings.available():
        pytest.skip("native runtime unavailable")


def test_backend_byte_identity(monkeypatch, _native_runtime):
    for data in _cases():
        monkeypatch.setenv("FQZ_RANS_BACKEND", "device")
        enc_dev = rans.encode_stream(data)
        monkeypatch.setenv("FQZ_RANS_BACKEND", "host")
        enc_host = rans.encode_stream(data)
        assert enc_host == enc_dev


def test_backend_cross_decode(monkeypatch, _native_runtime):
    for data in _cases():
        monkeypatch.setenv("FQZ_RANS_BACKEND", "device")
        enc = rans.encode_stream(data)
        monkeypatch.setenv("FQZ_RANS_BACKEND", "host")
        assert rans.decode_stream(enc) == data
        enc2 = rans.encode_stream(data)
        monkeypatch.setenv("FQZ_RANS_BACKEND", "device")
        assert rans.decode_stream(enc2) == data


def test_host_backend_corrupt_words_rejected(monkeypatch, _native_runtime):
    monkeypatch.setenv("FQZ_RANS_BACKEND", "host")
    enc = bytearray(rans.encode_stream(b"host backend corruption" * 200))
    # truncate the word payload but keep the header/total intact
    with pytest.raises(rans.RansError, match="truncated"):
        rans.decode_stream(bytes(enc[:-7]))


def test_wide_lane_roundtrip_16384():
    """The >=8 MB lane tier (E057): 16384 lanes must round-trip on both
    backends; exercised at a small size via the explicit lanes param."""
    import os

    rng = np.random.default_rng(11)
    data = rng.integers(0, 60, size=1 << 20).astype(np.uint8).tobytes()
    payload = rans.encode_stream(data, lanes=16384)
    assert rans.decode_stream(payload) == data
    old = os.environ.get("FQZ_RANS_BACKEND")
    try:
        os.environ["FQZ_RANS_BACKEND"] = "host"
        assert rans.decode_stream(payload) == data
        host_payload = rans.encode_stream(data, lanes=16384)
        assert host_payload == payload  # byte-identical twins
    finally:
        if old is None:
            os.environ.pop("FQZ_RANS_BACKEND", None)
        else:
            os.environ["FQZ_RANS_BACKEND"] = old
