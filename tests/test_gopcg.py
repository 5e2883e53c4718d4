"""Go math/rand/v2 PCG parity for fqscramble (VERDICT r2 #8).

The Python reference (utils/gopcg.py) and the C++ fast path
(fq_scramble_pcg) must agree byte-for-byte with each other and with the
Go tool's semantics (cmd/fqscramble/main.go:72,111-158). The PCG vector
test recomputes the stream with independent big-int arithmetic; the
go-interop CI job cmp-checks against the real binary where Go exists.
"""

import numpy as np
import pytest

from fastqpacker_tpu.runtime import bindings
from fastqpacker_tpu.utils import gopcg


def _pcg_uint64_independent(seed: int, count: int) -> list[int]:
    """Recompute Go PCG-DXSM outputs with raw 128-bit integer arithmetic
    (independent of the GoPCG class internals)."""
    M128 = (1 << 128) - 1
    M64 = (1 << 64) - 1
    state = ((seed & M64) << 64) | (seed & M64)
    mul = (2549297995355413924 << 64) | 4865540595714422341
    inc = (6364136223846793005 << 64) | 1442695040888963407
    out = []
    for _ in range(count):
        state = (state * mul + inc) & M128
        hi, lo = state >> 64, state & M64
        hi ^= hi >> 32
        hi = (hi * 0xDA942042E4DD58B5) & M64
        hi ^= hi >> 48
        hi = (hi * (lo | 1)) & M64
        out.append(hi)
    return out


def test_pcg_stream_matches_independent_arithmetic():
    for seed in (42, 0, 1, 2**63 + 17):
        rng = gopcg.GoPCG(seed, seed)
        got = [rng.uint64() for _ in range(64)]
        assert got == _pcg_uint64_independent(seed, 64)


def test_uint64n_pow2_masks_and_lemire_reduces():
    rng = gopcg.GoPCG(42, 42)
    ref = gopcg.GoPCG(42, 42)
    # pow2: one draw, masked
    v = rng.uint64n(8)
    assert v == (ref.uint64() & 7)
    # non-pow2: Lemire high half (no rejection for these draws unless
    # lo < thresh, which the loop handles identically in both impls)
    v2 = rng.uint64n(5)
    x = ref.uint64()
    prod = x * 5
    lo = prod & ((1 << 64) - 1)
    thresh = (1 << 64) % 5
    while lo < thresh:
        x = ref.uint64()
        prod = x * 5
        lo = prod & ((1 << 64) - 1)
    assert v2 == prod >> 64


def test_shuffle_matches_go_fisher_yates_shape():
    # Shuffle(n) draws exactly n-1 bounded ints i+1 = n..2
    rng = gopcg.GoPCG(7, 7)
    ref = gopcg.GoPCG(7, 7)
    arr = list(range(10))
    rng.shuffle(arr)
    expect = list(range(10))
    for i in range(9, 0, -1):
        j = ref.uint64n(i + 1)
        expect[i], expect[j] = expect[j], expect[i]
    assert arr == expect
    assert sorted(arr) == list(range(10))


CORPUS = (
    b"@r1 desc\nACGTACGTACGTNNACGT\n+\nIIIIIIIIIIIIIIIIII\n"
    b"@r2\r\nACGTTGCA\r\n+p2\r\nFFFFFFFF\r\n"  # CRLF lines
    b"@r3\n\n+\n\n"  # empty seq/qual
    b"@r4\nACGT\xc3\xa9GT\xffA\n+\nHHHHHHHHH\n"  # UTF-8 + invalid byte
    b"@r5\nAC"  # incomplete trailing group: dropped
)


def test_python_reference_scramble_semantics():
    out = gopcg.scramble_text(CORPUS, 42)
    lines = out.split(b"\n")
    # 4 complete groups -> 16 lines + trailing empty split
    assert len(lines) == 17 and lines[-1] == b""
    assert lines[0] == b"@r1 desc"
    assert sorted(lines[1]) == sorted(b"ACGTACGTACGTNNACGT")
    assert lines[4] == b"@r2"  # \r stripped
    assert sorted(lines[5]) == sorted(b"ACGTTGCA")
    assert lines[6] == b"+p2"
    assert lines[9] == b""  # empty seq preserved
    # invalid byte 0xff became U+FFFD (Go []rune conversion)
    assert "�".encode() in lines[13] or b"\xc3\xa9" in lines[13]
    assert b"@r5" not in out  # incomplete group dropped


@pytest.mark.skipif(
    not bindings.scramble_pcg_available(), reason="native runtime absent"
)
def test_native_matches_python_reference():
    for seed in (42, 7, 123456789):
        assert bindings.scramble_pcg(CORPUS, seed) == gopcg.scramble_text(
            CORPUS, seed
        )


@pytest.mark.skipif(
    not bindings.scramble_pcg_available(), reason="native runtime absent"
)
def test_native_matches_python_on_random_corpus():
    rng = np.random.default_rng(3)
    recs = []
    for i in range(300):
        ln = int(rng.integers(0, 80))
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append(f"@x{i}\n{s}\n+\n{q}\n")
    data = "".join(recs).encode()
    assert bindings.scramble_pcg(data, 42) == gopcg.scramble_text(data, 42)


@pytest.mark.skipif(
    not bindings.scramble_pcg_available(), reason="native runtime absent"
)
def test_chunked_state_carry_equals_whole_buffer():
    data = CORPUS[: CORPUS.rfind(b"@r5")]  # complete groups only
    whole = bindings.scramble_pcg(data, 42)
    # split at a 4-line-group boundary (after group 1 = 4 newlines)
    nl = [i for i, b in enumerate(data) if b == 10]
    cut = nl[3] + 1
    state = np.array([42, 42], dtype=np.uint64)
    part = bindings.scramble_pcg(data[:cut], 42, state)
    part += bindings.scramble_pcg(data[cut:], 42, state)
    assert part == whole
    # python side too
    rng = gopcg.GoPCG(42, 42)
    py = gopcg.scramble_text(data[:cut], 42, rng)
    py += gopcg.scramble_text(data[cut:], 42, rng)
    assert py == whole


def test_cli_stream_pcg_matches_reference_semantics():
    import io

    from fastqpacker_tpu.cli import fqscramble

    data = CORPUS[: CORPUS.rfind(b"@r5")]
    out = io.BytesIO()
    fqscramble.scramble_stream_pcg(io.BytesIO(data), out, seed=42)
    assert out.getvalue() == gopcg.scramble_text(data, 42)
    # tiny chunk size exercises the boundary carry
    out2 = io.BytesIO()
    fqscramble.scramble_stream_pcg(
        io.BytesIO(data), out2, seed=42, chunk_bytes=7
    )
    assert out2.getvalue() == gopcg.scramble_text(data, 42)
