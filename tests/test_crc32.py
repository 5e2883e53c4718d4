"""On-chip CRC32 vs zlib ground truth."""

import zlib

import numpy as np
import pytest

from fastqpacker_tpu.ops import crc32 as dcrc


def test_combine_matches_zlib():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, 1000).astype(np.uint8).tobytes()
    b = rng.integers(0, 256, 1777).astype(np.uint8).tobytes()
    got = dcrc.crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b))
    assert got == zlib.crc32(a + b)


@pytest.mark.parametrize(
    "n", [0, 1, 100, 256 * 64, 256 * 64 + 1, 100_000, 1_000_003]
)
def test_crc32_device_matches_zlib(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n).astype(np.uint8).tobytes()
    assert dcrc.crc32_device(data) == (zlib.crc32(data) & 0xFFFFFFFF)


def test_crc32_device_exact_multiple_of_lanes():
    rng = np.random.default_rng(9)
    n = 256 * 4096  # n == lanes * K exactly
    data = rng.integers(0, 256, n).astype(np.uint8).tobytes()
    assert dcrc.crc32_device(data) == (zlib.crc32(data) & 0xFFFFFFFF)
