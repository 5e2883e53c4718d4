"""libzstd binding tests: frame round trip, checksum, error handling."""

import pytest

from fastqpacker_tpu.entropy import zstd as z


def test_roundtrip():
    data = b"ACGT" * 1000
    comp = z.compress(data)
    assert len(comp) < len(data)
    assert z.decompress(comp) == data


def test_empty_roundtrip():
    comp = z.compress(b"")
    assert z.decompress(comp) == b""


def test_frame_has_checksum():
    """Frame checksums stay on, matching the reference (PERFORMANCE.md E033)."""
    comp = z.compress(b"hello world" * 100)
    # zstd frame header descriptor: bit 2 = content checksum flag
    assert comp[:4] == b"\x28\xb5\x2f\xfd"
    assert comp[4] & 0x04


def test_checksum_verified_on_decode():
    data = b"payload" * 500
    comp = bytearray(z.compress(data))
    comp[-1] ^= 0xFF  # corrupt the checksum
    with pytest.raises(z.ZstdError):
        z.decompress(bytes(comp))


def test_corrupt_frame_rejected():
    with pytest.raises(z.ZstdError):
        z.decompress(b"\x00\x01\x02\x03\x04")


def test_decompress_with_expected_size():
    data = bytes(range(256)) * 10
    comp = z.compress(data)
    assert z.decompress(comp, expected_size=len(data)) == data


def test_incompressible_data():
    import os

    data = os.urandom(10000)
    comp = z.compress(data)
    assert z.decompress(comp) == data


def test_corrupt_declared_frame_fails_fast_no_retry_bomb():
    """A frame with a declared content size whose decode reports
    dstSize_tooSmall (mid-frame corruption) must raise immediately: the
    old retry loop quadrupled a zeroed buffer without bound — an
    effective hang found by the E048 fuzz campaign."""
    import time

    from fastqpacker_tpu.entropy.zstd import ZstdCodec, ZstdError

    codec = ZstdCodec()
    frame = codec.compress(bytes(range(256)) * 4096)
    for off in (6, 10, 50, len(frame) // 2):
        mut = bytearray(frame)
        mut[off] ^= 0xFF
        t0 = time.monotonic()
        try:
            codec.decompress(bytes(mut))
        except ZstdError:
            pass
        assert time.monotonic() - t0 < 5.0
