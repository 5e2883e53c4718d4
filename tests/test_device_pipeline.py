"""Device pipeline round trips (bucketed shapes, overlap scheduler)."""

import os

os.environ["FQZ_BACKEND"] = "device"  # bypass the transfer probe in tests

import io

import numpy as np

import fastqpacker_tpu as fq
from fastqpacker_tpu.pipeline import api, device


def _fastq(n, seed=0, varlen=False, maxlen=160):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        ln = int(rng.integers(1, maxlen)) if varlen else maxlen
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append(f"@dev_{i} f={i%7}\n{s}\n+\n{q}\n")
    return "".join(recs).encode()


def _roundtrip_device(data: bytes, block_size: int) -> bytes:
    comp = io.BytesIO()
    device.compress_device(
        io.BytesIO(data), comp, fq.Options(block_size=block_size)
    )
    out = io.BytesIO()
    device.decompress_device(io.BytesIO(comp.getvalue()), out)
    return out.getvalue()


def test_device_pipeline_uniform():
    data = _fastq(500, seed=1)
    assert _roundtrip_device(data, 128) == data


def test_device_pipeline_varlen_multiblock():
    data = _fastq(700, seed=2, varlen=True)
    assert _roundtrip_device(data, 100) == data


def test_device_compress_cpu_decompress():
    """Device-compressed containers decode identically on the CPU path."""
    data = _fastq(300, seed=3, varlen=True)
    comp = io.BytesIO()
    device.compress_device(io.BytesIO(data), comp, fq.Options(block_size=75))
    assert fq.decompress_bytes(comp.getvalue()) == data


def test_cpu_compress_device_decompress():
    data = _fastq(300, seed=4)
    comp = fq.compress_bytes(data, fq.Options(block_size=75))
    out = io.BytesIO()
    device.decompress_device(io.BytesIO(comp), out)
    assert out.getvalue() == data


def test_device_and_cpu_containers_byte_identical():
    """Same input -> byte-identical container from both backends."""
    data = _fastq(250, seed=5, varlen=True)
    cpu = fq.compress_bytes(data, fq.Options(block_size=60))
    dev = io.BytesIO()
    device.compress_device(io.BytesIO(data), dev, fq.Options(block_size=60))
    assert dev.getvalue() == cpu


def test_device_pipeline_empty_input():
    comp = io.BytesIO()
    device.compress_device(io.BytesIO(b""), comp, fq.Options())
    out = io.BytesIO()
    device.decompress_device(io.BytesIO(comp.getvalue()), out)
    assert out.getvalue() == b""


def test_device_pipeline_phred64():
    q = "".join(chr(64 + i % 40) for i in range(80))
    data = f"@p64\n{'ACGT' * 20}\n+\n{q}\n".encode()
    assert _roundtrip_device(data, 10) == data
