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


def test_wctx_container_routes_to_mesh_decoder(monkeypatch):
    """VERDICT r4 #4: decompress_device sends TAG_WCTX containers to the
    batched mesh decoder when the device probe says it pays, and to the
    host twin otherwise — byte-exact either way."""
    import io

    import numpy as np

    from fastqpacker_tpu.pipeline import (
        api,
        auto,
        device as devpipe,
        meshpipe,
    )
    from fastqpacker_tpu.parallel import mesh as pmesh
    from fastqpacker_tpu.format import container

    # markov-ish corpus that the mesh path wctx-codes (same recipe as
    # tests/test_meshpipe.py)
    rng = np.random.default_rng(11)
    n, L = 4000, 80
    probs = np.array(
        [
            [0.17, 0.45, 0.25, 0.13],
            [0.13, 0.17, 0.45, 0.25],
            [0.45, 0.25, 0.13, 0.17],
            [0.25, 0.13, 0.17, 0.45],
        ]
    )
    cum = np.cumsum(probs, axis=1)
    u = rng.random(n * L)
    codes = np.empty(n * L, np.uint8)
    prev = 0
    for i in range(n * L):
        prev = int(np.searchsorted(cum[prev], u[i]))
        codes[i] = prev
    seq = np.frombuffer(b"ACGT", np.uint8)[codes].reshape(n, L)
    steps = rng.integers(-2, 3, size=(n, L)).astype(np.int32)
    qual = np.clip(33 + 30 + np.cumsum(steps, axis=1) // 3, 33, 74).astype(
        np.uint8
    )
    recs = []
    for i in range(n):
        recs.append(
            b"@m%d\n%s\n+\n%s\n" % (i, seq[i].tobytes(), qual[i].tobytes())
        )
    data = b"".join(recs)

    mesh = pmesh.make_mesh(8)
    comp = meshpipe.compress_mesh_bytes(
        data, __import__("fastqpacker_tpu").Options(block_size=1000), mesh
    )
    # the corpus must actually produce wctx streams for this test to
    # exercise the routing sniff
    bio = io.BytesIO(comp)
    fh = container.read_file_header(bio)
    from fastqpacker_tpu.utils.inmem import source_view

    assert devpipe._first_block_wctx(source_view(bio))

    calls = {"mesh": 0}
    real = meshpipe.decompress_mesh

    def spy(r, w, mesh=None, fh=None):
        calls["mesh"] += 1
        return real(r, w, mesh, fh=fh)

    monkeypatch.setattr(meshpipe, "decompress_mesh", spy)
    monkeypatch.setattr(auto, "device_worthwhile", lambda: True)
    out = io.BytesIO()
    devpipe.decompress_device(io.BytesIO(comp), out)
    assert out.getvalue() == data
    assert calls["mesh"] == 1

    monkeypatch.setattr(auto, "device_worthwhile", lambda: False)
    out2 = io.BytesIO()
    devpipe.decompress_device(io.BytesIO(comp), out2)
    assert out2.getvalue() == data
    assert calls["mesh"] == 1  # host twin path, no new mesh call
