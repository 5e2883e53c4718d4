"""Strictly lossless mode (FLAG_LOSSLESS, journal E052).

The reference normalizes lowercase bases to uppercase and exotic
symbols to N by design (sequence.go:44-51,129-133); --lossless restores
the exact input bytes via a case bitmask + verbatim exotic bytes
appended to the npos slot.
"""

import io

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container


def _opts(**kw):
    return fq.Options(version=container.VERSION_3_NATIVE, lossless=True, **kw)


def _rt(data: bytes, **kw) -> bytes:
    comp = fq.compress_bytes(data, _opts(**kw))
    fh = container.parse_file_header(comp[:10])
    assert fh.flags & container.FLAG_LOSSLESS
    return fq.decompress_bytes(comp)


@pytest.mark.parametrize("data", [
    b"@r1\nacgtACGT\n+\nIIIIIIII\n",
    b"@r1\nAC.GT*xNn\n+\nIIIIIIIII\n",
    b"@r1 d\nacgtNnRyACGT\n+x\n!!!!!!!!!!!!\n@r2\nGGGG\n+\nHHHH\n",
    b"@r\nACGT\n+\nIIII\n",
    b"@r\n\n+\n\n",
    b"",
])
def test_lossless_exact(data):
    if data:
        assert _rt(data) == data
    else:
        comp = fq.compress_bytes(data, _opts())
        assert fq.decompress_bytes(comp) == data


def test_lossless_multiblock_random():
    rng = np.random.default_rng(3)
    ab = "ACGTacgtNn.Ryx*"
    recs = []
    for i in range(4000):
        ln = int(rng.integers(1, 120))
        sq = "".join(ab[j] for j in rng.integers(0, len(ab), ln))
        ql = "".join(chr(33 + int(j)) for j in rng.integers(0, 42, ln))
        recs.append(f"@r{i} t\n{sq}\n+\n{ql}\n")
    data = "".join(recs).encode()
    assert _rt(data, block_size=700) == data


def test_default_mode_still_normalizes():
    data = b"@r1\nacgtXn\n+\nIIIIII\n"
    out = fq.decompress_bytes(
        fq.compress_bytes(data, fq.Options(version=3))
    )
    assert out == b"@r1\nACGTNN\n+\nIIIIII\n"


def test_lossless_info_and_ranges():
    import os
    import tempfile

    from fastqpacker_tpu.cli import inspect as insp
    from fastqpacker_tpu.pipeline import ranges

    rng = np.random.default_rng(5)
    ab = "ACGTacgtn."
    recs = []
    for i in range(900):
        sq = "".join(ab[j] for j in rng.integers(0, len(ab), 40))
        recs.append(f"@z{i}\n{sq}\n+\n{'I' * 40}\n")
    data = "".join(recs).encode()
    comp = fq.compress_bytes(data, _opts(block_size=300))
    fd, path = tempfile.mkstemp(suffix=".fqz")
    os.write(fd, comp)
    os.close(fd)
    try:
        buf = io.StringIO()
        assert insp.info(path, out=buf) == 0
        assert "lossless" in buf.getvalue()
        buf = io.StringIO()
        assert insp.check(path, out=buf) == 0
        # random access into block 2 restores case/exotics
        text = ranges.read_record_range(path, 700, 702)
        nl = np.flatnonzero(np.frombuffer(data, np.uint8) == 0x0A)
        a = int(nl[4 * 700 - 1]) + 1
        b = int(nl[4 * 702 - 1]) + 1
        assert text == data[a:b]
    finally:
        os.unlink(path)


def test_lossless_corrupt_side_data_rejected():
    data = b"@r1\nacgtNx\n+\nIIIIII\n" * 50
    comp = bytearray(fq.compress_bytes(data, _opts(block_size=50)))
    # truncating the container still fails typed
    with pytest.raises((container.FormatError, ValueError, RuntimeError)):
        fq.decompress_bytes(bytes(comp[:-3]))


def test_lossless_paired():
    from fastqpacker_tpu.pipeline import api

    r1 = b"@a/1\nacgT\n+\nIIII\n" * 40
    r2 = b"@a/2\nTTx.\n+\nHHHH\n" * 40
    out = io.BytesIO()
    api.compress_paired(io.BytesIO(r1), io.BytesIO(r2), out, _opts(block_size=16))
    w1, w2 = io.BytesIO(), io.BytesIO()
    api.decompress_paired(io.BytesIO(out.getvalue()), w1, w2)
    assert w1.getvalue() == r1
    assert w2.getvalue() == r2


def test_lossless_numpy_fallback_decodes(tmp_path):
    """FQZ_NO_NATIVE decode of lossless containers: the numpy npos
    parser must tolerate the appended side data like the C++ twin
    (second-review finding)."""
    import subprocess
    import sys

    code = (
        "import os\n"
        "os.environ['FQZ_NO_NATIVE']='1'\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import fastqpacker_tpu as fq\n"
        "from fastqpacker_tpu.format import container\n"
        "d = b'@r1\\nacgtNnRy.\\n+\\n!!!!!!!!!\\n' * 30\n"
        "o = fq.Options(version=container.VERSION_3_NATIVE,"
        " lossless=True, block_size=8)\n"
        "comp = fq.compress_bytes(d, o)\n"
        "assert fq.decompress_bytes(comp) == d\n"
        "print('OK')\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert res.stdout.strip() == "OK", res.stderr[-800:]


def test_lossless_requires_v3():
    """Options(lossless=True) with a v1/v2 version must raise, never
    silently produce lossy output (second-review finding)."""
    with pytest.raises(ValueError, match="lossless mode requires"):
        fq.compress_bytes(b"@r\nacgt\n+\nIIII\n", fq.Options(lossless=True))


def test_lossless_multihost(tmp_path):
    """Multihost sections must carry FLAG_LOSSLESS in the file header
    (second-review finding: the flag was dropped and decode silently
    normalized)."""
    from fastqpacker_tpu.parallel import multihost as mh

    d = b"@r1\nacgtNnRy.\n+\n!!!!!!!!!\n" * 200
    src = tmp_path / "in.fq"
    dst = tmp_path / "out.fqz"
    src.write_bytes(d)
    mh.simulate_multihost(
        str(src), str(dst), num_hosts=2,
        opts=fq.Options(
            version=container.VERSION_3_NATIVE, lossless=True,
            block_size=64,
        ),
    )
    comp = dst.read_bytes()
    fh = container.parse_file_header(comp[:10])
    assert fh.flags & container.FLAG_LOSSLESS
    assert fq.decompress_bytes(comp) == d


def test_lossless_composes_with_seq_dict():
    """FLAG_LOSSLESS + FLAG_SEQ_DICT in one container round-trips."""
    from bench import synth_fastq

    base = bytearray(synth_fastq(12, genomic=True, seed=5))
    arr = np.frombuffer(bytes(base), np.uint8)
    nl = np.flatnonzero(arr == 0x0A)
    seq_line_starts = np.concatenate(([0], nl[:-1] + 1))[1::4][:100]
    for s in seq_line_starts:
        base[s] = ord(chr(base[s]).lower())
    data = bytes(base)
    comp = fq.compress_bytes(data, _opts(block_size=5000))
    fh = container.parse_file_header(comp[:10])
    assert fh.flags & container.FLAG_SEQ_DICT
    assert fh.flags & container.FLAG_LOSSLESS
    assert fq.decompress_bytes(comp) == data
