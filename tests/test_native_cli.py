"""Native fqpack front-end (bin/fqpack, E077): the v1/v2 CLI surface
driven through libfqruntime directly, byte-identical to the Python CLI,
with exec-to-Python fallbacks for the full-featured surface.

Reference surface: cmd/fqpack/main.go:37-203 (-d -i -o -c -b -w
-version -h + positionals); error strings per runtime/bindings.py
_mt_raise_* / format/container.py (parser.go:70,88,180 parity).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.runtime import build as rtbuild

BIN = rtbuild.build_cli()
pytestmark = pytest.mark.skipif(
    BIN is None, reason="native CLI build unavailable"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **kw):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [BIN, *args], capture_output=True, env=env, timeout=600, **kw
    )


def _fastq(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ln = int(rng.integers(1, 160))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln).tobytes()
        qual = (33 + rng.integers(0, 41, ln).astype(np.uint8)).tobytes()
        out.append(b"@r%d x:%d\n%s\n+\n%s\n" % (i, i % 7, seq, qual))
    return b"".join(out)


def test_native_cli_roundtrip_identical_to_python(tmp_path):
    data = _fastq()
    src = tmp_path / "in.fq"
    src.write_bytes(data)
    out = tmp_path / "out.fqz"
    r = _run(["-i", str(src), "-o", str(out)])
    assert r.returncode == 0, r.stderr
    # byte-identical to the library/Python pipeline
    assert out.read_bytes() == fq.compress_bytes(data)
    dec = tmp_path / "dec.fq"
    r = _run(["-d", "-i", str(out), "-o", str(dec)])
    assert r.returncode == 0, r.stderr
    assert dec.read_bytes() == data


def test_native_cli_flags_and_stdout(tmp_path):
    data = _fastq(500, seed=1)
    src = tmp_path / "in.fq"
    src.write_bytes(data)
    # -c to stdout, -b custom block size, positional input
    r = _run(["-c", "-b", "100", str(src)])
    assert r.returncode == 0, r.stderr
    assert (
        r.stdout
        == fq.compress_bytes(data, fq.Options(block_size=100))
    )
    # -w 1 still round-trips
    out = tmp_path / "w1.fqz"
    assert _run(["-w", "1", "-i", str(src), "-o", str(out)]).returncode == 0
    assert fq.decompress_bytes(out.read_bytes()) == data


def test_native_cli_error_strings(tmp_path):
    bad = tmp_path / "bad.fq"
    bad.write_bytes(b"not fastq\n")
    r = _run(["-i", str(bad), "-o", str(tmp_path / "x.fqz")])
    assert r.returncode == 1
    assert (
        r.stderr.strip()
        == b"error: invalid FASTQ: header line must start with @"
    )
    junk = tmp_path / "junk.fqz"
    junk.write_bytes(b"NOPE......")
    r = _run(["-d", "-i", str(junk), "-o", str(tmp_path / "y.fq")])
    assert r.returncode == 1
    assert r.stderr.strip() == b"error: invalid magic bytes: not an FQZ file"
    # corrupt payload -> typed zstd error
    data = _fastq(300, seed=2)
    src = tmp_path / "c.fq"
    src.write_bytes(data)
    comp = bytearray(fq.compress_bytes(data))
    comp[len(comp) // 2] ^= 0xFF
    cf = tmp_path / "c.fqz"
    cf.write_bytes(bytes(comp))
    r = _run(["-d", "-i", str(cf), "-o", str(tmp_path / "c.out")])
    assert r.returncode == 1
    assert b"corrupted zstd frame" in r.stderr


def test_native_cli_v3_compress(tmp_path):
    data = _fastq(400, seed=3)
    src = tmp_path / "in.fq"
    src.write_bytes(data)
    # --format native runs the whole-file MT v3 compress in-process
    # (E080), byte-identical to the library path
    out3 = tmp_path / "o3.fqz"
    r = _run(["--format", "native", "-i", str(src), "-o", str(out3)])
    assert r.returncode == 0, r.stderr
    blob = out3.read_bytes()
    assert blob[4] == 3  # v3 version byte
    assert blob == fq.compress_bytes(
        data, fq.Options(version=fq.container.VERSION_3_NATIVE)
    )
    # --format=VALUE spelling matches argparse's
    r = _run(["--format=native", "-c", str(src)])
    assert r.returncode == 0, r.stderr
    assert r.stdout == blob
    # native binary -d decodes the v3 container in-process
    dec = tmp_path / "d3.fq"
    r = _run(["-d", "-i", str(out3), "-o", str(dec)])
    assert r.returncode == 0, r.stderr
    assert dec.read_bytes() == data


def test_native_cli_v3_dict_native(tmp_path):
    # coverage-redundant reads: block 0's probe fires and the native
    # binary builds the FLAG_SEQ_DICT container ITSELF (E088: probe,
    # dictionary, section all in native code) — byte-identical to the
    # Python CLI's dict path
    g = np.random.default_rng(5)
    genome = g.integers(0, 4, 40_000).astype(np.uint8)
    starts = g.integers(0, 40_000 - 151, 4000)
    rows = np.frombuffer(b"ACGT", np.uint8)[
        genome[starts[:, None] + np.arange(151)]
    ]
    data = b"".join(
        b"@r%d\n%s\n+\n%s\n" % (i, rows[i].tobytes(), b"I" * 151)
        for i in range(len(rows))
    )
    src = tmp_path / "cov.fq"
    src.write_bytes(data)
    out3 = tmp_path / "cov.fqz"
    r = _run(
        ["--format", "native", "-b", "1000", "-i", str(src), "-o", str(out3)]
    )
    assert r.returncode == 0, r.stderr
    blob = out3.read_bytes()
    assert blob[4] == 3
    assert blob[9] & fq.container.FLAG_SEQ_DICT
    assert fq.decompress_bytes(blob) == data
    # byte-identical to the Python dict path (library route)
    assert blob == fq.compress_bytes(
        data,
        fq.Options(
            version=fq.container.VERSION_3_NATIVE, block_size=1000
        ),
    )


def test_native_cli_python_fallbacks(tmp_path):
    data = _fastq(400, seed=3)
    src = tmp_path / "in.fq"
    src.write_bytes(data)
    # gzip input: exec fallback handles transparent gunzip
    import gzip as _gzip

    gz = tmp_path / "in.fq.gz"
    gz.write_bytes(_gzip.compress(data))
    outg = tmp_path / "g.fqz"
    r = _run(["-i", str(gz), "-o", str(outg)])
    assert r.returncode == 0, r.stderr
    assert fq.decompress_bytes(outg.read_bytes()) == data


def test_native_cli_empty_file(tmp_path):
    src = tmp_path / "empty.fq"
    src.write_bytes(b"")
    out = tmp_path / "e.fqz"
    assert _run(["-i", str(src), "-o", str(out)]).returncode == 0
    assert len(out.read_bytes()) == 10
    dec = tmp_path / "e.out"
    assert _run(["-d", "-i", str(out), "-o", str(dec)]).returncode == 0
    assert dec.read_bytes() == b""
