"""CLI tests (reference analog: cmd/fqpack/main_test.go).

Covers gzip-by-extension, gzip-by-magic, no auto-gunzip in -d mode, stdin
sniffing, file round trips, and fqscramble invariants.
"""

import gzip
import io
import os
import subprocess
import sys

import numpy as np
import pytest

SAMPLE = open("/root/reference/testdata/sample.fq", "rb").read()

ENV = {
    **os.environ,
    "FQZ_FORCE_CPU": "1",
    "JAX_PLATFORMS": "cpu",
    "PYTHONPATH": "/root/repo",
}


def run_cli(args, stdin: bytes = b"", module="fastqpacker_tpu.cli.fqpack"):
    proc = subprocess.run(
        [sys.executable, "-m", module, *args],
        input=stdin,
        capture_output=True,
        env=ENV,
        cwd="/root/repo",
    )
    return proc


def test_version_flag():
    p = run_cli(["-version"])
    assert p.returncode == 0
    assert b"fqpack version" in p.stdout


def test_help_flag():
    p = run_cli(["-h"])
    assert p.returncode == 0
    assert b"fqpack" in p.stderr


def test_stdin_stdout_roundtrip():
    comp = run_cli(["-c"], stdin=SAMPLE)
    assert comp.returncode == 0, comp.stderr
    dec = run_cli(["-d"], stdin=comp.stdout)
    assert dec.returncode == 0, dec.stderr
    assert dec.stdout == SAMPLE


def test_file_roundtrip(tmp_path):
    fin = tmp_path / "in.fq"
    fz = tmp_path / "out.fqz"
    fout = tmp_path / "out.fq"
    fin.write_bytes(SAMPLE)
    p = run_cli(["-i", str(fin), "-o", str(fz)])
    assert p.returncode == 0, p.stderr
    p = run_cli(["-d", "-i", str(fz), "-o", str(fout)])
    assert p.returncode == 0, p.stderr
    assert fout.read_bytes() == SAMPLE


def test_positional_args(tmp_path):
    fin = tmp_path / "in.fq"
    fz = tmp_path / "out.fqz"
    fin.write_bytes(SAMPLE)
    p = run_cli([str(fin), str(fz)])
    assert p.returncode == 0, p.stderr
    assert fz.exists() and fz.stat().st_size > 10


def test_gzip_input_by_extension(tmp_path):
    fin = tmp_path / "in.fq.gz"
    fin.write_bytes(gzip.compress(SAMPLE))
    p = run_cli(["-i", str(fin), "-c"])
    assert p.returncode == 0, p.stderr
    dec = run_cli(["-d"], stdin=p.stdout)
    assert dec.stdout == SAMPLE


def test_gzip_input_by_magic_bytes(tmp_path):
    fin = tmp_path / "in.data"  # no .gz suffix
    fin.write_bytes(gzip.compress(SAMPLE))
    p = run_cli(["-i", str(fin), "-c"])
    assert p.returncode == 0, p.stderr
    dec = run_cli(["-d"], stdin=p.stdout)
    assert dec.stdout == SAMPLE


def test_gzip_stdin_sniffed():
    p = run_cli(["-c"], stdin=gzip.compress(SAMPLE))
    assert p.returncode == 0, p.stderr
    dec = run_cli(["-d"], stdin=p.stdout)
    assert dec.stdout == SAMPLE


def test_no_auto_gunzip_in_decompress_mode(tmp_path):
    """-d must not transparently gunzip its input (main_test.go:93-119)."""
    fin = tmp_path / "in.fqz.gz"
    comp = run_cli(["-c"], stdin=SAMPLE).stdout
    fin.write_bytes(gzip.compress(comp))
    p = run_cli(["-d", "-i", str(fin)])
    assert p.returncode == 1
    assert b"error:" in p.stderr


def test_missing_input_file_errors():
    p = run_cli(["-i", "/nonexistent/file.fq"])
    assert p.returncode == 1
    assert b"cannot open input" in p.stderr


def test_invalid_fastq_errors():
    p = run_cli(["-c"], stdin=b"not a fastq\nfile\n+\nzz\n")
    assert p.returncode == 1
    assert b"error:" in p.stderr


def test_block_size_flag(tmp_path):
    recs = b"".join(b"@r%d\nACGT\n+\nIIII\n" % i for i in range(30))
    p = run_cli(["-b", "7", "-c"], stdin=recs)
    assert p.returncode == 0
    assert p.stdout[5:9] == (7).to_bytes(4, "little")
    dec = run_cli(["-d"], stdin=p.stdout)
    assert dec.stdout == recs


# --- fqscramble --------------------------------------------------------------


def scramble(data: bytes, seed: int = 42) -> bytes:
    p = run_cli([f"--seed={seed}"], stdin=data, module="fastqpacker_tpu.cli.fqscramble")
    assert p.returncode == 0, p.stderr
    return p.stdout


def test_fqscramble_preserves_invariants():
    out = scramble(SAMPLE)
    in_lines = SAMPLE.decode().strip().split("\n")
    out_lines = out.decode().strip().split("\n")
    assert len(in_lines) == len(out_lines)
    for i in range(0, len(in_lines), 4):
        assert out_lines[i] == in_lines[i]  # headers preserved
        assert out_lines[i + 2] == in_lines[i + 2]  # plus preserved
        assert out_lines[i + 3] == in_lines[i + 3]  # qualities preserved
        assert sorted(out_lines[i + 1]) == sorted(in_lines[i + 1])  # composition
        assert len(out_lines[i + 1]) == len(in_lines[i + 1])


def test_fqscramble_deterministic_per_seed():
    a = scramble(SAMPLE, seed=7)
    b = scramble(SAMPLE, seed=7)
    c = scramble(SAMPLE, seed=8)
    assert a == b
    assert a != c


def test_fqscramble_gz_input(tmp_path):
    fin = tmp_path / "in.fq.gz"
    fin.write_bytes(gzip.compress(SAMPLE))
    p = run_cli(["-i", str(fin)], module="fastqpacker_tpu.cli.fqscramble")
    assert p.returncode == 0, p.stderr
    assert len(p.stdout.splitlines()) == len(SAMPLE.splitlines())


def test_info_command(tmp_path):
    fz = tmp_path / "s.fqz"
    fz.write_bytes(run_cli(["-c"], stdin=SAMPLE).stdout)
    p = run_cli(["info", str(fz)])
    assert p.returncode == 0, p.stderr
    out = p.stdout.decode()
    assert "v2 (zstd)" in out
    assert "records:     3" in out
    assert "stream seq" in out


def test_check_command_ok(tmp_path):
    fz = tmp_path / "s.fqz"
    fz.write_bytes(run_cli(["-c"], stdin=SAMPLE).stdout)
    p = run_cli(["check", str(fz)])
    assert p.returncode == 0, p.stderr
    assert b"OK: decoded" in p.stdout


def test_check_command_detects_corruption(tmp_path):
    comp = bytearray(run_cli(["-c"], stdin=SAMPLE).stdout)
    comp[-2] ^= 0xFF  # corrupt inside last zstd frame/checksum
    fz = tmp_path / "bad.fqz"
    fz.write_bytes(bytes(comp))
    p = run_cli(["check", str(fz)])
    assert p.returncode == 1
    assert b"FAILED" in p.stdout


def test_info_native_format(tmp_path):
    fin = tmp_path / "in.fq"
    fin.write_bytes(SAMPLE)
    fz = tmp_path / "s3.fqz"
    p = run_cli(["--format", "native", "-i", str(fin), "-o", str(fz)])
    assert p.returncode == 0, p.stderr
    p = run_cli(["info", str(fz)])
    assert p.returncode == 0, p.stderr
    assert b"v3 (native rANS + CRC32)" in p.stdout
