"""Paired-end interleaving (utils/pairing.py, --pair CLI flag).

The reference container defines FlagPairedEnd but its compressor never
sets it (container.go:14-17; SURVEY.md §2 C6); this framework implements
the feature. Round trips must reproduce both mate files byte-exactly and
the container must carry the flag.
"""

import gzip
import io
import os
import subprocess
import sys

import pytest

from fastqpacker_tpu.format import container
from fastqpacker_tpu.pipeline import api
from fastqpacker_tpu.utils import pairing


def mate_files(n: int, tag: str) -> bytes:
    out = []
    for i in range(n):
        seq = "ACGT" * (2 + (i * 7 + len(tag)) % 5)
        out.append(
            f"@pair{i}/{tag} run=7\n{seq}\n+\n{'F' * len(seq)}\n"
        )
    return "".join(out).encode()


R1 = mate_files(517, "1")
R2 = mate_files(517, "2")


def interleaved_expect(r1: bytes, r2: bytes) -> bytes:
    recs1 = r1.decode().splitlines(keepends=True)
    recs2 = r2.decode().splitlines(keepends=True)
    out = []
    for i in range(len(recs1) // 4):
        out += recs1[i * 4 : i * 4 + 4] + recs2[i * 4 : i * 4 + 4]
    return "".join(out).encode()


def test_interleaved_reader_small_chunks():
    rd = pairing.InterleavedPairReader(
        io.BytesIO(R1), io.BytesIO(R2), chunk_bytes=256
    )
    assert rd.read() == interleaved_expect(R1, R2)


def test_interleaved_reader_bounded_reads():
    rd = pairing.InterleavedPairReader(io.BytesIO(R1), io.BytesIO(R2))
    got = b""
    while True:
        chunk = rd.read(1000)
        if not chunk:
            break
        got += chunk
    assert got == interleaved_expect(R1, R2)


def test_count_mismatch_raises():
    rd = pairing.InterleavedPairReader(
        io.BytesIO(R1), io.BytesIO(mate_files(516, "2"))
    )
    with pytest.raises(pairing.PairError, match="different record counts"):
        rd.read()


def test_deinterleaving_writer_chunked():
    text = interleaved_expect(R1, R2)
    w1, w2 = io.BytesIO(), io.BytesIO()
    dw = pairing.DeinterleavingWriter(w1, w2)
    # ragged chunk sizes exercise the record-boundary buffering
    for i in range(0, len(text), 777):
        dw.write(text[i : i + 777])
    dw.close()
    assert w1.getvalue() == R1
    assert w2.getvalue() == R2


def test_deinterleave_odd_records_raises():
    text = interleaved_expect(R1, R2) + b"@odd\nACGT\n+\nFFFF\n"
    dw = pairing.DeinterleavingWriter(io.BytesIO(), io.BytesIO())
    dw.write(text)
    with pytest.raises(pairing.PairError, match="odd number"):
        dw.close()


@pytest.mark.parametrize(
    "version", [container.VERSION_2, container.VERSION_3_NATIVE]
)
def test_paired_roundtrip(version):
    comp = io.BytesIO()
    api.compress_paired(
        io.BytesIO(R1), io.BytesIO(R2), comp,
        api.Options(block_size=100, version=version),
    )
    comp.seek(0)
    fh = container.read_file_header(comp)
    assert fh.paired
    comp.seek(0)
    w1, w2 = io.BytesIO(), io.BytesIO()
    api.decompress_paired(comp, w1, w2)
    assert w1.getvalue() == R1
    assert w2.getvalue() == R2


def test_paired_container_decodes_interleaved_without_split():
    comp = io.BytesIO()
    api.compress_paired(io.BytesIO(R1), io.BytesIO(R2), comp)
    out = api.decompress_bytes(comp.getvalue())
    assert out == interleaved_expect(R1, R2)


def test_unpaired_container_rejected_by_paired_decode():
    comp = api.compress_bytes(R1)
    with pytest.raises(container.FormatError, match="not paired-end"):
        api.decompress_paired(io.BytesIO(comp), io.BytesIO(), io.BytesIO())


ENV = {
    **os.environ,
    "FQZ_FORCE_CPU": "1",
    "JAX_PLATFORMS": "cpu",
    "PYTHONPATH": "/root/repo",
}


def run_cli(args, stdin=b""):
    return subprocess.run(
        [sys.executable, "-m", "fastqpacker_tpu.cli.fqpack", *args],
        input=stdin, capture_output=True, env=ENV, cwd="/root/repo",
    )


def test_cli_paired_roundtrip(tmp_path):
    f1 = tmp_path / "r1.fq"
    f2 = tmp_path / "r2.fq.gz"  # mate input may be gzipped
    fz = tmp_path / "pe.fqz"
    o1 = tmp_path / "o1.fq"
    o2 = tmp_path / "o2.fq"
    f1.write_bytes(R1)
    f2.write_bytes(gzip.compress(R2))
    p = run_cli(["-i", str(f1), "--pair", str(f2), "-o", str(fz)])
    assert p.returncode == 0, p.stderr
    p = run_cli(["info", str(fz)])
    assert b"paired-end" in p.stdout
    p = run_cli(["-d", "-i", str(fz), "-o", str(o1), "--pair", str(o2)])
    assert p.returncode == 0, p.stderr
    assert o1.read_bytes() == R1
    assert o2.read_bytes() == R2


def test_cli_paired_mismatch_errors(tmp_path):
    f1 = tmp_path / "r1.fq"
    f2 = tmp_path / "r2.fq"
    f1.write_bytes(R1)
    f2.write_bytes(mate_files(99, "2"))
    p = run_cli(["-i", str(f1), "--pair", str(f2), "-c"])
    assert p.returncode == 1
    assert b"different record counts" in p.stderr
