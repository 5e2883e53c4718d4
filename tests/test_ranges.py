"""Random-access sub-range decompression (pipeline/ranges.py, fqpack cat).

The reference cannot do this ("no streaming decompression",
reference README.md:94); the block container makes it natural. Ranges are
validated against slicing the original FASTQ text for both container
formats, plus the CLI surface.
"""

import io
import os
import subprocess
import sys

import pytest

from fastqpacker_tpu.format import container
from fastqpacker_tpu.pipeline import api, ranges


def synth_fastq(n: int) -> bytes:
    out = []
    for i in range(n):
        seq = "ACGTACGTAC"[(i % 7):] + "GATTACA" * (1 + i % 3)
        out.append(f"@read{i} lane{i % 4}\n{seq}\n+\n{'I' * len(seq)}\n")
    return "".join(out).encode()


def records_slice(text: bytes, start: int, stop: int) -> bytes:
    recs = text.decode().splitlines(keepends=True)
    return "".join(
        "".join(recs[i * 4 : i * 4 + 4]) for i in range(start, stop)
    ).encode()


N_RECORDS = 1037
TEXT = synth_fastq(N_RECORDS)


def make_container(tmp_path, version):
    path = tmp_path / f"v{version}.fqz"
    opts = api.Options(block_size=100, version=version)
    with open(path, "wb") as w:
        if version == container.VERSION_3_NATIVE:
            from fastqpacker_tpu.pipeline import native

            native.compress_native(io.BytesIO(TEXT), w, opts)
        else:
            api.compress(io.BytesIO(TEXT), w, opts)
    return str(path)


@pytest.mark.parametrize(
    "version", [container.VERSION_2, container.VERSION_3_NATIVE]
)
def test_index_totals(tmp_path, version):
    path = make_container(tmp_path, version)
    idx = ranges.index_path(path)
    assert idx.total_records == N_RECORDS
    assert [e.num_records for e in idx.entries] == [100] * 10 + [37]
    assert idx.entries[3].record_start == 300


@pytest.mark.parametrize(
    "version", [container.VERSION_2, container.VERSION_3_NATIVE]
)
@pytest.mark.parametrize(
    "start,stop",
    [
        (0, 5),  # head
        (0, 100),  # exactly one block
        (95, 105),  # straddles a block boundary
        (250, 250),  # empty range
        (333, 777),  # multi-block interior
        (1000, 1037),  # tail into the partial final block
        (0, 1037),  # everything
    ],
)
def test_record_ranges(tmp_path, version, start, stop):
    path = make_container(tmp_path, version)
    idx = ranges.index_path(path)
    got = ranges.read_record_range(path, start, stop, index=idx)
    assert got == records_slice(TEXT, start, stop)


def test_open_stop_and_clamp(tmp_path):
    path = make_container(tmp_path, container.VERSION_2)
    assert ranges.read_record_range(path, 1030) == records_slice(
        TEXT, 1030, N_RECORDS
    )
    # stop beyond EOF clamps
    assert ranges.read_record_range(path, 1030, 99999) == records_slice(
        TEXT, 1030, N_RECORDS
    )
    with pytest.raises(ValueError):
        ranges.read_record_range(path, -1, 5)
    with pytest.raises(ValueError):
        ranges.read_record_range(path, 10, 5)


def test_cat_cli(tmp_path):
    path = make_container(tmp_path, container.VERSION_2)
    env = {
        **os.environ,
        "FQZ_FORCE_CPU": "1",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "/root/repo",
    }
    p = subprocess.run(
        [sys.executable, "-m", "fastqpacker_tpu.cli.fqpack",
         "cat", path, "-r", "95:105"],
        capture_output=True, env=env, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr
    assert p.stdout == records_slice(TEXT, 95, 105)
    # bare N = single record
    p = subprocess.run(
        [sys.executable, "-m", "fastqpacker_tpu.cli.fqpack",
         "cat", path, "-r", "7"],
        capture_output=True, env=env, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr
    assert p.stdout == records_slice(TEXT, 7, 8)
    # invalid range errors out
    p = subprocess.run(
        [sys.executable, "-m", "fastqpacker_tpu.cli.fqpack",
         "cat", path, "-r", "9:3"],
        capture_output=True, env=env, cwd="/root/repo",
    )
    assert p.returncode == 1
    assert b"invalid record range" in p.stderr


def test_bench_subcommand_smoke(tmp_path):
    env = {
        **os.environ,
        "FQZ_FORCE_CPU": "1",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "/root/repo",
    }
    p = subprocess.run(
        [sys.executable, "-m", "fastqpacker_tpu.cli.fqpack",
         "bench", "--mb", "1"],
        capture_output=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert p.returncode == 0, p.stderr
    assert b'"metric"' in p.stdout.splitlines()[-1]
