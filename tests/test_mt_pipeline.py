"""Whole-file native MT pipeline (fq_compress_mt / fq_decompress_mt).

The MT path must be byte-identical to the per-block ThreadPoolExecutor
path in both directions, across sinks (fd vs buffer) and sources (mmap,
BytesIO, pipe fallback), and must surface the same typed errors.
"""

import io
import os
import struct
import tempfile

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.format import container
from fastqpacker_tpu.runtime import bindings

pytestmark = pytest.mark.skipif(
    not (bindings.available() and bindings.mt_available()),
    reason="native MT pipeline not built",
)


def _fastq(n: int, seed: int = 0, read_len: int = 60) -> bytes:
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    out = []
    for i in range(n):
        ln = read_len + int(rng.integers(-5, 6))
        seq = bases[rng.integers(0, 5, ln)].tobytes()
        qual = (rng.integers(33, 74, ln).astype(np.uint8)).tobytes()
        out.append(b"@read%d x:%d\n%s\n+\n%s\n" % (i, i % 7, seq, qual))
    return b"".join(out)


def _per_block_compress(data: bytes, opts=None) -> bytes:
    """Reference output: the per-block pipeline with MT routing disabled."""
    from fastqpacker_tpu.pipeline import api

    out = io.BytesIO()
    real = bindings.mt_available
    bindings.mt_available = lambda: False
    try:
        api.compress(io.BytesIO(data), out, opts)
    finally:
        bindings.mt_available = real
    return out.getvalue()


def _per_block_decompress(comp: bytes) -> bytes:
    from fastqpacker_tpu.pipeline import api

    out = io.BytesIO()
    real = bindings.mt_available
    bindings.mt_available = lambda: False
    try:
        api.decompress(io.BytesIO(comp), out)
    finally:
        bindings.mt_available = real
    return out.getvalue()


@pytest.mark.parametrize("workers", [1, 2, 4])
def test_mt_identical_to_per_block(workers):
    data = _fastq(3000, seed=1)
    opts = fq.Options(block_size=256, workers=workers)
    ref = _per_block_compress(data, opts)
    mt = fq.compress_bytes(data, opts)
    assert mt == ref
    assert _per_block_decompress(mt) == data
    assert fq.decompress_bytes(mt) == data


def test_mt_fd_mode_matches_buffer_mode():
    data = _fastq(2000, seed=2)
    opts = fq.Options(block_size=300)
    buf_mode = fq.compress_bytes(data, opts)
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.fq")
        dst = os.path.join(d, "out.fqz")
        back = os.path.join(d, "back.fq")
        with open(src, "wb") as f:
            f.write(data)
        with open(src, "rb") as r, open(dst, "wb") as w:
            fq.compress(r, w, opts)  # mmap source + fd sink
        assert open(dst, "rb").read() == buf_mode
        with open(dst, "rb") as r, open(back, "wb") as w:
            fq.decompress(r, w)
        assert open(back, "rb").read() == data


def test_mt_pipe_source_falls_back_streaming():
    """Non-addressable sources must keep working (streaming per-block
    path) and produce the same container bytes."""
    data = _fastq(500, seed=3)
    opts = fq.Options(block_size=100)
    ref = fq.compress_bytes(data, opts)

    class PipeLike(io.RawIOBase):
        def __init__(self, payload):
            self._b = io.BytesIO(payload)

        def readable(self):
            return True

        def read(self, n=-1):
            return self._b.read(n)

        def readinto(self, b):
            return self._b.readinto(b)

    out = io.BytesIO()
    fq.compress(io.BufferedReader(PipeLike(data)), out, opts)
    assert out.getvalue() == ref


def test_mt_phred64_and_v1():
    recs = []
    for i in range(300):
        recs.append(b"@r%d\nACGTACGTAA\n+\nhhhhhhhhhh\n" % i)
    data = b"".join(recs)
    for version in (container.VERSION_1, container.VERSION_2):
        opts = fq.Options(block_size=64, version=version)
        mt = fq.compress_bytes(data, opts)
        assert mt == _per_block_compress(data, opts)
        assert mt[9] & container.FLAG_PHRED64
        assert fq.decompress_bytes(mt) == data


def test_mt_midfile_parse_error():
    good = _fastq(400, seed=4)
    bad = good + b"not-a-header\nACGT\n+\nIIII\n"
    from fastqpacker_tpu.parser.fastq import FastqParseError

    with pytest.raises(FastqParseError, match="header line must start"):
        fq.compress_bytes(bad, fq.Options(block_size=50))


def test_mt_ambiguous_overflow_error_matches():
    long_seq = b"A" * 70000 + b"N"
    qual = b"I" * 70001
    data = b"@long\n" + long_seq + b"\n+\n" + qual + b"\n"
    with pytest.raises(ValueError, match="ambiguous bases beyond position"):
        fq.compress_bytes(data)


def test_mt_truncated_and_corrupt_errors_match_per_block():
    data = _fastq(600, seed=5)
    comp = fq.compress_bytes(data, fq.Options(block_size=100))
    # truncated payload
    cut = comp[: len(comp) - 7]
    with pytest.raises(container.FormatError):
        fq.decompress_bytes(cut)
    # corrupted zstd frame
    mut = bytearray(comp)
    mut[len(mut) // 2] ^= 0xFF
    with pytest.raises((RuntimeError, ValueError)) as ei:
        fq.decompress_bytes(bytes(mut))
    with pytest.raises((RuntimeError, ValueError)) as ei2:
        _per_block_decompress(bytes(mut))
    assert str(ei.value) == str(ei2.value)


def test_mt_foreign_frames_fall_back():
    """Frames without declared content sizes (streaming encoders) must
    route to the per-block fallback and still decode."""
    zstandard = pytest.importorskip("zstandard")
    data = _fastq(50, seed=6)
    comp = fq.compress_bytes(data, fq.Options(block_size=50))
    fh, rest = comp[:10], comp[10:]
    hdr = rest[: container.BLOCK_HEADER_SIZE_V2]
    payload = rest[container.BLOCK_HEADER_SIZE_V2 :]
    sizes = list(struct.unpack("<9I", hdr))
    comp_sizes = sizes[1:7]
    # re-encode each stream with a streaming writer (no content size)
    dctx = zstandard.ZstdDecompressor()
    new_frames, off = [], 0
    for cs in comp_sizes:
        raw = dctx.decompress(
            payload[off : off + cs], max_output_size=1 << 26
        )
        off += cs
        buf = io.BytesIO()
        cctx = zstandard.ZstdCompressor(level=1)
        with cctx.stream_writer(buf, closefd=False) as sw:
            sw.write(raw)
        new_frames.append(buf.getvalue())
    sizes[1:7] = [len(f) for f in new_frames]
    rebuilt = fh + struct.pack("<9I", *sizes) + b"".join(new_frames)
    assert fq.decompress_bytes(rebuilt) == data


def test_mt_empty_and_tiny():
    assert fq.compress_bytes(b"") == _per_block_compress(b"")
    one = b"@r\nA\n+\nI\n"
    assert fq.compress_bytes(one) == _per_block_compress(one)
    assert fq.decompress_bytes(fq.compress_bytes(one)) == one


def test_mt_fd_write_failure_surfaces_oserror():
    """A failing output fd (closed write end of a pipe) must surface a
    typed OSError from the native writer, not hang or abort."""
    import os

    data = _fastq(800, seed=7)
    rfd, wfd = os.pipe()
    os.close(rfd)  # writes now fail with EPIPE
    import signal

    old = signal.signal(signal.SIGPIPE, signal.SIG_IGN)
    try:
        with os.fdopen(wfd, "wb", buffering=0) as w, tempfile.NamedTemporaryFile(
            suffix=".fq"
        ) as f:
            f.write(data)
            f.flush()
            with open(f.name, "rb") as r:
                with pytest.raises(OSError):
                    fq.compress(r, w, fq.Options(block_size=100))
    finally:
        signal.signal(signal.SIGPIPE, old)


def test_transform_wrapper_sink_not_pierced():
    """A GzipFile sink exposes fileno(), but bytes must flow through its
    write() — the fd fast path once bypassed the transform and wrote raw
    FASTQ into the gzip file (E049)."""
    import gzip

    data = _fastq(500, seed=9)
    comp = fq.compress_bytes(data, fq.Options(block_size=100))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.fastq.gz")
        with open(path, "wb") as f:
            gz = gzip.GzipFile(fileobj=f, mode="wb")
            fq.decompress(io.BytesIO(comp), gz)
            gz.close()
        assert gzip.open(path, "rb").read() == data
        # compress direction too
        cpath = os.path.join(d, "out.fqz.gz")
        with open(cpath, "wb") as f:
            gz = gzip.GzipFile(fileobj=f, mode="wb")
            fq.compress(io.BytesIO(data), gz, fq.Options(block_size=100))
            gz.close()
        assert gzip.open(cpath, "rb").read() == comp


@pytest.mark.skipif(
    bool(os.environ.get("FQZ_SANITIZE")),
    reason="ASan aborts inside operator new on huge requests before the "
    "bad_alloc our typed-error contract catches",
)
def test_huge_block_size_never_aborts():
    """Caller-sized native allocations must fail typed or succeed, never
    abort the process via bad_alloc across the C ABI (E049). Since the
    r3 prelude rework the MT path no longer allocates a
    block_records-sized offsets table, so a huge -b simply produces one
    big block — accept either outcome, require no crash."""
    data = b"@r\nACGT\n+\nIIII\n" * 10
    try:
        comp = fq.compress_bytes(data, fq.Options(block_size=1 << 45))
    except (RuntimeError, MemoryError):
        return
    assert fq.decompress_bytes(comp) == data


# ---------------------------------------------------------------------------
# Fused scan+encode path (E056): blocks 1+ are parsed, validated, and
# encoded in a single pass from light line-count framing. These pin the
# byte identity and the error semantics of that path.
# ---------------------------------------------------------------------------


def _adversarial_fastq() -> bytes:
    """CRLF lines, empty sequences, plus payloads, lowercase, Ns, and a
    partial trailing record — every parser edge in one corpus."""
    import random

    random.seed(7)
    recs = []
    for i in range(4000):
        ln = random.choice([0, 1, 2, 3, 5, 31, 32, 33, 151, 152])
        seq = "".join(random.choice("ACGTNacgt") for _ in range(ln))
        q = "".join(chr(random.randint(33, 74)) for _ in range(ln))
        plus = "+payload%d" % i if i % 3 == 0 else "+"
        eol = "\r\n" if i % 5 == 0 else "\n"
        recs.append(f"@read{i} desc{eol}{seq}{eol}{plus}{eol}{q}{eol}")
    recs.append("@tail\nACG")  # unterminated partial record
    return "".join(recs).encode()


def test_fused_identical_to_per_block_adversarial():
    data = _adversarial_fastq()
    opts = fq.Options(block_size=300)  # many fused blocks + short tail
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "in.fq")
        with open(path, "wb") as f:
            f.write(data)
        out = io.BytesIO()
        with open(path, "rb") as r:  # file source -> MT fused path
            fq.compress(r, out, opts)
    assert out.getvalue() == _per_block_compress(data, opts)
    # normalizing round trip agrees between paths too
    assert fq.decompress_bytes(out.getvalue()) == _per_block_decompress(
        out.getvalue()
    )


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda p: p.__setitem__(333, p[333].replace("@r333", "r333")),
         "header line must start"),
        (lambda p: p.__setitem__(290, "@r290\nACGTACGT\n+\nIII\n"),
         "lengths must match"),
        (lambda p: p.__setitem__(320, "@r320\nACGT\nX\nIIII\n"),
         "separator line must start"),
    ],
)
def test_fused_parse_errors_in_later_blocks(mutate, match):
    from fastqpacker_tpu.parser.fastq import FastqParseError

    parts = [f"@r{i}\nACGTACGT\n+\nIIIIIIII\n" for i in range(400)]
    mutate(parts)
    data = "".join(parts).encode()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "in.fq")
        with open(path, "wb") as f:
            f.write(data)
        with pytest.raises(FastqParseError, match=match):
            with open(path, "rb") as r:
                fq.compress(r, io.BytesIO(), fq.Options(block_size=100))


def test_fused_ambiguous_overflow_in_later_block():
    long_seq = "A" * 65536 + "N" + "A" * 10
    parts = [f"@r{i}\nACGTACGT\n+\nIIIIIIII\n" for i in range(150)]
    parts[120] = "@long\n" + long_seq + "\n+\n" + "I" * len(long_seq) + "\n"
    data = "".join(parts).encode()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "in.fq")
        with open(path, "wb") as f:
            f.write(data)
        # row is block-relative: record 120 is row 20 of block 1
        with pytest.raises(ValueError, match="record 20.*ambiguous bases"):
            with open(path, "rb") as r:
                fq.compress(r, io.BytesIO(), fq.Options(block_size=100))


def test_fused_parse_error_beats_ambiguous_overflow():
    """The offs-table path scans (validates) a whole block before the
    ambiguity check; the fused path must keep that precedence even though
    it meets the ambiguous record first."""
    from fastqpacker_tpu.parser.fastq import FastqParseError

    long_seq = "A" * 65536 + "N" + "A" * 10
    parts = [f"@r{i}\nACGTACGT\n+\nIIIIIIII\n" for i in range(200)]
    parts[110] = "@long\n" + long_seq + "\n+\n" + "I" * len(long_seq) + "\n"
    parts[130] = "@r130\nACGT\n+\nIII\n"  # parse error after the ambig row
    data = "".join(parts).encode()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "in.fq")
        with open(path, "wb") as f:
            f.write(data)
        with pytest.raises(FastqParseError, match="lengths must match"):
            with open(path, "rb") as r:
                fq.compress(r, io.BytesIO(), fq.Options(block_size=100))


def test_parser_grow_buffer_never_shrinks_below_filled():
    """After `avg` adapts down on tiny records, one huge record made the
    grow-buffer target smaller than the bytes already read (numpy
    broadcast crash in _blocks_native)."""
    long_seq = "A" * 65536 + "N" + "A" * 10
    recs = [f"@r{i}\nACGTACGT\n+\nIIIIIIII\n" for i in range(150)]
    recs[120] = "@long\n" + long_seq + "\n+\n" + "I" * len(long_seq) + "\n"
    data = "".join(recs).encode()
    # per-block (streaming) path: must fail typed, not crash
    with pytest.raises(ValueError, match="ambiguous bases"):
        _per_block_compress(data, fq.Options(block_size=100))


def test_scatter_file_sink_identical_to_buffered():
    """pwrite-scatter decompress (regular-file sink, r3): byte-identical
    to the buffered/ordered path, including a short final block."""
    data = _fastq(25000, read_len=137)
    comp = fq.compress_bytes(data)
    buffered = fq.decompress_bytes(comp)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.fq")
        with open(path, "wb") as w:
            fq.decompress(io.BytesIO(comp), w)
        with open(path, "rb") as f:
            scattered = f.read()
    assert scattered == buffered == data


def test_scatter_error_truncates_partial_prefix():
    """A corrupted later block must not leave out-of-order pwrites beyond
    the failure point: the surviving file is a prefix of the expected
    text ending at a block boundary."""
    data = _fastq(30000, read_len=101)
    comp = bytearray(fq.compress_bytes(data))
    comp[-50] ^= 0xFF  # corrupt inside the final block's payload
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.fq")
        with pytest.raises(Exception):
            with open(path, "wb") as w:
                fq.decompress(io.BytesIO(bytes(comp)), w)
        with open(path, "rb") as f:
            part = f.read()
    assert data.startswith(part)
    assert len(part) < len(data)


def test_resync_framing_roundtrips_large_files():
    """>=4 MB inputs use parallel resync framing (no whole-file newline
    scan): output must decode byte-identically and block record counts
    must approximate the requested block size."""
    data = _fastq(40000, read_len=120)  # ~10 MB
    assert len(data) > (4 << 20)
    comp = fq.compress_bytes(data)
    assert fq.decompress_bytes(comp) == data
    # block census: v2 header walk
    counts = []
    pos = 10
    while pos < len(comp):
        fields = struct.unpack_from("<9I", comp, pos)
        counts.append(fields[0])
        pos += 36 + sum(fields[1:7])
    from fastqpacker_tpu.pipeline import api

    assert sum(counts) == 40000
    assert all(c > api.SPEED_BLOCK_SIZE // 2 for c in counts[:-1])


def test_resync_framing_seq_env_knob_exact_blocks():
    """FQZ_MT_SEQ_FRAMING=1 forces the exact newline-count scanner: the
    container must be byte-identical to the per-block reference path
    (the fused-encoder oracle, preserved behind the knob)."""
    import subprocess
    import sys

    data = _fastq(30000, read_len=120)
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.fq")
        with open(src, "wb") as f:
            f.write(data)
        outs = {}
        for knob in ("0", "1"):
            out = os.path.join(d, f"out{knob}.fqz")
            env = dict(os.environ, FQZ_MT_SEQ_FRAMING=knob,
                       FQZ_BACKEND="cpu")
            subprocess.run(
                [sys.executable, "-m", "fastqpacker_tpu.cli.fqpack",
                 "-i", src, "-o", out],
                check=True, env=env,
            )
            with open(out, "rb") as f:
                outs[knob] = f.read()
    # both decode to the input; the seq-framing container additionally
    # matches the per-block path byte for byte
    assert fq.decompress_bytes(outs["0"]) == data
    assert fq.decompress_bytes(outs["1"]) == data
    per_block = io.BytesIO()
    from fastqpacker_tpu.pipeline import api

    api.compress(
        io.BytesIO(data), per_block,
        fq.Options(workers=1, block_size=api.SPEED_BLOCK_SIZE),
    )
    assert outs["1"] == per_block.getvalue()


def test_resync_mislock_repair_is_exact():
    """Adversarial corpus where the resync probe CAN lock onto a quality
    line (qual starts '@', seq starts '+', header/plus lengths match):
    the consumed-chain verification must catch any mis-lock and repair
    with the exact scanner — output identical to the sequential path."""
    rec = b"@r000001\n" + b"+ACGTACGTACGTACGTACGTACGTACGTACG\n" \
          + b"+payload\n" + b"@FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF\n"
    n = ((5 << 20) // len(rec)) + 1
    data = rec * n
    assert len(data) > (4 << 20)
    comp = fq.compress_bytes(data)
    out = fq.decompress_bytes(comp)
    # the seq line's '+' is a non-ACGT symbol: normalized to N by spec,
    # so compare against the per-block reference path's output
    ref = fq.decompress_bytes(_per_block_compress(data, fq.Options()))
    assert out == ref
