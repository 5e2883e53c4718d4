"""Order-1 context-modeled quality coder (ops/qualctx.py, v3 TAG_QCTX).

Follows the codebase invariant: the numpy reference defines semantics and
the C++ backend must be byte-equivalent on random varlen inputs; the v3
container integration is exercised end-to-end including the --max-ratio
CLI surface and corrupt-data behavior.
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from fastqpacker_tpu.format import container
from fastqpacker_tpu.ops import qualctx
from fastqpacker_tpu.pipeline import api, native
from fastqpacker_tpu.runtime import bindings


def walk_qualities(rng, lengths, lo=2, hi=41):
    total = int(lengths.sum())
    steps = rng.integers(-2, 3, total)
    return np.clip(np.cumsum(steps) + 30, lo, hi).astype(np.uint8)


def binned_qualities(rng, lengths):
    """Illumina RTA3-style binned values with sticky runs."""
    total = int(lengths.sum())
    levels = np.array([2, 12, 23, 37], np.uint8)
    state = rng.integers(0, 4, total)
    sticky = rng.random(total) < 0.9
    for i in range(1, total):
        if sticky[i]:
            state[i] = state[i - 1]
    return levels[state]


CASES = [
    ("empty", np.zeros(0, np.int64), None),
    ("all-zero-lengths", np.zeros(7, np.int64), None),
    ("single-record", np.array([151], np.int64), "walk"),
    ("varlen", None, "walk"),
    ("varlen-binned", None, "binned"),
    ("uniform-random", None, "uniform"),
]


@pytest.mark.parametrize("name,lengths,kind", CASES)
def test_native_reference_equivalence(name, lengths, kind):
    rng = np.random.default_rng(hash(name) % 2**32)
    if lengths is None:
        lengths = rng.integers(0, 200, size=333).astype(np.int64)
    if kind == "uniform":
        raw = rng.integers(0, 94, int(lengths.sum())).astype(np.uint8)
    elif kind == "binned":
        raw = binned_qualities(rng, lengths)
    elif kind == "walk":
        raw = walk_qualities(rng, lengths)
    else:
        raw = np.zeros(0, np.uint8)
    delta = qualctx.deintegrate(raw, lengths)

    ref = qualctx.encode_reference(delta, lengths)
    if bindings.available():
        nat = qualctx.encode(delta, lengths)
        assert nat == ref, "native encode must be byte-equal to reference"
        assert qualctx.decode(ref, lengths) == delta
    assert qualctx.decode_reference(ref, lengths) == delta


def test_integrate_deintegrate_inverse():
    rng = np.random.default_rng(3)
    lengths = rng.integers(0, 60, 50).astype(np.int64)
    raw = rng.integers(0, 250, int(lengths.sum())).astype(np.uint8)
    delta = np.frombuffer(qualctx.deintegrate(raw, lengths), np.uint8)
    assert qualctx.integrate(delta, lengths).tobytes() == raw.tobytes()


def test_length_mismatch_raises():
    with pytest.raises(ValueError, match="does not match"):
        qualctx.encode(b"\x01\x02\x03", np.array([2], np.int64))


def test_corrupt_payload_raises():
    rng = np.random.default_rng(9)
    lengths = np.full(50, 100, np.int64)
    raw = binned_qualities(rng, lengths)
    delta = qualctx.deintegrate(raw, lengths)
    payload = bytearray(qualctx.encode(delta, lengths))
    # a flip must either raise or decode to wrong bytes (the container's
    # block CRC32 catches the latter; see the v3 corruption test below) —
    # never silently round-trip
    for pos in (4, 9, len(payload) // 2, len(payload) - 3):
        bad = bytearray(payload)
        bad[pos] ^= 0xFF
        try:
            out = qualctx.decode(bytes(bad), lengths)
        except ValueError:
            continue
        assert out != delta


def test_estimate_tracks_actual():
    rng = np.random.default_rng(11)
    lengths = np.full(2000, 151, np.int64)
    raw = binned_qualities(rng, lengths)
    delta = qualctx.deintegrate(raw, lengths)
    _, hist2 = qualctx.prepare(np.frombuffer(delta, np.uint8), lengths)
    _, est = qualctx.pick_model(hist2)
    actual = len(qualctx.encode(delta, lengths))
    assert 0.7 * actual < est < 1.3 * actual


def synth_fastq_binned(n_rec: int, L: int = 151) -> bytes:
    rng = np.random.default_rng(5)
    lengths = np.full(n_rec, L, np.int64)
    qual = (binned_qualities(rng, lengths) + 33).astype(np.uint8)
    seq = rng.choice(list(b"ACGT"), size=n_rec * L).astype(np.uint8)
    out = []
    for i in range(n_rec):
        out.append(
            b"@r%d\n%s\n+\n%s\n"
            % (
                i,
                seq[i * L : (i + 1) * L].tobytes(),
                qual[i * L : (i + 1) * L].tobytes(),
            )
        )
    return b"".join(out)


TEXT = synth_fastq_binned(3000)


def _qual_tag(buf: io.BytesIO) -> int:
    buf.seek(0)
    fh = container.read_file_header(buf)
    hdr = container.read_block_header(buf, fh.version)
    buf.seek(hdr.seq_data_size, os.SEEK_CUR)
    return buf.read(1)[0]


def test_v3_max_ratio_roundtrip_and_wins():
    opts0 = api.Options(version=container.VERSION_3_NATIVE)
    opts1 = api.Options(
        version=container.VERSION_3_NATIVE, order1_qual=True
    )
    c0, c1 = io.BytesIO(), io.BytesIO()
    native.compress_native(io.BytesIO(TEXT), c0, opts0)
    native.compress_native(io.BytesIO(TEXT), c1, opts1)
    assert api.decompress_bytes(c1.getvalue()) == TEXT
    assert api.decompress_bytes(c0.getvalue()) == TEXT
    # on binned (rans-class) data the order-1 model wins the pick in BOTH
    # modes: it replaces a would-be order-0 rANS pick even at default
    # settings (strictly smaller and faster to decode on host)
    assert len(c1.getvalue()) <= len(c0.getvalue())
    assert _qual_tag(c1) == native.TAG_QCTX
    assert _qual_tag(c0) == native.TAG_QCTX


def test_v3_qctx_block_crc_catches_corruption():
    opts = api.Options(version=container.VERSION_3_NATIVE, order1_qual=True)
    comp = io.BytesIO()
    native.compress_native(io.BytesIO(TEXT), comp, opts)
    from fastqpacker_tpu.entropy.zstd import ZstdError

    data = bytearray(comp.getvalue())
    data[len(data) // 2] ^= 0x01
    with pytest.raises((container.FormatError, ValueError, ZstdError)):
        api.decompress_bytes(bytes(data))


ENV = {
    **os.environ,
    "FQZ_FORCE_CPU": "1",
    "JAX_PLATFORMS": "cpu",
    "PYTHONPATH": "/root/repo",
}


def run_cli(args, stdin=b"", extra_env=None):
    return subprocess.run(
        [sys.executable, "-m", "fastqpacker_tpu.cli.fqpack", *args],
        input=stdin, capture_output=True,
        env={**ENV, **(extra_env or {})}, cwd="/root/repo",
    )


def test_cli_max_ratio_roundtrip(tmp_path):
    fin = tmp_path / "in.fq"
    fz = tmp_path / "out.fqz"
    fin.write_bytes(TEXT)
    p = run_cli(["--max-ratio", "-i", str(fin), "-o", str(fz)])
    assert p.returncode == 0, p.stderr
    p = run_cli(["-d", "-i", str(fz), "-c"])
    assert p.returncode == 0, p.stderr
    assert p.stdout == TEXT


def test_qctx_container_decodes_without_native_runtime(tmp_path):
    """A qctx container must decode on the numpy-only fallback path."""
    small = synth_fastq_binned(400, 60)
    fin = tmp_path / "in.fq"
    fz = tmp_path / "out.fqz"
    fin.write_bytes(small)
    p = run_cli(["--max-ratio", "-i", str(fin), "-o", str(fz)])
    assert p.returncode == 0, p.stderr
    p = run_cli(
        ["-d", "-i", str(fz), "-c"], extra_env={"FQZ_NO_NATIVE": "1"}
    )
    assert p.returncode == 0, p.stderr
    assert p.stdout == small


def test_order2_model_picked_and_byte_identical():
    """Sticky binned qualities favor the order-2 model (prev2 bucket);
    the pick must engage, reference and native must stay byte-identical,
    and both decoders must read it."""
    rng = np.random.default_rng(21)
    nrec, L = 20_000, 151  # enough symbols that prev2 beats its table cost
    lengths = np.full(nrec, L, np.int64)
    levels = np.array([2, 12, 23, 37], np.uint8)
    q = levels[
        np.clip(
            (np.cumsum(rng.integers(-1, 2, (nrec, L)), axis=1) // 6) % 4,
            0, 3,
        )
    ]
    delta = np.diff(
        np.concatenate([np.zeros((nrec, 1), np.uint8), q], axis=1).astype(
            np.int16
        ),
        axis=1,
    ).astype(np.uint8).reshape(-1).tobytes()

    _, hist2 = qualctx.prepare(np.frombuffer(delta, np.uint8), lengths)
    model, _ = qualctx.pick_model(hist2)
    assert model == 1

    enc_ref = qualctx.encode_reference(delta, lengths)
    enc_nat = qualctx.encode(delta, lengths)
    assert enc_ref == enc_nat
    assert enc_ref[5] == 1  # model byte
    assert qualctx.decode_reference(enc_ref, lengths) == delta
    assert qualctx.decode(enc_ref, lengths) == delta


def test_model_byte_zero_reads_as_order1():
    """Pre-model containers carried zero in the pad byte; they must keep
    decoding as the order-1 model (wire back-compat)."""
    rng = np.random.default_rng(22)
    lengths = np.full(50, 80, np.int64)
    delta = rng.integers(0, 3, 4000).astype(np.uint8).tobytes()
    enc = qualctx.encode(delta, lengths)
    if enc[5] == 0:  # order-1 picked: exactly the legacy layout
        assert qualctx.decode(enc, lengths) == delta
