"""Pallas fused-encode kernel equivalence tests (interpret mode on CPU)."""

import numpy as np
import pytest

from fastqpacker_tpu.ops import pallas_kernels as pk
from fastqpacker_tpu.ops import reference as refops
from fastqpacker_tpu.parser.fastq import QUAL_PAD, SEQ_PAD


def random_block(rng, r, l, alphabet=b"ACGTNacgt."):
    lengths = rng.integers(0, l + 1, size=r).astype(np.int32)
    lengths[0] = l  # at least one full row
    seq = np.full((r, l), SEQ_PAD, dtype=np.uint8)
    qual = np.full((r, l), QUAL_PAD, dtype=np.uint8)
    ab = np.frombuffer(bytes(alphabet), np.uint8)
    for i in range(r):
        ln = lengths[i]
        seq[i, :ln] = ab[rng.integers(0, len(ab), ln)]
        qual[i, :ln] = rng.integers(33, 105, ln)
    return seq, qual, lengths


@pytest.mark.parametrize("r,l", [(8, 152), (16, 31), (4, 8), (300, 64)])
@pytest.mark.parametrize("offset", [33, 64])
def test_pallas_encode_matches_reference(r, l, offset):
    rng = np.random.default_rng(r * 100 + l + offset)
    seq, qual, lengths = random_block(rng, r, l)

    ref = refops.encode_block_arrays(seq, qual, lengths, offset)
    got = pk.encode_block_arrays(
        seq.copy(), qual.copy(), lengths, offset, interpret=True
    )

    np.testing.assert_array_equal(got.packed, ref.packed)
    np.testing.assert_array_equal(got.nmask_bits, ref.nmask_bits)
    np.testing.assert_array_equal(got.n_counts, ref.n_counts)
    col = np.arange(l)[None, :]
    mask = col < lengths[:, None]
    np.testing.assert_array_equal(got.qual_delta[mask], ref.qual_delta[mask])


def test_pallas_encode_in_pipeline():
    """Full round trip with the Pallas backend doing the dense encode."""
    import io
    from functools import partial

    import fastqpacker_tpu as fq
    from fastqpacker_tpu.pipeline import api

    rng = np.random.default_rng(7)
    recs = []
    for i in range(150):
        ln = int(rng.integers(1, 180))
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append(f"@pl_{i}\n{s}\n+\n{q}\n")
    data = "".join(recs).encode()

    out = io.BytesIO()
    api.compress(
        io.BytesIO(data),
        out,
        fq.Options(block_size=50),
        encode_arrays=partial(pk.encode_block_arrays, interpret=True),
    )
    assert fq.decompress_bytes(out.getvalue()) == data


@pytest.mark.parametrize("r,l", [(8, 152), (16, 31), (4, 8), (300, 64)])
@pytest.mark.parametrize("offset", [33, 64])
def test_pallas_decode_matches_host(r, l, offset):
    """Fused Pallas decode == host decode on encode outputs (ACGT body;
    N restoration is the caller's job on both backends)."""
    from fastqpacker_tpu.pipeline import blocks as blockcodec

    rng = np.random.default_rng(r * 31 + l + offset)
    seq, qual, lengths = random_block(rng, r, l, alphabet=b"ACGT")
    enc = refops.encode_block_arrays(seq, qual, lengths, offset)

    ref_seq, ref_qual = blockcodec.host_decode_arrays(
        enc.packed, enc.qual_delta.copy(), lengths, offset
    )
    got_seq, got_qual = pk.decode_block_arrays(
        enc.packed, enc.qual_delta.copy(), lengths, offset, interpret=True
    )
    col = np.arange(l)[None, :]
    mask = col < lengths[:, None]
    np.testing.assert_array_equal(got_seq[mask], np.asarray(ref_seq)[mask])
    np.testing.assert_array_equal(
        got_qual[mask], np.asarray(ref_qual)[mask]
    )


def test_pallas_decode_in_pipeline():
    """Full decompress with the Pallas backend doing the dense decode."""
    import io
    from functools import partial

    import fastqpacker_tpu as fq
    from fastqpacker_tpu.pipeline import api

    rng = np.random.default_rng(9)
    recs = []
    for i in range(120):
        ln = int(rng.integers(1, 170))
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append(f"@pd_{i}\n{s}\n+\n{q}\n")
    data = "".join(recs).encode()

    comp = fq.compress_bytes(data, fq.Options(block_size=40))
    out = io.BytesIO()
    api.decompress(
        io.BytesIO(comp),
        out,
        decode_arrays=partial(pk.decode_block_arrays, interpret=True),
    )
    assert out.getvalue() == data
