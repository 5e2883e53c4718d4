"""Device-kernel vs numpy-reference equivalence tests.

The edge-case inventory follows the reference's unit tests (SURVEY.md §4):
N runs, lowercase, Phred+64, 1-3 base remainders, empty rows, padding,
wraparound deltas — on random inputs.
"""

import numpy as np
import pytest

from fastqpacker_tpu.ops import device as devops
from fastqpacker_tpu.ops import reference as refops
from fastqpacker_tpu.parser.fastq import QUAL_PAD, SEQ_PAD


def random_block(rng, r, l, uniform=False, alphabet=b"ACGTNacgtRy."):
    lengths = (
        np.full(r, l, dtype=np.int32)
        if uniform
        else rng.integers(0, l + 1, size=r).astype(np.int32)
    )
    seq = np.full((r, l), SEQ_PAD, dtype=np.uint8)
    qual = np.full((r, l), QUAL_PAD, dtype=np.uint8)
    ab = np.frombuffer(bytes(alphabet), np.uint8)
    for i in range(r):
        ln = lengths[i]
        seq[i, :ln] = ab[rng.integers(0, len(ab), ln)]
        qual[i, :ln] = rng.integers(33, 105, ln)
    return seq, qual, lengths


@pytest.mark.parametrize("r,l,uniform", [(8, 152, True), (16, 31, False), (5, 1, False), (3, 4, True)])
@pytest.mark.parametrize("offset", [33, 64])
def test_encode_equivalence(r, l, uniform, offset):
    rng = np.random.default_rng(r * 1000 + l)
    seq, qual, lengths = random_block(rng, r, l, uniform)

    ref = refops.encode_block_arrays(seq, qual, lengths, offset)
    dev = devops.encode_block_arrays(seq.copy(), qual.copy(), lengths, offset)

    np.testing.assert_array_equal(dev.packed, ref.packed)
    np.testing.assert_array_equal(dev.nmask_bits, ref.nmask_bits)
    np.testing.assert_array_equal(dev.n_counts, ref.n_counts)
    # qual_delta compared only within record lengths (padding is garbage
    # in both but not required to match bit-for-bit)
    col = np.arange(l)[None, :]
    mask = col < lengths[:, None]
    np.testing.assert_array_equal(dev.qual_delta[mask], ref.qual_delta[mask])


@pytest.mark.parametrize("offset", [33, 64])
def test_decode_equivalence(offset):
    rng = np.random.default_rng(99)
    r, l = 12, 77
    seq, qual, lengths = random_block(rng, r, l, alphabet=b"ACGT")
    ref = refops.encode_block_arrays(seq, qual, lengths, offset)

    s_ref, q_ref = refops.decode_block_arrays(
        ref.packed, ref.qual_delta, lengths, offset
    )
    s_dev, q_dev = devops.decode_block_arrays(
        ref.packed.copy(), ref.qual_delta.copy(), lengths, offset
    )
    col = np.arange(l)[None, :]
    mask = col < lengths[:, None]
    np.testing.assert_array_equal(s_dev[mask], s_ref[mask])
    np.testing.assert_array_equal(q_dev[mask], q_ref[mask])
    # and the decode actually inverts the encode
    np.testing.assert_array_equal(s_dev[mask], seq[mask])
    np.testing.assert_array_equal(q_dev[mask], qual[mask])


def test_encode_decode_roundtrip_device_only():
    rng = np.random.default_rng(5)
    r, l = 20, 150
    seq, qual, lengths = random_block(rng, r, l, uniform=True, alphabet=b"ACGT")
    enc = devops.encode_block_arrays(seq.copy(), qual.copy(), lengths, 33)
    s, q = devops.decode_block_arrays(enc.packed, enc.qual_delta, lengths, 33)
    np.testing.assert_array_equal(s, seq)
    np.testing.assert_array_equal(q, qual)


def test_nmask_cap_on_device():
    l = refops.MAX_SEQUENCE_LENGTH + 16
    seq = np.full((1, l), ord("A"), dtype=np.uint8)
    seq[0, 3] = ord("N")
    seq[0, refops.MAX_SEQUENCE_LENGTH + 5] = ord("N")  # beyond cap
    qual = np.full((1, l), 40, dtype=np.uint8)
    lengths = np.array([l], dtype=np.int32)
    dev = devops.encode_block_arrays(seq, qual, lengths, 33)
    assert dev.n_counts[0] == 1


def test_empty_width_block():
    seq = np.zeros((4, 0), dtype=np.uint8)
    qual = np.zeros((4, 0), dtype=np.uint8)
    lengths = np.zeros(4, dtype=np.int32)
    dev = devops.encode_block_arrays(seq, qual, lengths, 33)
    assert dev.packed.shape == (4, 0)
    assert dev.n_counts.tolist() == [0, 0, 0, 0]


def test_pipeline_with_device_backend():
    """End-to-end round trip routed through the JAX backend."""
    import fastqpacker_tpu as fq
    from fastqpacker_tpu.pipeline import api

    import io

    rng = np.random.default_rng(11)
    recs = []
    for i in range(200):
        ln = int(rng.integers(1, 200))
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append(f"@dev_{i}\n{s}\n+x{i}\n{q}\n")
    data = "".join(recs).encode()

    out = io.BytesIO()
    api.compress(
        io.BytesIO(data),
        out,
        fq.Options(block_size=64),
        encode_arrays=devops.encode_block_arrays,
    )
    back = io.BytesIO()
    api.decompress(
        io.BytesIO(out.getvalue()),
        back,
        decode_arrays=devops.decode_block_arrays,
    )
    assert back.getvalue() == data
