"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from fastqpacker_tpu.ops import reference as refops
from fastqpacker_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return pmesh.make_mesh(8)


def _batch(d, r, l, seed=0):
    rng = np.random.default_rng(seed)
    ab = np.frombuffer(b"ACGTN", np.uint8)
    seq = ab[rng.integers(0, 5, size=(d * r, l))].astype(np.uint8)
    qual = rng.integers(33, 75, size=(d * r, l)).astype(np.uint8)
    lengths = np.full(d * r, l, dtype=np.int32)
    return seq, qual, lengths


def test_sharded_encode_matches_reference(mesh8):
    d, r, l = 8, 16, 64
    seq, qual, lengths = _batch(d, r, l)
    enc, offsets = pmesh.encode_blocks_parallel(seq, qual, lengths, 33, mesh8)

    ref = refops.encode_block_arrays(seq, qual, lengths, 33)
    np.testing.assert_array_equal(np.asarray(enc.packed), ref.packed)
    np.testing.assert_array_equal(np.asarray(enc.n_counts), ref.n_counts)
    np.testing.assert_array_equal(np.asarray(enc.nmask_bits), ref.nmask_bits)
    np.testing.assert_array_equal(np.asarray(enc.qual_delta), ref.qual_delta)


def test_sharded_offsets_are_exclusive_prefix(mesh8):
    d, r, l = 8, 4, 32
    seq, qual, lengths = _batch(d, r, l, seed=1)
    _, offsets = pmesh.encode_blocks_parallel(seq, qual, lengths, 33, mesh8)
    offsets = np.asarray(offsets)
    # uniform shards -> per-shard size identical
    per_shard = r * ((l + 3) // 4) + r * l + 4 * r
    np.testing.assert_array_equal(
        offsets, np.arange(d, dtype=np.int64) * per_shard
    )


def test_sharded_decode_roundtrip(mesh8):
    d, r, l = 8, 8, 40
    seq, qual, lengths = _batch(d, r, l, seed=2)
    seq = np.where(seq == ord("N"), ord("A"), seq).astype(np.uint8)
    enc, _ = pmesh.encode_blocks_parallel(seq, qual, lengths, 33, mesh8)
    s, q = pmesh.decode_sharded(
        enc.packed, enc.qual_delta, jax.numpy.asarray(lengths),
        qual_offset=33, mesh=mesh8,
    )
    np.testing.assert_array_equal(np.asarray(s), seq)
    np.testing.assert_array_equal(np.asarray(q), qual)


def test_input_sharding_is_row_partitioned(mesh8):
    d, r, l = 8, 4, 32
    seq, qual, lengths = _batch(d, r, l, seed=3)
    enc, _ = pmesh.encode_blocks_parallel(seq, qual, lengths, 33, mesh8)
    shard_rows = {s.data.shape[0] for s in enc.packed.addressable_shards}
    assert shard_rows == {r}


def test_uneven_batch_rejected(mesh8):
    seq, qual, lengths = _batch(1, 9, 16)
    with pytest.raises(ValueError, match="not divisible"):
        pmesh.encode_blocks_parallel(seq, qual, lengths, 33, mesh8)


def test_sharded_entropy_roundtrip(mesh8):
    """Full sharded entropy stage: per-shard lane rANS encode with
    in-program word-count all_gather, then sharded decode, byte-exact."""
    import jax.numpy as jnp

    from fastqpacker_tpu.ops import rans

    rng = np.random.default_rng(31)
    d, m = 8, 1024
    streams = rng.integers(0, 40, (d, m)).astype(np.uint8)
    freq_cum, pad_sym = pmesh.entropy_table(streams)
    words, states, totals, offsets = pmesh.entropy_encode_sharded(
        jnp.asarray(streams), jnp.asarray(freq_cum),
        mesh=mesh8, pad_sym=pad_sym, m_per_shard=m,
    )
    tot = np.asarray(totals)
    offs = np.asarray(offsets)
    np.testing.assert_array_equal(np.cumsum(tot) - tot, offs)

    freq = np.asarray(freq_cum)[0].astype(np.uint16)
    tabs = rans.compact_tables(freq)
    out = pmesh.entropy_decode_sharded(
        words, states, jnp.asarray(tabs), mesh=mesh8, m_per_shard=m,
    )
    np.testing.assert_array_equal(np.asarray(out), streams)
