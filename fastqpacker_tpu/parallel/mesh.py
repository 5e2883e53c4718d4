"""Data-parallel block sharding over a device mesh.

The reference's only parallelism strategy is embarrassingly-parallel
data-parallelism over independent record blocks (goroutine workers,
compress.go:240-403). The TPU-native equivalent implemented here:

- a 1-D ``blocks`` mesh axis over all chips (single- or multi-host);
- block batches sharded row-wise with ``NamedSharding``; the dense encode
  runs per-shard with no cross-chip traffic (XLA partitions the
  elementwise program trivially);
- the ordered-collector step is an ``all_gather`` of per-shard compressed
  sizes inside the compiled program (riding ICI), from which every shard
  computes the exclusive-prefix file offsets of its blocks — the
  deterministic in-order gather design from SURVEY.md §2/§8 (sizes first,
  then payloads written at offsets).

Multi-host execution initializes ``jax.distributed`` and gives each host
its own input byte-range (record-aligned); this module is written against
the mesh abstraction so the same code drives 1 chip, 1 host, or N hosts.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import device as devops

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (records) sharded across chips, columns replicated."""
    return NamedSharding(mesh, P(BLOCK_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


@partial(jax.jit, static_argnames=("qual_offset", "mesh"))
def encode_sharded(
    seq: jax.Array,
    qual: jax.Array,
    lengths: jax.Array,
    *,
    qual_offset: int,
    mesh: Mesh,
) -> tuple[devops.DeviceEncoded, jax.Array]:
    """Sharded encode step + in-program ordered-gather bookkeeping.

    ``seq``/``qual`` are ``(D*R, L)`` batches holding one block of R
    records per device, sharded on the leading axis. Returns the encoded
    arrays (still sharded) plus ``offsets``: for every device-block, the
    exclusive prefix sum of per-block payload sizes — the all-gathered
    "where does my compressed block land in the file" table
    (the TPU replacement for the seqNum collector, compress.go:365-403).
    """
    def local_encode(seq_l, qual_l, lengths_l):
        enc = devops.encode_arrays_jit.__wrapped__(
            seq_l, qual_l, lengths_l, qual_offset
        )
        # Per-shard raw payload size: packed seq + qual bytes + u32 lengths
        # (the dense streams; host-side entropy coding refines this later).
        plen = (lengths_l.astype(jnp.int32) + 3) // 4
        local_size = (
            jnp.sum(plen)
            + jnp.sum(lengths_l.astype(jnp.int32))
            + 4 * lengths_l.shape[0]
        )
        sizes = jax.lax.all_gather(local_size, BLOCK_AXIS)  # (D,)
        offsets = jnp.cumsum(sizes) - sizes  # exclusive prefix
        my_offset = offsets[jax.lax.axis_index(BLOCK_AXIS)][None]
        return enc, my_offset

    spec = P(BLOCK_AXIS, None)
    enc, offsets = jax.shard_map(
        local_encode,
        mesh=mesh,
        in_specs=(spec, spec, P(BLOCK_AXIS)),
        out_specs=(
            devops.DeviceEncoded(
                packed=spec,
                nmask_bits=spec,
                n_counts=P(BLOCK_AXIS),
                qual_delta=spec,
            ),
            P(BLOCK_AXIS),
        ),
    )(seq, qual, lengths)
    return enc, offsets


@partial(jax.jit, static_argnames=("qual_offset", "mesh"))
def decode_sharded(
    packed: jax.Array,
    qual_delta: jax.Array,
    lengths: jax.Array,
    *,
    qual_offset: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Sharded dense decode over the blocks axis."""
    sh = block_sharding(mesh)
    packed = jax.lax.with_sharding_constraint(packed, sh)
    qual_delta = jax.lax.with_sharding_constraint(qual_delta, sh)
    return devops.decode_arrays_jit.__wrapped__(
        packed, qual_delta, lengths, qual_offset
    )


def encode_blocks_parallel(
    seq: np.ndarray,
    qual: np.ndarray,
    lengths: np.ndarray,
    qual_offset: int,
    mesh: Optional[Mesh] = None,
):
    """Host-facing helper: shard a (D*R, L) batch and encode on the mesh."""
    mesh = mesh or make_mesh()
    d = len(mesh.devices.flat)
    if seq.shape[0] % d != 0:
        raise ValueError(
            f"batch rows {seq.shape[0]} not divisible by {d} devices"
        )
    sh = block_sharding(mesh)
    lsh = NamedSharding(mesh, P(BLOCK_AXIS))
    seq_d = jax.device_put(seq, sh)
    qual_d = jax.device_put(qual, sh)
    len_d = jax.device_put(lengths, lsh)
    return encode_sharded(
        seq_d, qual_d, len_d, qual_offset=qual_offset, mesh=mesh
    )


# ---------------------------------------------------------------------------
# Sharded entropy stage (the TPU-resident rANS coder under shard_map)
# ---------------------------------------------------------------------------

ENTROPY_LANES = 256


def _pow2ceil(x: int, lo: int) -> int:
    return max(lo, 1 << max(x - 1, 0).bit_length())


def entropy_table(
    streams: np.ndarray,
    pad_sym: int | None = None,
    raw_lens: np.ndarray | None = None,
    lanes: int = ENTROPY_LANES,
):
    """Group-shared rANS table over ``(D, M)`` per-device streams.

    The per-block host pipeline builds adaptive per-stream tables; the
    sharded device pipeline instead shares one replicated table (as the
    reference fixes the quality encoding from the first batch,
    compress.go:137-154) so the encode step stays a single compiled
    program with no host round-trip. Lane padding symbols are included:
    with ``raw_lens`` given, each stream ``i`` pads only to
    ``ceil(raw_lens[i]/N)*N`` (the per-shard dynamic-steps encode);
    otherwise every stream pads to ``ceil(M/N)*N``.
    Returns (freq_cum (2, 256) u32, pad_sym).
    """
    from ..ops import rans

    d, m = streams.shape
    n_lanes = lanes
    if raw_lens is None:
        steps = -(-m // n_lanes)
        pad_count = (steps * n_lanes - m) * d
        hist = np.bincount(
            streams.reshape(-1), minlength=256
        ).astype(np.int64)
    else:
        lens = np.asarray(raw_lens, np.int64)
        coded = -(-lens // n_lanes) * n_lanes
        pad_count = int((coded - lens).sum())
        hist = np.zeros(256, np.int64)
        for i in range(d):
            hist += np.bincount(streams[i, : lens[i]], minlength=256)
    if pad_sym is None:
        pad_sym = int(np.argmax(hist))
    hist[pad_sym] += pad_count
    freq = rans.normalize_freqs(hist)
    freq_cum = np.stack(
        [freq.astype(np.uint32), rans.cumulative(freq).astype(np.uint32)]
    )
    return freq_cum, pad_sym


@partial(
    jax.jit, static_argnames=("mesh", "pad_sym", "m_per_shard", "lanes")
)
def entropy_encode_sharded(
    streams: jax.Array,  # (D, M) uint8, sharded on axis 0
    freq_cum: jax.Array,  # (2, 256) uint32, replicated
    raw_lens: jax.Array | None = None,  # (D,) int32, sharded; None -> M
    *,
    mesh: Mesh,
    pad_sym: int,
    m_per_shard: int,
    lanes: int = ENTROPY_LANES,
):
    """Per-shard interleaved-lane rANS encode (ops/rans.py kernels) with
    an in-program all_gather of emitted word counts — the entropy stage
    of the fully sharded compress step.

    ``raw_lens`` gives each shard its own stream length: the kernel's
    trip count is a traced scalar, so shards code only
    ``ceil(raw_lens[d]/N)`` steps of their padded row — the same steps a
    standalone ``rans.decode_stream`` of that stream will compute from
    its header, which is what makes the per-shard outputs valid
    standalone wire streams (see ``entropy_encode_streams``). Rows must
    be pre-padded with ``pad_sym`` up to the coded range.

    Returns (words (D, W) u16, states (D, N) u32, totals (D,) i32,
    offsets (D,) i32 — exclusive prefix over shards).
    """
    from ..ops import rans

    N = lanes
    max_steps = -(-m_per_shard // N)
    S = rans._pick_smax(max_steps)

    def local(streams_l, fc, rl):
        stream = streams_l.reshape(-1)  # (M,)
        steps_l = (rl.reshape(()) + (N - 1)) // N
        mat = jnp.full((max_steps * N,), jnp.uint8(pad_sym))
        mat = jax.lax.dynamic_update_slice(mat, stream, (0,))
        padded = jnp.zeros((S, N), dtype=jnp.uint8)
        padded = jax.lax.dynamic_update_slice(
            padded, mat.reshape(max_steps, N), (0, 0)
        )
        emits, emask, states = rans._encode_kernel.__wrapped__(
            padded, steps_l.astype(jnp.int32), fc, S, N
        )
        flat, total = rans._compact_global.__wrapped__(emits, emask, S, N)
        totals = jax.lax.all_gather(total, BLOCK_AXIS)  # (D,)
        offsets = jnp.cumsum(totals) - totals
        return (
            flat[None, :],
            states[None, :],
            totals[jax.lax.axis_index(BLOCK_AXIS)][None],
            offsets[jax.lax.axis_index(BLOCK_AXIS)][None],
        )

    if raw_lens is None:
        raw_lens = jnp.full(
            (streams.shape[0],), m_per_shard, dtype=jnp.int32
        )
    # check_vma off: the rANS kernels' loop-carry inits are unvarying
    # constants that become shard-varying through the body (a false
    # positive for the varying-manual-axes checker)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(), P(BLOCK_AXIS)),
        out_specs=(
            P(BLOCK_AXIS, None),
            P(BLOCK_AXIS, None),
            P(BLOCK_AXIS),
            P(BLOCK_AXIS),
        ),
        check_vma=False,
    )(streams, freq_cum, raw_lens)


@partial(
    jax.jit, static_argnames=("mesh", "pad_sym", "m_per_shard", "lanes")
)
def entropy_encode_sharded_raw(
    streams: jax.Array,  # (D, M) uint8, sharded on axis 0
    freq_cum: jax.Array,  # (2, 256) uint32, replicated
    raw_lens: jax.Array,  # (D,) int32, sharded
    *,
    mesh: Mesh,
    pad_sym: int,
    m_per_shard: int,
    lanes: int = ENTROPY_LANES,
):
    """Device stage of the production rANS encode: per-shard scan +
    emit-bitmask pack + in-program all_gather of word counts. The word
    compaction deliberately stays on HOST (bindings.rans_compact): every
    on-device formulation — scatter, sort, 16M-element prefix sums,
    log-shift routing — hits XLA:TPU de-vectorization (~1-2 GB/s flat-op
    throughput, E057), while the sequential host pass runs at memcpy
    speed on bytes that must reach the host anyway to be written.

    Returns (emits (D, S*N) u16 dense slot matrix, mask_bits (D, S*N/8)
    u8 LSB-first, states (D, N) u32, totals (D,) i32, offsets (D,) i32).
    """
    from ..ops import rans

    N = lanes
    max_steps = -(-m_per_shard // N)
    S = rans._pick_smax(max_steps)

    def local(streams_l, fc, rl):
        stream = streams_l.reshape(-1)
        steps_l = (rl.reshape(()) + (N - 1)) // N
        mat = jnp.full((max_steps * N,), jnp.uint8(pad_sym))
        mat = jax.lax.dynamic_update_slice(mat, stream, (0,))
        padded = jnp.zeros((S, N), dtype=jnp.uint8)
        padded = jax.lax.dynamic_update_slice(
            padded, mat.reshape(max_steps, N), (0, 0)
        )
        emits, emask, states = rans._encode_kernel.__wrapped__(
            padded, steps_l.astype(jnp.int32), fc, S, N
        )
        # LSB-first bitpack in global (step, lane) order: elementwise
        # shifts+adds only (8-wide reduce), no big prefix ops
        bits = emask.reshape(-1, 8).astype(jnp.uint8)
        weights = (jnp.uint8(1) << jax.lax.iota(jnp.uint8, 8))[None, :]
        mask_bits = jnp.sum(
            bits * weights, axis=1, dtype=jnp.uint8
        )
        total = jnp.sum(emask.astype(jnp.int32))
        totals = jax.lax.all_gather(total, BLOCK_AXIS)
        offsets = jnp.cumsum(totals) - totals
        return (
            emits.reshape(-1)[None, :],
            mask_bits[None, :],
            states[None, :],
            totals[jax.lax.axis_index(BLOCK_AXIS)][None],
            offsets[jax.lax.axis_index(BLOCK_AXIS)][None],
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(), P(BLOCK_AXIS)),
        out_specs=(
            P(BLOCK_AXIS, None),
            P(BLOCK_AXIS, None),
            P(BLOCK_AXIS, None),
            P(BLOCK_AXIS),
            P(BLOCK_AXIS),
        ),
        check_vma=False,
    )(streams, freq_cum, raw_lens)


def entropy_encode_streams(
    streams: list[bytes | np.ndarray],
    mesh: Optional[Mesh] = None,
    async_result: bool = False,
):
    """Encode one byte stream per device through the sharded rANS coder
    and return **standalone wire payloads** (the exact
    ``ops/rans.py`` stream format: header, freq table, lane states, word
    count, words) — each decodable independently by
    ``rans.decode_stream`` on any backend. This is the production
    entry the v3 mesh pipeline writes TAG_RANS streams through
    (pipeline/meshpipe.py).

    The group shares one frequency table (computed here, embedded in
    every stream) so the whole batch is a single compiled program with
    no host round-trip between shards; per-stream lengths ride the
    dynamic-steps path. Streams longer than the group are padded on
    host with the table's pad symbol. Empty streams come back as the
    canonical empty payload.

    ``async_result=True`` returns a zero-argument *finisher* instead of
    the payloads: the device programs are dispatched (JAX dispatch is
    asynchronous) but results are not fetched until the finisher runs —
    the caller overlaps the device round with host work (compaction /
    container writes of the previous round; the E057 serialization fix).
    """
    import struct

    from ..ops import rans

    mesh = mesh or make_mesh()
    d = len(mesh.devices.flat)
    if len(streams) != d:
        raise ValueError(f"need {d} streams (one per device), got {len(streams)}")
    rows = [
        np.frombuffer(s, np.uint8) if isinstance(s, (bytes, bytearray)) else s
        for s in streams
    ]
    lens = np.array([len(r) for r in rows], np.int32)
    if int(lens.max(initial=0)) == 0:
        res = [struct.pack(rans.HEADER_FMT, 0, 0)] * d
        return (lambda: res) if async_result else res

    # lane count scales with stream size like rans._pick_lanes: on the
    # real TPU 256 lanes on a multi-MB stream means tens of thousands of
    # tiny sequential fori_loop steps — pure dispatch latency (E057)
    N = rans._pick_lanes(int(lens.max()))
    # bucket the padded width (pow2) to bound recompiles across groups
    m = _pow2ceil(int(lens.max()), N)
    batch = np.empty((d, m), np.uint8)
    freq_cum, pad_sym = None, None
    # table first (needs a cheap pass anyway); then pad rows with pad_sym
    tmp = np.zeros((d, m), np.uint8)
    for i, r in enumerate(rows):
        tmp[i, : len(r)] = r
    freq_cum, pad_sym = entropy_table(tmp, raw_lens=lens, lanes=N)
    batch.fill(pad_sym)
    for i, r in enumerate(rows):
        batch[i, : len(r)] = r

    sh = NamedSharding(mesh, P(BLOCK_AXIS, None))
    lsh = NamedSharding(mesh, P(BLOCK_AXIS))
    emits, mask_bits, states, totals, _ = entropy_encode_sharded_raw(
        jax.device_put(batch, sh),
        jax.device_put(jnp.asarray(freq_cum), replicated(mesh)),
        jax.device_put(lens, lsh),
        mesh=mesh,
        pad_sym=pad_sym,
        m_per_shard=m,
        lanes=N,
    )
    from ..runtime import bindings as rt

    def finish() -> list[bytes]:
        emits_h = np.asarray(emits)
        mask_h = np.asarray(mask_bits)
        states_h = np.asarray(states)
        totals_h = np.asarray(totals)
        freq = freq_cum[0].astype("<u2")
        out = []
        for i in range(d):
            n = int(lens[i])
            if n == 0:
                out.append(struct.pack(rans.HEADER_FMT, 0, 0))
                continue
            words = rt.rans_compact(emits_h[i], mask_h[i])
            assert len(words) == int(totals_h[i])
            payload = bytearray()
            payload += struct.pack(rans.HEADER_FMT, n, N.bit_length() - 1)
            payload += freq.tobytes()
            payload += states_h[i].astype("<u4").tobytes()
            payload += struct.pack("<I", len(words))
            payload += words.astype("<u2").tobytes()
            out.append(bytes(payload))
        return out

    return finish if async_result else finish()


@partial(
    jax.jit, static_argnames=("mesh", "m_per_shard", "lanes")
)
def entropy_decode_sharded(
    words: jax.Array,  # (D, W) uint16, sharded
    states: jax.Array,  # (D, N) uint32, sharded
    tabs: jax.Array,  # (4, B) uint32 compacted decode tables, replicated
    raw_lens: jax.Array | None = None,  # (D,) int32, sharded; None -> M
    *,
    mesh: Mesh,
    m_per_shard: int,
    lanes: int = ENTROPY_LANES,
):
    """Per-shard gather-free rANS decode; inverse of
    :func:`entropy_encode_sharded`. ``raw_lens`` gives each shard its own
    stream length (dynamic step counts, like the encode side); rows
    beyond a shard's length decode as garbage and are ignored by the
    caller. Returns (D, M) uint8."""
    from ..ops import rans

    N = lanes
    max_steps = -(-m_per_shard // N)
    S = rans._pick_smax(max_steps)
    B = tabs.shape[1]

    def local(words_l, states_l, tb, rl):
        steps_l = ((rl.reshape(()) + (N - 1)) // N).astype(jnp.int32)
        # N zeros of tail padding keep the kernel's per-step (base, N)
        # dynamic slices in bounds on the final steps (mirrors the host
        # path's _pow2ceil(total + N, ...) padding)
        wbuf = jnp.concatenate(
            [words_l.reshape(-1), jnp.zeros((N,), jnp.uint16)]
        )
        out_mat, _, _ = rans._decode_kernel_nogather.__wrapped__(
            wbuf, states_l.reshape(-1), steps_l,
            tb, S, N, B,
        )
        flat = out_mat.reshape(-1)[: max_steps * N]
        return jax.lax.dynamic_slice(flat, (0,), (m_per_shard,))[None, :]

    if raw_lens is None:
        raw_lens = jnp.full((words.shape[0],), m_per_shard, dtype=jnp.int32)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(BLOCK_AXIS, None), P(BLOCK_AXIS, None), P(), P(BLOCK_AXIS),
        ),
        out_specs=P(BLOCK_AXIS, None),
        check_vma=False,
    )(words, states, tabs, raw_lens)


def entropy_decode_streams(
    payloads: list[bytes],
    mesh: Optional[Mesh] = None,
) -> list[bytes] | None:
    """Batch-decode one standard rANS wire payload per device on the
    mesh — the decode twin of :func:`entropy_encode_streams`. Returns
    the decoded byte streams, or ``None`` when the group is not
    batchable (mixed lane counts or frequency tables — e.g. containers
    written by the per-block host pipeline, whose tables are
    per-stream): the caller falls back to per-stream decoding. Empty
    payloads decode to empty bytes and don't affect batchability.
    """
    import struct

    from ..ops import rans

    mesh = mesh or make_mesh()
    d = len(mesh.devices.flat)
    if len(payloads) != d:
        raise ValueError(f"need {d} payloads, got {len(payloads)}")
    hdr_size = struct.calcsize(rans.HEADER_FMT)
    parsed = []
    lanes_set = set()
    freq_ref: bytes | None = None
    for p in payloads:
        buf = np.frombuffer(p, np.uint8) if not isinstance(p, np.ndarray) else p
        if len(buf) < hdr_size:
            raise rans.RansError("truncated rANS stream header")
        raw_len, lanes_log2 = struct.unpack(
            rans.HEADER_FMT, bytes(buf[:hdr_size])
        )
        if raw_len == 0:
            parsed.append(None)
            continue
        N = 1 << lanes_log2
        off = hdr_size
        if len(buf) < off + 512 + 4 * N + 4:
            raise rans.RansError("truncated rANS stream tables")
        freq_bytes = bytes(buf[off : off + 512])
        off += 512
        states = buf[off : off + 4 * N].view("<u4").astype(np.uint32)
        off += 4 * N
        (total,) = struct.unpack("<I", bytes(buf[off : off + 4]))
        off += 4
        if len(buf) < off + 2 * total:
            raise rans.RansError("truncated rANS stream words")
        words = buf[off : off + 2 * total].view("<u2")
        parsed.append((raw_len, N, freq_bytes, states, words))
        lanes_set.add(N)
        if freq_ref is None:
            freq_ref = freq_bytes
        elif freq_bytes != freq_ref:
            return None  # mixed tables: not batchable
    if freq_ref is None:  # all empty
        return [b""] * d
    if len(lanes_set) != 1:
        return None
    if max(p[0] for p in parsed if p) > (1 << 30):
        # hostile declared lengths: don't size a (D, M) batch from them;
        # the per-stream fallback path allocates per stream with its own
        # typed failures (the E048 retry-bomb lesson)
        return None
    N = lanes_set.pop()
    freq = np.frombuffer(freq_ref, "<u2").astype(np.uint16)
    if int(freq.astype(np.int64).sum()) != rans.PROB_SCALE:
        raise rans.RansError("invalid rANS frequency table")
    tabs = rans.compact_tables(freq)

    m = _pow2ceil(max(p[0] for p in parsed if p), N)
    max_steps = -(-m // N)
    w_cap = max_steps * N + N
    words_b = np.zeros((d, w_cap), np.uint16)
    states_b = np.zeros((d, N), np.uint32)
    lens_b = np.zeros(d, np.int32)
    for i, pp in enumerate(parsed):
        if pp is None:
            continue
        raw_len, _, _, states, words = pp
        if len(words) > w_cap:
            return None  # hostile word count beyond plausible; fall back
        words_b[i, : len(words)] = words
        states_b[i] = states
        lens_b[i] = raw_len

    sh = NamedSharding(mesh, P(BLOCK_AXIS, None))
    lsh = NamedSharding(mesh, P(BLOCK_AXIS))
    out = entropy_decode_sharded(
        jax.device_put(jnp.asarray(words_b), sh),
        jax.device_put(jnp.asarray(states_b), sh),
        jax.device_put(jnp.asarray(tabs), replicated(mesh)),
        jax.device_put(jnp.asarray(lens_b), lsh),
        mesh=mesh,
        m_per_shard=m,
        lanes=N,
    )
    out = np.asarray(out)
    res: list[bytes] = []
    for i, pp in enumerate(parsed):
        res.append(b"" if pp is None else out[i, : pp[0]].tobytes())
    return res


# ---------------------------------------------------------------------------
# Sharded context-modeled entropy stage (ops/wctx.py under shard_map) —
# the device coder that keeps the v3 context-model ratio wins on-mesh
# (VERDICT r2 #1: order-0 rANS on packed bytes loses to every host path).
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("mesh", "S", "N", "L", "B"),
)
def wctx_encode_sharded(
    symm: jax.Array,  # (D, S, N) uint8 present-index symbols
    ctxm: jax.Array,  # (D, S, N) uint16 context ids
    steps: jax.Array,  # (D,) int32 valid rows per shard
    planes: jax.Array,  # (D, 2, H, L*B) int8 per-block pcum planes
    seg: jax.Array,  # (D, N) int32 real symbols per lane (pads skipped)
    *,
    mesh: Mesh,
    S: int,
    N: int,
    L: int,
    B: int,
):
    """Per-shard backward context-rANS encode + emit-bitmask pack; the
    word compaction stays on host (rans_compact), exactly like
    :func:`entropy_encode_sharded_raw` (E057)."""
    from ..ops import wctx

    def local(symm_l, ctxm_l, steps_l, planes_l, seg_l):
        emits, emask, states = wctx._encode_kernel.__wrapped__(
            symm_l[0], ctxm_l[0].astype(jnp.int32),
            steps_l.reshape(()).astype(jnp.int32), planes_l[0],
            seg_l[0], S, N, L, B,
        )
        bits = emask.reshape(-1, 8).astype(jnp.uint8)
        weights = (jnp.uint8(1) << jax.lax.iota(jnp.uint8, 8))[None, :]
        mask_bits = jnp.sum(bits * weights, axis=1, dtype=jnp.uint8)
        total = jnp.sum(emask.astype(jnp.int32))
        return (
            emits.reshape(-1)[None, :],
            mask_bits[None, :],
            states[None, :],
            total[None],
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(BLOCK_AXIS, None, None), P(BLOCK_AXIS, None, None),
            P(BLOCK_AXIS), P(BLOCK_AXIS, None, None, None),
            P(BLOCK_AXIS, None),
        ),
        out_specs=(
            P(BLOCK_AXIS, None), P(BLOCK_AXIS, None),
            P(BLOCK_AXIS, None), P(BLOCK_AXIS),
        ),
        check_vma=False,
    )(symm, ctxm, steps, planes, seg)


@partial(
    jax.jit,
    static_argnames=("mesh", "S", "N", "L", "B", "model", "order"),
)
def wctx_decode_sharded(
    words: jax.Array,  # (D, W) uint16
    states: jax.Array,  # (D, N) uint32
    startm_bits: jax.Array,  # (D, S, N//8) uint8
    steps: jax.Array,  # (D,) int32
    planes: jax.Array,  # (D, 2, H, L*B) int8
    dpres: jax.Array,  # (D, B) int32
    seg: jax.Array,  # (D, N) int32 real symbols per lane (pads skipped)
    *,
    mesh: Mesh,
    S: int,
    N: int,
    L: int,
    B: int,
    model: int,
    order: int,
):
    from ..ops import wctx

    def local(words_l, states_l, startm_l, steps_l, planes_l, dpres_l,
              seg_l):
        out, x, consumed = wctx._decode_kernel.__wrapped__(
            words_l.reshape(-1), states_l.reshape(-1), startm_l[0],
            steps_l.reshape(()).astype(jnp.int32), planes_l[0],
            dpres_l.reshape(-1), seg_l[0], S, N, L, B, model, order,
        )
        return out[None], consumed[None]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(BLOCK_AXIS, None), P(BLOCK_AXIS, None),
            P(BLOCK_AXIS, None, None), P(BLOCK_AXIS),
            P(BLOCK_AXIS, None, None, None), P(BLOCK_AXIS, None),
            P(BLOCK_AXIS, None),
        ),
        out_specs=(P(BLOCK_AXIS, None, None), P(BLOCK_AXIS)),
        check_vma=False,
    )(words, states, startm_bits, steps, planes, dpres, seg)


def _wctx_block_prep(syms, lengths, hist, model, order, N):
    """Host-side per-block prep for the sharded wctx encode: lane
    layout, matrices, tables, planes. ``hist``: (C, 256) DATA histogram
    — used as-is: pad cells are skipped by the coders (r3), so the
    tables are exactly the host prepare histograms. Returns a dict of
    batchable pieces."""
    from ..ops import wctx

    C, H, L = wctx.model_geometry(model, order)
    lengths = np.asarray(lengths, np.int64)
    sb, S = wctx.lane_bounds(lengths, N)
    seg = (sb[1:] - sb[:-1]).astype(np.int32)
    n = len(syms)
    hist = hist.astype(np.int64)
    pad_sym = int(np.argmax(hist.sum(axis=0)))
    present = np.flatnonzero(hist.sum(axis=0) > 0)
    freq_full = wctx.normalize_tables(hist)
    freq_p = np.ascontiguousarray(freq_full[:, present])
    npres = len(present)
    startm = wctx.start_matrix(lengths, sb, S)
    symm = wctx.to_matrix(np.asarray(syms, np.uint8), sb, S, pad_sym)
    ctxm = wctx.context_matrix(symm, startm, model, order)
    sym_idx = wctx._sym_to_idx(present)[symm]
    return {
        "sb": sb, "S": S, "n": n, "npres": npres, "seg": seg,
        "present": present, "freq_p": freq_p,
        "sym_idx": sym_idx, "ctxm": ctxm,
        "C": C, "H": H, "L": L,
    }


def wctx_encode_streams(
    jobs: list,
    model: int,
    order: int,
    mesh: Optional[Mesh] = None,
    lanes: int | None = None,
    async_result: bool = False,
):
    """Encode one unpacked symbol stream per device through the sharded
    context coder; returns standalone TAG_WCTX wire payloads (each
    independently decodable by ops/wctx.decode_stream / the C++ twin).

    ``jobs``: up to D entries of ``(flat_syms, lengths, data_hist)``
    where ``data_hist`` is the (C, 256) histogram over data positions
    (native sctx/qualctx prepare output reshaped); ``None`` entries are
    skipped (their payload comes back as ``None``).

    ``async_result=True`` returns a zero-argument finisher (dispatch
    now, fetch/compact/assemble later) — see entropy_encode_streams.
    """
    import struct

    from ..ops import wctx
    from ..runtime import bindings as rt
    from ..entropy import zstd as zstd_entropy

    mesh = mesh or make_mesh()
    d = len(mesh.devices.flat)
    if len(jobs) > d:
        raise ValueError(f"need <= {d} jobs, got {len(jobs)}")
    jobs = list(jobs) + [None] * (d - len(jobs))
    C, H, L = wctx.model_geometry(model, order)
    max_n = max((len(j[0]) for j in jobs if j), default=0)
    if max_n == 0:
        res = [None] * d
        return (lambda: res) if async_result else res
    # one lane count per group (the sharded program is compiled per
    # (S_pad, N, L, B)): the most ratio-constrained block decides (E085)
    N = lanes or min(
        wctx.pick_lanes_for(j[2], len(j[0])) for j in jobs if j
    )

    preps = [
        _wctx_block_prep(j[0], j[1], j[2], model, order, N) if j else None
        for j in jobs
    ]
    B = 2
    while B < max(p["npres"] for p in preps if p):
        B *= 2
    S_pad = wctx._pick_smax(max(p["S"] for p in preps if p))

    symb = np.zeros((d, S_pad, N), np.uint8)
    ctxb = np.zeros((d, S_pad, N), np.uint16)
    steps = np.zeros(d, np.int32)
    segb = np.zeros((d, N), np.int32)
    planes = np.zeros((d, 2, H, L * B), np.int8)
    for i, p in enumerate(preps):
        if p is None:
            continue
        symb[i, : p["S"]] = p["sym_idx"]
        ctxb[i, : p["S"]] = p["ctxm"].astype(np.uint16)
        steps[i] = p["S"]
        segb[i] = p["seg"]
        pcum = wctx._pcum_from_freq(p["freq_p"])
        pcum_b = np.zeros((C, B), np.int32)
        pcum_b[:, : p["npres"]] = pcum
        if p["npres"] < B:
            tail = pcum[:, -1] + p["freq_p"][:, -1].astype(np.int32)
            for jcol in range(p["npres"], B):
                pcum_b[:, jcol] = tail
        planes[i] = wctx.pack_planes(pcum_b, H, L)

    sh2 = NamedSharding(mesh, P(BLOCK_AXIS, None))
    sh3 = NamedSharding(mesh, P(BLOCK_AXIS, None, None))
    sh4 = NamedSharding(mesh, P(BLOCK_AXIS, None, None, None))
    lsh = NamedSharding(mesh, P(BLOCK_AXIS))
    emits, mask_bits, states, totals = wctx_encode_sharded(
        jax.device_put(symb, sh3),
        jax.device_put(ctxb, sh3),
        jax.device_put(steps, lsh),
        jax.device_put(planes, sh4),
        jax.device_put(segb, sh2),
        mesh=mesh, S=S_pad, N=N, L=L, B=B,
    )
    def finish():
        emits_h = np.asarray(emits)
        mask_h = np.asarray(mask_bits)
        states_h = np.asarray(states)
        totals_h = np.asarray(totals)
        codec = zstd_entropy.get_codec()
        out: list[bytes | None] = []
        for i, p in enumerate(preps):
            if p is None:
                out.append(None)
                continue
            if rt.available():
                words = rt.rans_compact(emits_h[i], mask_h[i])
            else:
                m = np.unpackbits(
                    mask_h[i], bitorder="little"
                ).astype(bool)
                words = emits_h[i][m]
            assert len(words) == int(totals_h[i])
            blob = codec.compress(
                np.ascontiguousarray(p["freq_p"].astype("<u2")).tobytes()
            )
            payload = bytearray()
            payload += struct.pack(
                wctx.HEADER_FMT, model, order, N.bit_length() - 1, p["n"]
            )
            payload += struct.pack("<H", p["npres"])
            payload += p["present"].astype(np.uint8).tobytes()
            payload += struct.pack("<I", len(blob))
            payload += blob
            payload += struct.pack("<I", len(words))
            payload += states_h[i].astype("<u4").tobytes()
            payload += words.astype("<u2").tobytes()
            out.append(bytes(payload))
        return out

    return finish if async_result else finish()


def wctx_decode_streams(
    payloads: list,
    lengths_list: list,
    mesh: Optional[Mesh] = None,
) -> list | None:
    """Batch-decode one TAG_WCTX payload per device — the decode twin of
    :func:`wctx_encode_streams`. Returns flat unpacked symbol arrays, or
    ``None`` when the group is not batchable (mixed models/orders/lane
    counts — fall back to per-stream decoding). ``None`` payload slots
    are skipped."""
    from ..ops import wctx

    mesh = mesh or make_mesh()
    d = len(mesh.devices.flat)
    if len(payloads) > d:
        raise ValueError(f"need <= {d} payloads, got {len(payloads)}")
    payloads = list(payloads) + [None] * (d - len(payloads))
    lengths_list = list(lengths_list) + [None] * (d - len(lengths_list))
    parsed = [
        wctx.parse_stream(p) if p is not None else None for p in payloads
    ]
    live = [p for p in parsed if p]
    if not live:
        return [None] * d
    keys = {(p["model"], p["order"], p["N"]) for p in live}
    if len(keys) != 1:
        return None
    model, order, N = keys.pop()
    C, H, L = wctx.model_geometry(model, order)
    B = 2
    while B < max(len(p["present"]) for p in live):
        B *= 2
    infos = []
    for p, lens in zip(parsed, lengths_list):
        if p is None:
            infos.append(None)
            continue
        lens = np.asarray(lens, np.int64)
        if int(lens.sum()) != p["total"]:
            raise wctx.WctxError(
                "wctx total does not match record lengths"
            )
        if p["total"] > (1 << 30):
            return None  # hostile declared size: per-stream fallback
        sb, S = wctx.lane_bounds(lens, N)
        infos.append({"sb": sb, "S": S, "lens": lens})
    S_pad = wctx._pick_smax(max(i["S"] for i in infos if i))
    w_cap = S_pad * N + N
    words_b = np.zeros((d, w_cap), np.uint16)
    states_b = np.zeros((d, N), np.uint32)
    steps_b = np.zeros(d, np.int32)
    seg_b = np.zeros((d, N), np.int32)
    startm_b = np.zeros((d, S_pad, N // 8), np.uint8)
    planes_b = np.zeros((d, 2, H, L * B), np.int8)
    dpres_b = np.zeros((d, B), np.int32)
    for i, (p, info) in enumerate(zip(parsed, infos)):
        if p is None:
            continue
        if len(p["words"]) > w_cap:
            return None  # hostile word count: per-stream fallback
        words_b[i, : len(p["words"])] = p["words"]
        states_b[i] = p["states"]
        steps_b[i] = info["S"]
        seg_b[i] = (info["sb"][1:] - info["sb"][:-1]).astype(np.int32)
        startm = wctx.start_matrix(info["lens"], info["sb"], info["S"])
        sp = np.zeros((S_pad, N), bool)
        sp[: info["S"]] = startm
        startm_b[i] = wctx._pack_startm(sp)
        npres = len(p["present"])
        pcum = wctx._pcum_from_freq(p["freq_p"])
        pcum_b = np.zeros((C, B), np.int32)
        pcum_b[:, :npres] = pcum
        if npres < B:
            tail = pcum[:, -1] + p["freq_p"][:, -1].astype(np.int32)
            for jcol in range(npres, B):
                pcum_b[:, jcol] = tail
        planes_b[i] = wctx.pack_planes(pcum_b, H, L)
        dpres_b[i, :npres] = np.diff(
            np.concatenate([[0], p["present"]])
        )

    sh2 = NamedSharding(mesh, P(BLOCK_AXIS, None))
    sh3 = NamedSharding(mesh, P(BLOCK_AXIS, None, None))
    sh4 = NamedSharding(mesh, P(BLOCK_AXIS, None, None, None))
    lsh = NamedSharding(mesh, P(BLOCK_AXIS))
    out_mat, consumed = wctx_decode_sharded(
        jax.device_put(words_b, sh2),
        jax.device_put(states_b, sh2),
        jax.device_put(startm_b, sh3),
        jax.device_put(steps_b, lsh),
        jax.device_put(planes_b, sh4),
        jax.device_put(dpres_b, sh2),
        jax.device_put(seg_b, sh2),
        mesh=mesh, S=S_pad, N=N, L=L, B=B, model=model, order=order,
    )
    out_mat = np.asarray(out_mat)
    consumed = np.asarray(consumed)
    res = []
    for i, (p, info) in enumerate(zip(parsed, infos)):
        if p is None:
            res.append(None)
            continue
        if int(consumed[i]) != len(p["words"]):
            raise wctx.WctxError("trailing wctx words")
        idx = wctx.from_matrix(
            out_mat[i, : info["S"]], info["sb"]
        )
        if len(idx) and int(idx.max()) >= len(p["present"]):
            raise wctx.WctxError("corrupted wctx stream")
        res.append(p["present"].astype(np.uint8)[idx])
    return res
