"""FQZ v3 "native" pipeline: TPU-resident entropy coding + block CRC32.

Container layout is the v2 layout plus a CRC32 field in the block header
(format/container.py). Stream entropy codecs are fixed by position:

  seq, qual        -> interleaved-lane rANS (ops/rans.py, on-accelerator)
  headers, plus,
  npos, lengths    -> zstd (host; small/LZ-friendly streams where order-0
                      entropy coding would lose badly)

The CRC32 (IEEE, zlib polynomial) is computed over the concatenated
*uncompressed* streams in wire order and verified after entropy decode —
an explicit integrity field replacing the zstd frame checksums that v1/v2
inherit from the reference (PERFORMANCE.md E033; README.md:87).
"""

from __future__ import annotations

import zlib
from typing import BinaryIO, Optional

import numpy as np

from ..format import container
from ..ops import rans
from ..ops import reference as refops
from ..parser.fastq import FastqStreamParser, RecordBlock
from ..entropy import zstd as zstd_entropy
from . import api
from . import blocks as blockcodec

# Per-stream codec policy in v2+ wire order (seq, qual, headers, plus,
# npos, lengths): "seq"/"rans" streams carry a 1-byte tag choosing their
# codec empirically; "tok" streams choose token-delta+zstd or plain zstd;
# "zstd" streams are untagged zstd.
STREAM_CODECS = ("seq", "rans", "tok", "zstd", "zstd", "zstd")

# Below this size the rANS per-stream overhead (lane state table + freq
# table, ~1.5 KB at 256 lanes) dominates; fall back to zstd. Each
# rANS-eligible stream carries a 1-byte codec tag so the decoder knows.
RANS_MIN_BYTES = 16384
# wire tag values live in format/container.py (importable without jax)
TAG_RANS = container.TAG_RANS
TAG_ZSTD = container.TAG_ZSTD
TAG_TOK = container.TAG_TOK
TAG_QCTX = container.TAG_QCTX
TAG_SCTX = container.TAG_SCTX
TAG_SLDM = container.TAG_SLDM
TAG_WCTX = container.TAG_WCTX


def _tok_encode(stream: bytes, count: int) -> bytes:
    from ..runtime import bindings

    if bindings.available():
        return bindings.tok_encode(stream, count)
    from ..ops import tokenize

    return tokenize.encode(stream, count)


def _tok_decode(data: bytes, count: int) -> bytes:
    from ..runtime import bindings

    if bindings.available():
        return bindings.tok_decode(data, count)
    from ..ops import tokenize

    return tokenize.decode(data, count)


def _rans_size_estimate(s: bytes) -> int:
    """Exact order-0 rANS output size from the histogram (pre-encode).

    rANS emits sum(count_k * log2(PROB_SCALE / freq_k)) bits to within
    lane-padding noise; adding the table/state overhead gives a faithful
    estimate without running the coder.
    """
    from ..runtime import bindings

    if bindings.available():
        hist = bindings.hist256(s)
    else:
        hist = np.bincount(
            np.frombuffer(s, np.uint8), minlength=256
        ).astype(np.int64)
    freq = rans.normalize_freqs(hist.copy()).astype(np.float64)
    nz = hist > 0
    bits = float(
        np.sum(hist[nz] * (np.log2(rans.PROB_SCALE) - np.log2(freq[nz])))
    )
    lanes = rans._pick_lanes(len(s))
    overhead = 8 + 512 + 4 * lanes + 4  # header + freqs + states + total
    return int(bits / 8) + overhead


def _zstd_candidate(codec, s) -> bytes:
    """The zstd candidate frame: adaptive (E028 probe + E041 stored
    raw-block frames for incompressible streams) when the codec has it.
    Frames are self-describing, so decode is unaffected."""
    return getattr(codec, "compress_adaptive", codec.compress)(s)


def _encode_tagged(s: bytes, codec) -> bytes:
    """Per-stream empirical codec pick: zstd always runs (fast, and the
    LZ candidate), rANS only when its exact size estimate beats it."""
    z = _zstd_candidate(codec, s)
    if len(s) >= RANS_MIN_BYTES and _rans_size_estimate(s) < len(z):
        r = rans.encode_stream(s)
        if len(r) < len(z):
            return bytes([TAG_RANS]) + r
    return bytes([TAG_ZSTD]) + z


# A context-coder pick must beat the cheap competition by this factor
# before its coder runs: on uncorrelated DNA sctx still "wins" by the
# pack's padding bits + zstd framing (<1%), which is not worth running
# a ~4x-slower coder both directions. --max-ratio waives the margin.
SCTX_WIN_MARGIN = 0.98


class PickMemo:
    """Cross-block probe memoization (E072).

    Blocks of one file share statistics: on structure-free data the
    sctx sampling probe (~2.6-4.3 ms/block) and the coverage probe
    (~1.4 ms/block) reach the same "skip" verdict on every block — pure
    per-block waste that the E067 native-qctx-probe work did not touch.
    After ``STREAK`` consecutive negative probes, later blocks skip the
    probe and only re-check every ``PROBE_EVERY``-th block, so a
    mid-file statistics change (e.g. coverage appearing) is detected at
    most ``PROBE_EVERY - 1`` blocks late; any positive probe resets the
    streak and probing resumes for every block. One instance per
    compress invocation, shared across the worker pool (counter updates
    are GIL-atomic; a lost increment only shifts WHICH block re-probes).
    ``None`` (the default everywhere) preserves probe-every-block
    behavior bit-for-bit.
    """

    PROBE_EVERY = 4
    STREAK = 2

    def __init__(self) -> None:
        self._sctx_miss = 0
        self._sctx_seen = 0
        self._cov_miss = 0
        self._cov_seen = 0

    def sctx_should_probe(self) -> bool:
        self._sctx_seen += 1
        if self._sctx_miss < self.STREAK:
            return True
        return self._sctx_seen % self.PROBE_EVERY == 0

    def sctx_outcome(self, hopeless: bool) -> None:
        self._sctx_miss = self._sctx_miss + 1 if hopeless else 0

    def cov_should_probe(self) -> bool:
        self._cov_seen += 1
        if self._cov_miss < self.STREAK:
            return True
        return self._cov_seen % self.PROBE_EVERY == 0

    def cov_outcome(self, hit: bool) -> None:
        self._cov_miss = 0 if hit else self._cov_miss + 1


def _encode_tagged_seq(
    s: bytes,
    lengths: np.ndarray,
    codec,
    max_ratio: bool = False,
    seq_dict: np.ndarray | None = None,
    memo: "PickMemo | None" = None,
) -> bytes:
    """Sequence-stream pick: zstd vs order-0 rANS vs order-k context
    model over the unpacked bases, by estimated-then-verified size.

    The 2-bit pack makes packed bytes near-uniform, so the order-0
    candidates floor at ~2 bits/base; the context model is the only one
    that can go below on real (correlated) DNA. Its histogram pass is
    one cheap sweep, so it is always estimated; the coder only runs
    when the estimate beats the measured/estimated competition by
    :data:`SCTX_WIN_MARGIN` (or at all, under --max-ratio).
    """
    z = _zstd_candidate(codec, s)
    if len(s) < RANS_MIN_BYTES:
        return bytes([TAG_ZSTD]) + z
    r0 = _rans_size_estimate(s)
    bar = min(len(z), r0)
    margin = 1.0 if max_ratio else SCTX_WIN_MARGIN
    from ..ops import seqctx, sldm

    s_arr = np.frombuffer(s, np.uint8)
    best: Optional[bytes] = None
    bases = None
    est_s = None
    try:
        sctx_hopeless = False
        if not max_ratio:
            # sampled pre-gate: skip the full histogram pass when even
            # the optimistic sampled projection cannot reach the margin;
            # a streak of hopeless blocks skips the probe itself (E072)
            if memo is not None and not memo.sctx_should_probe():
                sctx_hopeless = True
            else:
                proj = seqctx.sample_estimate(s_arr, lengths)
                sctx_hopeless = proj is not None and proj >= bar * margin
                if memo is not None:
                    memo.sctx_outcome(sctx_hopeless)
        if not sctx_hopeless:
            bases, hist6 = seqctx.prepare(s_arr, lengths)
            _, est_s = seqctx.pick_order(hist6)
    except ValueError:
        est_s = None
    if est_s is not None and est_s < bar * margin:
        q = seqctx.encode_prepared(bases, lengths, hist6)
        if len(q) < bar:
            best, bar = bytes([TAG_SCTX]) + q, len(q)
    # coverage-redundancy candidate (E039): unpacked codes + zstd-LDM.
    # Always measured under --max-ratio; the default pipeline runs it
    # only when the sampled 16-mer duplicate probe sees block-local
    # coverage (so coverage-free data never pays the LDM pass).
    try:
        run_cov = seq_dict is not None or max_ratio
        if not run_cov and (memo is None or memo.cov_should_probe()):
            run_cov = sldm.coverage_probe(s_arr) >= sldm.DUP_THRESHOLD
            if memo is not None:
                memo.cov_outcome(run_cov)
        if run_cov:
            d = (
                sldm.encode_bases(bases, prefix=seq_dict)
                if bases is not None
                else sldm.encode(s_arr, lengths, prefix=seq_dict)
            )
            if len(d) < bar:
                best, bar = bytes([TAG_SLDM]) + d, len(d)
    except ValueError:
        pass
    if best is not None:
        return best
    if r0 < len(z):
        r = rans.encode_stream(s)
        if len(r) < len(z):
            return bytes([TAG_RANS]) + r
    return bytes([TAG_ZSTD]) + z


def _encode_tagged_headers(
    s: bytes, count: int, codec, cost_gate: int = 0
) -> bytes:
    """Header stream pick: token-delta transform vs raw, both zstd-coded.

    The transform wins whenever headers share structure between records
    (the overwhelmingly common case); degenerate inputs (every header
    unique noise) fall back to plain zstd by measured size.

    ``cost_gate``: skip the (~15 ms/100k-record) tokenizer when plain
    zstd already shrinks the stream below this byte count — the absolute
    saving is then immaterial next to the block's other streams (E042).
    Only applies to streams big enough for the tokenizer pass to cost
    real CPU; small blocks always try. --max-ratio passes 0 to always
    try.
    """
    z = _zstd_candidate(codec, s)
    if cost_gate and len(z) <= cost_gate and len(s) > (256 << 10):
        return bytes([TAG_ZSTD]) + z
    try:
        tok = _tok_encode(s, count)
    except ValueError:
        return bytes([TAG_ZSTD]) + z
    zt = _zstd_candidate(codec, tok)
    if len(zt) < len(z):
        return bytes([TAG_TOK]) + zt
    return bytes([TAG_ZSTD]) + z


def _decode_tagged(
    chunk: bytes, codec, count: int = 0, lengths=None, seq_dict=None
) -> bytes:
    if len(chunk) == 0:
        raise container.FormatError("truncated block payload")
    tag, payload = chunk[0], chunk[1:]
    if tag == TAG_RANS:
        return rans.decode_stream(payload)
    if tag == TAG_ZSTD:
        return codec.decompress(payload)
    if tag == TAG_TOK:
        try:
            return _tok_decode(codec.decompress(payload), count)
        except ValueError as e:
            raise container.FormatError(str(e)) from None
    if tag == TAG_QCTX:
        from ..ops import qualctx

        if lengths is None:
            raise container.FormatError(
                "qctx stream outside the quality slot"
            )
        try:
            return qualctx.decode(payload, lengths)
        except ValueError as e:
            raise container.FormatError(str(e)) from None
    if tag == TAG_SCTX:
        from ..ops import seqctx

        if lengths is None:
            raise container.FormatError(
                "sctx stream outside the sequence slot"
            )
        try:
            return seqctx.decode(payload, lengths)
        except ValueError as e:
            raise container.FormatError(str(e)) from None
    if tag == TAG_SLDM:
        from ..ops import sldm

        if lengths is None:
            raise container.FormatError(
                "sldm stream outside the sequence slot"
            )
        try:
            return sldm.decode(payload, lengths, prefix=seq_dict)
        except ValueError as e:
            raise container.FormatError(str(e)) from None
    if tag == TAG_WCTX:
        from ..ops import seqctx, wctx

        if lengths is None:
            raise container.FormatError(
                "wctx stream outside the sequence/quality slots"
            )
        try:
            model = payload[0] if payload else 255
            flat = wctx.decode_stream(payload, lengths)
            if model == wctx.MODEL_SEQ:
                # symbols are unpacked base codes -> packed wire rows
                return seqctx.pack_stream(flat, lengths).tobytes()
            # symbols are raw qualities -> per-record delta wire stream
            from ..ops import qualctx  # noqa: F401  (semantics ref)

            return _raw_to_delta(flat, lengths)
        except ValueError as e:
            raise container.FormatError(str(e)) from None
    raise container.FormatError(f"unknown stream codec tag: {tag}")


def _raw_to_delta(raw: np.ndarray, lengths: np.ndarray) -> bytes:
    """Integrated qualities -> the v3 per-record delta stream (inverse
    of qualctx.integrate), vectorized."""
    if len(raw) == 0:
        return b""
    d = np.empty(len(raw), np.uint8)
    d[0] = raw[0]
    np.subtract(raw[1:], raw[:-1], out=d[1:])
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1].astype(np.int64), out=starts[1:])
    nz = lengths > 0
    d[starts[nz]] = raw[starts[nz]]
    return d.tobytes()


def _encode_tagged_qual(
    s: bytes, lengths: np.ndarray, codec, order1: bool
) -> bytes:
    """Quality-stream pick: zstd vs order-0 rANS vs order-1 context
    model, by estimated-then-verified size.

    The order-1 candidate is always allowed to replace a would-be order-0
    rANS pick (it is then both smaller and faster to decode on host);
    with ``order1`` (--max-ratio) it may also replace zstd on estimated
    size alone — the speed-for-ratio trade the user asked for.
    """
    z = _zstd_candidate(codec, s)
    if len(s) < RANS_MIN_BYTES:
        return bytes([TAG_ZSTD]) + z
    r0 = _rans_size_estimate(s)
    from ..ops import qualctx

    bar = min(len(z), r0)
    # The context model may also replace a winning zstd when it beats it
    # by the same margin policy as the seq pick (SCTX_WIN_MARGIN) —
    # momentum-shaped qualities (delta alphabet small but order-1/2
    # structure strong) previously shipped zstd at +36% because the old
    # gate only ran qctx when order-0 rANS beat zstd. A sampled pre-gate
    # keeps the full histogram pass off streams with no structure.
    try_qctx = order1 or r0 < len(z)
    if not try_qctx:
        proj = qualctx.sample_estimate(np.frombuffer(s, np.uint8), lengths)
        try_qctx = proj is None or proj < bar * SCTX_WIN_MARGIN
    if try_qctx:
        try:
            raw, hist2 = qualctx.prepare(
                np.frombuffer(s, np.uint8), lengths
            )
            _, est1 = qualctx.pick_model(hist2)
        except ValueError:
            est1 = None
        margin = 1.0 if (order1 or r0 < len(z)) else SCTX_WIN_MARGIN
        if est1 is not None and est1 < bar * margin:
            q = qualctx.encode_prepared(raw, lengths, hist2)
            if len(q) < bar:
                return bytes([TAG_QCTX]) + q
    if r0 < len(z):
        r = rans.encode_stream(s)
        if len(r) < len(z):
            return bytes([TAG_RANS]) + r
    return bytes([TAG_ZSTD]) + z


def _crc_streams(ordered: list[bytes]) -> int:
    from . import auto

    if auto.device_worthwhile():
        # on-chip chunk-parallel CRC + GF(2) combine (ops/crc32.py)
        from ..ops import crc32 as dcrc

        crc = 0
        for s in ordered:
            crc = dcrc.crc32_combine(crc, dcrc.crc32_device(s), len(s))
        return crc & 0xFFFFFFFF
    from ..runtime import bindings

    if bindings.available():
        # PCLMUL-folded host CRC (fq_crc32; ~2.7x zlib on this host)
        crc = 0
        for s in ordered:
            crc = bindings.crc32(s, crc)
        return crc & 0xFFFFFFFF
    crc = 0
    for s in ordered:
        crc = zlib.crc32(s, crc)
    return crc & 0xFFFFFFFF


def _lossless_extra(blk: RecordBlock, lengths: np.ndarray) -> bytes:
    """FLAG_LOSSLESS payload appended to the npos slot (journal E052):
    little-endian-packed per-base lowercase bits (record-concatenated,
    ceil(total/8) bytes) followed by one verbatim byte per npos entry
    (the original non-ACGT symbols, in npos order). Sizes are derivable
    from the lengths and npos streams, so the blob is self-locating."""
    from ..utils import varlen

    seq = blk.seq
    w = seq.shape[1]
    col = np.arange(w, dtype=np.int64)[None, :]
    in_len = col < lengths[:, None]
    lower = (seq >= 97) & (seq <= 122) & in_len
    flat_bits = varlen.flatten_rows(
        lower.astype(np.uint8), lengths
    )
    case_bytes = np.packbits(flat_bits, bitorder="little").tobytes()
    amb = refops.ambiguity_mask(seq, lengths, npos_cap=1 << 62)
    rows, cols = np.nonzero(amb)
    exotic = seq[rows, cols].tobytes()
    return case_bytes + exotic


def _apply_lossless_extra(
    text: bytearray,
    extra: np.ndarray,
    lengths: np.ndarray,
    hdr_lens: np.ndarray,
    plus_lens: np.ndarray,
    n_counts: np.ndarray,
    n_rows: np.ndarray,
    n_pos: np.ndarray,
) -> None:
    """Restore case and verbatim exotic bytes on assembled FASTQ text."""
    total = int(lengths.sum())
    case_len = -(-total // 8)
    n_exotic = int(n_counts.sum())
    if len(extra) != case_len + n_exotic:
        raise container.FormatError("truncated lossless side data")
    # absolute offset of each record's sequence line within the text
    rec_sizes = (
        (hdr_lens + 2) + (lengths + 1) + (plus_lens + 2) + (lengths + 1)
    )
    rec_offs = np.zeros(len(lengths), dtype=np.int64)
    if len(lengths) > 1:
        np.cumsum(rec_sizes[:-1], out=rec_offs[1:])
    seq_line = rec_offs + hdr_lens + 2
    buf = np.frombuffer(text, np.uint8)
    if n_exotic:
        dst = seq_line[n_rows] + n_pos
        buf[dst] = extra[case_len:]
    bits = np.unpackbits(extra[:case_len], bitorder="little", count=total)
    idx = np.flatnonzero(bits)
    if len(idx):
        # map flat base index -> (record, in-record position)
        starts = np.zeros(len(lengths), dtype=np.int64)
        if len(lengths) > 1:
            np.cumsum(lengths[:-1], out=starts[1:])
        rec = np.searchsorted(starts, idx, side="right") - 1
        pos = idx - starts[rec]
        dst = seq_line[rec] + pos
        buf[dst] |= 0x20


def encode_block_native(
    blk: RecordBlock,
    qual_offset: int,
    order1_qual: bool = False,
    encode_arrays=None,
    seq_dict: np.ndarray | None = None,
    raw=None,
    lossless: bool = False,
    memo: "PickMemo | None" = None,
) -> bytes:
    """Encode one record block to v3 wire bytes (header + tagged
    streams). Shared by the single-host pipeline and the multi-host
    section compressor. ``raw``: precomputed RawStreams for this block
    (the dict probe already built block 0's; don't build them twice)."""
    if encode_arrays is None:
        encode_arrays = api._default_encode_arrays()
    # --max-ratio also buys a stronger zstd for whatever stays
    # zstd-coded (frames are self-describing; decode is unaffected)
    codec = (
        zstd_entropy.ZstdCodec(level=9)
        if order1_qual
        else zstd_entropy.get_codec()
    )
    if raw is None:
        raw = blockcodec.block_to_raw_streams(
            blk, qual_offset, encode_arrays=encode_arrays, wide_npos=True
        )
    if lossless:
        lens64 = blk.lengths.astype(np.int64)
        raw.npos = np.concatenate(
            [
                np.frombuffer(raw.npos, np.uint8),
                np.frombuffer(_lossless_extra(blk, lens64), np.uint8),
            ]
        )
    ordered = raw.ordered(container.VERSION_2)
    crc = _crc_streams(ordered)
    comp = []
    for i, (s, policy) in enumerate(zip(ordered, STREAM_CODECS)):
        if i == 1 and policy == "rans":
            lengths = np.frombuffer(ordered[5], "<u4").astype(np.int64)
            comp.append(
                _encode_tagged_qual(s, lengths, codec, order1_qual)
            )
        elif policy == "seq":
            lengths = np.frombuffer(ordered[5], "<u4").astype(np.int64)
            comp.append(
                _encode_tagged_seq(
                    s, lengths, codec, order1_qual, seq_dict, memo
                )
            )
        elif policy == "rans":
            comp.append(_encode_tagged(s, codec))
        elif policy == "tok":
            # default pipeline: tokenizing is only worth its CPU when the
            # plain-zstd header stream is a visible fraction of the
            # block's OUTPUT (seq+qual, already coded in wire order,
            # carry almost all of it — ~0.8% threshold); --max-ratio
            # always tries (E042)
            gate = (
                0
                if order1_qual
                else max(4096, (len(comp[0]) + len(comp[1])) >> 7)
            )
            comp.append(
                _encode_tagged_headers(s, raw.num_records, codec, gate)
            )
        else:
            comp.append(_zstd_candidate(codec, s))
    hdr = container.BlockHeader(
        num_records=raw.num_records,
        seq_data_size=len(comp[0]),
        qual_data_size=len(comp[1]),
        header_data_size=len(comp[2]),
        plus_data_size=len(comp[3]),
        npositions_size=len(comp[4]),
        seq_lengths_size=len(comp[5]),
        original_seq_size=raw.original_seq_size,
        original_qual_size=raw.original_qual_size,
        crc32=crc,
    )
    return hdr.to_bytes(container.VERSION_3_NATIVE) + b"".join(comp)


def compress_native(
    r: BinaryIO,
    w: BinaryIO,
    opts: Optional[api.Options] = None,
    encode_arrays=None,
) -> None:
    opts = opts or api.Options()
    block_size = api.resolve_block_size(opts)

    # Whole-file native MT compress (E080): one GIL-released C++ call —
    # scanner + pick workers + ordered collector — for the common
    # envelope (default picks; --lossless and --max-ratio stay here in
    # Python). Containers are byte-identical to the per-block path
    # below. When block 0's coverage probe fires the native call returns
    # FALLBACK without writing a byte, and the Python dict path runs.
    src_view = None  # kept for the E087 dict-mode MT attempt below
    if encode_arrays is None and not opts.lossless and not opts.order1_qual:
        from ..runtime import bindings
        from ..utils.inmem import source_view

        if (
            bindings.available()
            and bindings.mt_available()
            and bindings.compress_mt_v3_available()
        ):
            view = source_view(r)
            if view is not None:
                fd = api._sink_fd(w)
                if fd >= 0 or len(view) <= api._MT_BUFFER_CAP:
                    res = bindings.compress_mt(
                        np.frombuffer(view, np.uint8),
                        block_size,
                        container.VERSION_3_NATIVE,
                        opts.flags,
                        api._resolve_workers(opts.workers),
                        fd,
                        sink=w,
                    )
                    if res is not None:
                        return
                    src_view = view
                # source_view advanced r to EOF: the dict path (or the
                # buffer-cap skip) reruns over the same bytes
                import io as _io

                r = _io.BytesIO(view)

    if encode_arrays is None:
        encode_arrays = api._default_encode_arrays()

    parser = FastqStreamParser(r, block_size=block_size)
    block_iter = parser.blocks()
    # Phred detection from the reference's fixed min(100k, file)-record
    # window regardless of -b (compress.go:48-52,137-154).
    peeked, qual_offset = api.peek_detection(block_iter)
    first_block = peeked[0] if len(peeked) > 0 else None
    second_block: Optional[RecordBlock] = (
        peeked[1] if len(peeked) > 1 else None
    )
    if first_block is not None and second_block is None:
        # peek one more block (the reference's exact-one-block detect,
        # E021): a single-block container gains nothing from a
        # cross-block dictionary — its window already spans everything
        for blk in block_iter:
            second_block = blk
            peeked.append(blk)
            break
    flags = opts.flags | (
        container.FLAG_PHRED64
        if qual_offset == refops.PHRED64_OFFSET
        else 0
    )
    if opts.lossless:
        flags |= container.FLAG_LOSSLESS

    # Cross-block sequence dictionary (E044): when block 0's coverage
    # probe fires, its leading unpacked codes become a container-level
    # LDM prefix shared by every TAG_SLDM stream, so coverage matches
    # cross block boundaries (the per-block window forfeited them,
    # E039). Gated on the probe in both modes: coverage-free data never
    # pays the section. Decided before the header write — the flag and
    # section precede the first block on the wire.
    seq_dict = None
    raw0 = None
    if (
        first_block is not None
        and first_block.n > 0
        and second_block is not None
    ):
        from ..ops import sldm

        raw0 = blockcodec.block_to_raw_streams(
            first_block, qual_offset,
            encode_arrays=encode_arrays, wide_npos=True,
        )
        packed0 = np.frombuffer(raw0.seq, np.uint8)
        if sldm.coverage_probe(packed0) >= sldm.DUP_THRESHOLD:
            lens0 = np.frombuffer(raw0.lengths, "<u4").astype(np.int64)
            try:
                seq_dict = sldm.build_dict(packed0, lens0)
                flags |= container.FLAG_SEQ_DICT
            except ValueError:
                seq_dict = None

    # Whole-file native MT compress, dict mode (E087): the dict decision
    # above is the Python path's; hand the parallel per-block encode to
    # C++ with the prefix and the pre-compressed section (byte-identical
    # container, no per-block Python loop). Nothing has been written to
    # ``w`` yet, so the error paths raise on a clean sink.
    if seq_dict is not None and src_view is not None:
        from ..ops import sldm
        from ..runtime import bindings

        if bindings.compress_mt_dict_available():
            fd = api._sink_fd(w)
            res = bindings.compress_mt_dict(
                np.frombuffer(src_view, np.uint8),
                block_size,
                opts.flags | container.FLAG_SEQ_DICT,
                api._resolve_workers(opts.workers),
                seq_dict,
                sldm.compress_dict(seq_dict),
                fd,
                sink=w,
            )
            if res is not None:
                return

    container.FileHeader(
        version=container.VERSION_3_NATIVE,
        block_size=block_size,
        flags=flags,
    ).write(w)
    if seq_dict is not None:
        from ..ops import sldm

        container.write_seq_dict_section(
            w, sldm.compress_dict(seq_dict), len(seq_dict)
        )
    if first_block is None:
        return

    def all_blocks():
        yield from peeked
        yield from block_iter

    memo = PickMemo()

    def encode_one(blk: RecordBlock) -> bytes:
        return encode_block_native(
            blk, qual_offset, opts.order1_qual, encode_arrays, seq_dict,
            raw=raw0 if blk is first_block else None,
            lossless=opts.lossless, memo=memo,
        )

    api.ordered_map_write(
        w, all_blocks(), encode_one, api._resolve_workers(opts.workers)
    )


def decode_block_payload(
    hdr: container.BlockHeader,
    payload: bytes,
    codec,
    qual_offset: int,
    seq_dict: np.ndarray | None = None,
    lossless: bool = False,
    predecoded: dict | None = None,
) -> bytes:
    """Decode one v3 block payload (streams after the header) to FASTQ
    text, verifying the block CRC32. ``predecoded`` maps stream slots
    (0=seq, 1=qual) to raw bytes already entropy-decoded elsewhere (the
    mesh batch decoder, pipeline/meshpipe.py); the CRC check below still
    covers them, so a wrong batched decode fails exactly like corrupt
    data."""
    sizes = hdr.stream_sizes(container.VERSION_2)
    if len(payload) < sum(sizes):
        raise container.FormatError("truncated block payload")
    offs = [0]
    for size in sizes:
        offs.append(offs[-1] + size)
    chunks = [payload[offs[i] : offs[i + 1]] for i in range(len(sizes))]
    # lengths (slot 5, plain zstd) decode first: the quality slot's
    # order-1 codec needs record boundaries
    lengths_bytes = codec.decompress(chunks[5])
    if len(lengths_bytes) % 4:
        raise container.FormatError("truncated sequence length data")
    lengths = np.frombuffer(lengths_bytes, "<u4").astype(np.int64)
    parts = []
    for i, (chunk, policy) in enumerate(zip(chunks, STREAM_CODECS)):
        if i == 5:
            parts.append(lengths_bytes)
        elif policy == "zstd":
            parts.append(codec.decompress(chunk))
        elif predecoded is not None and i in predecoded:
            parts.append(predecoded[i])
        elif i == 0:
            # the sequence slot may reference the container dictionary
            parts.append(
                _decode_tagged(
                    chunk, codec, hdr.num_records, lengths, seq_dict
                )
            )
        elif i == 1:
            # quality context codecs need record boundaries
            parts.append(
                _decode_tagged(chunk, codec, hdr.num_records, lengths)
            )
        else:
            parts.append(_decode_tagged(chunk, codec, hdr.num_records))
    if _crc_streams(parts) != hdr.crc32:
        raise container.FormatError("block CRC32 mismatch: corrupted data")
    npos_full = np.frombuffer(parts[4], np.uint8)
    extra = None
    n_counts = n_rows = n_pos = None
    if lossless:
        # FLAG_LOSSLESS: the npos slot carries [npos][case bits][exotic
        # bytes]; npos is self-delimiting, split after parsing it
        n_counts, n_rows, n_pos = blockcodec.parse_npos_stream(
            npos_full, hdr.num_records, wide=True
        )
        boundary = 4 * (hdr.num_records + int(n_counts.sum()))
        extra = npos_full[boundary:]
        npos_full = npos_full[:boundary]
    ds = blockcodec.DecodedStreams(
        seq=np.frombuffer(parts[0], np.uint8),
        qual=np.frombuffer(parts[1], np.uint8),
        headers=np.frombuffer(parts[2], np.uint8),
        plus=np.frombuffer(parts[3], np.uint8),
        npos=npos_full,
        lengths=np.frombuffer(parts[5], np.uint8),
        num_records=hdr.num_records,
    )
    text = blockcodec.streams_to_fastq(ds, qual_offset, wide_npos=True)
    if lossless:
        hdr_starts, hdr_lens = blockcodec.parse_len16_stream(
            ds.headers, hdr.num_records, "header"
        )
        if len(ds.plus):
            _, plus_lens = blockcodec.parse_len16_stream(
                ds.plus, hdr.num_records, "plus-line payload"
            )
        else:
            plus_lens = np.zeros(hdr.num_records, np.int64)
        out = bytearray(text)
        _apply_lossless_extra(
            out, extra, lengths, hdr_lens, plus_lens,
            n_counts, n_rows, n_pos,
        )
        return bytes(out)
    return text


def decompress_native(
    r: BinaryIO,
    w: BinaryIO,
    fh: container.FileHeader,
    qual_offset: int,
    workers: int,
    seq_dict: Optional[np.ndarray] = None,
    skip_sections: bool = False,
) -> None:
    """``skip_sections``: the caller already consumed the file-level
    sections (e.g. the multihost stripe reader starts mid-file) and
    passes the decoded ``seq_dict`` itself."""
    if not skip_sections and fh.flags & container.FLAG_SEQ_DICT:
        from ..ops import sldm

        raw_len, comp = container.read_seq_dict_section(r)
        try:
            seq_dict = sldm.decompress_dict(comp, raw_len)
        except ValueError as e:
            raise container.FormatError(str(e)) from None

    # Whole-file native MT decode (E078/E081): one GIL-released call for
    # the native envelope (zstd/rANS/tok/qctx/sctx/sldm streams,
    # seq-dict containers, addressable source). Lossless sections,
    # wctx-coded containers, and foreign frames return None and take the
    # per-block path below unchanged.
    if not (fh.flags & container.FLAG_LOSSLESS):
        from ..runtime import bindings
        from ..utils.inmem import source_view

        if bindings.available() and bindings.decompress_mt_v3_ex_available():
            view = source_view(r)
            if view is not None:
                fd = api._sink_fd(w)
                if fd >= 0 or len(view) <= api._MT_BUFFER_CAP_DECODE:
                    res = bindings.decompress_mt_v3_ex(
                        np.frombuffer(view, np.uint8), qual_offset,
                        workers, seq_dict, fd, sink=w,
                    )
                    if res is not None:
                        return
                import io as _io

                r = _io.BytesIO(view)

    def read_jobs():
        while True:
            hdr = container.read_block_header(r, container.VERSION_3_NATIVE)
            if hdr is None:
                return
            payload_size = sum(hdr.stream_sizes(container.VERSION_2))
            payload = r.read(payload_size)
            yield hdr, payload

    lossless = bool(fh.flags & container.FLAG_LOSSLESS)

    def decode_one(job) -> bytes:
        hdr, payload = job
        codec = zstd_entropy.get_codec()
        return decode_block_payload(
            hdr, payload, codec, qual_offset, seq_dict, lossless=lossless
        )

    api.ordered_map_write(w, read_jobs(), decode_one, workers)
