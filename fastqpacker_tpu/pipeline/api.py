"""Top-level compress/decompress pipeline.

Mirrors the reference pipeline shape (internal/compress/compress.go:125-288):
quality encoding detected from the first block only and recorded as a
file-wide flag, then blocks are encoded independently and written in input
order. The goroutine producer/worker/collector machinery maps to a thread
pool with an ordered collector here (numpy and libzstd release the GIL);
the TPU pipeline in :mod:`fastqpacker_tpu.pipeline.device` replaces the
per-block dense transforms with device kernels and double-buffered
transfers.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import BinaryIO, Optional

import numpy as np

from ..format import container
from ..ops import reference as refops
from ..parser.fastq import FastqStreamParser, RecordBlock
from ..entropy import zstd as zstd_entropy
from . import blocks as blockcodec

DEFAULT_BLOCK_SIZE = 100000  # compress.go:71

# Cache-tuned block size for the zstd speed path (journal E030): 37.5k-record
# blocks (~13 MB of 151 bp text) keep the parse->build->zstd working set
# close to the LLC where the reference-parity 100k blocks (~34 MB) thrash it —
# ~+25% e2e compress at -1.3% ratio on the bench fixture (interleaved sweep:
# 25k trades more ratio for no extra speed, 50k is slower). The v3 context
# models keep 100k blocks (per-block frequency tables want the statistics).
SPEED_BLOCK_SIZE = 37500


def peek_detection(block_iter) -> tuple[list, int]:
    """Consume leading blocks until the reference's fixed Phred-detection
    window is covered and return ``(peeked_blocks, qual_offset)``.

    The Go tool always detects from the first min(DefaultBlockSize, file)
    records regardless of ``-b`` — its detection batch comes from a pool
    fixed at ``NewRecordBatch(DefaultBlockSize)``
    (compress.go:48-52,137-154) — so with a small block size the window
    spans several of our blocks. Detection needs only the window's
    minimum quality byte, so this accumulates a running min; the peeked
    blocks are handed back for normal encoding (chain them ahead of the
    remaining iterator). Parse errors inside the window surface here,
    before any output is written — the same ordering Go has (its first
    ReadBatch precedes the header write).
    """
    peeked: list = []
    seen = 0
    qmin = 256
    for blk in block_iter:
        peeked.append(blk)
        take = min(blk.n, DEFAULT_BLOCK_SIZE - seen)
        if take > 0 and int(blk.lengths[:take].sum()) > 0:
            qmin = min(qmin, int(blk.qual[:take].min()))
        seen += blk.n
        if seen >= DEFAULT_BLOCK_SIZE:
            break
    if qmin > 255:  # no quality bytes in the window
        return peeked, refops.PHRED33_OFFSET
    return peeked, refops.detect_offset_from_min(qmin)


def resolve_block_size(opts: "Options") -> int:
    """Explicit block size if set, else the per-version tuned default."""
    if opts.block_size > 0:
        return opts.block_size
    if opts.version == container.VERSION_3_NATIVE:
        return DEFAULT_BLOCK_SIZE
    return SPEED_BLOCK_SIZE


@dataclass
class Options:
    """Compression options (compress.go:74-77).

    ``block_size=0`` means auto (:func:`resolve_block_size`): the
    cache-tuned :data:`SPEED_BLOCK_SIZE` for v1/v2, the reference's
    :data:`DEFAULT_BLOCK_SIZE` for v3."""

    block_size: int = 0
    workers: int = 0  # 0 -> os.cpu_count()
    version: int = container.CURRENT_VERSION
    # Extra file-header flags OR'd with the detected ones (e.g.
    # FLAG_PAIRED_END for interleaved mate input, utils/pairing.py).
    flags: int = 0
    # v3 only: allow the order-1 context-modeled quality coder
    # (ops/qualctx.py) when its estimated size wins. Slower compress,
    # better ratio (CLI: --max-ratio).
    order1_qual: bool = False
    # v3 only: strictly lossless mode (CLI --lossless): preserve
    # lowercase bases and exotic symbols verbatim instead of the
    # reference's normalization (acgt -> ACGT, non-ACGTN -> N).
    lossless: bool = False


@dataclass
class DecompressOptions:
    workers: int = 0


def _resolve_workers(workers: int, extra: int = 0) -> int:
    """Explicit count wins; default is NumCPU (compress.go:132-134) plus
    ``extra``. The fused-encode compress path passes ``extra=1``: its
    zero-copy producer is nearly free, so one more worker than cores
    fills the pipeline gaps (measured +5-7% on 2 cores)."""
    return workers if workers > 0 else (os.cpu_count() or 1) + extra


def _default_encode_arrays():
    """Fused native encoder when available, numpy reference otherwise."""
    from ..runtime import bindings

    if bindings.available():
        return bindings.encode_block_arrays
    return refops.encode_block_arrays


def _sink_fd(w) -> int:
    """OS fd of ``w`` when writing to the fd IS writing to ``w`` — plain
    FileIO or a buffered wrapper directly over one (flushed first).
    Anything else returns -1 and gets bytes via ``w.write``: a transform
    wrapper like GzipFile also exposes fileno(), but bytes sent to its
    fd would bypass the transform and corrupt the output."""
    import io as _io

    raw = w
    if isinstance(w, (_io.BufferedWriter, _io.BufferedRandom)):
        raw = getattr(w, "raw", None)
    if not isinstance(raw, _io.FileIO) or not raw.writable():
        return -1
    try:
        fd = w.fileno()
        w.flush()
    except (AttributeError, OSError, ValueError, _io.UnsupportedOperation):
        return -1
    return fd


# Without an output fd the native whole-file pipeline buffers its entire
# result in memory; beyond this input size, stream block-by-block instead.
_MT_BUFFER_CAP = 1 << 31  # compress output < input
_MT_BUFFER_CAP_DECODE = 256 << 20  # decompress output ~3-10x input


def _compress_mt(r, w, opts, block_size: int, workers: int) -> bool:
    """Whole-file native pipeline (one GIL-released call: scanner thread +
    encode workers + ordered collector, the reference's full goroutine
    pipeline compress.go:240-443 as native threads). Returns False when
    the source is not addressable or the output would not fit the
    buffer-mode cap — the caller runs the per-block path."""
    from ..runtime import bindings
    from ..utils.inmem import source_view

    try:
        pos = r.tell() if hasattr(r, "tell") else None
    except OSError:
        pos = None
    view = source_view(r)
    if view is None:
        return False
    fd = _sink_fd(w)
    if fd < 0 and len(view) > _MT_BUFFER_CAP:
        if pos is not None:
            r.seek(pos)
            return False
    src = np.frombuffer(view, np.uint8)
    bindings.compress_mt(
        src, block_size, opts.version, opts.flags, workers, fd, sink=w
    )
    return True


def ordered_map_write(w, jobs, fn, workers: int) -> None:
    """Run ``fn`` over ``jobs`` on a bounded thread pool and write the
    results to ``w`` in input order — the shared collector used by every
    pipeline direction (the reference's buffered channels + seqNum
    collector, compress.go:241-242,365-403). ``workers <= 1`` runs
    inline with no pool."""
    if workers <= 1:
        for job in jobs:
            w.write(fn(job))
        return
    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending = []
        max_inflight = workers * 2
        for job in jobs:
            pending.append(pool.submit(fn, job))
            while len(pending) >= max_inflight:
                w.write(pending.pop(0).result())
        for fut in pending:
            w.write(fut.result())


def compress(
    r: BinaryIO,
    w: BinaryIO,
    opts: Optional[Options] = None,
    encode_arrays=None,
) -> None:
    """Compress FASTQ from ``r`` into an FQZ container on ``w``."""
    opts = opts or Options()
    if opts.lossless and opts.version != container.VERSION_3_NATIVE:
        # a flag whose whole contract is "do not lose data" must never
        # be silently ignored (the v1/v2 wire has nowhere to put it)
        raise ValueError(
            "lossless mode requires the v3 native container "
            "(Options(version=VERSION_3_NATIVE) / --format native)"
        )
    if opts.version == container.VERSION_3_NATIVE:
        # v3 streams carry per-stream codec tags; only the native
        # pipeline writes them (untagged v3 output would not decode).
        from . import native

        native.compress_native(r, w, opts, encode_arrays=encode_arrays)
        return
    default_encoder = encode_arrays is None
    if encode_arrays is None:
        encode_arrays = _default_encode_arrays()
    block_size = resolve_block_size(opts)
    workers = _resolve_workers(opts.workers, extra=1)
    version = opts.version

    from ..runtime import bindings

    # MT default is NumCPU with no +1: the native scanner and collector
    # are real threads already (the +1 heuristic fed the Python pool's
    # nearly-free producer); measured w2 2493 vs w3 2471 vs w4 2285 MB/s.
    mt_workers = _resolve_workers(opts.workers)
    if (
        default_encoder
        and bindings.available()
        and bindings.mt_available()
        and version in (container.VERSION_1, container.VERSION_2)
        and _compress_mt(r, w, opts, block_size, mt_workers)
    ):
        return

    parser = FastqStreamParser(r, block_size=block_size)
    block_iter = parser.blocks()

    # Encoding detection from the reference's fixed window — the first
    # min(DefaultBlockSize, file) records regardless of -b
    # (compress.go:48-52,137-154).
    peeked, qual_offset = peek_detection(block_iter)
    first_block = peeked[0] if peeked else None

    flags = opts.flags
    if qual_offset == refops.PHRED64_OFFSET:
        flags |= container.FLAG_PHRED64
    container.FileHeader(
        version=version, block_size=block_size, flags=flags
    ).write(w)

    if first_block is None:
        return

    def all_blocks():
        yield from peeked
        yield from block_iter

    from ..runtime import bindings

    use_fused = (
        bindings.available()
        and bindings.encode_block_v2_available()
        and encode_arrays is bindings.encode_block_arrays
        and getattr(first_block, "offsets", None) is not None
    )

    if use_fused:
        # one GIL-released native call per block: stream build + 6x zstd
        # + header sizes (the whole of compressBlockWithBuffers,
        # compress.go:471-552) — workers scale past the interpreter lock
        def encode_one(blk: RecordBlock) -> bytes:
            return bindings.encode_block_v2(blk, qual_offset, version)

    else:

        def encode_one(blk: RecordBlock) -> bytes:
            raw = blockcodec.block_to_raw_streams(
                blk, qual_offset, encode_arrays=encode_arrays
            )
            codec = zstd_entropy.get_codec()
            return blockcodec.compress_raw_streams(raw, codec, version)

    ordered_map_write(w, all_blocks(), encode_one, workers)


def decompress(
    r: BinaryIO,
    w: BinaryIO,
    opts: Optional[DecompressOptions] = None,
    decode_arrays=None,
) -> None:
    """Decompress an FQZ container from ``r`` into FASTQ text on ``w``."""
    opts = opts or DecompressOptions()
    workers = _resolve_workers(opts.workers)

    fh = container.read_file_header(r)
    if fh.version not in (
        container.VERSION_1,
        container.VERSION_2,
        container.VERSION_3_NATIVE,
    ):
        raise container.FormatError(f"unsupported file version: {fh.version}")
    qual_offset = (
        refops.PHRED64_OFFSET if fh.phred64 else refops.PHRED33_OFFSET
    )

    if fh.version == container.VERSION_3_NATIVE:
        from . import native

        native.decompress_native(r, w, fh, qual_offset, workers)
        return

    from ..runtime import bindings

    if (
        decode_arrays is None
        and bindings.available()
        and bindings.mt_available()
    ):
        from ..utils.inmem import source_view

        try:
            pos = r.tell() if hasattr(r, "tell") else None
        except OSError:
            pos = None
        view = source_view(r)
        if view is not None:
            fd = _sink_fd(w)
            if fd >= 0 or len(view) <= _MT_BUFFER_CAP_DECODE:
                res = bindings.decompress_mt(
                    np.frombuffer(view, np.uint8),
                    fh.version,
                    qual_offset,
                    workers,
                    fd,
                    sink=w,
                )
                if res is not None:  # None: foreign frames -> per-block path
                    return
            if pos is not None:
                r.seek(pos)  # fall through to the streaming per-block path

    def read_jobs():
        while True:
            hdr = container.read_block_header(r, fh.version)
            if hdr is None:
                return
            payload_size = sum(hdr.stream_sizes(fh.version))
            payload = r.read(payload_size)
            if len(payload) < payload_size:
                raise container.FormatError("truncated block payload")
            yield hdr, payload

    from ..runtime import bindings

    use_fused = (
        decode_arrays is None
        and bindings.available()
        and bindings.decode_block_v2_available()
    )

    def decode_one(job) -> bytes:
        hdr, payload = job
        if use_fused:
            # one GIL-released native call per block: 5/6x zstd decode +
            # FASTQ reassembly (the whole of decompressJobToPooledBuffer
            # + blockReader, compress.go:780-835,944-1078); falls through
            # only for frames without a declared content size
            try:
                res = bindings.decode_block_v2(
                    hdr, payload, fh.version, qual_offset
                )
            except ValueError as e:
                raise container.FormatError(str(e)) from None
            if res is not None:
                return res
        codec = zstd_entropy.get_codec()
        try:
            ds = blockcodec.decode_streams(hdr, payload, fh.version, codec)
            if decode_arrays is None:
                return blockcodec.streams_to_fastq(ds, qual_offset)
            return blockcodec.streams_to_fastq(
                ds, qual_offset, decode_arrays=decode_arrays
            )
        except container.FormatError:
            raise
        except ValueError as e:
            # keep the exception type identical to the fused path for the
            # same corrupt data, regardless of FQZ_NO_NATIVE
            raise container.FormatError(str(e)) from None

    ordered_map_write(w, read_jobs(), decode_one, workers)


class _ChainedReader:
    """Replays already-consumed head bytes, then continues on the stream."""

    def __init__(self, head: bytes, rest: BinaryIO):
        self._head = head
        self._rest = rest

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n < 0 or n >= len(self._head):
                data, self._head = self._head, b""
                if n < 0 or n > len(data):
                    rem = self._rest.read(-1 if n < 0 else n - len(data))
                    return data + rem
                return data
            data, self._head = self._head[:n], self._head[n:]
            return data
        return self._rest.read(n)


def compress_paired(
    r1: BinaryIO, r2: BinaryIO, w: BinaryIO, opts: Optional[Options] = None
) -> None:
    """Compress R1/R2 mate files as one record-interleaved container.

    Sets FLAG_PAIRED_END (container.go:14-17 — defined by the reference
    format but never produced by its compressor); records interleave
    R1[0], R2[0], R1[1], ... via :mod:`fastqpacker_tpu.utils.pairing`.
    """
    from dataclasses import replace

    from ..utils import pairing

    opts = opts or Options()
    opts = replace(opts, flags=opts.flags | container.FLAG_PAIRED_END)
    reader = pairing.InterleavedPairReader(r1, r2)
    if opts.version == container.VERSION_3_NATIVE:
        from . import native

        native.compress_native(reader, w, opts)
    else:
        compress(reader, w, opts)


def decompress_paired(
    r: BinaryIO,
    w1: BinaryIO,
    w2: BinaryIO,
    opts: Optional[DecompressOptions] = None,
) -> None:
    """Split a paired-end container back into R1/R2 mate outputs."""
    from ..utils import pairing

    head = r.read(container.FILE_HEADER_SIZE)
    fh = container.parse_file_header(head)
    if not fh.paired:
        raise container.FormatError(
            "container is not paired-end (FlagPairedEnd not set)"
        )
    dw = pairing.DeinterleavingWriter(w1, w2)
    decompress(_ChainedReader(head, r), dw, opts)
    dw.close()


def compress_bytes(data: bytes, opts: Optional[Options] = None) -> bytes:
    import io

    out = io.BytesIO()
    compress(io.BytesIO(data), out, opts)
    return out.getvalue()


def decompress_bytes(
    data: bytes, opts: Optional[DecompressOptions] = None
) -> bytes:
    import io

    out = io.BytesIO()
    decompress(io.BytesIO(data), out, opts)
    return out.getvalue()
