"""FQZ v3 compression with the entropy stage on the device mesh.

This is the production path for the framework's core thesis: the entropy
coder (the reference's dominant CPU cost, internal/compress/compress.go:
523-528) runs ON the accelerator mesh, not on host. Blocks are grouped in
rounds of D (one per device); each round's sequence and quality streams
are rANS-coded by ``parallel.mesh.entropy_encode_streams`` — a single
compiled ``shard_map`` program per group whose in-program ``all_gather``
of word counts replaces the reference's ordered collector — and come back
as standalone TAG_RANS wire streams. The container written here is a
standard FQZ v3 file: ``pipeline.native.decompress_native`` (and the
``fqpack`` CLI) decode it with no knowledge of how it was produced.

Host keeps the irregular byte work it is good at (record scan, stream
building, header/plus/npos/length side streams via zstd), exactly the
split SURVEY.md §8 prescribes.
"""

from __future__ import annotations

from typing import BinaryIO, Optional

import numpy as np

from ..format import container
from ..ops import reference as refops
from ..parser.fastq import FastqStreamParser, RecordBlock
from ..entropy import zstd as zstd_entropy
from . import api
from . import blocks as blockcodec
from . import native


def _encode_round(
    blks: list[RecordBlock],
    raws: list,
    qual_offset: int,
    mesh,
    codec,
) -> list[bytes]:
    """Encode one round of <=D blocks; returns v3 wire bytes per block."""
    from ..parallel import mesh as pmesh

    d = len(mesh.devices.flat)
    ordereds = [raw.ordered(container.VERSION_2) for raw in raws]
    pad = d - len(blks)
    seq_group = [o[0] for o in ordereds] + [b""] * pad
    qual_group = [o[1] for o in ordereds] + [b""] * pad
    seq_payloads = pmesh.entropy_encode_streams(seq_group, mesh)
    qual_payloads = pmesh.entropy_encode_streams(qual_group, mesh)

    out = []
    for bi, (raw, ordered) in enumerate(zip(raws, ordereds)):
        crc = native._crc_streams(ordered)
        # v3 wire: streams 0-2 are codec-tagged, 3-5 are raw zstd frames
        # (pipeline/native.py STREAM_CODECS + decode_block_payload)
        comp = [
            bytes([native.TAG_RANS]) + seq_payloads[bi],
            bytes([native.TAG_RANS]) + qual_payloads[bi],
            bytes([native.TAG_ZSTD])
            + native._zstd_candidate(codec, ordered[2]),
        ]
        for s in ordered[3:]:
            comp.append(native._zstd_candidate(codec, s))
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
        out.append(
            hdr.to_bytes(container.VERSION_3_NATIVE) + b"".join(comp)
        )
    return out


def compress_mesh(
    r: BinaryIO,
    w: BinaryIO,
    opts: Optional[api.Options] = None,
    mesh=None,
) -> None:
    """Compress FASTQ from ``r`` into a standard FQZ v3 container whose
    seq/qual entropy stage ran on the device mesh (TAG_RANS streams,
    one block per device per round). Decode with the ordinary
    ``fastqpacker_tpu.decompress`` / CLI — nothing mesh-specific
    survives in the container.
    """
    from ..parallel import mesh as pmesh

    opts = opts or api.Options()
    if opts.lossless:
        raise ValueError(
            "compress_mesh does not implement lossless mode; use the "
            "host v3 pipeline (Options(lossless=True))"
        )
    mesh = mesh or pmesh.make_mesh()
    d = len(mesh.devices.flat)
    block_size = api.resolve_block_size(opts)
    encode_arrays = api._default_encode_arrays()
    codec = zstd_entropy.get_codec()

    parser = FastqStreamParser(r, block_size=block_size)
    block_iter = parser.blocks()
    # Phred detection from the reference's fixed min(100k, file)-record
    # window regardless of -b (compress.go:48-52,137-154).
    peeked, qual_offset = api.peek_detection(block_iter)
    first_block = peeked[0] if peeked else None
    flags = opts.flags | (
        container.FLAG_PHRED64
        if qual_offset == refops.PHRED64_OFFSET
        else 0
    )
    container.FileHeader(
        version=container.VERSION_3_NATIVE,
        block_size=block_size,
        flags=flags,
    ).write(w)
    if first_block is None:
        return

    def all_blocks():
        yield from peeked
        yield from block_iter

    # Overlap the host stages with the device round: while round i's
    # group is being entropy-coded on the mesh, a worker thread parses
    # and stream-builds round i+1's blocks (the host is idle during the
    # device dispatch otherwise — the producer/collector overlap lesson
    # from the reference, PERFORMANCE.md E011/E021).
    from concurrent.futures import ThreadPoolExecutor

    def build_round(blks: list[RecordBlock]):
        return blks, [
            blockcodec.block_to_raw_streams(
                blk, qual_offset,
                encode_arrays=encode_arrays, wide_npos=True,
            )
            for blk in blks
        ]

    def rounds():
        group: list[RecordBlock] = []
        for blk in all_blocks():
            group.append(blk)
            if len(group) == d:
                yield group
                group = []
        if group:
            yield group

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = None
        for group in rounds():
            nxt = pool.submit(build_round, group)
            if fut is not None:
                blks, raws = fut.result()
                for payload in _encode_round(
                    blks, raws, qual_offset, mesh, codec
                ):
                    w.write(payload)
            fut = nxt
        if fut is not None:
            blks, raws = fut.result()
            for payload in _encode_round(
                blks, raws, qual_offset, mesh, codec
            ):
                w.write(payload)


def compress_mesh_bytes(data: bytes, opts=None, mesh=None) -> bytes:
    import io

    out = io.BytesIO()
    compress_mesh(io.BytesIO(data), out, opts, mesh)
    return out.getvalue()


def decompress_mesh(r: BinaryIO, w: BinaryIO, mesh=None) -> None:
    """Decompress an FQZ v3 container with the rANS entropy stage batched
    on the device mesh: groups of D consecutive blocks whose seq/qual
    streams are TAG_RANS with a shared frequency table (what
    ``compress_mesh`` writes per round) decode in one sharded program
    (``parallel.mesh.entropy_decode_streams``); anything else — mixed
    tables, other codec tags, dict/lossless containers — falls back to
    the ordinary per-block decoder. The block CRC32 checks cover the
    batched output, so a wrong batch decode fails exactly like corrupt
    data.
    """
    from ..parallel import mesh as pmesh
    from ..ops import rans

    opts_fh = container.read_file_header(r)
    if opts_fh.version != container.VERSION_3_NATIVE:
        raise container.FormatError(
            "decompress_mesh requires an FQZ v3 container "
            f"(got version {opts_fh.version}); use the ordinary decoder"
        )
    if opts_fh.flags & (container.FLAG_SEQ_DICT | container.FLAG_LOSSLESS):
        # dict/lossless containers: the ordinary pipeline handles the
        # sections; re-dispatch with the header already consumed
        native.decompress_native(
            r, w, opts_fh,
            refops.PHRED64_OFFSET
            if opts_fh.phred64
            else refops.PHRED33_OFFSET,
            api._resolve_workers(None),
        )
        return
    qual_offset = (
        refops.PHRED64_OFFSET if opts_fh.phred64 else refops.PHRED33_OFFSET
    )
    mesh = mesh or pmesh.make_mesh()
    d = len(mesh.devices.flat)
    codec = zstd_entropy.get_codec()

    def read_group():
        group = []
        while len(group) < d:
            hdr = container.read_block_header(
                r, container.VERSION_3_NATIVE
            )
            if hdr is None:
                break
            size = sum(hdr.stream_sizes(container.VERSION_2))
            payload = r.read(size)
            if len(payload) < size:
                raise container.FormatError("truncated block payload")
            group.append((hdr, payload))
        return group

    import struct

    empty = struct.pack(rans.HEADER_FMT, 0, 0)
    while True:
        group = read_group()
        if not group:
            return
        pre = [dict() for _ in group]
        for slot in (0, 1):
            chunks = []
            for hdr, payload in group:
                sizes = hdr.stream_sizes(container.VERSION_2)
                off = sum(sizes[:slot])
                chunks.append(payload[off : off + sizes[slot]])
            if not all(c[:1] == bytes([native.TAG_RANS]) for c in chunks):
                continue  # other codec tags in this group: per-block path
            payloads = [c[1:] for c in chunks] + [empty] * (d - len(group))
            try:
                decoded = pmesh.entropy_decode_streams(payloads, mesh)
            except rans.RansError as e:
                raise container.FormatError(str(e)) from None
            if decoded is None:
                continue  # mixed tables/lanes: per-block path
            for i in range(len(group)):
                pre[i][slot] = decoded[i]
        for (hdr, payload), p in zip(group, pre):
            w.write(
                native.decode_block_payload(
                    hdr, payload, codec, qual_offset,
                    predecoded=p or None,
                )
            )
        if len(group) < d:
            return
