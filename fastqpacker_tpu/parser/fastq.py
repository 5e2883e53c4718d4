"""Vectorized FASTQ parsing into TPU-friendly record blocks.

The reference parses record-at-a-time with a buffered line reader
(`/root/reference/internal/fqparser/parser.go`). On TPU the natural unit is
a *block* of records as dense arrays, so this parser is a vectorized 4-line
record scanner: newline positions are found with whole-buffer numpy scans,
lines are validated in bulk, and sequence/quality bytes land in padded
``(records, max_len)`` matrices ready for device transfer.

Behavioral contract matched to the reference:

- Lines split on ``\n``; a trailing ``\r`` is stripped (parser.go:213-214).
- Record = 4 lines: header starting ``@`` (stripped), sequence, separator
  starting ``+`` (payload kept, ``+`` stripped), quality
  (parser.go:61-106); ``len(seq) == len(qual)`` enforced (parser.go:179).
- Error messages match parser.go:70,88,180 verbatim.
- A trailing record whose lines end before the 4th newline is dropped, but
  its *complete* lines are still validated, mirroring the reference's
  line-by-line reads hitting EOF mid-record (parser.go:136-184 +
  readLine EOF handling).
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import BinaryIO, Iterator

import numpy as np

from ..utils import varlen

NEWLINE = 0x0A
CR = 0x0D

ERR_HEADER = "invalid FASTQ: header line must start with @"
ERR_PLUS = "invalid FASTQ: separator line must start with +"
ERR_LEN_MISMATCH = "invalid FASTQ: sequence and quality lengths must match"

# Quality padding byte: 0xFF never appears in valid Phred data and keeps
# masked minima correct during encoding detection.
QUAL_PAD = 0xFF
SEQ_PAD = 0x00  # packs to code 0 ('A'); never emitted thanks to length masks


class FastqParseError(ValueError):
    pass


class RecordBlock:
    """A block of parsed FASTQ records in dense, device-friendly layout.

    ``seq``/``qual`` are ``(n, max_len)`` uint8 padded matrices, built
    lazily from ``text`` + scan ``offsets`` when the parser took the
    native path (the single-pass C++ stream builder never needs them);
    ``lengths`` holds per-record sequence lengths. Headers and plus-line
    payloads stay on host as raw byte runs referenced into ``text``.
    """

    def __init__(
        self,
        n: int,
        lengths: np.ndarray,
        text: np.ndarray,
        header_starts: np.ndarray,
        header_lengths: np.ndarray,
        plus_starts: np.ndarray,
        plus_lengths: np.ndarray,
        seq: np.ndarray | None = None,
        qual: np.ndarray | None = None,
        offsets: np.ndarray | None = None,  # (n, 8) native scan offsets
    ):
        self.n = n
        self.lengths = lengths
        self.text = text
        self.header_starts = header_starts
        self.header_lengths = header_lengths
        self.plus_starts = plus_starts
        self.plus_lengths = plus_lengths
        self.offsets = offsets
        self._seq = seq
        self._qual = qual

    @property
    def seq(self) -> np.ndarray:
        if self._seq is None:
            self._seq = varlen.gather_rows(
                self.text, self.offsets[:, 2], self.offsets[:, 3],
                fill=SEQ_PAD,
            )
        return self._seq

    @property
    def qual(self) -> np.ndarray:
        if self._qual is None:
            self._qual = varlen.gather_rows(
                self.text, self.offsets[:, 6], self.offsets[:, 3],
                fill=QUAL_PAD,
            )
        return self._qual

    @property
    def max_len(self) -> int:
        return int(self.lengths.max()) if self.n else 0

    def header_stream(self) -> bytes:
        """u16 length-prefixed header stream (compress.go:514-515)."""
        return varlen.build_len16_stream(
            self.text, self.header_starts, self.header_lengths
        )

    def plus_stream(self) -> bytes:
        """u16 length-prefixed plus-line payload stream (compress.go:518-519)."""
        return varlen.build_len16_stream(
            self.text, self.plus_starts, self.plus_lengths
        )

    def record(self, i: int) -> tuple[bytes, bytes, bytes, bytes]:
        """(header, sequence, plus, quality) bytes of record i (for tests)."""
        ln = int(self.lengths[i])
        return (
            self.text[
                self.header_starts[i] : self.header_starts[i]
                + self.header_lengths[i]
            ].tobytes(),
            self.seq[i, :ln].tobytes(),
            self.text[
                self.plus_starts[i] : self.plus_starts[i] + self.plus_lengths[i]
            ].tobytes(),
            self.qual[i, :ln].tobytes(),
        )


def _line_bounds(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end (exclusive, CR-stripped) offsets of complete lines."""
    nl = np.flatnonzero(data == NEWLINE)
    starts = np.empty_like(nl)
    if len(nl):
        starts[0] = 0
        starts[1:] = nl[:-1] + 1
    ends = nl.copy()
    if len(nl):
        has_cr = (ends > starts) & (data[np.maximum(ends - 1, 0)] == CR)
        ends[has_cr] -= 1
    return starts, ends


def parse_block_array(data: np.ndarray) -> RecordBlock:
    """Parse a buffer of complete FASTQ records (vectorized).

    ``data`` must contain exactly 4*n complete newline-terminated lines.
    """
    starts, ends = _line_bounds(data)
    return _records_from_lines(data, starts, ends, len(starts) // 4)


def _records_from_lines(
    data: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    n: int,
    leftover_check: bool = True,
) -> RecordBlock:
    lens = ends - starts

    h_idx = np.arange(n) * 4
    s_idx = h_idx + 1
    p_idx = h_idx + 2
    q_idx = h_idx + 3

    hdr_ok = (lens[h_idx] > 0) & (data[starts[h_idx]] == ord("@")) if n else np.empty(0, bool)
    plus_ok = (lens[p_idx] > 0) & (data[starts[p_idx]] == ord("+")) if n else np.empty(0, bool)
    len_ok = lens[s_idx] == lens[q_idx] if n else np.empty(0, bool)

    if n and not (hdr_ok.all() and plus_ok.all() and len_ok.all()):
        # Report the error the reference would hit first: the failing check
        # at the lowest line number (header @ line 4i, plus @ 4i+2,
        # mismatch detected after line 4i+3).
        bad_hdr = np.flatnonzero(~hdr_ok)
        bad_plus = np.flatnonzero(~plus_ok)
        bad_len = np.flatnonzero(~len_ok)
        cands = []
        if len(bad_hdr):
            cands.append((bad_hdr[0] * 4 + 0, ERR_HEADER))
        if len(bad_plus):
            cands.append((bad_plus[0] * 4 + 2, ERR_PLUS))
        if len(bad_len):
            cands.append((bad_len[0] * 4 + 3, ERR_LEN_MISMATCH))
        cands.sort()
        raise FastqParseError(cands[0][1])

    if leftover_check:
        _validate_leftover_lines(data, starts, ends, n)

    seq_starts = starts[s_idx] if n else np.empty(0, np.int64)
    seq_lens = lens[s_idx] if n else np.empty(0, np.int64)
    qual_starts = starts[q_idx] if n else np.empty(0, np.int64)

    seq = varlen.gather_rows(data, seq_starts, seq_lens, fill=SEQ_PAD)
    qual = varlen.gather_rows(data, qual_starts, seq_lens, fill=QUAL_PAD)

    return RecordBlock(
        n=n,
        seq=seq,
        qual=qual,
        lengths=seq_lens.astype(np.int32),
        text=data,
        header_starts=(starts[h_idx] + 1) if n else np.empty(0, np.int64),
        header_lengths=(lens[h_idx] - 1) if n else np.empty(0, np.int64),
        plus_starts=(starts[p_idx] + 1) if n else np.empty(0, np.int64),
        plus_lengths=(lens[p_idx] - 1) if n else np.empty(0, np.int64),
    )


def _validate_leftover_lines(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray, n: int
) -> None:
    """Validate complete lines of a trailing partial record.

    The reference reads these lines before hitting EOF, so their structural
    checks still fire even though the record is dropped (parser.go:136-168).
    Unterminated trailing bytes (no final newline) are never validated.
    """
    total = len(starts)
    extra = total - n * 4
    if extra >= 1:
        i = n * 4
        if ends[i] == starts[i] or data[starts[i]] != ord("@"):
            raise FastqParseError(ERR_HEADER)
    if extra >= 3:
        i = n * 4 + 2
        if ends[i] == starts[i] or data[starts[i]] != ord("+"):
            raise FastqParseError(ERR_PLUS)


def _native():
    from ..runtime import bindings

    return bindings if bindings.available() else None


def _block_from_offsets(data: np.ndarray, offs: np.ndarray) -> RecordBlock:
    """Build a RecordBlock from native scan offsets (n, 8); the padded
    seq/qual matrices are materialized lazily only if a consumer needs
    them (device backends, detection on the first block)."""
    n = len(offs)
    seq_lens = offs[:, 3] if n else np.empty(0, np.int64)
    return RecordBlock(
        n=n,
        lengths=seq_lens.astype(np.int32),
        text=data,
        header_starts=offs[:, 0] if n else np.empty(0, np.int64),
        header_lengths=offs[:, 1] if n else np.empty(0, np.int64),
        plus_starts=offs[:, 4] if n else np.empty(0, np.int64),
        plus_lengths=offs[:, 5] if n else np.empty(0, np.int64),
        offsets=offs if n else None,
        seq=None if n else np.zeros((0, 0), np.uint8),
        qual=None if n else np.zeros((0, 0), np.uint8),
    )


class FastqStreamParser:
    """Streaming block parser: yields :class:`RecordBlock` of ``block_size``.

    Replaces the reference's producer goroutine + record batches
    (compress.go:303-363) with chunked reads and a native sequential
    record scan (numpy vectorized splits as fallback).
    """

    def __init__(
        self,
        reader: BinaryIO,
        block_size: int = 100000,
        chunk_bytes: int = 8 << 20,
    ):
        self.reader = reader
        self.block_size = block_size
        self.chunk_bytes = chunk_bytes
        self._pending = b""
        self._eof = False

    def _read_more(self) -> bool:
        chunk = self.reader.read(self.chunk_bytes)
        if not chunk:
            self._eof = True
            return False
        self._pending += chunk
        return True

    def _fill(self, target_bytes: int) -> None:
        while not self._eof and len(self._pending) < target_bytes:
            want = max(self.chunk_bytes, target_bytes - len(self._pending))
            chunk = self.reader.read(want)
            if not chunk:
                self._eof = True
                return
            self._pending += chunk

    def blocks(self) -> Iterator[RecordBlock]:
        nat = _native()
        if nat is not None:
            mv = self._inmem_view()
            if mv is not None:
                yield from self._blocks_native_inmem(nat, mv)
            else:
                yield from self._blocks_native(nat)
        else:
            yield from self._blocks_numpy()

    def _inmem_view(self):
        """Zero-copy view of the whole source when it is addressable
        (:func:`fastqpacker_tpu.utils.inmem.source_view`); ``None`` sends
        pipes/gzip/peek wrappers down the streaming path. The reader is
        advanced to EOF — block views replace reads."""
        from ..utils.inmem import source_view

        return source_view(self.reader)

    def _blocks_native_inmem(self, nat, mv) -> Iterator[RecordBlock]:
        """Scan record blocks in place over an addressable source — no
        block buffers, no copies; yielded blocks view the source."""
        from ..runtime.bindings import SCAN_ERRORS

        arr = np.frombuffer(mv, np.uint8)
        pos = 0
        while pos < arr.size:
            data = arr[pos:]
            offs, consumed, err = nat.scan_records(data, self.block_size)
            if err:
                raise FastqParseError(SCAN_ERRORS[err])
            n = len(offs) if offs is not None else 0
            if n == 0:
                # partial trailing record at EOF: complete lines already
                # validated by the scan; dropped like the streaming path
                return
            yield _block_from_offsets(data, offs)
            pos += consumed

    def _read_into(self, buf: np.ndarray, filled: int) -> int:
        """Fill ``buf[filled:]`` from the reader until full or EOF; one
        copy from the source, no intermediate bytes objects."""
        readinto = getattr(self.reader, "readinto", None)
        mv = memoryview(buf).cast("B")
        while not self._eof and filled < len(buf):
            if readinto is not None:
                try:
                    got = readinto(mv[filled:])
                except (NotImplementedError, io.UnsupportedOperation):
                    # e.g. the CLI's gzip-sniff peek wrapper only
                    # implements read()
                    readinto = None
                    continue
                if not got:
                    self._eof = True
                    break
                filled += got
            else:
                chunk = self.reader.read(len(buf) - filled)
                if not chunk:
                    self._eof = True
                    break
                buf[filled : filled + len(chunk)] = np.frombuffer(
                    chunk, np.uint8
                )
                filled += len(chunk)
        return filled

    def _blocks_native(self, nat) -> Iterator[RecordBlock]:
        from ..runtime.bindings import SCAN_ERRORS

        avg = 512  # adaptive bytes-per-record estimate
        leftover = b""
        while True:
            # One fresh buffer per block: yielded blocks hold views into
            # it, so ownership transfers and it is never mutated after
            # the leftover tail is copied out.
            target = max(int(self.block_size * avg * 1.15) + 1024,
                         len(leftover))
            buf = np.empty(target, np.uint8)  # no zero-fill
            if leftover:
                buf[: len(leftover)] = np.frombuffer(leftover, np.uint8)
            filled = self._read_into(buf, len(leftover))
            leftover = b""
            while True:
                data = buf[:filled]
                if filled == 0:
                    return
                offs, consumed, err = nat.scan_records(data, self.block_size)
                if err:
                    raise FastqParseError(SCAN_ERRORS[err])
                n = len(offs) if offs is not None else 0
                if n >= self.block_size or self._eof:
                    break
                avg *= 2  # underestimated record size; read more
                # never shrink below the bytes already read: after avg
                # adapts down on small records, one huge record otherwise
                # makes this target smaller than `filled` (broadcast crash)
                bigger = np.empty(
                    max(
                        int(self.block_size * avg * 1.15) + 1024,
                        filled * 2,
                    ),
                    np.uint8,
                )
                bigger[:filled] = buf[:filled]
                buf = bigger
                filled = self._read_into(buf, filled)
            if n == 0:
                return  # EOF; partial-record lines already validated by scan
            block = _block_from_offsets(data, offs)
            leftover = buf[consumed:filled].tobytes()
            avg = max(64, consumed // n)
            yield block
            if self._eof and not leftover:
                return

    def _blocks_numpy(self) -> Iterator[RecordBlock]:
        lines_needed = self.block_size * 4
        while True:
            data = np.frombuffer(self._pending, dtype=np.uint8)
            nl_count = int((data == NEWLINE).sum()) if len(data) else 0
            if nl_count < lines_needed and not self._eof:
                if self._read_more():
                    continue
            if len(data) == 0:
                return
            nl = np.flatnonzero(data == NEWLINE)
            n_complete = len(nl) // 4
            n_take = min(n_complete, self.block_size)
            if n_take == 0:
                if self._eof:
                    # Partial record at EOF: validate complete lines, drop.
                    starts, ends = _line_bounds(data)
                    _validate_leftover_lines(data, starts, ends, 0)
                    return
                if not self._read_more():
                    continue
                continue
            cut = int(nl[n_take * 4 - 1]) + 1
            block_data = data[:cut].copy()
            is_tail = self._eof and n_take * 4 == len(nl)
            if is_tail:
                starts, ends = _line_bounds(data)
                block = _records_from_lines(
                    data, starts, ends, n_take, leftover_check=True
                )
                yield block
                return
            starts, ends = _line_bounds(block_data)
            block = _records_from_lines(
                block_data, starts, ends, n_take, leftover_check=False
            )
            self._pending = data[cut:].tobytes()
            yield block
            if self._eof and not self._pending:
                return


def parse_all(data: bytes, block_size: int = 100000) -> list[RecordBlock]:
    """Parse an in-memory FASTQ buffer into blocks (test convenience)."""
    return list(FastqStreamParser(io.BytesIO(data), block_size).blocks())
