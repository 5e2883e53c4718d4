"""fqpack CLI: compress and decompress FASTQ files.

Same flag surface as the reference CLI (cmd/fqpack/main.go:65-101):
``fqpack [-d] [-i in] [-o out] [-c] [-b blocksize] [-w workers]
[-version] [-h]`` plus positional input/output paths; stdin/stdout
defaults; transparent gzip input in compress mode only
(main.go:123-174).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import BinaryIO, Callable

from .. import __version__
from ..format import container
from ..parser.fastq import FastqParseError
from ..pipeline import api
from ..utils import gzipio

BUFFER_SIZE = 1 << 20


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fqpack",
        description="Fast TPU-native FASTQ compression tool",
        add_help=False,
    )
    p.add_argument("-d", action="store_true", dest="decompress",
                   help="decompress mode")
    p.add_argument("-i", dest="input", default="",
                   help="input file (default: stdin)")
    p.add_argument("-o", dest="output", default="",
                   help="output file (default: stdout)")
    p.add_argument("-c", action="store_true", dest="to_stdout",
                   help="write to stdout (compress mode)")
    p.add_argument("-b", dest="block_size", type=int, default=0,
                   help="records per block (0 = auto: 37500 for the v1/v2 "
                        "speed path, 100000 for v3 context models)")
    p.add_argument("-w", dest="workers", type=int, default=0,
                   help="compression workers (default: NumCPU)")
    p.add_argument("-version", action="store_true", dest="show_version",
                   help="show version and exit")
    p.add_argument("-h", "--help", action="store_true", dest="show_help",
                   help="show help")
    p.add_argument("--backend", choices=["auto", "cpu", "tpu"],
                   default="auto",
                   help="compute backend for block transforms")
    p.add_argument("--format", choices=["zstd", "native"], default="zstd",
                   dest="wire_format",
                   help="container flavor: zstd (fqpack-compatible v2) or "
                        "native (TPU rANS v3)")
    p.add_argument("--max-ratio", action="store_true", dest="max_ratio",
                   help="spend more compute on ratio: enables the order-1 "
                        "context-modeled quality coder (implies "
                        "--format native)")
    p.add_argument("--lossless", action="store_true", dest="lossless",
                   help="strictly lossless: preserve lowercase bases and "
                        "exotic symbols verbatim instead of the "
                        "reference's normalization (implies --format "
                        "native)")
    p.add_argument("--mesh", action="store_true", dest="mesh",
                   help="compress v3 with the entropy stage on the "
                        "device mesh (TAG_RANS seq/qual streams, one "
                        "block per device per round; implies --format "
                        "native). Decode needs no special flag.")
    p.add_argument("--pair", dest="pair", default="",
                   help="paired-end mate file: on compress, the R2 input "
                        "(records interleave R1,R2,...; sets FlagPairedEnd); "
                        "on decompress, the R2 output (-o/-c gets R1)")
    p.add_argument("-r", "--records", dest="records", default="",
                   help="record range START:STOP for the cat subcommand "
                        "(0-based, half-open; either side may be empty)")
    p.add_argument("positional", nargs="*", default=[])
    return p


def _parse_record_range(spec: str) -> tuple[int, int | None]:
    if not spec:
        return 0, None
    head, sep, tail = spec.partition(":")
    try:
        start = int(head) if head else 0
        stop = int(tail) if tail else None
        if not sep and head:  # bare N means the single record N
            stop = start + 1
    except ValueError:
        raise RuntimeError(f"invalid record range: {spec!r}") from None
    if start < 0 or (stop is not None and stop < start):
        raise RuntimeError(f"invalid record range: {spec!r}")
    return start, stop


def _run_bench(bench_args: list[str]) -> int:
    """`fqpack bench` wraps the repo benchmark entry point (bench.py)."""
    import runpy

    bench_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "bench.py"
    )
    if not os.path.exists(bench_path):
        print("error: bench.py not found", file=sys.stderr)
        return 1
    sys.argv = [bench_path] + bench_args
    runpy.run_path(bench_path, run_name="__main__")
    return 0


def cat(target: str, records: str, out: BinaryIO) -> int:
    """Random-access decode of a record sub-range (pipeline/ranges.py)."""
    from ..pipeline import ranges

    start, stop = _parse_record_range(records)
    out.write(ranges.read_record_range(target, start, stop))
    return 0


def open_input(path: str, decompress: bool) -> tuple[BinaryIO, Callable[[], None]]:
    if path in ("", "-"):
        raw = sys.stdin.buffer
        if decompress:
            return raw, lambda: None
        return gzipio.wrap_input_maybe_gzip(path, raw), lambda: None
    try:
        f = open(path, "rb")
    except OSError as e:
        raise RuntimeError(f"cannot open input: {e}") from e
    if decompress:
        return f, f.close
    wrapped = gzipio.wrap_input_maybe_gzip(path, f)
    return wrapped, f.close


def open_output(path: str, to_stdout: bool) -> tuple[BinaryIO, Callable[[], None]]:
    if path in ("", "-") or to_stdout:
        out = sys.stdout.buffer
        return out, out.flush
    try:
        f = open(path, "wb", buffering=BUFFER_SIZE)
    except OSError as e:
        raise RuntimeError(f"cannot create output: {e}") from e
    return f, f.close


def execute(args, inp: BinaryIO, out: BinaryIO) -> None:
    use_device = args.backend == "tpu" or (
        args.backend == "auto" and _tpu_available()
    )
    if args.pair:
        if getattr(args, "mesh", False):
            raise RuntimeError("--mesh does not support --pair yet")
        _execute_paired(args, inp, out)
        return
    if getattr(args, "mesh", False) and args.max_ratio:
        raise RuntimeError(
            "--mesh does not support --max-ratio (the mesh path codes "
            "seq/qual with order-0 rANS on the device)"
        )
    if args.decompress:
        dopts = api.DecompressOptions(workers=args.workers)
        if getattr(args, "mesh", False):
            from ..pipeline import meshpipe

            meshpipe.decompress_mesh(inp, out)
            return
        if use_device:
            from ..pipeline import device

            device.decompress_device(inp, out, dopts)
        else:
            api.decompress(inp, out, dopts)
        return
    version = (
        container.VERSION_3_NATIVE
        if args.wire_format == "native" or args.max_ratio or args.lossless
        else container.CURRENT_VERSION
    )
    opts = api.Options(
        block_size=args.block_size,
        workers=args.workers,
        version=(
            container.VERSION_3_NATIVE if getattr(args, "mesh", False)
            else version
        ),
        order1_qual=args.max_ratio,
        lossless=args.lossless,
    )
    if getattr(args, "mesh", False):
        if args.lossless:
            raise RuntimeError("--mesh does not support --lossless")
        from ..pipeline import meshpipe

        meshpipe.compress_mesh(inp, out, opts)
        return
    if use_device or version == container.VERSION_3_NATIVE:
        from ..pipeline import device

        device.compress_device(inp, out, opts)
        return
    api.compress(inp, out, opts)


def _execute_paired(args, inp: BinaryIO, out: BinaryIO) -> None:
    """--pair handling: R1 comes from -i/-o as usual, R2 from --pair."""
    if args.decompress:
        try:
            w2 = open(args.pair, "wb", buffering=BUFFER_SIZE)
        except OSError as e:
            raise RuntimeError(f"cannot create output: {e}") from e
        try:
            api.decompress_paired(
                inp, out, w2, api.DecompressOptions(workers=args.workers)
            )
        finally:
            w2.close()
        return
    r2, close_r2 = open_input(args.pair, decompress=False)
    try:
        version = (
            container.VERSION_3_NATIVE
            if args.wire_format == "native" or args.max_ratio or args.lossless
            else container.CURRENT_VERSION
        )
        api.compress_paired(
            inp, r2, out,
            api.Options(
                block_size=args.block_size,
                workers=args.workers,
                version=version,
                order1_qual=args.max_ratio,
                lossless=args.lossless,
            ),
        )
    finally:
        close_r2()


def _tpu_available() -> bool:
    """Bounded accelerator probe for ``--backend auto``.

    ``jax.devices()`` initializes the backend, which on a remote/relayed
    platform can block for MINUTES when the link is unhealthy (observed
    259 s on this host) — an unacceptable tax on every CLI compress. The
    init runs in a daemon thread with a deadline (FQZ_PROBE_TIMEOUT
    seconds, default 10); on timeout the CLI takes the host path and the
    straggler thread finishes harmlessly in the background. ``--backend
    tpu`` still waits unboundedly for the device the user insisted on.
    """
    if os.environ.get("FQZ_FORCE_CPU"):
        return False
    if os.environ.get("FQZ_SANITIZE"):
        # sanitizer legs: never initialize jax (its uninstrumented
        # Eigen/llvm thread pools trip TSan; see pipeline/auto.py)
        return False
    from ..pipeline.auto import bounded_probe, cached_probe

    def probe() -> bool:
        import jax

        return jax.devices()[0].platform not in ("cpu",)

    # memoized across CLI processes (E058): on a sick relay the bounded
    # init probe otherwise burns its full deadline on EVERY invocation
    return cached_probe(
        "tpu_available", lambda: bounded_probe(probe, 10.0, False)
    )


def main(argv: list[str] | None = None) -> int:
    try:
        return _main(argv)
    except BrokenPipeError:
        # stdout consumer went away (e.g. `fqpack info | head`): exit
        # silently with the conventional 128+SIGPIPE status.
        try:
            sys.stderr.close()
        except OSError:
            pass
        return 141


def _main(argv: list[str] | None = None) -> int:
    raw_argv = sys.argv[1:] if argv is None else argv
    if raw_argv and raw_argv[0] == "bench":
        # `fqpack bench [...]` forwards everything to the repo bench
        # entry point; bench owns its own flags (--mb, --metric, ...).
        return _run_bench(raw_argv[1:])
    parser = build_argparser()
    args = parser.parse_args(argv)

    if args.show_help:
        parser.print_help(sys.stderr)
        return 0
    if args.show_version:
        print(f"fqpack version {__version__}")
        return 0

    # subcommands: fqpack info|check|cat <file> / fqpack bench [...]
    if args.positional and args.positional[0] in ("info", "check", "cat"):
        sub = args.positional[0]
        target = (
            args.positional[1] if len(args.positional) > 1 else args.input
        )
        try:
            if sub == "cat":
                out, close_out = open_output(args.output, args.to_stdout)
                try:
                    return cat(target, args.records, out)
                finally:
                    close_out()
            from . import inspect as fqinspect

            fn = fqinspect.info if sub == "info" else fqinspect.check
            return fn(target)
        except BrokenPipeError:
            raise
        except (container.FormatError, ValueError, RuntimeError, OSError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1

    if args.positional:
        if not args.input:
            args.input = args.positional[0]
        if len(args.positional) > 1 and not args.output:
            args.output = args.positional[1]

    try:
        inp, close_in = open_input(args.input, args.decompress)
    except RuntimeError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    try:
        out, close_out = open_output(args.output, args.to_stdout)
    except RuntimeError as e:
        close_in()
        print(f"error: {e}", file=sys.stderr)
        return 1

    try:
        execute(args, inp, out)
    except BrokenPipeError:
        raise
    except (container.FormatError, FastqParseError, ValueError,
            RuntimeError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        close_out()
        close_in()
    return 0


if __name__ == "__main__":
    # Exit without interpreter teardown: when the axon relay is
    # unhealthy its client threads abort the process during normal exit
    # ("terminate called ... exception not rethrown", status 134) AFTER
    # the work already succeeded. All outputs are flushed/closed by
    # execute's finally; nothing here needs finalizers. Library callers
    # (tests) use main() directly and are unaffected.
    _rc = main()
    # A consumer that closed our stdout mid-stream (`fqpack info | head`)
    # makes these flushes raise; exiting 141 silently is the pipe
    # convention, not an interpreter error dump.
    try:
        sys.stdout.flush()
    except (BrokenPipeError, ValueError, OSError):
        _rc = 141
    try:
        sys.stderr.flush()
    except (BrokenPipeError, ValueError, OSError):
        pass
    os._exit(_rc)
