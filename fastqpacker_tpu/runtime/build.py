"""Build libfqruntime.so from fqruntime.cpp on demand.

The shared library is compiled lazily at import time when missing or when
the source is newer than the binary; failures degrade gracefully (the
numpy fallbacks in the callers keep working).
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "fqruntime.cpp")
LIB = os.path.join(_DIR, "libfqruntime.so")

CXX = os.environ.get("CXX", "g++")
FLAGS = [
    "-O3", "-march=native", "-shared", "-fPIC", "-fvisibility=default",
    "-pthread",  # whole-file MT pipeline (fq_compress_mt/fq_decompress_mt)
]
# the fused block encoder entropy-codes in-process (fq_encode_block_v2)
LIBS = ["-lzstd"]


CLI_SRC = os.path.join(_DIR, "fqpack_cli.cpp")
CLI_BIN = os.path.join(os.path.dirname(os.path.dirname(_DIR)), "bin", "fqpack")


def build_cli(verbose: bool = False) -> str | None:
    """Build the native fqpack front-end (E077): drives the whole-file
    MT pipeline in libfqruntime.so directly for the v1/v2 CLI surface
    (~5 ms startup vs ~2.3 s of Python/jax environment startup) and
    execs the Python CLI for everything else."""
    if ensure_built(verbose) is None:
        return None
    try:
        if os.path.exists(CLI_BIN) and os.path.getmtime(
            CLI_BIN
        ) >= max(os.path.getmtime(CLI_SRC), os.path.getmtime(LIB)):
            return CLI_BIN
        os.makedirs(os.path.dirname(CLI_BIN), exist_ok=True)
        cmd = [
            CXX, "-O3", "-march=native", "-pthread", "-o", CLI_BIN,
            CLI_SRC, "-L" + _DIR, "-lfqruntime", "-lzstd",
            "-Wl,-rpath," + os.path.join(
                "$ORIGIN", "..", "fastqpacker_tpu", "runtime"
            ),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            if verbose:
                print(
                    f"fqpack cli build failed:\n{proc.stderr}",
                    file=sys.stderr,
                )
            return None
        return CLI_BIN
    except OSError:
        return None


def ensure_built(verbose: bool = False) -> str | None:
    """Compile if needed; returns the library path or None on failure."""
    try:
        if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(
            SRC
        ):
            return LIB
        cmd = [CXX, *FLAGS, "-o", LIB, SRC, *LIBS]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            if verbose:
                print(
                    f"fqruntime build failed:\n{proc.stderr}", file=sys.stderr
                )
            return None
        return LIB
    except OSError:
        return None


def _compile(extra_flags: list[str]) -> bool:
    cmd = [CXX, *FLAGS, *extra_flags, "-o", LIB, SRC, *LIBS]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        print(f"fqruntime build failed:\n{proc.stderr}", file=sys.stderr)
        return False
    return True


_PGO_WORKLOAD = r"""
import io, os, sys
# sitecustomize exports JAX_PLATFORMS=axon before user code runs, so
# setdefault is a no-op — force both the env var and the config call
# (CLAUDE.md recipe), and pin the transform router to the host path.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["FQZ_BACKEND"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.getcwd())
from bench import synth_fastq
from fastqpacker_tpu.pipeline import api
from fastqpacker_tpu.format import container
data = synth_fastq(24)
for version, order1 in ((container.VERSION_2, False),
                        (container.VERSION_3_NATIVE, False),
                        (container.VERSION_3_NATIVE, True)):
    comp = api.compress_bytes(
        data, api.Options(version=version, order1_qual=order1)
    )
    assert api.decompress_bytes(comp) == data
print("pgo workload ok", file=sys.stderr)
"""


def build_pgo() -> str | None:
    """Profile-guided rebuild (reference analog: Makefile build-pgo):
    instrument, run a representative compress/decompress workload over
    both container formats, recompile with the profile."""
    pgo_dir = os.path.join(_DIR, "pgo")
    os.makedirs(pgo_dir, exist_ok=True)
    if not _compile([f"-fprofile-generate={pgo_dir}"]):
        return None
    env = dict(
        os.environ,
        FQZ_RANS_BACKEND="host",
        FQZ_BACKEND="cpu",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, "-c", _PGO_WORKLOAD],
        cwd=os.path.dirname(os.path.dirname(_DIR)),
        env=env, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        print(f"pgo workload failed:\n{proc.stderr[-2000:]}", file=sys.stderr)
        _compile([])  # restore a plain build
        return None
    if not _compile([f"-fprofile-use={pgo_dir}", "-fprofile-correction"]):
        return None
    return LIB


def build_sanitized(kind: str) -> str | None:
    """Sanitizer build (the analog of the reference's `go test -race`,
    Makefile:13-14): -fsanitize=thread|address at -O1 with frame
    pointers. Overwrites the production .so — rebuild plain (or PGO)
    afterwards; `make test-tsan`/`test-asan` do this automatically."""
    flags = [
        f"-fsanitize={kind}", "-O1", "-g", "-fno-omit-frame-pointer",
    ]
    # drop -O3 so sanitizer instrumentation stays precise
    global FLAGS
    saved = FLAGS
    FLAGS = [f for f in FLAGS if f != "-O3"]
    try:
        return LIB if _compile(flags) else None
    finally:
        FLAGS = saved


if __name__ == "__main__":
    if "--pgo" in sys.argv:
        path = build_pgo()
        if path is not None:
            build_cli(verbose=True)  # relink against the PGO'd .so
    elif "--tsan" in sys.argv:
        path = build_sanitized("thread")
    elif "--asan" in sys.argv:
        path = build_sanitized("address")
    elif "--force" in sys.argv:
        path = LIB if _compile([]) else None
    elif "--cli" in sys.argv:
        path = build_cli(verbose=True)
    else:
        path = ensure_built(verbose=True)
        if path is not None:
            build_cli(verbose=True)  # best-effort; bin/fqpack
    print(path or "BUILD FAILED")
    sys.exit(0 if path else 1)
