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
FLAGS = ["-O3", "-march=native", "-shared", "-fPIC", "-fvisibility=default"]


def ensure_built(verbose: bool = False) -> str | None:
    """Compile if needed; returns the library path or None on failure."""
    try:
        if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(
            SRC
        ):
            return LIB
        cmd = [CXX, *FLAGS, "-o", LIB, SRC]
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


if __name__ == "__main__":
    path = ensure_built(verbose=True)
    print(path or "BUILD FAILED")
    sys.exit(0 if path else 1)
