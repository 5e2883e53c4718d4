"""Numpy-fallback coverage: the framework must work without the C++
runtime (FQZ_NO_NATIVE=1) and produce byte-identical containers.

With the native runtime loaded by default, the pure-numpy parser,
varlen helpers, and block codec fallbacks would otherwise go untested.
"""

import os
import subprocess
import sys

SCRIPT = r"""
import os, io
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import fastqpacker_tpu as fq
from fastqpacker_tpu.runtime import bindings
assert not bindings.available(), "native runtime should be disabled"
from fastqpacker_tpu.format import container
from fastqpacker_tpu.pipeline import native

rng = np.random.default_rng(99)
recs = []
for i in range(200):
    ln = int(rng.integers(1, 150))
    s = "".join("ACGTNacgt."[b] for b in rng.integers(0, 10, ln))
    q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
    recs.append(f"@fb_{i} x\n{s}\n+p{i}\n{q}\n")
data = "".join(recs).encode()

comp = fq.compress_bytes(data, fq.Options(block_size=64, workers=1))
out = fq.decompress_bytes(comp)
norm = []
for li, line in enumerate(data.decode().split("\n")):
    if li % 4 == 1:
        norm.append("".join(c.upper() if c.upper() in "ACGT" else "N" for c in line))
    else:
        norm.append(line)
expected = "\n".join(norm).encode()
assert out == expected, "fallback v2 round trip mismatch"

o = io.BytesIO()
native.compress_native(io.BytesIO(data), o,
                       fq.Options(block_size=64, version=container.VERSION_3_NATIVE))
assert fq.decompress_bytes(o.getvalue()) == expected, "fallback v3 mismatch"

# malformed input errors still verbatim
try:
    fq.compress_bytes(b"bad\nACGT\n+\nIIII\n")
    raise SystemExit("expected parse error")
except ValueError as e:
    assert "header line must start with @" in str(e)
print("FALLBACK_OK", len(comp))
"""


def test_numpy_fallback_roundtrips():
    env = {
        **os.environ,
        "FQZ_NO_NATIVE": "1",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "/root/repo",
    }
    p = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        env=env,
        cwd="/root/repo",
        timeout=280,
    )
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    assert b"FALLBACK_OK" in p.stdout


def test_fallback_container_matches_native_container():
    """Both runtimes must emit byte-identical v2 containers."""
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "/root/repo",
    }
    script = (
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys, fastqpacker_tpu as fq\n"
        "data = open('/root/repo/tests/testdata/golden/golden.fq','rb').read()\n"
        "c = fq.compress_bytes(data, fq.Options(block_size=50, workers=1))\n"
        "sys.stdout.buffer.write(c)\n"
    )
    outs = []
    for disable in ("", "1"):
        env = {**env_base, "FQZ_NO_NATIVE": disable}
        p = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, env=env, cwd="/root/repo", timeout=280,
        )
        assert p.returncode == 0, p.stderr.decode()[-2000:]
        outs.append(p.stdout)
    assert outs[0] == outs[1], "native and numpy containers differ"
