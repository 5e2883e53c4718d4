"""REAL jax.distributed multi-host execution (2 local processes).

The simulation tests (test_multihost.py) cover the orchestration logic
in one process; this spawns two actual processes that initialize
jax.distributed over a local coordinator, exercise the REAL collective
paths — multihost_utils.broadcast_one_to_all for the Phred flag and
process_allgather for section sizes (DCN in production) — and pwrite
their own byte ranges. Output must be byte-identical to the simulated
path. This is the 'cluster time' item from ROADMAP Multi-host, executed
without a cluster.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import fastqpacker_tpu as fq
from fastqpacker_tpu.parallel import multihost as mh

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port, in_path, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
    process_id=pid,
)
import fastqpacker_tpu as fq
from fastqpacker_tpu.parallel import multihost as mh
mh.compress_multihost(in_path, out_path, fq.Options(block_size=150))
# The size all-gather happens BEFORE the pwrites, so returning from
# compress_multihost does NOT mean the peers' sections are on disk —
# barrier before reading the container back (separate invocations in
# production; the coordinator owns this ordering).
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("fqz-compress-complete")
mh.decompress_multihost(out_path, out_path + ".fq")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(240)
def test_two_process_jax_distributed_compress(tmp_path):
    rng = np.random.default_rng(5)
    recs = []
    for i in range(1500):
        ln = int(rng.integers(1, 160))
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
        q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
        recs.append(f"@mh{i}\n{s}\n+\n{q}\n")
    data = "".join(recs).encode()
    in_path = tmp_path / "in.fq"
    in_path.write_bytes(data)
    out_path = tmp_path / "out.fqz"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual device count in the workers
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(fq.__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port),
             str(in_path), str(out_path)],
            env=env, stderr=subprocess.PIPE, cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        errs.append(err.decode(errors="replace"))
        assert p.returncode == 0, f"worker failed:\n{errs[-1][-2000:]}"

    comp = out_path.read_bytes()
    assert fq.decompress_bytes(comp) == data
    # distributed decompress (real block-stripe sharding) round-trips
    assert (tmp_path / "out.fqz.fq").read_bytes() == data
    # byte-identical to the single-process simulation of the same layout
    sim_path = tmp_path / "sim.fqz"
    mh.simulate_multihost(
        str(in_path), str(sim_path), 2, fq.Options(block_size=150)
    )
    assert sim_path.read_bytes() == comp
