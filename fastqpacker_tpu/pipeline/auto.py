"""Adaptive backend selection: measure, then commit.

The device pipeline wins only when host<->device bandwidth can keep up
with the dense transforms (on healthy hardware PCIe/ICI gives tens of
GB/s; behind a degraded or tunneled link it can fall to MB/s). Rather than
assume, the scheduler probes the real transfer path once per process and
routes block transforms to the device only when profitable — the TPU
analog of the reference's measured single-worker fast paths
(PERFORMANCE.md E008/E011/E021: use the parallel machinery only when it
actually wins).
"""

from __future__ import annotations

import os
import time
from functools import lru_cache

import numpy as np

def bounded_probe(fn, default_timeout: float, fallback):
    """Run ``fn`` in a daemon thread with a deadline (FQZ_PROBE_TIMEOUT
    overrides ``default_timeout``); return ``fallback`` on timeout or
    error. On an unhealthy relayed link, backend init and device_put can
    block for minutes (E050/E053) — a probe that slow has already made
    the decision."""
    import threading

    result = []

    def run() -> None:
        try:
            result.append(fn())
        except Exception:
            pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        timeout = float(
            os.environ.get("FQZ_PROBE_TIMEOUT", str(default_timeout))
        )
    except ValueError:
        timeout = default_timeout
    t.join(timeout)
    return result[0] if result else fallback


# Minimum round-trip bandwidth for the device path to beat the host path:
# the host pipeline sustains hundreds of MB/s, and the device path moves
# ~1.3x the input over the link (in: seq+qual, out: packed+delta+masks).
MIN_TRANSFER_MBPS = 1000.0


@lru_cache(maxsize=1)
def transfer_bandwidth_mbps(nbytes: int = 2 << 20) -> float:
    """Measured min(host->device, device->host) bandwidth in MB/s."""
    import jax

    if jax.devices()[0].platform == "cpu":
        return float("inf")  # same memory; transfers are no-ops
    x = np.ones(nbytes, dtype=np.uint8)
    # warmup both directions
    xd = jax.device_put(x)
    np.asarray(xd)

    t0 = time.perf_counter()
    xd = jax.device_put(x)
    xd.block_until_ready()
    h2d = nbytes / 1e6 / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    np.asarray(xd)
    d2h = nbytes / 1e6 / (time.perf_counter() - t0)
    return min(h2d, d2h)


def _cache_path() -> str:
    import tempfile

    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"fqz_probe_cache_{uid}.json")


def cached_probe(key: str, compute, ttl_default: float = 300.0):
    """Cross-PROCESS probe cache (E058): every CLI invocation is a fresh
    process, and on a sick relay the bounded availability + transfer
    probes burn their full deadlines (10 s + 30 s) before 0.4 s of
    actual work — a 1 GB canonical run measured 31 MB/s end-to-end with
    user+sys under 3 s. Probe outcomes are stable on the scale of
    minutes, so they are memoized in a tmp JSON with a TTL
    (FQZ_PROBE_CACHE_TTL seconds, 0 disables). Values are coerced to
    bool; a corrupt or stale file just means re-probing."""
    try:
        ttl = float(os.environ.get("FQZ_PROBE_CACHE_TTL", str(ttl_default)))
    except ValueError:
        ttl = ttl_default
    path = _cache_path()
    data = {}
    if ttl > 0:
        try:
            import json

            with open(path) as f:
                data = json.load(f)
            if (
                isinstance(data, dict)
                and time.time() - float(data.get("ts", 0)) < ttl
                and key in data.get("values", {})
            ):
                return bool(data["values"][key])
        except (OSError, ValueError, TypeError):
            data = {}
    val = bool(compute())
    if ttl > 0:
        try:
            import json

            values = data.get("values", {}) if isinstance(data, dict) else {}
            if not isinstance(values, dict):
                values = {}
            values[key] = val
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump({"ts": time.time(), "values": values}, f)
            os.replace(tmp, path)
        except (OSError, ValueError, TypeError):
            pass
    return val


@lru_cache(maxsize=1)
def device_worthwhile() -> bool:
    """Should block transforms run on the accelerator?

    The probe (backend init + two transfers) runs in a daemon thread
    with a deadline: on an unhealthy relayed link either step can block
    for minutes (E050), and an auto decision that slow is already the
    wrong one — route host and let the straggler finish harmlessly.
    The outcome is memoized across processes for a few minutes
    (``cached_probe``) so back-to-back CLI runs don't re-pay the probe.
    """
    force = os.environ.get("FQZ_BACKEND", "").lower()
    if force in ("tpu", "device"):
        return True
    if os.environ.get("FQZ_SANITIZE"):
        # sanitizer legs (make test-tsan/test-asan) must stay inside our
        # instrumented native code: jaxlib's llvm thread pool has
        # uninstrumented internal races TSan reports against us, and
        # whether the probe wanders there depends on the cross-process
        # cache's state — a flaky leg either way
        return False
    if force in ("cpu", "host"):
        return False

    def probe() -> bool:
        import jax

        if jax.devices()[0].platform == "cpu":
            return False
        return transfer_bandwidth_mbps() >= MIN_TRANSFER_MBPS

    return cached_probe(
        "device_worthwhile", lambda: bounded_probe(probe, 30.0, False)
    )
