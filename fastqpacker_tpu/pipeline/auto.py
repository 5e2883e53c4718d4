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


@lru_cache(maxsize=1)
def device_worthwhile() -> bool:
    """Should block transforms run on the accelerator?

    The probe (backend init + two transfers) runs in a daemon thread
    with a deadline: on an unhealthy relayed link either step can block
    for minutes (E050), and an auto decision that slow is already the
    wrong one — route host and let the straggler finish harmlessly.
    """
    force = os.environ.get("FQZ_BACKEND", "").lower()
    if force in ("tpu", "device"):
        return True
    if force in ("cpu", "host"):
        return False
    def probe() -> bool:
        import jax

        if jax.devices()[0].platform == "cpu":
            return False
        return transfer_bandwidth_mbps() >= MIN_TRANSFER_MBPS

    return bool(bounded_probe(probe, 30.0, False))
