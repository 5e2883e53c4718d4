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
    import threading

    result: list[bool] = []

    def probe() -> None:
        try:
            import jax

            if jax.devices()[0].platform == "cpu":
                result.append(False)
                return
            result.append(
                transfer_bandwidth_mbps() >= MIN_TRANSFER_MBPS
            )
        except Exception:
            result.append(False)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    try:
        timeout = float(os.environ.get("FQZ_PROBE_TIMEOUT", "30"))
    except ValueError:
        timeout = 30.0
    t.join(timeout)
    return bool(result and result[0])
