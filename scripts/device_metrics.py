"""One-shot device metric capture for a healthy relay window.

The axon relay has outage spells measured in hours (CLAUDE.md); when a
healthy window opens, paying per-process startup + compile for each
``bench.py --metric`` squanders it. This runner executes every device
metric in ONE process (warm compiles shared where shapes allow) and
appends the JSON lines to ``DEVICE_METRICS_r03.jsonl`` with a probe of
relay health first, so a sick window aborts fast instead of recording
garbage numbers.

Usage: python scripts/device_metrics.py [--out FILE] [--mb 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="DEVICE_METRICS_r03.jsonl")
    ap.add_argument("--mb", type=int, default=32)
    ap.add_argument(
        "--health-ms", type=float, default=5000.0,
        help="abort if a trivial dispatch exceeds this (sick relay)",
    )
    args = ap.parse_args()

    from fastqpacker_tpu.utils import malloc_tuning

    malloc_tuning.tune()
    malloc_tuning.warm_heap(256 << 20)

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    _ = int((jnp.arange(4096) * 3).sum())
    dt = (time.perf_counter() - t0) * 1e3
    plat = jax.devices()[0].platform
    print(f"# platform={plat} trivial dispatch {dt:.0f} ms", flush=True)
    if plat == "cpu":
        print("refusing to record device metrics on cpu", file=sys.stderr)
        return 2
    if dt > args.health_ms:
        print(f"relay unhealthy ({dt:.0f} ms); aborting", file=sys.stderr)
        return 3

    import bench

    rows = []

    def run(name, fn):
        t0 = time.perf_counter()
        row = {"metric": name}
        try:
            res = fn()
            if isinstance(res, tuple):
                res = list(res)
            row["result"] = res
        except Exception as e:  # record the failure, keep going
            row["error"] = f"{type(e).__name__}: {e}"
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        row["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")

    run("kernel", lambda: bench.bench_kernel())
    run("decode_kernel", lambda: bench.bench_decode_kernel())
    # 16 MB cap (E079): past the 1024-step padded tier the encode scan
    # runs 3x slower — a regime production stream sizes never reach
    run("mesh_entropy", lambda: bench.bench_mesh_entropy(min(args.mb, 16)))
    run(
        "mesh_entropy_decode",
        lambda: bench.bench_mesh_entropy_decode(max(args.mb // 2, 8)),
    )
    run("wctx_entropy", lambda: bench.bench_wctx_entropy(16, decode=False))
    run(
        "wctx_entropy_decode",
        lambda: bench.bench_wctx_entropy(16, decode=True),
    )
    run("mesh_e2e", lambda: bench.bench_mesh_e2e(args.mb))
    print(f"# wrote {len(rows)} rows to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
