"""Weak-scaling harness for the sharded entropy stage (BASELINE.md: GB/s
at 1 chip / 1 host / N hosts; >= 80% weak-scaling efficiency at 2+).

Each device gets a constant-size stream (default 16 MB — the
production-representative size E079 capped the mesh-entropy metric at;
the old 8 MB default sat one lane tier lower and recorded 297 MB/s
where the 16 MB metric recorded 820 on the same stage, VERDICT r4 weak
#5); the batch grows with the mesh, so perfect weak scaling is flat
time / linear aggregate throughput. Timing is chained inside one jit (single dispatch per
measurement — the relay adds ~80 ms per round trip and dedupes identical
dispatches, CLAUDE.md).

On the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N
JAX_PLATFORMS=cpu) the "devices" share the host's physical cores, so
efficiency numbers there validate the SHARDING SHAPE, not hardware
scaling — the output labels which regime it measured. On a real multi-
chip slice the same script produces the hardware numbers.

Usage: python scripts/weak_scaling.py [--mb-per-device 8] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(d: int, mb: int, steps: int = 4) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastqpacker_tpu.ops import rans
    from fastqpacker_tpu.parallel import mesh as pmesh

    m = mb << 20
    lanes = rans._pick_lanes(m)
    mesh = pmesh.make_mesh(d)
    rng = np.random.default_rng(0)
    streams = rng.integers(0, 45, size=(d, m)).astype(np.uint8)
    freq_cum, pad_sym = pmesh.entropy_table(streams, lanes=lanes)
    lens = np.full(d, m, np.int32)

    from jax.sharding import NamedSharding, PartitionSpec as P

    st = jax.device_put(
        jnp.asarray(streams), NamedSharding(mesh, P(pmesh.BLOCK_AXIS, None))
    )
    fc = jax.device_put(jnp.asarray(freq_cum), pmesh.replicated(mesh))
    ln = jax.device_put(
        jnp.asarray(lens), NamedSharding(mesh, P(pmesh.BLOCK_AXIS))
    )

    @jax.jit
    def chained(s0):
        def body(_, carry):
            s, acc = carry
            s = jnp.roll(s, 1, axis=1)
            emits, mask_bits, states, totals, _ = (
                pmesh.entropy_encode_sharded_raw(
                    s, fc, ln,
                    mesh=mesh, pad_sym=pad_sym, m_per_shard=m, lanes=lanes,
                )
            )
            acc = (
                acc
                + jnp.sum(totals).astype(jnp.int32)
                + jnp.sum(mask_bits.astype(jnp.uint32)).astype(jnp.int32)
                + jnp.sum(emits.astype(jnp.uint32)).astype(jnp.int32)
            )
            return (s, acc)

        s, acc = jax.lax.fori_loop(0, steps, body, (s0, jnp.int32(0)))
        return acc

    int(chained(st))  # compile + warm
    t0 = time.perf_counter()
    int(chained(st))
    return (time.perf_counter() - t0) / steps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb-per-device", type=int, default=16)
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    # sitecustomize pins JAX_PLATFORMS=axon; env vars alone cannot force
    # the virtual CPU mesh (CLAUDE.md) — the live config update can.
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    avail = len(jax.devices())
    platform = jax.devices()[0].platform
    dlist = args.devices or [d for d in (1, 2, 4, 8) if d <= avail]
    regime = (
        "hardware" if platform not in ("cpu",) and avail > 1
        else ("virtual-cpu-mesh (shape validation only)" if platform == "cpu"
              else "single-chip")
    )
    print(
        f"# weak scaling: {args.mb_per_device} MB/device, platform="
        f"{platform}, {avail} devices, regime={regime}",
        file=sys.stderr,
    )
    rows = []
    base = None
    for d in dlist:
        dt = measure(d, args.mb_per_device)
        agg = d * args.mb_per_device / dt  # MB/s aggregate (MiB-based)
        per = agg / d
        if base is None:
            base = per
        eff = per / base
        rows.append(
            {"devices": d, "aggregate_mbps": round(agg, 1),
             "per_device_mbps": round(per, 1),
             "weak_scaling_efficiency": round(eff, 3)}
        )
        print(
            f"D={d}: {agg:8.1f} MB/s aggregate  {per:7.1f}/device  "
            f"eff={eff:.2f}",
            file=sys.stderr,
        )
    print(json.dumps({"regime": regime, "platform": platform, "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.stdout.flush()
    rc = main()
    sys.stdout.flush()
    sys.stderr.flush()
    import os

    os._exit(rc)
