"""Separate relay tax from true kernel time with a step-count slope fit.

``bench.py --metric kernel`` divides ONE chained-loop dispatch's total
wall time by its step count, so the relay's fixed round-trip cost (~tens
of ms through the axon tunnel) is smeared into every step: at 20 steps a
50 us kernel reads as 50 us + RTT/20. VERDICT r3 weak #2 ("~2% of
roofline") could be entirely that artifact. Timing the SAME chained
program at several step counts and fitting dt_total(S) = RTT + S * t_k
removes the fixed cost: the slope IS the steady-state per-step kernel
time, and the intercept measures the relay tax directly.

Each step count is dispatched twice and the best is kept (the relay
dedup means identical dispatches are already untrustworthy — the chain
carries data dependences so programs differ per step count).

Usage: python scripts/kernel_slope.py [--metric kernel|decode-kernel]
       [--r 65536] [--len 152] [--steps 10,40,160]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", default="kernel",
                    choices=["kernel", "decode-kernel"])
    ap.add_argument("--r", type=int, default=65536)
    ap.add_argument("--len", type=int, dest="read_len", default=152)
    ap.add_argument("--steps", default="10,40,160")
    args = ap.parse_args()

    from fastqpacker_tpu.utils import malloc_tuning

    malloc_tuning.warm_heap(256 << 20)

    import jax
    import jax.numpy as jnp

    from fastqpacker_tpu.ops.device import encode_arrays_jit

    r, read_len = args.r, args.read_len
    rng = np.random.default_rng(0)
    ab = np.frombuffer(b"ACGT", np.uint8)
    seq = jax.device_put(ab[rng.integers(0, 4, size=(r, read_len))])
    qual = jax.device_put(
        rng.integers(33, 74, size=(r, read_len)).astype(np.uint8)
    )
    lengths = jax.device_put(np.full(r, read_len, dtype=np.int32))

    if args.metric == "kernel":
        def make(steps):
            @jax.jit
            def chained(seq0, qual0):
                def body(_, carry):
                    sq, ql = carry
                    enc = encode_arrays_jit(sq, ql, lengths, 33)
                    return (sq ^ enc.qual_delta, ql ^ enc.qual_delta)

                sq, ql = jax.lax.fori_loop(0, steps, body, (seq0, qual0))
                return jnp.sum(sq.astype(jnp.uint32)) + jnp.sum(
                    ql.astype(jnp.uint32)
                )

            return lambda: float(chained(seq, qual))
        # per-step HBM traffic (bench.py bench_kernel accounting)
        rl = r * read_len
        traffic = int(rl * (2 + 0.25 + 1 + 0.125 + 4))
    else:
        from fastqpacker_tpu.ops.device import decode_arrays_jit
        from fastqpacker_tpu.ops import device as dev

        codes = rng.integers(0, 4, size=(r, read_len)).astype(np.uint8)
        packed = jax.device_put(
            np.packbits(
                np.unpackbits(
                    codes.reshape(r, -1, 1), axis=2, count=2,
                    bitorder="little",
                ).reshape(r, -1),
                axis=1, bitorder="little",
            )
        )
        qd = jax.device_put(
            rng.integers(0, 3, size=(r, read_len)).astype(np.uint8)
        )

        def make(steps):
            @jax.jit
            def chained(p0, d0):
                def body(_, carry):
                    p, dl = carry
                    s, q = decode_arrays_jit(p, dl, lengths, 33)
                    return (
                        p ^ s[:, : p.shape[1]],
                        dl ^ q,
                    )

                p, dl = jax.lax.fori_loop(0, steps, body, (p0, d0))
                return jnp.sum(p.astype(jnp.uint32)) + jnp.sum(
                    dl.astype(jnp.uint32)
                )

            return lambda: float(chained(packed, qd))
        rl = r * read_len
        traffic = int(rl * (0.25 + 1 + 1 + 1 + 4))

    step_counts = [int(s) for s in args.steps.split(",")]
    times = {}
    for s in step_counts:
        fn = make(s)
        fn()  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        times[s] = best
        print(f"steps={s}: total={best * 1e3:.1f} ms", flush=True)

    s_lo, s_hi = min(step_counts), max(step_counts)
    t_k = (times[s_hi] - times[s_lo]) / (s_hi - s_lo)
    rtt = times[s_lo] - s_lo * t_k
    input_bytes = 2 * r * read_len
    gbps = traffic / 1e9 / t_k
    print(
        f"slope fit: t_kernel={t_k * 1e6:.0f} us/step, fixed cost "
        f"(relay RTT + fetch)={rtt * 1e3:.1f} ms"
    )
    print(
        f"true kernel rate: {input_bytes / 1e6 / t_k:.0f} MB/s input, "
        f"{gbps:.1f} GB/s HBM traffic = {100 * gbps / 819.0:.1f}% of "
        f"v5e peak"
    )
    naive = input_bytes / 1e6 / (times[s_lo] / s_lo)
    print(
        f"naive single-dispatch metric at steps={s_lo} would read "
        f"{naive:.0f} MB/s — the fixed cost accounts for the difference"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
