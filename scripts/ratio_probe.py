"""Measure host-v2/host-v3/mesh compressed sizes + per-stream breakdown
on the synthetic genomic corpus (the VERDICT r2 ratio experiment).

Runs on the virtual CPU mesh: XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu python scripts/ratio_probe.py [MB]
"""
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from bench import synth_fastq
from fastqpacker_tpu.format import container
from fastqpacker_tpu.pipeline import api, meshpipe, native

mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
kind = sys.argv[2] if len(sys.argv) > 2 else "genomic"
data = synth_fastq(
    mb, genomic=kind == "genomic", markov=kind == "markov"
)
print(f"input ({kind}): {len(data)} bytes ({len(data)/2**20:.1f} MB)")


def breakdown(blob: bytes, label: str) -> None:
    r = io.BytesIO(blob)
    fh = container.read_file_header(r)
    if fh.flags & container.FLAG_SEQ_DICT:
        container.read_seq_dict_section(r)
    slots = [0] * 6
    tags = [set() for _ in range(6)]
    nblocks = 0
    while True:
        hdr = container.read_block_header(r, fh.version)
        if hdr is None:
            break
        nblocks += 1
        sizes = hdr.stream_sizes(container.VERSION_2)
        for i, s in enumerate(sizes):
            slots[i] += s
            chunk = r.read(s)
            if fh.version >= container.VERSION_3_NATIVE and i < 3:
                tags[i].add(chunk[0] if chunk else -1)
    names = ["seq", "qual", "hdr", "plus", "npos", "len"]
    parts = ", ".join(
        f"{n}={v} {sorted(t) if t else ''}"
        for n, v, t in zip(names, slots, tags)
    )
    print(
        f"{label}: total={len(blob)} ratio={len(data)/len(blob):.2f}x "
        f"blocks={nblocks}\n  {parts}"
    )


v3 = api.compress_bytes(
    data, api.Options(version=container.VERSION_3_NATIVE)
)
breakdown(v3, "host v3")
v2 = api.compress_bytes(data, api.Options(version=container.VERSION_2))
print(f"host v2: total={len(v2)} ratio={len(data)/len(v2):.2f}x")
mesh_blob = meshpipe.compress_mesh_bytes(data)
breakdown(mesh_blob, "mesh v3")
# round-trip check
out = api.decompress_bytes(mesh_blob)
assert out == api.decompress_bytes(v3), "mesh decode mismatch"
print("round-trip OK")
