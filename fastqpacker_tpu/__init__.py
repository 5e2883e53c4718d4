"""fastqpacker_tpu: a TPU-native FASTQ compression framework.

A from-scratch JAX/XLA/Pallas reimagining of the fqpack speed-first FASTQ
codec (reference: vertti/fastqpacker): vectorized record parsing, dense
block encoding on TPU (2-bit base packing, N-bitmask extraction,
delta-coded qualities as fused device kernels), zstd-compatible FQZ v1/v2
containers plus a TPU-resident rANS entropy backend (FQZ v3), and
data-parallel block sharding over device meshes.

Public API::

    from fastqpacker_tpu import compress, decompress, Options
"""

from .utils import malloc_tuning as _malloc_tuning

_malloc_tuning.tune()

from .format import container
from .pipeline.api import (
    DEFAULT_BLOCK_SIZE,
    DecompressOptions,
    Options,
    compress,
    compress_bytes,
    decompress,
    decompress_bytes,
)

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_BLOCK_SIZE",
    "DecompressOptions",
    "Options",
    "compress",
    "compress_bytes",
    "container",
    "decompress",
    "decompress_bytes",
    "__version__",
]
