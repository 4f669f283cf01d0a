"""lz77_tpu — a TPU-native LZ77 codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C
reference codec (cstdvd/lz77): same stream format, CLI surface, and decode
semantics, but block-parallel and mesh-shardable instead of byte-serial.

Layering (mirrors SURVEY.md §1's layer map, re-drawn TPU-first):

* ``spec`` / ``bitio``      — format contract + host bitstream codec
* ``ops``                   — device kernels: match, parse, pack, decode
* ``models``                — codec pipelines (encoder, decoder, file codec)
* ``parallel``              — mesh / shard_map / multi-host orchestration
* ``utils``                 — metrics, profiling, manifest, fault handling
* ``cli``                   — reference-compatible command line driver
"""

from . import spec
from .spec import Params

__version__ = "0.1.0"

__all__ = ["spec", "Params", "__version__"]
