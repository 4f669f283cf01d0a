import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax
import bench
from lz77_tpu import spec
from lz77_tpu.models import codec
params = spec.Params()
data = bench.make_text(4 << 20)
kw = dict(block_size=1 << 16, batch_blocks=16, matcher="chunked")
t0=time.perf_counter()
s = codec.encode_bytes(data[: 1 << 21], params, **kw)
print(f"warmup 2MB: {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
s = codec.encode_bytes(data, params, **kw)
print(f"4MB: {time.perf_counter()-t0:.1f}s -> {4/(time.perf_counter()-t0):.2f} MB/s", flush=True)
t0=time.perf_counter()
assert codec.decode_bytes(s) == data
print(f"decode ok {time.perf_counter()-t0:.1f}s", flush=True)
