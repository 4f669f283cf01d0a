import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax, jax.numpy as jnp
from lz77_tpu import spec
from lz77_tpu.ops import bitplane, pallas_match

rng = np.random.default_rng(0)
p = spec.Params()
B, G = 1 << 16, 16
H, R = p.d_limit, p.len_limit
data = rng.integers(97, 123, (G, B), np.uint8)
args = [jax.device_put(jnp.asarray(data)),
        jax.device_put(jnp.zeros((G, H), jnp.uint8)),
        jax.device_put(jnp.zeros((G, R), jnp.uint8)),
        jax.device_put(jnp.zeros(G, np.int32)),
        jax.device_put(jnp.full(G, B + R, np.int32))]

def meas(fn, name):
    f = jax.jit(lambda *a: jax.vmap(functools.partial(fn, la=p.la, sb=p.sb))(*a))
    t0 = time.perf_counter()
    out = f(*args)
    s = np.asarray(jnp.sum(out[0]))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s = np.asarray(jnp.sum(f(*args)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {G*B/best/1e6:.1f} MB/s device ({best*1e3:.1f} ms/batch, compile {compile_s:.0f}s, sum={s})")

meas(bitplane.find_matches_bitplane, "bitplane")
meas(pallas_match.find_matches_pallas, "pallas   ")
