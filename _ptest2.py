import time, numpy as np, jax, jax.numpy as jnp, functools, re
from lz77_tpu.ops import pallas_match
from lz77_tpu import spec
rng = np.random.default_rng(0)
la, sb = 8, 129
p = spec.Params(la=la, sb=sb)
B = 1024
x = rng.integers(97,103,B,dtype=np.uint8)
f = jax.jit(functools.partial(pallas_match.find_matches_pallas, la=la, sb=sb, tile=1024))
args = (jnp.asarray(x), jnp.zeros(p.d_limit, jnp.uint8), jnp.zeros(p.len_limit, jnp.uint8), jnp.int32(0), jnp.int32(B))
t0=time.perf_counter(); L, O = f(*args); Ln = np.asarray(L); t1=time.perf_counter()
print(f"tiny pallas compile+run: {t1-t0:.1f}s", flush=True)
from lz77_tpu.ops import match as match_ops
L2, O2 = match_ops.find_matches_brute(*args, la=la, sb=sb)
np.testing.assert_array_equal(Ln, np.asarray(L2))
print("tiny CORRECT on TPU", flush=True)
t0=time.perf_counter()
for _ in range(20):
    L, O = f(*args); Ln = np.asarray(L)
t1=time.perf_counter()
print(f"tiny warm: {(t1-t0)/20*1000:.1f} ms per 1KB, {20*B/(t1-t0)/1e6:.2f} MB/s", flush=True)
