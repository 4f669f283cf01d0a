# A/B experiment: chunked matcher variants, best-of-3, forced fetch.
import time, numpy as np, jax, jax.numpy as jnp, functools
from jax import lax
from lz77_tpu import spec
from lz77_tpu.models import codec as codec_m
import bench

p = spec.Params(); H, R = p.d_limit, p.len_limit
data = bench.make_text(6<<20); x = np.frombuffer(data, np.uint8)
B, G = 65536, 16
depth, dlim = 14, 4095

def variant(rl_dtype, key_dtype, chunk):
    def f(block, halo, right, avail, valid_ext):
        pos = jnp.arange(B, dtype=jnp.int32)
        cap = jnp.minimum(depth, valid_ext - pos - 1)
        buf = jnp.concatenate([jnp.zeros((chunk,), jnp.uint8), halo, block, right])
        n_chunks = -(-dlim // chunk)
        ext = 16
        xr = jnp.concatenate([block, right])
        x_ext = jnp.concatenate([xr, jnp.zeros((B + ext - xr.shape[0],), jnp.uint8)])[:B+ext]
        pad_buf = jnp.concatenate([buf, jnp.zeros((ext,), jnp.uint8)])
        kmul = dlim + 2
        dlimit_vec = jnp.minimum(dlim, pos + avail)  # (B,)
        def body(dc, best):
            start = chunk + H - (dc + 1) * chunk
            z = lax.dynamic_slice(pad_buf, (start,), (B + ext + chunk,))
            S = jnp.stack([lax.dynamic_slice(z, (chunk - 1 - r,), (B + ext,)) for r in range(chunk)])
            eq = (S == x_ext[None, :]).astype(rl_dtype)
            rl = eq
            m = 1
            while m < depth:
                shifted = jnp.concatenate([rl[:, m:], jnp.zeros((chunk, m), rl_dtype)], axis=1)
                rl = rl + jnp.where(rl == m, shifted, 0)
                m <<= 1
            runs = jnp.minimum(rl[:, :B].astype(jnp.int32), cap)
            d = dc * chunk + jnp.arange(1, chunk + 1, dtype=jnp.int32)[:, None]
            ok = d <= dlimit_vec[None, :]
            key = jnp.where(ok, runs * kmul + (dlim + 1 - d), 0).astype(key_dtype)
            return jnp.maximum(best, key.max(axis=0))
        best = lax.fori_loop(0, n_chunks, body, jnp.zeros((B,), key_dtype))
        best = best.astype(jnp.int32)
        L = best // kmul
        O = jnp.where(L > 0, (dlim + 1) - best % kmul, 0)
        return L, O
    return jax.jit(lambda *a: jax.vmap(f)(*a))

results = {}
for name, rd, kd, ch in [("i8/i32/128", jnp.int8, jnp.int32, 128),
                          ("i8/u16/128", jnp.int8, jnp.uint16, 128),
                          ("i16/u16/128", jnp.int16, jnp.uint16, 128),
                          ("i8/u16/256", jnp.int8, jnp.uint16, 256)]:
    fv = variant(rd, kd, ch)
    gb, gh, gr, ga, gv = codec_m._batch_inputs(x, len(data), 0, G, G, B, H, R)
    dev = tuple(jnp.asarray(a) for a in (gb, gh, gr, ga, gv))
    t0=time.perf_counter(); L, O = fv(*dev); _ = np.asarray(L); t1=time.perf_counter()
    best_t = 1e9
    for rep in range(1,4):
        gb, gh, gr, ga, gv = codec_m._batch_inputs(x, len(data), rep*G, G, G, B, H, R)
        dev = tuple(jnp.asarray(a) for a in (gb, gh, gr, ga, gv))
        t2=time.perf_counter(); L, O = fv(*dev); Ln = np.asarray(L); t3=time.perf_counter()
        best_t = min(best_t, t3-t2)
    print(f"{name}: compile {t1-t0:.0f}s best {G*B/best_t/1e6:.2f} MB/s", flush=True)
    results[name] = np.asarray(L)
# cross-check variants agree
base = results["i8/i32/128"]
for k, v in results.items():
    assert np.array_equal(base, v), k
print("variants agree")
