"""Characterize the HNSW beam step's dominant op: the (Q, M) random
row gather from the 1M-row nav table + batched matvec.

Questions:
  1. row-op bound or byte bound?  (vary dtype/width at fixed rows)
  2. does index locality / repetition matter?  (random vs sorted vs 0)
  3. how does cost scale with M (rows per query)?
  4. gather alone vs gather+einsum (is the matvec free?)

Run from /root/repo:  python -u benchmarks/tpu_gather_micro.py
"""
import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np
from vers_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from vers_tpu.utils.profiling import timed_device

N, D, Q, M = 1_000_000, 300, 16384, 384
key = jax.random.PRNGKey(0)

print(f"backend={jax.default_backend()} N={N} D={D} Q={Q} M={M}", flush=True)

tab_f32 = jax.random.normal(key, (N, D), jnp.float32)
tab_bf16 = tab_f32.astype(jnp.bfloat16)
tab_bf16_150 = tab_bf16[:, :150]
tab_bf16_128 = tab_bf16[:, :128]
tab_i8 = (tab_f32 * 10).astype(jnp.int8)
q = jax.random.normal(jax.random.fold_in(key, 1), (Q, D), jnp.float32)
q_bf = q.astype(jnp.bfloat16)

ids_rand = jax.random.randint(jax.random.fold_in(key, 2), (Q, M), 0, N, jnp.int32)
ids_sorted = jnp.sort(ids_rand, axis=1)
ids_zero = jnp.zeros((Q, M), jnp.int32)
# local: each query's M ids drawn from a 4096-row window (beam locality proxy)
base = jax.random.randint(jax.random.fold_in(key, 3), (Q, 1), 0, N - 4096, jnp.int32)
ids_local = base + jax.random.randint(jax.random.fold_in(key, 4), (Q, M), 0, 4096, jnp.int32)


def bench(name, fn, *args):
    f = jax.jit(fn)
    t, _ = timed_device(lambda: f(*args), warmup=1, iters=2, depth=4)
    rows = Q * args[-1].shape[1] if args else Q * M
    print(f"{name}: {t*1e3:8.2f} ms   ({t/rows*1e9:6.2f} ns/row)", flush=True)


def gather_sum(tab, ids):
    # gather only (reduce to keep it live; sum is cheap vs gather)
    v = jnp.take(tab, ids, axis=0)
    return v.astype(jnp.float32).sum(axis=2)


def gather_dot(tab, qq, ids):
    v = jnp.take(tab, ids, axis=0)
    return jnp.einsum("qmd,qd->qm", v, qq,
                      preferred_element_type=jnp.float32)


bench("bf16 300d gather+sum  rand ", gather_sum, tab_bf16, ids_rand)
bench("bf16 300d gather+dot  rand ", lambda t, qq, i: gather_dot(t, qq, i), tab_bf16, q_bf, ids_rand)
bench("f32  300d gather+sum  rand ", gather_sum, tab_f32, ids_rand)
bench("bf16 150d gather+sum  rand ", gather_sum, tab_bf16_150, ids_rand)
bench("bf16 128d gather+sum  rand ", gather_sum, tab_bf16_128, ids_rand)
bench("int8 300d gather+sum  rand ", gather_sum, tab_i8, ids_rand)
bench("bf16 300d gather+sum  sort ", gather_sum, tab_bf16, ids_sorted)
bench("bf16 300d gather+sum  zero ", gather_sum, tab_bf16, ids_zero)
bench("bf16 300d gather+sum  local", gather_sum, tab_bf16, ids_local)
for m in (96, 192, 768):
    ids_m = ids_rand[:, :m] if m <= M else jnp.concatenate([ids_rand, ids_rand], 1)
    f = jax.jit(gather_sum)
    t, _ = timed_device(lambda: f(tab_bf16, ids_m), warmup=1, iters=2, depth=4)
    print(f"bf16 300d gather+sum M={m:4d}: {t*1e3:8.2f} ms   ({t/(Q*m)*1e9:6.2f} ns/row)", flush=True)
