"""Microbench the wave-build beam's per-step pieces on TPU."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np
from vers_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from vers_tpu.utils.profiling import timed_device
from vers_tpu.ops.topk import topk_smallest

W, EF, DEG, D, N = 2048, 100, 33, 300, 100096
key = jax.random.PRNGKey(0)
vecs = jax.random.normal(key, (N, D), jnp.float32)
q = jax.random.normal(jax.random.fold_in(key, 1), (W, D), jnp.float32)

def bench(name, fn):
    t, _ = timed_device(fn, warmup=1, iters=2, depth=8)
    print(f"{name}: {t*1e3:.2f} ms", flush=True)

for e in (4, 8):
    nb = e * DEG
    nbrs = jax.random.randint(jax.random.fold_in(key, 2), (W, nb), 0, N)
    beam_d = jax.random.uniform(jax.random.fold_in(key, 3), (W, EF))
    cat = jnp.concatenate([beam_d, jax.random.uniform(jax.random.fold_in(key, 4), (W, nb))], axis=1)
    beam_i = jax.random.randint(jax.random.fold_in(key, 5), (W, EF), 0, N)

    f_topk = jax.jit(lambda c: topk_smallest(c, EF))
    bench(f"e={e} topk ef=100 over (2048,{EF+nb})", lambda: f_topk(cat))

    f_gd = jax.jit(lambda nbrs: jnp.einsum("wmd,wd->wm", jnp.take(vecs, nbrs, axis=0), q))
    bench(f"e={e} gather+einsum (2048,{nb},300)", lambda: f_gd(nbrs))

    f_dup = jax.jit(lambda nbrs, beam_i: (
        jnp.any(nbrs[:, :, None] == beam_i[:, None, :], axis=2),
        jnp.any((nbrs[:, :, None] == nbrs[:, None, :]) &
                (jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1) <
                 jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0))[None], axis=2)))
    bench(f"e={e} dup masks (2048,{nb})", lambda: f_dup(nbrs, beam_i))
