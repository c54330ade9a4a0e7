"""Micro A/B of the cross-probe merge variants at (16k, 40) on TPU."""
import sys, os, functools, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from vers_tpu.utils.profiling import enable_compilation_cache, timed_device, tunnel_canary
enable_compilation_cache()
import jax, jax.numpy as jnp
print("canary", tunnel_canary(), flush=True)
from vers_tpu.ops.binned import _rank_select_topk, merge_probe_results
from vers_tpu.ops.topk import topk_smallest
Q, w, k = 16384, 40, 10
rng = np.random.default_rng(0)
d = jnp.asarray(rng.normal(size=(Q, w)).astype(np.float32))
i = jnp.asarray(rng.integers(0, 100000, size=(Q, w)).astype(np.int32))
rank_jit = jax.jit(functools.partial(_rank_select_topk, top_k=k))

@functools.partial(jax.jit, static_argnames=("top_k",))
def old_merge(all_d, all_i, top_k):
    fin_d, sel = topk_smallest(all_d, top_k)
    fin_i = jnp.take_along_axis(all_i, sel, axis=1)
    return fin_d, jnp.where(jnp.isfinite(fin_d), fin_i, -1)

t0=time.time(); od, oi = old_merge(d, i, k); np.asarray(od); print("old compiled", time.time()-t0, flush=True)
t0=time.time(); nd, ni = rank_jit(d, i); np.asarray(nd); print("new compiled", time.time()-t0, flush=True)
print("dist equal:", bool(jnp.allclose(od, nd)), "ids equal:", bool((oi == ni).all()), flush=True)
for name, fn in [
    ("old topk_smallest(no dedup)", lambda: old_merge(d, i, k)),
    ("new rank_select (no dedup)", lambda: rank_jit(d, i)),
    ("merge dedup=True", lambda: merge_probe_results(d, i, k, dedup=True)),
    ("merge dedup=False", lambda: merge_probe_results(d, i, k, dedup=False)),
]:
    t, _ = timed_device(fn, warmup=1, iters=3, depth=8)
    print(f"{name}: {t*1e3:.3f} ms", flush=True)
