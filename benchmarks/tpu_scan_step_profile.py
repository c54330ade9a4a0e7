"""Profile wave_step (beam routing) vs wave_step_scan (MXU routing) and
the scan pieces at 131k x 300 main.rs shapes — the build A/B measured
scan 2.2x SLOWER (276.6s vs 126.6s warm), opposite of the query side;
this isolates where the extra ~2.2s/wave goes.

Run from /root/repo, serialized with other TPU jobs.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
from vers_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()
import jax

if os.environ.get("VERS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VERS_PLATFORM"])
import jax.numpy as jnp

from vers_tpu.utils.profiling import timed_device
from vers_tpu.ops.topk import fused_scan_topk, topk_smallest
from vers_tpu.ops import hnsw_build as hb

N = int(os.environ.get('PROF_N', 131_072))
D = 300
W = 2048
EFC, M, L = 100, 24, 12
SLACK = max(M, 8)
ITERS = int(os.environ.get("PROF_ITERS", 2))

key = jax.random.PRNGKey(0)
N_PAD = max(8, 1 << (N - 1).bit_length())
vecs = jax.jit(lambda k: jax.random.normal(k, (N_PAD, D), jnp.bfloat16))(key)

# realistic layer sizes at 131k, M=24 (from the A/B run)
sizes = ([1000000, 41547, 1757, 80, 2, 1, 1, 1, 1, 1, 1, 1]
         if N > 500_000 else
         [131072, 5374, 220, 12, 1, 1, 1, 1, 1, 1, 1, 1])
sizes[0] = N
degs = [(2 * M if l == 0 else M) + 1 for l in range(L)]
rank_maps, adjs, dists, tabs, tab_members = [], [], [], [], []
members = []
for l in range(L):
    mem = np.sort(np.random.default_rng(l).choice(N, sizes[l], replace=False))
    if l == 0:
        mem = np.arange(N)
    members.append(mem)
    rank = np.full((N_PAD,), -1, np.int32)
    rank[mem] = np.arange(len(mem), dtype=np.int32)
    rank_maps.append(jnp.asarray(rank))
    rows = max(8, 1 << (max(len(mem), 1) - 1).bit_length())
    adjs.append(jax.jit(
        lambda k, r=rows, dg=degs[l]: jax.random.randint(
            k, (r, dg + SLACK), 0, max(1, len(mem)), jnp.int32)
    )(jax.random.fold_in(key, 100 + l)))
    dists.append(jax.jit(
        lambda k, r=rows, dg=degs[l]: jax.random.uniform(
            k, (r, dg + SLACK), jnp.float32)
    )(jax.random.fold_in(key, 200 + l)))
    mem_pad = np.zeros((rows,), np.int64)
    mem_pad[: len(mem)] = mem
    mids = jnp.asarray(mem_pad, jnp.int32)
    tabs.append(jnp.take(vecs, mids, axis=0))
    tab_members.append(mids)

q = jax.jit(lambda k: jax.random.normal(k, (W, D), jnp.bfloat16))(
    jax.random.fold_in(key, 1))
wave_ids = jnp.arange(W, dtype=jnp.int32)
ins_l = jnp.zeros((W,), jnp.int32)
entry = jnp.array(0, jnp.int32)
n_built = jnp.asarray([s // 2 for s in sizes], jnp.int32)

caps = [0] * L
caps[1] = 128
caps[2] = 16
caps[3] = 16
caps = tuple(caps)


def bench(name, fn, *args, depth=4):
    t, _ = timed_device(lambda: fn(*args), warmup=1, iters=ITERS, depth=depth)
    print(f"{name}: {t * 1e3:8.1f} ms", flush=True)


# ---- pieces -----------------------------------------------------------
f_seed = jax.jit(lambda q_, t_, nb: fused_scan_topk(
    q_, t_, nb, 1, metric="cosine", chunk_size=8192,
    precision=jax.lax.Precision.DEFAULT))
bench("seeds scan W=2048 k=1 over 8192", f_seed, q, tabs[1], n_built[1])

f_l1 = jax.jit(lambda q_, t_, nb: fused_scan_topk(
    q_, t_, nb, EFC, metric="cosine", chunk_size=8192,
    precision=jax.lax.Precision.DEFAULT))
bench("l1 scan c=128 k=100 over 8192", f_l1, q[:128], tabs[1], n_built[1])

f_l2 = jax.jit(lambda q_, t_, nb: fused_scan_topk(
    q_, t_, nb, EFC, metric="cosine", chunk_size=256,
    precision=jax.lax.Precision.DEFAULT))
bench("l2 scan c=16 k=100 over 256", f_l2, q[:16], tabs[2], n_built[2])

# ---- whole steps ------------------------------------------------------
for mode, rs in (("beam", False), ("scan", True)):
    fn = hb.make_wave_step(
        L, M, EFC, degs, SLACK, sub_caps=caps, layer_sizes=tuple(sizes),
        expand=8, route_expand=8, beam_steps=25, route_steps=16,
        route_scan=rs, seed_count=1,
    )
    if rs:
        args = (vecs, rank_maps, list(adjs), list(dists), wave_ids, ins_l,
                entry, tabs, tab_members, n_built)
    else:
        args = (vecs, rank_maps, list(adjs), list(dists), wave_ids, ins_l,
                entry)
    # donation: pass copies each call
    def run(fn=fn, rs=rs):
        if rs:
            return fn(vecs, rank_maps, [jnp.copy(a) for a in adjs],
                      [jnp.copy(d) for d in dists], wave_ids, ins_l,
                      entry, tabs, tab_members, n_built)
        return fn(vecs, rank_maps, [jnp.copy(a) for a in adjs],
                  [jnp.copy(d) for d in dists], wave_ids, ins_l, entry)
    t0 = time.time()
    out = run()
    jax.block_until_ready(out[0][0])
    np.asarray(out[0][0][0])  # real sync
    print(f"{mode} first-call (compile+run): {time.time()-t0:.1f}s", flush=True)
    bench(f"wave_step[{mode}] steady", run, depth=2)
