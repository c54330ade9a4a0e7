"""Phase-profile the HNSW wave-build step at realistic 1M layer shapes.

Times each component of `ops/hnsw_build.make_wave_step` separately
(beam per-iteration pieces, heuristic select, commit_edges incl. its
two w*s-element argsorts) so the 1M build attack (VERDICT #2, <=600s
warm) targets the actual dominant phase instead of guessing.

Env: PROF_N (corpus rows, default 1_000_000), PROF_W (wave size, 2048),
PROF_EFC (100), PROF_M (24), PROF_EXPAND (8), PROF_ITERS (3).
Run from /root/repo.
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
import functools

from vers_tpu.utils.profiling import timed_device
from vers_tpu.ops.topk import topk_smallest
from vers_tpu.ops import hnsw_build as hb

N = int(os.environ.get("PROF_N", 1_000_000))
W = int(os.environ.get("PROF_W", 2048))
EFC = int(os.environ.get("PROF_EFC", 100))
M = int(os.environ.get("PROF_M", 24))
E = int(os.environ.get("PROF_EXPAND", 8))
ITERS = int(os.environ.get("PROF_ITERS", 3))
D = 300
SLACK = max(M, 8)
DEG0 = 2 * M + 1          # layer 0 forward degree (m+1 quirk)
WIDTH0 = DEG0 + SLACK
N_PAD = max(8, 1 << (N - 1).bit_length())

print(f"# shapes: N={N} (pad {N_PAD}) W={W} efc={EFC} M={M} expand={E} "
      f"deg0={DEG0} width0={WIDTH0}", file=sys.stderr, flush=True)

key = jax.random.PRNGKey(0)
# on-device synthesis (never ship ~GB over the tunnel)
vecs16 = jax.jit(
    lambda k: jax.random.normal(k, (N_PAD, D), jnp.bfloat16)
)(key)
q = jax.jit(lambda k: jax.random.normal(k, (W, D), jnp.bfloat16))(
    jax.random.fold_in(key, 1)
)
# layer 0: all rows are members; random plausible adjacency
rank_map = jnp.arange(N_PAD, dtype=jnp.int32)
adj0 = jax.jit(
    lambda k: jax.random.randint(k, (N_PAD, WIDTH0), 0, N, jnp.int32)
)(jax.random.fold_in(key, 2))
dist0 = jax.jit(
    lambda k: jax.random.uniform(k, (N_PAD, WIDTH0), jnp.float32)
)(jax.random.fold_in(key, 3))
beam_d = jax.jit(lambda k: jnp.sort(jax.random.uniform(k, (W, EFC)), axis=1))(
    jax.random.fold_in(key, 4)
)
beam_i = jax.jit(
    lambda k: jax.random.randint(k, (W, EFC), 0, N, jnp.int32)
)(jax.random.fold_in(key, 5))
nb = E * DEG0
nbrs = jax.jit(lambda k: jax.random.randint(k, (W, nb), 0, N, jnp.int32))(
    jax.random.fold_in(key, 6)
)
sel_i = beam_i[:, : DEG0]
sel_d = beam_d[:, : DEG0]
wave_ids = jnp.arange(W, dtype=jnp.int32)
connect = jnp.ones((W,), bool)


def bench(name, fn, *args):
    t, _ = timed_device(lambda: fn(*args), warmup=1, iters=ITERS, depth=4)
    print(f"{name}: {t * 1e3:8.2f} ms", flush=True)


# ---- beam body pieces (one lockstep iteration, layer-0 shapes) --------
f_pick = jax.jit(lambda bd: topk_smallest(bd, E))
bench(f"pick topk (W,{EFC})->{E}", f_pick, beam_d)

f_adj_gather = jax.jit(lambda a, r: jnp.take(a, r, axis=0))
rows = jax.random.randint(jax.random.fold_in(key, 7), (W, E), 0, N, jnp.int32)
bench(f"adj row gather (W,{E},{WIDTH0})", f_adj_gather, adj0, rows)

f_dist = jax.jit(
    lambda v, ids, qq: jnp.einsum(
        "wmd,wd->wm",
        jnp.take(v, ids, axis=0),
        qq,
        preferred_element_type=jnp.float32,
    )
)
bench(f"nav gather+einsum (W,{nb},{D}) bf16", f_dist, vecs16, nbrs, q)

f_dup = jax.jit(
    lambda nn, bi: jnp.any(nn[:, :, None] == bi[:, None, :], axis=2)
)
bench(f"dup mask (W,{nb})x(W,{EFC})", f_dup, nbrs, beam_i)

cat_d = jnp.concatenate([beam_d, jnp.zeros((W, nb), jnp.float32)], axis=1)
f_merge = jax.jit(lambda cd: topk_smallest(cd, EFC))
bench(f"merge topk (W,{EFC + nb})->{EFC}", f_merge, cat_d)

# ---- full beam (capped iterations, layer-0 adjacency) -----------------
steps = max(24, 2 * -(-EFC // E))
f_beam = jax.jit(
    functools.partial(hb._beam, ef=EFC, max_steps=steps, expand=E)
)
bench(f"full beam ef={EFC} steps<={steps}", f_beam, q, vecs16, adj0,
      rank_map, wave_ids)

# ---- routing beam ------------------------------------------------------
f_route = jax.jit(
    functools.partial(hb._beam, ef=8, max_steps=64, expand=E)
)
bench("routing beam ef=8 steps<=64", f_route, q, vecs16, adj0,
      rank_map, wave_ids)

# ---- heuristic select --------------------------------------------------
f_sel = jax.jit(functools.partial(hb._heuristic_select, m=2 * M))
bench(f"heuristic select (W,{EFC},{EFC})", f_sel, q, vecs16, beam_d, beam_i)

# ---- commit edges (incl. the two (W*S)-element argsorts) ---------------
f_commit = jax.jit(
    functools.partial(hb._commit_edges, deg=DEG0, slack=SLACK)
)
bench(f"commit edges (e={W * DEG0} sort)", f_commit, adj0, dist0,
      rank_map, wave_ids, sel_i, sel_d, connect)

# ---- commit sub-phases -------------------------------------------------
e_tot = W * DEG0
v_flat = jnp.reshape(sel_i, (e_tot,))
d_flat = jnp.reshape(sel_d, (e_tot,))
f_sort2 = jax.jit(
    lambda v, d: jnp.argsort(
        jnp.where(True, v, 0)[jnp.argsort(d, stable=True)], stable=True
    )
)
bench(f"two stable argsorts ({e_tot})", f_sort2, v_flat, d_flat)

f_compact = jax.jit(lambda gd: topk_smallest(gd, WIDTH0))
gd = jax.random.uniform(jax.random.fold_in(key, 8), (e_tot, WIDTH0))
bench(f"compact topk ({e_tot},{WIDTH0})", f_compact, gd)
