"""A/B the neighborhood-inlined layer-0 beam (config.nav_inline_dp,
ops/beam_inline.py) against the row-gather beam at 1M x 300 — the
VERDICT r3 #2 main event. The gather beam is row-op-bound
(Q*expand*deg rows/step @ ~15.5 ns); the inline step gathers Q*expand
WIDE rows, so the bound collapses by ~deg.

Builds the wiki-1M-shaped graph ONCE (main.rs params), then sweeps.
Run from /root/repo, strictly serialized with other TPU jobs:
    python -u benchmarks/tpu_1m_inline_ab.py >> benchmarks/tpu_results.jsonl
Env: N (default 1_000_000), Q (default 16384).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from vers_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vers_tpu.core import round_up
    from vers_tpu.index.hnsw import HNSWIndex
    from vers_tpu.ops.pallas_topk import distance_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device

    log(f"backend={jax.default_backend()}")
    n = int(os.environ.get("N", 1_000_000))
    q_n = int(os.environ.get("Q", 16_384))
    d = 300
    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=4096, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    t0 = time.time()
    h = HNSWIndex.build_index_batched(12, 100, 32, 24, vectors,
                                      wave_cap=2048)
    log(f"build: {time.time() - t0:.1f}s layers={h.get_num_nodes_in_layers()}")

    n_pad = round_up(n, 128)
    corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    qd = jnp.asarray(queries)
    _, ti = distance_topk(qd, corpus, n, 10)
    truth = np.asarray(ti)
    del corpus, ti

    base_cfg = h.config
    results = []
    # COMBOS_JSON env overrides the default list:
    #   [{"name": "...", "max_degree": 32, ...}, ...]  (_ef = ef_search)
    # Default list = round 3 of the A/B; earlier rounds recorded in
    # tpu_results.jsonl (gather 17.9k @ 0.9801 -> refine=96 22.5k @
    # 0.9902 -> e=4 r=64 cap=8 s=16 37.3k @ 0.9889).
    combos_env = os.environ.get("COMBOS_JSON")
    if combos_env:
        combos = [(c.pop("name"), c) for c in json.loads(combos_env)]
    else:
        combos = _default_combos()
    last_key = object()
    for name, kw in combos:
        kw = dict(kw)
        ef = kw.pop("_ef", 32)
        h.ef_search = ef
        h.config = dataclasses.replace(base_cfg, **kw)
        cache_key = (kw.get("max_degree"), kw.get("nav_inline_dp"))
        if cache_key != last_key:
            h._device_cache = None  # re-pack adjacency / inline table
            last_key = cache_key
        t0 = time.time()
        bd, bi = h.search_batch_device(qd, 10)
        rec = recall_at_k(np.asarray(bi), truth)
        first_s = time.time() - t0
        t, _ = timed_device(
            lambda: h.search_batch_device(qd, 10)[1],
            warmup=1, iters=3, depth=8,
        )
        qps = q_n / t
        log(f"{name}: {t*1e3:7.1f} ms/batch  {qps/1e3:6.1f}k qps  "
            f"recall {float(rec):.4f}  (first call {first_s:.0f}s)")
        results.append(dict(name=name, ef=ef, **kw,
                            ms=round(t * 1e3, 1), qps=round(qps),
                            recall_at_10=round(float(rec), 4)))
    h.config = base_cfg
    h.ef_search = 32

    print(json.dumps(dict(config="hnsw-1m-inline-ab", n=n, d=d, q=q_n,
                          results=results, ts="2026-08-19")),
          flush=True)


def _default_combos():
    return [
        ("inline e=4 r=64 cap=8",
         dict(max_degree=32, route_seeds=32, beam_expand=4,
              nav_inline_dp=64, nav_inline_refine=64, beam_steps=8)),
        ("inline e=4 r=64 cap=6",
         dict(max_degree=32, route_seeds=32, beam_expand=4,
              nav_inline_dp=64, nav_inline_refine=64, beam_steps=6)),
        ("inline e=4 r=48 cap=8",
         dict(max_degree=32, route_seeds=32, beam_expand=4,
              nav_inline_dp=64, nav_inline_refine=48, beam_steps=8)),
        ("inline e=4 r=64 cap=8 dp96",
         dict(max_degree=32, route_seeds=32, beam_expand=4,
              nav_inline_dp=96, nav_inline_refine=64, beam_steps=8)),
        ("inline e=2 r=48 cap=12",
         dict(max_degree=32, route_seeds=32, beam_expand=2,
              nav_inline_dp=64, nav_inline_refine=48, beam_steps=12)),
        ("inline e=4 r=64 cap=8 ef40",
         dict(max_degree=32, route_seeds=32, beam_expand=4,
              nav_inline_dp=64, nav_inline_refine=64, beam_steps=8,
              _ef=40)),
        ("inline e=4 r=96 cap=6",
         dict(max_degree=32, route_seeds=32, beam_expand=4,
              nav_inline_dp=64, nav_inline_refine=96, beam_steps=6)),
        ("inline e=4 r=64 cap=8 s=16",
         dict(max_degree=32, route_seeds=16, beam_expand=4,
              nav_inline_dp=64, nav_inline_refine=64, beam_steps=8)),
    ]


if __name__ == "__main__":
    main()
