"""HNSW 1M query-throughput sweep (VERDICT r3 item #2: 14.5k -> 30k+
QPS @ recall@10 >= 0.98, ef=32, 1M x 300).

Builds the wiki-1M-shaped graph ONCE (wave build, main.rs params
L=12 efc=100 M=24, `vers/src/main.rs:70-79`), then sweeps the query
knobs in-process: route_seeds (layer-1 scan seeds), beam_expand,
beam_steps (straggler-tail cap), max_degree (nav adjacency truncation
— rows gathered per step are Q*expand*deg, the measured bottleneck).

Run from /root/repo, strictly serialized with other TPU jobs:
    python -u benchmarks/tpu_1m_hnsw_query_sweep.py >> benchmarks/tpu_results.jsonl
Env: N (default 1_000_000), Q (default 16384), EF (default 32).
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
    ef = int(os.environ.get("EF", 32))
    d = 300
    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=4096, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    t0 = time.time()
    h = HNSWIndex.build_index_batched(12, 100, ef, 24, vectors, wave_cap=2048)
    log(f"build: {time.time() - t0:.1f}s layers={h.get_num_nodes_in_layers()}")

    n_pad = round_up(n, 128)
    corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    qd = jnp.asarray(queries)
    _, ti = distance_topk(qd, corpus, n, 10)
    truth = np.asarray(ti)
    del corpus, ti

    base_cfg = h.config
    results = []
    combos = [
        ("baseline s=auto e=8 cap=None dg=None",
         dict()),
        ("s=32 e=8 cap=12",
         dict(route_seeds=32, beam_expand=8, beam_steps=12)),
        ("s=32 e=8 cap=8",
         dict(route_seeds=32, beam_expand=8, beam_steps=8)),
        ("s=32 e=16 cap=8",
         dict(route_seeds=32, beam_expand=16, beam_steps=8)),
        ("s=32 e=16 cap=6",
         dict(route_seeds=32, beam_expand=16, beam_steps=6)),
        ("dg=32 s=32 e=8 cap=12",
         dict(max_degree=32, route_seeds=32, beam_expand=8, beam_steps=12)),
        ("dg=32 s=32 e=16 cap=8",
         dict(max_degree=32, route_seeds=32, beam_expand=16, beam_steps=8)),
        ("dg=24 s=32 e=16 cap=8",
         dict(max_degree=24, route_seeds=32, beam_expand=16, beam_steps=8)),
        ("dg=32 s=64 e=16 cap=6",
         dict(max_degree=32, route_seeds=64, beam_expand=16, beam_steps=6)),
        ("dg=32 s=32 e=8 cap=16",
         dict(max_degree=32, route_seeds=32, beam_expand=8, beam_steps=16)),
    ]
    last_dg = object()
    for name, kw in combos:
        h.config = dataclasses.replace(base_cfg, **kw)
        dg = kw.get("max_degree")
        if dg != last_dg:
            h._device_cache = None  # re-pack adjacency at the new cap
            last_dg = dg
        t0 = time.time()
        bd, bi = h.search_batch_device(qd, 10)
        rec = recall_at_k(np.asarray(bi), truth)
        compile_s = time.time() - t0
        t, _ = timed_device(
            lambda: h.search_batch_device(qd, 10)[1],
            warmup=1, iters=3, depth=8,
        )
        qps = q_n / t
        log(f"{name}: {t*1e3:7.1f} ms/batch  {qps/1e3:6.1f}k qps  "
            f"recall {float(rec):.4f}  (first call {compile_s:.0f}s)")
        results.append(dict(name=name, **kw,
                            ms=round(t * 1e3, 1), qps=round(qps),
                            recall_at_10=round(float(rec), 4)))
    h.config = base_cfg

    print(json.dumps(dict(config="hnsw-1m-query-sweep", n=n, d=d, q=q_n,
                          ef=ef, results=results, ts="2026-08-19")),
          flush=True)


if __name__ == "__main__":
    main()
