"""A/B the HNSW batched-query ROUTING strategy: greedy routing beams
(route_mode="beam", the reference-shaped descent) vs the brute-force
layer-1 MXU scan (route_mode="scan", ops/beam.py full_descent_scan),
across seed counts and layer-0 step caps.

Run from /root/repo, serialized with other TPU jobs:
    python -u benchmarks/tpu_route_scan_ab.py
Env: N (default 131072), Q (default 16384), EF (default 32).
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
    n = int(os.environ.get("N", 131_072))
    q_n = int(os.environ.get("Q", 16_384))
    ef = int(os.environ.get("EF", 32))
    d = 300
    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
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

    base_cfg = h.config
    results = []
    combos = [
        ("beam e=8 cap=24", dict(route_mode="beam", beam_expand=8,
                                 beam_steps=24)),
        ("scan s=1  cap=24", dict(route_mode="scan", route_seeds=1,
                                  beam_expand=8, beam_steps=24)),
        ("scan s=4  cap=24", dict(route_mode="scan", route_seeds=4,
                                  beam_expand=8, beam_steps=24)),
        ("scan s=8  cap=24", dict(route_mode="scan", route_seeds=8,
                                  beam_expand=8, beam_steps=24)),
        ("scan s=16 cap=24", dict(route_mode="scan", route_seeds=16,
                                  beam_expand=8, beam_steps=24)),
        ("scan s=32 cap=24", dict(route_mode="scan", route_seeds=32,
                                  beam_expand=8, beam_steps=24)),
        ("scan s=16 cap=16", dict(route_mode="scan", route_seeds=16,
                                  beam_expand=8, beam_steps=16)),
        ("scan s=16 cap=12", dict(route_mode="scan", route_seeds=16,
                                  beam_expand=8, beam_steps=12)),
        ("scan s=32 cap=12", dict(route_mode="scan", route_seeds=32,
                                  beam_expand=8, beam_steps=12)),
        ("scan s=32 cap=8 ", dict(route_mode="scan", route_seeds=32,
                                  beam_expand=8, beam_steps=8)),
    ]
    for name, kw in combos:
        h.config = dataclasses.replace(base_cfg, **kw)
        bd, bi = h.search_batch_device(qd, 10)
        rec = recall_at_k(
            np.where(np.asarray(bi) >= 0, np.asarray(bi), -1), truth
        )
        t, _ = timed_device(
            lambda: h.search_batch_device(qd, 10)[1],
            warmup=1, iters=3, depth=8,
        )
        qps = q_n / t
        log(f"{name}: {t*1e3:7.1f} ms/batch  {qps/1e3:6.1f}k qps  "
            f"recall {float(rec):.4f}")
        results.append(dict(name=name.strip(), **kw,
                            ms=round(t * 1e3, 1), qps=round(qps),
                            recall_at_10=round(float(rec), 4)))
    h.config = base_cfg

    print(json.dumps(dict(config="hnsw-route-scan-ab", n=n, d=d, q=q_n,
                          ef=ef, results=results, ts="2026-08-18")),
          flush=True)


if __name__ == "__main__":
    main()
