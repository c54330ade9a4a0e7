"""A/B the HNSW BUILD routing strategy: routing beams (route_scan=False,
the committed wave builder) vs brute-force MXU routing scans
(route_scan=True, ops/hnsw_build.py make_wave_step docstring) at the
reference's main.rs:70-79 params.

Each mode builds twice (cold-with-cache, then warm) and reports warm
wall-clock + recall@10 at ef=32 over the batched query path. Same-day
pairing only — the tunnel's throughput swings ~2.5x day to day.

Run from /root/repo, serialized with other TPU jobs:
    python -u benchmarks/tpu_build_scan_ab.py
Env: N (default 131072), Q (default 8192), SEEDS (route_scan seed_count,
default 1), MODES (default "beam,scan").
"""

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

    if os.environ.get("VERS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["VERS_PLATFORM"])
    import jax.numpy as jnp

    from vers_tpu.core import round_up
    from vers_tpu.index.hnsw import HNSWIndex
    from vers_tpu.ops.pallas_topk import distance_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k

    log(f"backend={jax.default_backend()}")
    n = int(os.environ.get("N", 131_072))
    q_n = int(os.environ.get("Q", 8_192))
    seeds = int(os.environ.get("SEEDS", 1))
    modes = os.environ.get("MODES", "beam,scan").split(",")
    d = 300
    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    n_pad = round_up(n, 128)
    corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    qd = jnp.asarray(queries)
    _, ti = distance_topk(qd, corpus, n, 10)
    truth = np.asarray(ti)

    results = []
    for mode in modes:
        rs = mode == "scan"
        kw = dict(wave_cap=2048, route_scan=rs)
        if rs:
            kw["seed_count"] = seeds
        times = []
        h = None
        for p in range(2):
            t0 = time.time()
            h = HNSWIndex.build_index_batched(12, 100, 32, 24, vectors, **kw)
            times.append(round(time.time() - t0, 1))
            log(f"{mode} pass{p}: {times[-1]}s layers={h.get_num_nodes_in_layers()}")
        ids = np.asarray(h.search_batch(queries, 10).ids)
        rec = round(float(recall_at_k(ids, truth)), 4)
        log(f"{mode}: warm={times[-1]}s recall@10={rec}")
        results.append(dict(mode=mode, cold_s=times[0], warm_s=times[1],
                            recall_at_10_ef32=rec,
                            layers=h.get_num_nodes_in_layers(),
                            **({"seed_count": seeds} if rs else {})))
    print(json.dumps(dict(config="hnsw-build-scan-ab", n=n, d=d, q=q_n,
                          params="L=12 efc=100 M=24 (main.rs:70-79)",
                          results=results)), flush=True)


if __name__ == "__main__":
    main()
