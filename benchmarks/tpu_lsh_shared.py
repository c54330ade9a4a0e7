"""LSH (RP-forest) shared-corpus layout benchmark — build + search at
BENCH_N x BENCH_D (defaults 100k x 300), recording the auto-probes
(deficit rule) and fixed probes=4 operating points.

The single-chip 1M x 300 8-tree run is the VERDICT r3 #2 milestone:
the stacked layout needed ~2 corpus copies per tree and could not
exist on one 16GB chip; the shared layout holds the corpus once
(reference memory shape, lsh.rs:44,53).

Run from /root/repo:  BENCH_N=1000000 python benchmarks/tpu_lsh_shared.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("BENCH_N", 100_000))
DIM = int(os.environ.get("BENCH_D", 300))
Q = int(os.environ.get("BENCH_Q", 16384))
TREES = int(os.environ.get("BENCH_TREES", 8))
MAX_NODE = int(os.environ.get("BENCH_MAX_NODE", 100))
TOP_K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("VERS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["VERS_PLATFORM"])
    from vers_tpu.utils.profiling import (
        enable_compilation_cache,
        timed_device,
        tunnel_canary,
    )

    enable_compilation_cache()
    import jax.numpy as jnp
    from vers_tpu.index.lsh import ANNIndex
    from vers_tpu.ops.pallas_topk import distance_topk
    from vers_tpu.core import round_up, to_device
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k

    canary = tunnel_canary()
    log(f"backend={jax.default_backend()} canary={canary:.4f}s/call")

    vectors, queries = synthetic_gaussian(
        N, DIM, n_clusters=1024, n_queries=Q, seed=0, normalized=True,
        query_noise=0.5,
    )
    n = vectors.shape[0]
    qdev = jnp.asarray(queries)

    # ground truth via the exact Pallas scan (sliced upload: a single
    # >1GB transfer wedges the shared tunnel)
    n_pad = round_up(n, 128)
    corpus = to_device(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    td, ti = distance_topk(qdev, corpus, n, TOP_K)
    truth = np.asarray(ti)
    del corpus, td, ti

    t0 = time.perf_counter()
    idx = ANNIndex.build_index(TREES, MAX_NODE, vectors, np.arange(n))
    build_s = time.perf_counter() - t0
    log(f"build: {build_s:.1f}s ({TREES} trees, max_node={MAX_NODE})")

    # probe sweep (VERDICT r4 #4: the 1M quality-throughput curve) —
    # "auto" = deficit-rule emulation, integers = fixed probes/tree
    specs = []
    for s in os.environ.get("BENCH_PROBES", "auto,4").split(","):
        s = s.strip()
        specs.append(("auto", None) if s == "auto" else (f"p{s}", int(s)))
    rows = {}
    for label, probes in specs:
        res = idx.search_batch(qdev, TOP_K, probes_per_tree=probes)
        rec = recall_at_k(res.ids, truth)
        t_q, _ = timed_device(
            lambda p=probes: idx.search_batch_device(
                qdev, TOP_K, probes_per_tree=p
            ),
            warmup=1, iters=2, depth=8,
        )
        rows[label] = (Q / t_q, rec)
        log(f"probes={label}: qps={Q / t_q:.0f} recall@10={rec:.4f}")

    rec = dict(
        ts=time.time(),
        what="lsh_shared_corpus",
        n=n, d=DIM, q=Q, trees=TREES, max_node=MAX_NODE,
        build_s=round(build_s, 1),
        canary_s=round(canary, 4),
    )
    for label, (qps, rc) in rows.items():
        rec[f"qps_{label}"] = round(qps)
        rec[f"recall_{label}"] = round(float(rc), 4)
    with open(os.path.join(os.path.dirname(__file__), "tpu_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
