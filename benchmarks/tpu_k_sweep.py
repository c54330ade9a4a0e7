"""Sweep IVFFlat k (cluster count) at the bench.py operating point
(100k x 300 synthetic, Q=16k, nprobe=1, fused pallas scan) to pick the
headline BENCH_K.

Tile model for the packed scan (q_blk=128, chunk=1024): cost ~ sum over
probed clusters of ceil(q_c/q_blk) * ceil(rows_c/chunk) tiles. At
Q=16k/k clusters a query block saturates only when k <= Q/q_blk = 128,
while rows_c <= chunk needs k >= n/chunk = 98 — so k ~ 128 minimizes
tiles. This script measures whether that model survives contact with
the dispatch/merge overheads.

Run from /root/repo: python benchmarks/tpu_k_sweep.py
Env: BENCH_N/D/Q, VERS_KS (comma list, default "128,256,512").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("VERS_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["VERS_PLATFORM"])

from vers_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vers_tpu.core import round_up
from vers_tpu.index.ivfflat import IVFFlatIndex
from vers_tpu.ops.pallas_topk import distance_topk
from vers_tpu.utils.data import synthetic_gaussian
from vers_tpu.utils.harness import recall_at_k
from vers_tpu.utils.profiling import timed_device


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 300))
    q_n = int(os.environ.get("BENCH_Q", 16384))
    ks = [int(s) for s in os.environ.get("VERS_KS", "128,256,512").split(",")]
    top_k = 10

    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    n_pad = round_up(n, 128)
    corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    qdev = jnp.asarray(queries)
    _, ti = distance_topk(qdev, corpus, n, top_k)
    truth = np.asarray(ti)
    log(f"backend={jax.default_backend()} n={n} d={d} q={q_n} ks={ks}")

    rows = []
    for k in ks:
        t0 = time.perf_counter()
        index = IVFFlatIndex.build_index(k, 2, 10, vectors)
        index._ensure_layout()
        build_s = time.perf_counter() - t0
        res = index.search_batch(np.asarray(queries), top_k, nprobe=1)
        rec = recall_at_k(res.ids, truth)
        t_q, _ = timed_device(
            lambda: index.search_batch_device(qdev, top_k, nprobe=1),
            warmup=1, iters=2, depth=8,
        )
        qps = q_n / t_q
        row = dict(k=k, nprobe=1, recall_at_10=round(float(rec), 4),
                   qps=round(qps, 1), build_s=round(build_s, 2))
        rows.append(row)
        log(f"k={k}: qps={qps:,.0f} recall={rec:.4f} build={build_s:.1f}s")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
