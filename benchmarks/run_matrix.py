"""Benchmark matrix runner — the BASELINE.md configs.

Emits one JSON line per measurement (stdout); diagnostics on stderr.
Falls back to deterministic synthetic corpora when the real datasets
(wiki-news-300d-1M.vec, SIFT1M fvecs, GloVe) are absent (zero-egress
environments).

Configs (BASELINE.json):
  1. wiki-300d sample: IVFFlat k=64 build + top-10 search
  2. wiki-300d: LSH/RP-forest top-10
  3. wiki-300d: HNSW ef_search sweep {16,32,64} recall + QPS
  4. SIFT1M-style 128-d L2: IVFFlat nprobe sweep, recall@10 vs QPS
  5. GloVe-style 100-d cosine sharded: per-shard scan + cross-chip merge

Usage: python benchmarks/run_matrix.py [--config 1 2 4] [--n 100000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# Platform knobs (must land before first backend use): VERS_PLATFORM
# selects the backend; VERS_CPU_DEVICES creates a virtual device mesh
# for the sharded configs (config 5), e.g.
#   VERS_PLATFORM=cpu VERS_CPU_DEVICES=8 python benchmarks/run_matrix.py --config 5
if _os.environ.get("VERS_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VERS_PLATFORM"])
    if _os.environ.get("VERS_CPU_DEVICES"):
        _jax.config.update(
            "jax_num_cpu_devices", int(_os.environ["VERS_CPU_DEVICES"])
        )

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _corpus(n, d, seed=0, normalized=False):
    from vers_tpu.utils.data import synthetic_gaussian

    return synthetic_gaussian(
        n, d, n_clusters=max(32, n // 400), n_queries=4096, seed=seed,
        normalized=normalized,
    )


def _truth(vectors, queries, k=10):
    import jax.numpy as jnp
    from vers_tpu.core import round_up
    from vers_tpu.ops.pallas_topk import distance_topk

    n = vectors.shape[0]
    n_pad = round_up(n, 128)
    corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    _, ti = distance_topk(jnp.asarray(queries), corpus, n, k)
    return np.asarray(ti)


def config_wiki_ivfflat(n, d):
    from vers_tpu.index.ivfflat import IVFFlatIndex
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device

    vectors, queries = _corpus(n, d, seed=1, normalized=True)
    truth = _truth(vectors, queries)
    import jax.numpy as jnp
    qd = jnp.asarray(queries)  # device-resident: timing excludes upload
    t0 = time.perf_counter()
    idx = IVFFlatIndex.build_index(64, 2, 10, vectors)
    build_s = time.perf_counter() - t0
    idx._ensure_layout()
    for nprobe in (1, 2, 4, 8):
        res = idx.search_batch(queries, 10, nprobe=nprobe)
        rec = recall_at_k(res.ids, truth)
        t_q, _ = timed_device(
            lambda np_=nprobe: idx.search_batch_device(qd, 10, nprobe=np_),
            warmup=0, iters=2, depth=8,
        )
        emit(config="wiki-ivfflat", n=n, d=d, k=64, nprobe=nprobe,
             build_s=round(build_s, 2), recall_at_10=round(rec, 4),
             qps=round(len(queries) / t_q, 1))


def config_wiki_lsh(n, d):
    from vers_tpu.index.lsh import ANNIndex
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device

    vectors, queries = _corpus(n, d, seed=2, normalized=True)
    truth = _truth(vectors, queries)
    import jax.numpy as jnp
    qd = jnp.asarray(queries)
    t0 = time.perf_counter()
    idx = ANNIndex.build_index(8, 100, vectors, np.arange(n))
    build_s = time.perf_counter() - t0
    res = idx.search_batch(queries, 10)
    rec = recall_at_k(res.ids, truth)
    t_q, _ = timed_device(lambda: idx.search_batch_device(qd, 10), warmup=0, iters=2, depth=8)
    emit(config="wiki-lsh", n=n, d=d, trees=8, max_node=100,
         build_s=round(build_s, 2), recall_at_10=round(rec, 4),
         qps=round(len(queries) / t_q, 1))


def config_wiki_hnsw(n, d):
    from vers_tpu.index.hnsw import HNSWIndex
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device

    n = min(n, 20000)  # host-side build
    vectors, queries = _corpus(n, d, seed=3, normalized=True)
    queries = queries[:1024]
    truth = _truth(vectors, queries)
    import jax.numpy as jnp
    qd = jnp.asarray(queries)
    t0 = time.perf_counter()
    idx = HNSWIndex.build_index(8, 100, 32, 16, vectors)
    build_s = time.perf_counter() - t0
    for ef in (16, 32, 64):
        idx.ef_search = ef
        res = idx.search_batch(queries, 10)
        rec = recall_at_k(res.ids, truth)
        t_q, _ = timed_device(lambda: idx.search_batch_device(qd, 10), warmup=0, iters=2, depth=8)
        emit(config="wiki-hnsw", n=n, d=d, ef_search=ef,
             build_s=round(build_s, 2), recall_at_10=round(rec, 4),
             qps=round(len(queries) / t_q, 1))


def config_sift_ivfflat(n):
    from vers_tpu.index.ivfflat import IVFFlatIndex
    from vers_tpu.utils.data import dataset_path, read_fvecs
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device

    base = dataset_path("sift/sift_base.fvecs")
    if base:
        vectors = read_fvecs(base, max_rows=n)
        queries = read_fvecs(dataset_path("sift/sift_query.fvecs"), max_rows=4096)
        log(f"sift: real data n={len(vectors)}")
    else:
        vectors, queries = _corpus(n, 128, seed=4)
        log(f"sift: synthetic n={n}")
    truth = _truth(vectors, queries)
    import jax.numpy as jnp
    qd = jnp.asarray(queries)
    t0 = time.perf_counter()
    idx = IVFFlatIndex.build_index(1024 if len(vectors) > 300000 else 256, 2, 10, vectors)
    build_s = time.perf_counter() - t0
    idx._ensure_layout()
    for nprobe in (1, 2, 4, 8, 16, 32):
        res = idx.search_batch(queries, 10, nprobe=nprobe)
        rec = recall_at_k(res.ids, truth)
        t_q, _ = timed_device(
            lambda np_=nprobe: idx.search_batch_device(qd, 10, nprobe=np_),
            warmup=0, iters=2, depth=8,
        )
        emit(config="sift-ivfflat", n=len(vectors), d=128, nprobe=nprobe,
             build_s=round(build_s, 2), recall_at_10=round(rec, 4),
             qps=round(len(queries) / t_q, 1))


def config_glove_sharded(n):
    import jax
    from vers_tpu.parallel.sharded_index import ShardedFlatIndex
    from vers_tpu.parallel.ivf import ShardedIVFFlatIndex
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device

    d = 100
    vectors, queries = _corpus(n, d, seed=5, normalized=True)
    truth = _truth(vectors, queries)
    idx = ShardedFlatIndex.build_index(vectors, metric="cosine")
    res = idx.search_batch(queries, 10)
    # cosine truth differs from L2 truth only by normalization (both
    # normalized here, so rankings agree)
    rec = recall_at_k(res.ids, truth)
    t_q, _ = timed_device(lambda: idx.search_batch(queries, 10), warmup=0, iters=2, depth=8)
    # sharded save/load roundtrip
    import tempfile, os
    tmp = os.path.join(tempfile.gettempdir(), "glove_sharded")
    idx.save_index(tmp)
    re = ShardedFlatIndex.load_index(tmp)
    res2 = re.search_batch(queries[:64], 10)
    roundtrip_ok = bool((res2.ids == idx.search_batch(queries[:64], 10).ids).all())
    emit(config="glove-sharded-flat", n=n, d=d,
         n_devices=len(jax.devices()), recall_at_10=round(rec, 4),
         qps=round(len(queries) / t_q, 1), sharded_roundtrip=roundtrip_ok)

    # sharded IVF: psum k-means build + per-shard packed scan +
    # all_gather merge
    t0 = time.perf_counter()
    sivf = ShardedIVFFlatIndex.build_index(256, 1, 10, vectors)
    build_s = time.perf_counter() - t0
    for nprobe in (1, 4):
        res = sivf.search_batch(queries, 10, nprobe=nprobe)
        rec = recall_at_k(res.ids, truth)
        t_q, _ = timed_device(
            lambda np_=nprobe: sivf.search_batch(queries, 10, nprobe=np_),
            warmup=0, iters=2, depth=8,
        )
        emit(config="glove-sharded-ivf", n=n, d=d, nprobe=nprobe,
             n_devices=len(jax.devices()), build_s=round(build_s, 2),
             recall_at_10=round(rec, 4), qps=round(len(queries) / t_q, 1))


def config_sharded_hnsw(n):
    """Config 6: replicated-graph, query-sharded HNSW serving."""
    import jax
    from vers_tpu.index.hnsw import HNSWIndex
    from vers_tpu.parallel.hnsw import ShardedHNSWIndex
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device

    n = min(n, 20000)
    d = 300
    vectors, queries = _corpus(n, d, seed=6, normalized=True)
    queries = queries[:2048]
    truth = _truth(vectors, queries)
    t0 = time.perf_counter()
    base = HNSWIndex.build_index_batched(8, 100, 32, 16, vectors)
    build_s = time.perf_counter() - t0
    idx = ShardedHNSWIndex(base)
    res = idx.search_batch(queries, 10)
    rec = recall_at_k(res.ids, truth)
    t_q, _ = timed_device(
        lambda: idx._search_batch_rows(queries, 10), warmup=1, iters=2,
        depth=1,
    )
    emit(config="sharded-hnsw", n=n, d=d, ef_search=32,
         n_devices=len(jax.devices()), build_s=round(build_s, 2),
         recall_at_10=round(rec, 4),
         qps=round(len(queries) / t_q, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, nargs="*", default=[1, 2, 3, 4, 5, 6])
    p.add_argument("--n", type=int, default=100_000)
    args = p.parse_args()
    if 1 in args.config:
        config_wiki_ivfflat(min(args.n, 100_000), 300)
    if 2 in args.config:
        config_wiki_lsh(min(args.n, 100_000), 300)
    if 3 in args.config:
        config_wiki_hnsw(args.n, 300)
    if 4 in args.config:
        config_sift_ivfflat(args.n)
    if 5 in args.config:
        config_glove_sharded(min(args.n, 200_000))
    if 6 in args.config:
        config_sharded_hnsw(args.n)


if __name__ == "__main__":
    main()
