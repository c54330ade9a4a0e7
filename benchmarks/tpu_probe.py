"""Resumable TPU measurement probe. Builds artifacts once (cached on
disk), then appends timing lines to benchmarks/tpu_results.jsonl.
Safe to re-run; each phase is skipped if its result already exists.
"""

import json
import os
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "tpu_results.jsonl")
CACHE = "/tmp/vers_bench_cache"
os.makedirs(CACHE, exist_ok=True)

N, D, Q, K = 100_000, 300, 16384, 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    kw["ts"] = time.time()
    with open(RESULTS, "a") as fp:
        fp.write(json.dumps(kw) + "\n")
    log("RESULT", kw)


def done(phase):
    if not os.path.exists(RESULTS):
        return False
    for line in open(RESULTS):
        try:
            if json.loads(line).get("phase") == phase:
                return True
        except json.JSONDecodeError:
            pass
    return False


def main():
    import jax
    from vers_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from vers_tpu.core import round_up
    from vers_tpu.index.ivfflat import IVFFlatIndex
    from vers_tpu.ops.pallas_topk import pallas_distance_topk
    from vers_tpu.ops.topk import approx_scan_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k

    vectors, queries = synthetic_gaussian(
        N, D, n_clusters=1024, n_queries=Q, seed=0, normalized=True,
        query_noise=0.5,
    )
    n_pad = round_up(N, 128)
    corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - N), (0, 0))))
    qdev = jnp.asarray(queries)

    truth_path = os.path.join(CACHE, "truth.npy")
    if os.path.exists(truth_path):
        truth = np.load(truth_path)
    else:
        t0 = time.time()
        _, ti = pallas_distance_topk(qdev, corpus, N, K)
        truth = np.asarray(ti)
        np.save(truth_path, truth)
        emit(phase="truth", seconds=round(time.time() - t0, 2))

    if not done("flat_exact"):
        _ = np.asarray(pallas_distance_topk(qdev, corpus, N, K)[0])
        t0 = time.time()
        for _ in range(3):
            _ = np.asarray(pallas_distance_topk(qdev, corpus, N, K)[0])
        dt = (time.time() - t0) / 3
        emit(phase="flat_exact", ms=round(dt * 1e3, 1), qps=round(Q / dt))

    if not done("flat_approx"):
        f = lambda: approx_scan_topk(qdev, corpus, N, K, chunk_size=25088)
        d0, i0 = f()
        rec = recall_at_k(np.asarray(i0), truth)
        t0 = time.time()
        for _ in range(3):
            _ = np.asarray(f()[0])
        dt = (time.time() - t0) / 3
        emit(phase="flat_approx", ms=round(dt * 1e3, 1), qps=round(Q / dt),
             recall=round(float(rec), 4))

    idx_path = os.path.join(CACHE, "ivf.index")
    if os.path.exists(idx_path):
        idx = IVFFlatIndex.load_index(idx_path, dim=D)
    else:
        t0 = time.time()
        idx = IVFFlatIndex.build_index(256, 2, 10, vectors)
        emit(phase="ivf_build", seconds=round(time.time() - t0, 2))
        idx.save_index(idx_path)
    idx._ensure_layout()

    for nprobe in (1, 2, 4, 8, 16):
        phase = f"ivf_nprobe{nprobe}"
        if done(phase):
            continue
        r = idx.search_batch(qdev, K, nprobe=nprobe)
        rec = recall_at_k(r.ids, truth)
        t0 = time.time()
        for _ in range(3):
            r = idx.search_batch(qdev, K, nprobe=nprobe)
        dt = (time.time() - t0) / 3
        emit(phase=phase, ms=round(dt * 1e3, 1), qps=round(Q / dt),
             recall=round(float(rec), 4))


if __name__ == "__main__":
    main()


def sift_1m():
    from vers_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    """BASELINE config 4: 1M x 128 L2, IVF k=1024, nprobe sweep."""
    import jax.numpy as jnp
    from vers_tpu.core import round_up
    from vers_tpu.index.ivfflat import IVFFlatIndex
    from vers_tpu.ops.pallas_topk import pallas_distance_topk
    from vers_tpu.ops.topk import approx_scan_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k

    N1, D1, Q1, K1 = 1_000_000, 128, 16384, 10
    vectors, queries = synthetic_gaussian(
        N1, D1, n_clusters=4096, n_queries=Q1, seed=7, query_noise=0.5
    )
    n_pad = round_up(N1, 128)
    corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - N1), (0, 0))))
    qdev = jnp.asarray(queries)

    tp = os.path.join(CACHE, "truth1m.npy")
    if os.path.exists(tp):
        truth = np.load(tp)
    else:
        t0 = time.time()
        _, ti = pallas_distance_topk(qdev, corpus, N1, K1)
        truth = np.asarray(ti)
        np.save(tp, truth)
        emit(phase="truth1m", seconds=round(time.time() - t0, 2))

    if not done("flat1m_exact"):
        _ = np.asarray(pallas_distance_topk(qdev, corpus, N1, K1)[0])
        t0 = time.time()
        for _ in range(3):
            _ = np.asarray(pallas_distance_topk(qdev, corpus, N1, K1)[0])
        dt = (time.time() - t0) / 3
        emit(phase="flat1m_exact", ms=round(dt * 1e3, 1), qps=round(Q1 / dt))

    if not done("flat1m_approx"):
        f = lambda: approx_scan_topk(qdev, corpus, N1, K1, chunk_size=125056)
        d0, i0 = f()
        rec = recall_at_k(np.asarray(i0), truth)
        t0 = time.time()
        for _ in range(3):
            _ = np.asarray(f()[0])
        dt = (time.time() - t0) / 3
        emit(phase="flat1m_approx", ms=round(dt * 1e3, 1), qps=round(Q1 / dt),
             recall=round(float(rec), 4))

    idx_path = os.path.join(CACHE, "ivf1m.index")
    if os.path.exists(idx_path):
        idx = IVFFlatIndex.load_index(idx_path, dim=D1)
    else:
        t0 = time.time()
        idx = IVFFlatIndex.build_index(1024, 1, 10, vectors)
        emit(phase="ivf1m_build", seconds=round(time.time() - t0, 2))
        idx.save_index(idx_path)
    idx._ensure_layout()

    for nprobe in (1, 2, 4, 8):
        phase = f"ivf1m_nprobe{nprobe}"
        if done(phase):
            continue
        r = idx.search_batch(qdev, K1, nprobe=nprobe)
        rec = recall_at_k(r.ids, truth)
        t0 = time.time()
        for _ in range(3):
            r = idx.search_batch(qdev, K1, nprobe=nprobe)
        dt = (time.time() - t0) / 3
        emit(phase=phase, ms=round(dt * 1e3, 1), qps=round(Q1 / dt),
             recall=round(float(rec), 4))


if os.environ.get("PROBE_1M"):
    sift_1m()


def ann_100k():
    from vers_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    """LSH forest + batched-HNSW at 100k x 300 (wiki-style)."""
    import jax.numpy as jnp
    from vers_tpu.index.lsh import ANNIndex
    from vers_tpu.index.hnsw import HNSWIndex
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k

    vectors, queries = synthetic_gaussian(
        N, D, n_clusters=1024, n_queries=Q, seed=0, normalized=True,
        query_noise=0.5,
    )
    qdev = jnp.asarray(queries)
    truth = np.load(os.path.join(CACHE, "truth.npy"))

    lsh_path = os.path.join(CACHE, "lsh.index")
    lsh = None
    if os.path.exists(lsh_path):
        lsh = ANNIndex.load_index(lsh_path, dim=D)
    else:
        t0 = time.time()
        lsh = ANNIndex.build_index(8, 100, vectors, np.arange(N))
        emit(phase="lsh_build", seconds=round(time.time() - t0, 2),
             trees=8, max_node=100)
        lsh.save_index(lsh_path)
    for ppt in (1, 2, 4):
        if done(f"lsh_search_p{ppt}"):
            continue
        r = lsh.search_batch(qdev, K, probes_per_tree=ppt)
        rec = recall_at_k(r.ids, truth)
        t0 = time.time()
        for _ in range(3):
            r = lsh.search_batch(qdev, K, probes_per_tree=ppt)
        dt = (time.time() - t0) / 3
        emit(phase=f"lsh_search_p{ppt}", ms=round(dt * 1e3, 1),
             qps=round(Q / dt), recall=round(float(rec), 4))

    n_h = 100_000
    h_path = os.path.join(CACHE, "hnsw100k.index")
    if os.path.exists(h_path):
        h = HNSWIndex.load_index(h_path, dim=D)
    else:
        t0 = time.time()
        h = HNSWIndex.build_index_batched(8, 100, 32, 16, vectors[:n_h],
                                          wave_cap=2048)
        emit(phase="hnsw_batched_build", seconds=round(time.time() - t0, 2),
             n=n_h, layers=h.get_num_nodes_in_layers())
        h.save_index(h_path)
    if not done("hnsw_batched_search"):
        q1 = qdev[:4096]
        r = h.search_batch(q1, K)
        rec = recall_at_k(r.ids, truth[:4096])
        t0 = time.time()
        for _ in range(3):
            r = h.search_batch(q1, K)
        dt = (time.time() - t0) / 3
        emit(phase="hnsw_batched_search", ms=round(dt * 1e3, 1),
             qps=round(4096 / dt), recall=round(float(rec), 4),
             ef_search=32)


if os.environ.get("PROBE_ANN"):
    ann_100k()


def wiki_1m():
    from vers_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    """The reference's headline shape: 1M x 300 (wiki-news-300d-1M)."""
    import jax.numpy as jnp
    from vers_tpu.core import round_up
    from vers_tpu.index.ivfflat import IVFFlatIndex
    from vers_tpu.ops.pallas_topk import pallas_distance_topk
    from vers_tpu.ops.topk import approx_scan_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k

    N2, D2, Q2, K2 = 1_000_000, 300, 16384, 10
    vectors, queries = synthetic_gaussian(
        N2, D2, n_clusters=8192, n_queries=Q2, seed=9, normalized=True,
        query_noise=0.5,
    )
    n_pad = round_up(N2, 128)
    corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - N2), (0, 0))))
    qdev = jnp.asarray(queries)

    tp = os.path.join(CACHE, "truth_wiki1m.npy")
    if os.path.exists(tp):
        truth = np.load(tp)
    else:
        t0 = time.time()
        _, ti = pallas_distance_topk(qdev, corpus, N2, K2)
        truth = np.asarray(ti)
        np.save(tp, truth)
        emit(phase="truth_wiki1m", seconds=round(time.time() - t0, 2))

    if not done("wiki1m_flat_approx"):
        f = lambda: approx_scan_topk(qdev, corpus, N2, K2, chunk_size=125056)
        d0, i0 = f()
        rec = recall_at_k(np.asarray(i0), truth)
        t0 = time.time()
        for _ in range(3):
            _ = np.asarray(f()[0])
        dt = (time.time() - t0) / 3
        emit(phase="wiki1m_flat_approx", ms=round(dt * 1e3, 1),
             qps=round(Q2 / dt), recall=round(float(rec), 4))

    idx_path = os.path.join(CACHE, "wiki1m_ivf.index")
    if os.path.exists(idx_path):
        idx = IVFFlatIndex.load_index(idx_path, dim=D2)
    else:
        t0 = time.time()
        idx = IVFFlatIndex.build_index(2048, 1, 10, vectors)
        emit(phase="wiki1m_ivf_build", seconds=round(time.time() - t0, 2), k=2048)
        idx.save_index(idx_path)
    idx._ensure_layout()
    for nprobe in (1, 2, 4):
        phase = f"wiki1m_ivf_nprobe{nprobe}"
        if done(phase):
            continue
        r = idx.search_batch(qdev, K2, nprobe=nprobe)
        rec = recall_at_k(r.ids, truth)
        t0 = time.time()
        for _ in range(3):
            r = idx.search_batch(qdev, K2, nprobe=nprobe)
        dt = (time.time() - t0) / 3
        emit(phase=phase, ms=round(dt * 1e3, 1), qps=round(Q2 / dt),
             recall=round(float(rec), 4))


if os.environ.get("PROBE_WIKI1M"):
    wiki_1m()
