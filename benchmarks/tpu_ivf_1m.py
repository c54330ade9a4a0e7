"""1M-scale IVF operating points (the reference's wiki-1M / SIFT1M
shapes) on one chip: device build + pipelined nprobe sweep.

Corpus synthesizes on the host but uploads via `core.to_device`
(256MB slices — a single >1GB transfer wedges the tunnel, CLAUDE.md).

Run from /root/repo, strictly serialized with other TPU jobs:
    python -u benchmarks/tpu_ivf_1m.py
Env: N (1_000_000), D (300), K (2048), Q (16384), NPROBES ("1,2").
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
    import jax.numpy as jnp

    from vers_tpu.core import round_up, to_device
    from vers_tpu.index.ivfflat import IVFFlatIndex
    from vers_tpu.ops.pallas_topk import distance_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device

    log(f"backend={jax.default_backend()}")
    n = int(os.environ.get("N", 1_000_000))
    d = int(os.environ.get("D", 300))
    k = int(os.environ.get("K", 2048))
    q_n = int(os.environ.get("Q", 16_384))
    nprobes = [int(s) for s in os.environ.get("NPROBES", "1,2").split(",")]
    top_k = 10

    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=4096, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    n_pad = round_up(n, 128)
    dev = to_device(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    qd = jnp.asarray(queries)

    t0 = time.time()
    idx = IVFFlatIndex.build_index_device(k, 2, 10, dev, n_valid=n)
    idx.search_batch_device(qd[:128], top_k, nprobe=1)  # layout + compile
    build_s = time.time() - t0
    log(f"device build k={k}: {build_s:.1f}s (incl. layout + compile)")

    _, ti = distance_topk(qd, dev, n, top_k)
    truth = np.asarray(ti)

    # Output-identity check at the 1M shape (VERDICT r4 #2): the r4
    # in-kernel id stream (kernel_ids=True default) vs the pre-rebuild
    # s2o-table epilogue, per nprobe on a query subset. r_blk=1024
    # one-chunk groups interact with k=2048 differently than k=256, so
    # 100k identity does not imply 1M identity.
    identity = os.environ.get("IDENTITY", "1") == "1"
    id_rows = []
    if identity:
        from vers_tpu.ops.binned import binned_topk_pallas

        layout = idx._ensure_layout()
        q_sub = qd[:2048]
        for p in nprobes:
            d_new, i_new = binned_topk_pallas(
                q_sub, idx._centroids_dev, p, layout, top_k=top_k,
                dedup=False, kernel_ids=True)
            d_old, i_old = binned_topk_pallas(
                q_sub, idx._centroids_dev, p, layout, top_k=top_k,
                dedup=False, kernel_ids=False)
            same_i = bool(np.array_equal(np.asarray(i_new), np.asarray(i_old)))
            same_d = bool(np.allclose(np.asarray(d_new), np.asarray(d_old)))
            log(f"identity nprobe={p}: ids_equal={same_i} d_close={same_d}")
            id_rows.append(dict(nprobe=p, ids_equal=same_i, d_close=same_d))

    results = []
    for p in nprobes:
        fn = lambda p=p: idx.search_batch_device(qd, top_k, nprobe=p)
        _, ii = fn()
        rec = recall_at_k(np.asarray(ii), truth)
        t, _ = timed_device(fn, warmup=1, iters=2, depth=8)
        log(f"nprobe={p}: {q_n / t:,.0f} qps  {t*1e3:.1f} ms  "
            f"recall@10={rec:.4f}")
        results.append(
            dict(nprobe=p, qps=round(q_n / t), ms=round(t * 1e3, 1),
                 recall_at_10=round(float(rec), 4))
        )
    print(json.dumps(dict(
        config="ivf-1m", n=n, d=d, k=k, q=q_n, build_s=round(build_s, 1),
        results=results, identity=id_rows, ts=time.strftime("%Y-%m-%d"),
    )), flush=True)


if __name__ == "__main__":
    main()
