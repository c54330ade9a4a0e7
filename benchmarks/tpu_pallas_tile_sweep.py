"""Same-day A/B sweep of the Pallas packed-scan tiles (r_blk, chunk,
q_blk) at the headline IVF operating point (100k x 300, k=256,
nprobe=1, Q=16k).

Motivation: with whole-bin groups of r_blk rows and ~n/k-row bins, each
query block matmuls against ALL r_blk rows of its group but only its
own bin's rows survive the bin-equality mask — the masked fraction
(and the HBM traffic) scales with r_blk. The 2048 floor was tuned
2026-08-16 before the merge-skip/scatter-inverse fixes; re-measure.

Run from /root/repo: python -u benchmarks/tpu_pallas_tile_sweep.py
Env: COMBOS_JSON='[[512,512,128],...]' to override the sweep list.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vers_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from vers_tpu.index.ivfflat import IVFFlatIndex
from vers_tpu.ops.binned import binned_topk_pallas
from vers_tpu.utils.data import synthetic_gaussian
from vers_tpu.utils.harness import recall_at_k
from vers_tpu.utils.profiling import timed_device


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 300))
    q_n = int(os.environ.get("BENCH_Q", 16384))
    k = int(os.environ.get("BENCH_K", 256))
    top_k = 10

    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    index = IVFFlatIndex.build_index(k, 2, 10, vectors)
    layout = index._ensure_layout()
    sizes = np.asarray(layout.get("true_sizes_host", layout["sizes_host"]))
    log(
        f"bins: n={n} k={k} mean={sizes.mean():.0f} p95="
        f"{np.percentile(sizes, 95):.0f} max={sizes.max()}"
    )
    qdev = jnp.asarray(queries)
    cent = index._centroids_dev

    from vers_tpu.utils.harness import exhaustive_batch

    truth = exhaustive_batch(vectors, queries[:2048], top_k)

    combos = json.loads(
        os.environ.get(
            "COMBOS_JSON",
            "[[2048,1024,128],[1024,1024,128],[1024,512,128],"
            "[512,512,128],[512,512,256],[1024,512,256]]",
        )
    )
    for r_blk, chunk, q_blk in combos:
        fn = lambda: binned_topk_pallas(
            qdev, cent, 1, layout, top_k=top_k,
            q_blk=q_blk, r_blk=r_blk, chunk=chunk,
        )
        try:
            dd, ii = fn()
            rec = recall_at_k(np.asarray(ii)[:2048], truth)
            t, _ = timed_device(fn, warmup=1, iters=2, depth=8)
        except Exception as e:
            log(f"r_blk={r_blk} chunk={chunk} q_blk={q_blk}: FAILED "
                f"({str(e)[:100]})")
            continue
        log(
            f"r_blk={r_blk} chunk={chunk} q_blk={q_blk}: "
            f"{q_n / t:,.0f} qps  {t*1e3:.2f} ms  recall@10={rec:.4f}"
        )


if __name__ == "__main__":
    main()
