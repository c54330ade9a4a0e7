"""Split the per-rank nprobe cost of the shared-layout binned search
into its stages: dispatch1 (probe+sort+counts), counts download,
host pack_groups, dispatch2 (packed scan + merge).

Run: python benchmarks/profile_nprobe.py   (TPU by default)
"""

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
from vers_tpu.ops import binned


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n, d, k, q_n = 100_000, 300, 256, 16384
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = IVFFlatIndex.build_index(k, 1, 8, x)
    layout = idx._ensure_layout()
    queries = jnp.asarray(
        x[rng.integers(0, n, q_n)] + 0.3 * rng.normal(size=(q_n, d)).astype(np.float32)
    )
    np.asarray(queries)  # resident

    for nprobe in (1, 2, 4, 8):
        # warm both dispatches end to end
        idx.search_batch(np.asarray(queries), 10, nprobe=nprobe)

        stages = dict(d1=0.0, dl=0.0, pack=0.0, d2=0.0)
        iters = 3
        for _ in range(iters):
            t0 = time.time()
            q_stack, qbin_stack, orders, counts_dev = binned.probe_sort_counts(
                queries, idx._centroids_dev, k, nprobe, "sq_euclidean"
            )
            _ = np.asarray(counts_dev[0, :1])  # force
            t1 = time.time()
            counts = np.asarray(counts_dev)
            t2 = time.time()
            sizes, starts = layout["sizes_host"], layout["starts_host"]
            n_pad = layout["corpus_sorted"].shape[0]
            qmax = max(int(counts.max()), 1)
            n_used = max(int(sizes[counts.sum(0) > 0].sum()), 1)
            r_target = max(layout["max_bin"], 10, min(8192, max(1024, n_used // 32)))
            r_blk = min(round_up(r_target, 128), n_pad)
            g_est = max(n_used // r_blk, 1)
            q_blk = min(round_up(max(qmax, (q_n // g_est) * 2, 64), 64), round_up(q_n, 8))
            gq_all, gr_all = [], []
            for r in range(nprobe):
                gq, gr = binned.pack_groups(counts[r], sizes, starts, q_blk, r_blk)
                gq_all.append(gq + r * q_n)
                gr_all.append(gr)
            gq = np.concatenate(gq_all)
            gr = np.concatenate(gr_all)
            g_pad = round_up(max(len(gq), 1), 16)
            gq = np.pad(gq, (0, g_pad - len(gq)), constant_values=nprobe * q_n)
            gr = np.pad(gr, (0, g_pad - len(gr)))
            t3 = time.time()
            dd, ii = binned.scan_packed_merge(
                q_stack, qbin_stack, jnp.asarray(gq), jnp.asarray(gr),
                layout["corpus_sorted"], layout["rbin"], orders,
                layout["sorted_to_orig"], top_k=10, q_blk=q_blk, r_blk=r_blk,
                metric="sq_euclidean", use_approx=jax.default_backend() == "tpu",
                q_n=q_n,
            )
            _ = np.asarray(ii)
            t4 = time.time()
            stages["d1"] += t1 - t0
            stages["dl"] += t2 - t1
            stages["pack"] += t3 - t2
            stages["d2"] += t4 - t3
        total = sum(stages.values()) / iters
        log(
            f"nprobe={nprobe}: total={total*1e3:.1f}ms "
            + " ".join(f"{s}={v/iters*1e3:.1f}ms" for s, v in stages.items())
            + f" groups={len(gq)} q_blk={q_blk} r_blk={r_blk} qps={q_n/total:,.0f}"
        )


if __name__ == "__main__":
    main()
