"""Sweep (q_blk, r_blk) for the fused single-dispatch IVF search at the
headline shape. Diagnostics to stderr; run on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vers_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

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
        x[rng.integers(0, n, q_n)]
        + 0.3 * rng.normal(size=(q_n, d)).astype(np.float32)
    )
    np.asarray(queries)

    for nprobe in (1, 4):
        for q_blk, r_blk in [
            (None, None),
            (1024, 3200), (2048, 3200), (1024, 6400), (2048, 6400),
            (2048, 12800), (4096, 12800), (4096, 25600), (8192, 25600),
            (8192, 51200),
        ]:
            try:
                binned.binned_topk_fused(
                    queries, idx._centroids_dev, nprobe, layout, top_k=10,
                    q_blk=q_blk, r_blk=r_blk,
                )  # warm
                ts = []
                for _ in range(4):
                    t0 = time.time()
                    dd, ii = binned.binned_topk_fused(
                        queries, idx._centroids_dev, nprobe, layout,
                        top_k=10, q_blk=q_blk, r_blk=r_blk,
                    )
                    np.asarray(ii)
                    ts.append(time.time() - t0)
                best = min(ts)
                log(
                    f"nprobe={nprobe} q_blk={q_blk} r_blk={r_blk}: "
                    f"{best*1e3:7.1f}ms qps={q_n/best:9,.0f}"
                )
            except Exception as e:
                log(f"nprobe={nprobe} q_blk={q_blk} r_blk={r_blk}: FAIL {e}")


if __name__ == "__main__":
    main()
