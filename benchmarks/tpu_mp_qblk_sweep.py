"""q_blk sweep at wide nprobe (VERDICT r4 #5 follow-up, r5 tail).

The nprobe=8 floor attribution (BASELINE.md "IVF nprobe=8 attack")
reads ~17us per (q_blk, r_blk) tile, latency-bound — and the packed
scan's tile count is p*Q/q_blk + G, so q_blk is the ONE knob that
directly divides the dominant term. q_blk=256 was only ever measured
pre-id-stream at nprobe=4 (a loss); at nprobe=8 with the current
engine (combined pair sort + id stream + dedup-free serving merge) it
is untested. Sweep q_blk in {128, 256, 384} end-to-end via
`binned_topk_pallas`, asserting identical outputs.

Run from /root/repo, strictly serialized with other TPU jobs:
    NPROBE=8 python -u benchmarks/tpu_mp_qblk_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vers_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import jax

if os.environ.get("VERS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VERS_PLATFORM"])

import jax.numpy as jnp

from vers_tpu.index.ivfflat import IVFFlatIndex
from vers_tpu.ops import binned
from vers_tpu.utils.data import synthetic_gaussian
from vers_tpu.utils.profiling import timed_device, tunnel_canary


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 300))
    q_n = int(os.environ.get("BENCH_Q", 16384))
    k = int(os.environ.get("BENCH_K", 256))
    p = int(os.environ.get("NPROBE", 8))
    blks = tuple(
        int(x) for x in os.environ.get("QBLKS", "128,256,384").split(",")
    )
    top_k = 10
    log(f"canary={tunnel_canary():.4f}s/call")

    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    index = IVFFlatIndex.build_index(k, 2, 10, vectors)
    layout = index._ensure_layout()
    qdev = jnp.asarray(queries)
    out = {}

    ref = None
    for q_blk in blks:
        fn = lambda qb=q_blk: binned.binned_topk_pallas(
            qdev, index._centroids_dev, p, layout, top_k=top_k,
            q_blk=qb, dedup=False,
        )
        t, res = timed_device(fn, warmup=1, iters=2, depth=8)
        dd, ids = np.asarray(res[0]), np.asarray(res[1])
        if ref is None:
            ref = (dd, ids)
        else:
            # tie-aware equivalence: distances bit-identical elementwise;
            # ids may swap only WITHIN equal-distance runs (measured:
            # 1 row of 16384 at q_blk=256 — a same-distance pair order)
            assert np.array_equal(dd, ref[0]), f"q_blk={q_blk} changed dists"
            diff = ids != ref[1]
            n_tie = int(diff.any(1).sum())
            for r in np.where(diff.any(1))[0]:
                assert set(ids[r]) == set(ref[1][r]), (
                    f"q_blk={q_blk} row {r} changed id set"
                )
            log(f"q_blk={q_blk}: {n_tie} tie-order rows")
        log(f"q_blk={q_blk}: {q_n / t:,.0f} qps  {t*1e3:.2f} ms")
        out[f"qps_qblk{q_blk}"] = round(q_n / t)

    rec = dict(ts=time.time(), what="mp_qblk_sweep", n=n, d=d, q=q_n, k=k,
               nprobe=p, **out)
    with open(os.path.join(os.path.dirname(__file__), "tpu_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
