"""A/B the rebuilt multi-probe IVF pipeline (VERDICT r3 #5): packed-key
pair sort (vs stable argsort), q-major inverse gather (vs rank-major +
transpose), and the in-kernel id stream (kernel_ids=True, vs the
epilogue s2o table gather) — at nprobe in {1, 2, 4, 8} on the bench
headline shape.

Modes produce identical ids (asserted at nprobe=4) — the A/B is pure
throughput. Baseline to beat (2026-08-20 am, canary 0.025-0.031):
nprobe1 1.888M / nprobe2 1.299M / nprobe4 814k / nprobe8 440k.

Run from /root/repo, serialized with other TPU jobs:
    python -u benchmarks/tpu_ivf_mp_ab.py
Env: BENCH_N (100000), BENCH_D (300), BENCH_Q (16384), BENCH_K (256),
NPROBES ("1,2,4,8"), VERS_PLATFORM.
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
from vers_tpu.ops.pallas_topk import distance_topk
from vers_tpu.utils.data import synthetic_gaussian
from vers_tpu.utils.harness import recall_at_k
from vers_tpu.utils.profiling import timed_device, tunnel_canary


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 300))
    q_n = int(os.environ.get("BENCH_Q", 16384))
    k = int(os.environ.get("BENCH_K", 256))
    nprobes = [int(s) for s in os.environ.get("NPROBES", "1,2,4,8").split(",")]
    canary = tunnel_canary()
    log(f"backend={jax.default_backend()} canary={canary:.4f}s/call")

    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    t0 = time.time()
    idx = IVFFlatIndex.build_index(k, 1, 8, vectors)
    layout = idx._ensure_layout()
    build_s = round(time.time() - t0, 1)
    log(f"build {build_s}s")
    qd = jnp.asarray(queries)
    _, ti = distance_topk(qd, jnp.asarray(vectors), n, 10)
    truth = np.asarray(ti)

    results = {}
    for p in nprobes:
        row = {}
        ref_ids = None
        for kid in (False, True):
            fn = lambda q: binned.binned_topk_pallas(
                q, idx._centroids_dev, p, layout, top_k=10,
                kernel_ids=kid,
            )
            t, out = timed_device(fn, qd, depth=8)
            ids = np.asarray(out[1])
            if ref_ids is None:
                ref_ids = ids
                row["recall"] = round(float(recall_at_k(ids, truth)), 4)
            else:
                assert np.array_equal(ref_ids, ids), (
                    f"kernel_ids changed results at nprobe={p}"
                )
            row["qps_kid" if kid else "qps"] = int(q_n / t)
        results[f"nprobe{p}"] = row
        log(f"nprobe={p}: {row}")

    rec = dict(ts=time.time(), what="ivf_mp_ab_r4b", n=n, d=d, q=q_n, k=k,
               build_s=build_s, canary_s=round(canary, 4), results=results)
    with open(os.path.join(os.path.dirname(__file__), "tpu_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
