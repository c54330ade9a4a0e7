"""nprobe=8 attack micros (VERDICT r4 #5 follow-up): the stage profile
reads scan 20ms + epilogue unsort 14.4ms of a 28.5ms batch, so

  A. epilogue: two (pq, k) row gathers (d, i) vs ONE packed (pq, 2k)
     gather (bitcast f32->i32 + concat) — TPU row gathers are
     row-op-bound, so halving the row count should ~halve the stage.
  B. scan tiling: r_blk/chunk 1024/1024 (default) vs 512/512 vs
     2048/1024 at p=8 via binned_topk_pallas end-to-end — at p=8 the
     q-block tiles dominate the grid, flipping the r4 nprobe=1 trade
     (masked-row waste per tile scales with r_blk).

Run from /root/repo, strictly serialized with other TPU jobs:
    python -u benchmarks/tpu_mp_micro8.py
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

    # -- A: packed vs split epilogue gather (standalone jits) ----------
    pq = p * q_n
    rng = np.random.default_rng(0)
    res_d = jnp.asarray(rng.normal(size=(pq, top_k)).astype(np.float32))
    res_i = jnp.asarray(
        rng.integers(0, n, size=(pq, top_k)).astype(np.int32)
    )
    idx_qm = jnp.asarray(
        rng.permutation(pq).astype(np.int32)
    )

    @jax.jit
    def split_gather(rd, ri, ix):
        return rd[ix], ri[ix]

    @jax.jit
    def packed_gather(rd, ri, ix):
        packed = jnp.concatenate(
            [jax.lax.bitcast_convert_type(rd, jnp.int32), ri], axis=1
        )
        pk = packed[ix]
        return (
            jax.lax.bitcast_convert_type(pk[:, :top_k], jnp.float32),
            pk[:, top_k:],
        )

    dd1, ii1 = split_gather(res_d, res_i, idx_qm)
    dd2, ii2 = packed_gather(res_d, res_i, idx_qm)
    assert np.array_equal(np.asarray(ii1), np.asarray(ii2))
    assert np.array_equal(np.asarray(dd1), np.asarray(dd2))
    t1, _ = timed_device(lambda: split_gather(res_d, res_i, idx_qm),
                         warmup=1, iters=2, depth=8)
    t2, _ = timed_device(lambda: packed_gather(res_d, res_i, idx_qm),
                         warmup=1, iters=2, depth=8)
    log(f"epilogue gather: split {t1*1e3:.2f} ms  packed {t2*1e3:.2f} ms")
    out["gather_split_ms"] = round(t1 * 1e3, 2)
    out["gather_packed_ms"] = round(t2 * 1e3, 2)

    # -- B: scan tiling sweep at p=8 (end-to-end, identical outputs) ---
    ref_ids = None
    for label, r_blk, chunk in (
        ("rb1024", 1024, 1024), ("rb512", 512, 512), ("rb2048", 2048, 1024),
    ):
        fn = lambda rb=r_blk, ck=chunk: binned.binned_topk_pallas(
            qdev, index._centroids_dev, p, layout, top_k=top_k,
            r_blk=rb, chunk=ck, dedup=False,
        )
        t, res = timed_device(fn, warmup=1, iters=2, depth=8)
        ids = np.asarray(res[1])
        if ref_ids is None:
            ref_ids = ids
        else:
            assert np.array_equal(ids, ref_ids), f"{label} changed results"
        log(f"{label}: {q_n / t:,.0f} qps  {t*1e3:.2f} ms")
        out[f"qps_{label}"] = round(q_n / t)

    rec = dict(ts=time.time(), what="mp_micro8", n=n, d=d, q=q_n, k=k,
               nprobe=p, **out)
    with open(os.path.join(os.path.dirname(__file__), "tpu_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
