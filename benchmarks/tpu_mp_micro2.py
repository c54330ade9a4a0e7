"""Micro A/Bs for the nprobe=4 combined-path epilogue (VERDICT r3 #5):

1. merge at (Q, p*k): rank-select (`ops/binned._rank_select_topk`,
   the current 3.1ms path) vs the streaming Pallas merge
   (`ops/pallas_topk.pallas_topk_values`) which was never tried at
   this width (merge_micro only compared vs topk_smallest).
2. pack ordering at p*Q keys over num_bins bins: stable argsort
   (current) vs a counting-rank scheme (one-hot block counts +
   cross-block exclusive cumsum) that also yields the inverse
   permutation for free (the epilogue currently rebuilds it by
   scatter).

Run from /root/repo, strictly serialized with other TPU jobs:
    python -u benchmarks/tpu_mp_micro2.py
Env: BENCH_Q (16384), NPROBE (4), K (10), NBINS (256).
"""

import functools
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

from vers_tpu.ops.binned import _rank_select_topk
from vers_tpu.ops.pallas_topk import pallas_topk_values
from vers_tpu.utils.profiling import timed_device, tunnel_canary


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("num_bins", "blk"))
def counting_ranks(bins_flat, num_bins: int, blk: int = 512):
    """Stable rank of each element when sorting by bin id (sentinel
    bin == num_bins sorts last). rank == the inverse permutation of
    jnp.argsort(bins_flat, stable=True)."""
    n = bins_flat.shape[0]
    nb = n // blk
    x = bins_flat.reshape(nb, blk)
    ids = jnp.arange(num_bins + 1, dtype=jnp.int32)
    onehot = (x[:, :, None] == ids[None, None, :]).astype(jnp.float32)
    # within-block exclusive prefix count of own bin: strict lower-tri
    # matmul on the MXU instead of a 67MB cumsum intermediate
    tri = jnp.tril(jnp.ones((blk, blk), jnp.float32), k=-1)
    pre = jax.lax.dot_general(
        tri, onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (blk, nb, num_bins+1) -- contract tri cols with block rows
    pre = jnp.transpose(pre, (1, 0, 2))
    within = jnp.sum(pre * onehot, axis=2).astype(jnp.int32)
    blk_counts = jnp.sum(onehot, axis=1)  # (nb, num_bins+1)
    total = jnp.sum(blk_counts, axis=0)
    blk_excl = (jnp.cumsum(blk_counts, axis=0) - blk_counts).astype(
        jnp.int32
    )
    base = (jnp.cumsum(total) - total).astype(jnp.int32)
    bidx = jnp.clip(x, 0, num_bins)
    rank = (
        base[bidx]
        + jnp.take_along_axis(blk_excl, bidx, axis=1)
        + within
    )
    return rank.reshape(n)


def main():
    q_n = int(os.environ.get("BENCH_Q", 16384))
    p = int(os.environ.get("NPROBE", 4))
    k = int(os.environ.get("K", 10))
    nbins = int(os.environ.get("NBINS", 256))
    canary = tunnel_canary()
    log(f"backend={jax.default_backend()} canary={canary:.4f}s/call")
    rng = np.random.default_rng(0)
    w = p * k
    all_d = jnp.asarray(
        rng.standard_normal((q_n, w)).astype(np.float32) ** 2
    )
    all_i = jnp.asarray(
        rng.integers(0, 100_000, (q_n, w)).astype(np.int32)
    )

    rs = jax.jit(functools.partial(_rank_select_topk, top_k=k))
    t_rs, _ = timed_device(lambda: rs(all_d, all_i), warmup=2, iters=4,
                           depth=8)
    ptv = jax.jit(
        lambda d, i: pallas_topk_values(d, i, k), backend="tpu"
    ) if jax.default_backend() == "tpu" else (
        lambda d, i: pallas_topk_values(d, i, k, interpret=True)
    )
    t_pl, _ = timed_device(lambda: ptv(all_d, all_i), warmup=2, iters=4,
                           depth=8)
    # correctness: same ascending lists (ties may reorder ids)
    d1, i1 = rs(all_d, all_i)
    d2, i2 = ptv(all_d, all_i)
    ok_merge = bool(
        np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    )
    log(f"merge (Q={q_n}, w={w}, k={k}): rank_select {t_rs*1e3:.3f}ms "
        f"pallas {t_pl*1e3:.3f}ms match={ok_merge}")

    pq = p * q_n
    bins = jnp.asarray(rng.integers(0, nbins, (pq,)).astype(np.int32))
    srt = jax.jit(lambda b: jnp.argsort(b, stable=True))
    t_as, _ = timed_device(lambda: srt(bins), warmup=2, iters=4, depth=8)
    cr = jax.jit(
        functools.partial(counting_ranks, num_bins=nbins)
    )
    t_cr, _ = timed_device(lambda: cr(bins), warmup=2, iters=4, depth=8)
    # correctness: rank must equal the inverse of stable argsort
    order = np.asarray(srt(bins))
    inv = np.zeros(pq, np.int32)
    inv[order] = np.arange(pq, dtype=np.int32)
    ok_rank = bool((np.asarray(cr(bins)) == inv).all())
    log(f"pack order (pq={pq}, bins={nbins}): argsort {t_as*1e3:.3f}ms "
        f"counting_ranks {t_cr*1e3:.3f}ms match={ok_rank}")

    # argsort + the epilogue's scatter inverse (what combined pays now)
    def as_plus_inv(b):
        o = jnp.argsort(b, stable=True)
        return o, jnp.zeros((pq,), jnp.int32).at[o].set(
            jnp.arange(pq, dtype=jnp.int32)
        )
    api = jax.jit(as_plus_inv)
    t_ai, _ = timed_device(lambda: api(bins), warmup=2, iters=4, depth=8)
    # counting + the scatter to get order back
    def cr_plus_order(b):
        r = counting_ranks(b, nbins)
        return jnp.zeros((pq,), jnp.int32).at[r].set(
            jnp.arange(pq, dtype=jnp.int32)
        ), r
    cpo = jax.jit(cr_plus_order)
    t_co, _ = timed_device(lambda: cpo(bins), warmup=2, iters=4, depth=8)
    log(f"argsort+scatter_inv {t_ai*1e3:.3f}ms vs "
        f"counting+scatter_order {t_co*1e3:.3f}ms")

    import json
    rec = dict(
        ts=time.time(), what="mp_micro2", q=q_n, p=p, k=k, nbins=nbins,
        canary_s=round(canary, 4),
        ms=dict(
            rank_select=round(t_rs * 1e3, 3),
            pallas_merge=round(t_pl * 1e3, 3),
            argsort=round(t_as * 1e3, 3),
            counting_ranks=round(t_cr * 1e3, 3),
            argsort_plus_inv=round(t_ai * 1e3, 3),
            counting_plus_order=round(t_co * 1e3, 3),
        ),
        match=dict(merge=ok_merge, rank=ok_rank),
    )
    with open(os.path.join(os.path.dirname(__file__),
                           "tpu_results.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
