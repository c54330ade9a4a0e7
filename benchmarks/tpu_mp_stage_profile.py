"""Attribute the combined multi-probe IVF search's device time to its
stages by timing standalone jits of each piece (fusion is lost across
the cuts, so the parts overestimate slightly; the attribution is what
matters).

Stages of `ops/binned._pallas_fused_core` with combined=True (p>1):
  probe   — (Q,k) centroid distances + top-nprobe
  pack    — rank-major (query, rank) pair argsort over p*Q keys +
            p*Q-row query gather + counts + workitem blocks
  scan    — pallas_packed_scan over the combined pair stream
  epilogue— scatter inverse perm over p*Q + s2o map + (q, p*k)
            reshape + merge_probe_results (rank-select, dedup-free)

Run from /root/repo, strictly serialized with other TPU jobs:
    python -u benchmarks/tpu_mp_stage_profile.py
Env: BENCH_N/D/Q/K, NPROBE (default 4).
"""

import functools
import os
import sys

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
from vers_tpu.ops.binned import merge_probe_results, pairwise_distance
from vers_tpu.ops.pallas_binned import (
    _workitems_blocks,
    padded_group_layout,
    pallas_packed_scan,
)
from vers_tpu.ops.topk import topk_smallest
from vers_tpu.utils.data import synthetic_gaussian
from vers_tpu.utils.profiling import timed_device, tunnel_canary


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 300))
    q_n = int(os.environ.get("BENCH_Q", 16384))
    k = int(os.environ.get("BENCH_K", 256))
    p = int(os.environ.get("NPROBE", 4))
    top_k = 10

    log(f"canary={tunnel_canary():.4f}s/call")
    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    index = IVFFlatIndex.build_index(k, 2, 10, vectors)
    layout = index._ensure_layout()
    qdev = jnp.asarray(queries)
    cent = index._centroids_dev

    # mirror binned_topk_pallas's plan (combined layout: one group
    # table for every rank, w_rank sized for p*Q/q_blk + g_max + 1)
    chunk = 1024
    r_blk = round_up(
        max(1024, round_up(layout["max_bin"], chunk), top_k), chunk
    )
    padded = padded_group_layout(layout, r_blk)
    q_blk = 128
    q_pad_rank = round_up(q_n, q_blk)
    rows_pad = p * q_pad_rank
    qb_scratch = rows_pad // q_blk
    w_rank = qb_scratch + padded["g_max"] + 1
    d_pad = padded["corpus"].shape[1]
    num_bins = layout["num_bins"]
    log(f"plan: p={p} q_blk={q_blk} r_blk={r_blk} w_rank={w_rank}")

    @jax.jit
    def probe(q):
        cdist = pairwise_distance(q, cent, "sq_euclidean")
        _, probes = topk_smallest(cdist, p)
        return probes

    @jax.jit
    def pack(q, probes):
        bins_flat = jnp.transpose(probes).reshape(-1).astype(jnp.int32)
        order = jnp.argsort(bins_flat, stable=True)
        qidx = jnp.remainder(order, q_n)
        q_sorted = jnp.concatenate(
            [
                jnp.take(q, qidx, axis=0),
                jnp.zeros((p * q_n, d_pad - d), q.dtype),
            ],
            axis=1,
        )
        qbin = bins_flat[order]
        tail = rows_pad - p * q_n + q_blk
        q_stack = jnp.pad(q_sorted, ((0, tail), (0, 0)))
        qbin_stack = jnp.pad(qbin, (0, tail), constant_values=-1)[None, :]
        counts = jnp.zeros((num_bins,), jnp.int32).at[bins_flat].add(1)
        qb, gb = _workitems_blocks(
            counts, 0, padded["g_first"][0], q_blk, w_rank, qb_scratch,
            g_base=padded["g_base"][0],
        )
        return q_stack, qbin_stack, qb, gb, order, bins_flat

    @functools.partial(jax.jit, static_argnames=())
    def scan(q_stack, qbin_stack, qb, gb):
        return pallas_packed_scan(
            q_stack, qbin_stack, qb, gb,
            padded["corpus"], padded["rbin"], padded["xx"],
            top_k=top_k, q_blk=q_blk, chunk=chunk,
            r_chunks=r_blk // chunk, q_pad_rank=q_pad_rank,
            metric="sq_euclidean", interpret=False,
        )

    @jax.jit
    def epilogue(res_d, res_i, order, bins_flat):
        pq = p * q_n
        inv = jnp.zeros((pq,), jnp.int32).at[order].set(
            jnp.arange(pq, dtype=jnp.int32)
        )
        pos = res_i[:pq][inv]
        dd = res_d[:pq][inv]
        live = (bins_flat < num_bins)[:, None]
        dd = jnp.where(live, dd, jnp.inf)
        ii = jnp.where(
            live & (pos >= 0), padded["s2o"][jnp.clip(pos, 0, None)], -1
        )
        all_d = dd.reshape(p, q_n, top_k).transpose(1, 0, 2).reshape(
            q_n, p * top_k
        )
        all_i = ii.reshape(p, q_n, top_k).transpose(1, 0, 2).reshape(
            q_n, p * top_k
        )
        return merge_probe_results(all_d, all_i, top_k, dedup=False)

    @jax.jit
    def unsort_only(res_d, res_i, order, bins_flat):
        pq = p * q_n
        inv = jnp.zeros((pq,), jnp.int32).at[order].set(
            jnp.arange(pq, dtype=jnp.int32)
        )
        pos = res_i[:pq][inv]
        dd = res_d[:pq][inv]
        live = (bins_flat < num_bins)[:, None]
        dd = jnp.where(live, dd, jnp.inf)
        ii = jnp.where(
            live & (pos >= 0), padded["s2o"][jnp.clip(pos, 0, None)], -1
        )
        return dd, ii

    probes = probe(qdev)
    q_stack, qbin_stack, qb, gb, order, bins_flat = pack(qdev, probes)
    res_d, res_i = scan(q_stack, qbin_stack, qb, gb)
    fin = epilogue(res_d, res_i, order, bins_flat)
    jax.block_until_ready(fin)

    stages = {
        "probe": lambda: probe(qdev),
        "pack": lambda: pack(qdev, probes),
        "scan": lambda: scan(q_stack, qbin_stack, qb, gb),
        "unsort_only": lambda: unsort_only(res_d, res_i, order, bins_flat),
        "epilogue": lambda: epilogue(res_d, res_i, order, bins_flat),
        "end2end": lambda: index.search_batch_device(qdev, top_k, nprobe=p),
    }
    for name, fn in stages.items():
        t, _ = timed_device(fn, warmup=1, iters=2, depth=8)
        log(f"{name}: {t*1e3:.2f} ms  ({q_n / t:,.0f} qps-equivalent)")


if __name__ == "__main__":
    main()
