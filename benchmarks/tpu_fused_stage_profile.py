"""Attribute the fused one-dispatch IVF search's device time to its
stages by timing standalone jits of each piece (fusion is lost across
the cuts, so the parts overestimate slightly; the attribution is what
matters).

Stages of `ops/binned._pallas_fused_core` at nprobe=1:
  probe  — (Q,k) centroid distances + top-nprobe
  pack   — per-rank stable argsort of bins + query gather + counts +
           workitem blocks
  scan   — pallas_packed_scan (the MXU kernel)
  unsort — scatter inverse perm + s2o map (p==1: no merge)

Run from /root/repo: python benchmarks/tpu_fused_stage_profile.py
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
from vers_tpu.ops.binned import pairwise_distance
from vers_tpu.ops.pallas_binned import (
    _workitems_blocks,
    padded_group_layout,
    pallas_packed_scan,
)
from vers_tpu.ops.topk import topk_smallest
from vers_tpu.utils.data import synthetic_gaussian
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
    qdev = jnp.asarray(queries)
    cent = index._centroids_dev

    # mirror binned_topk_pallas's plan
    chunk = 1024
    r_blk = round_up(max(2048, round_up(layout["max_bin"], chunk), top_k), chunk)
    padded = padded_group_layout(layout, r_blk)
    q_blk = 128
    q_pad_rank = round_up(q_n, q_blk)
    w_rank = q_pad_rank // q_blk + padded["g_max"] + 1
    d_pad = padded["corpus"].shape[1]
    num_bins = layout["num_bins"]
    log(f"plan: q_blk={q_blk} r_blk={r_blk} w_rank={w_rank} d_pad={d_pad}")

    @jax.jit
    def probe(q):
        cdist = pairwise_distance(q, cent, "sq_euclidean")
        _, probes = topk_smallest(cdist, 1)
        return probes

    @jax.jit
    def pack(q, probes):
        bins = probes[:, 0].astype(jnp.int32)
        order = jnp.argsort(bins, stable=True)
        q_sorted = jnp.concatenate(
            [jnp.take(q, order, axis=0), jnp.zeros((q_n, d_pad - d), q.dtype)],
            axis=1,
        )
        qbin = bins[order]
        counts = jnp.zeros((num_bins,), jnp.int32).at[bins].add(1)
        qb, gb = _workitems_blocks(
            counts, 0, padded["g_first"][0], q_blk, w_rank,
            q_pad_rank // q_blk, g_base=padded["g_base"][0],
        )
        q_stack = jnp.concatenate(
            [jnp.pad(q_sorted, ((0, q_pad_rank - q_n), (0, 0))),
             jnp.zeros((q_blk, d_pad), q.dtype)], axis=0
        )
        qbin_stack = jnp.concatenate(
            [jnp.pad(qbin, (0, q_pad_rank - q_n), constant_values=-1),
             jnp.full((q_blk,), -1, jnp.int32)]
        )[None, :]
        return q_stack, qbin_stack, qb, gb, order

    @functools.partial(jax.jit, static_argnames=())
    def scan(q_stack, qbin_stack, qb, gb):
        return pallas_packed_scan(
            q_stack, qbin_stack, qb, gb,
            padded["corpus"], padded["rbin"], padded["xx"],
            top_k=top_k, q_blk=q_blk, chunk=chunk, r_chunks=r_blk // chunk,
            q_pad_rank=q_pad_rank, metric="sq_euclidean", interpret=False,
        )

    @jax.jit
    def unsort(res_d, res_i, order):
        # mirror of the shipped nprobe=1 epilogue in _pallas_fused_core:
        # scatter-based inverse perm, NO cross-probe merge (p==1 skip)
        seg_d = res_d[:q_n]
        seg_i = res_i[:q_n]
        inv = jnp.zeros((q_n,), jnp.int32).at[order].set(
            jnp.arange(q_n, dtype=jnp.int32)
        )
        pos = seg_i[inv]
        out_d = seg_d[inv]
        out_i = jnp.where(pos >= 0, padded["s2o"][jnp.clip(pos, 0, None)], -1)
        return out_d, out_i

    probes = probe(qdev)
    q_stack, qbin_stack, qb, gb, order = pack(qdev, probes)
    res_d, res_i = scan(q_stack, qbin_stack, qb, gb)
    fin = unsort(res_d, res_i, order)
    jax.block_until_ready(fin)

    stages = {
        "probe": lambda: probe(qdev),
        "pack": lambda: pack(qdev, probes),
        "scan": lambda: scan(q_stack, qbin_stack, qb, gb),
        "unsort": lambda: unsort(res_d, res_i, order),
        "end2end": lambda: index.search_batch_device(qdev, top_k, nprobe=1),
    }
    for name, fn in stages.items():
        t, _ = timed_device(fn, warmup=1, iters=2, depth=8)
        log(f"{name}: {t*1e3:.2f} ms  ({q_n / t:,.0f} qps-equivalent)")


if __name__ == "__main__":
    main()
