"""Binned (bucketed) dense search — the shared engine behind IVFFlat's
cluster probe and the RP-forest's leaf probe.

The corpus is stored **bin-major** (rows sorted so each bin — k-means
cluster or RP-tree leaf — is one contiguous row range). Queries are
binned, and a `lax.scan` over bins runs one dense
(query-block × bin-block) distance matmul + top-k per bin: no corpus
gathers, pure MXU work. Per-query block writes overlap, but bins are
processed in ascending query-offset order, so each sorted query row is
last written by the bin that owns it.

This replaces the reference's pointer-y walks (`ivfflat.rs:166-195`
cluster scan, `lsh.rs:163-216` tree descent + DashSet merge) with
rectangles.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from vers_tpu.core import round_up
from vers_tpu.ops.distance import pairwise_distance
from vers_tpu.ops.topk import topk_smallest


def make_layout(values: np.ndarray, bin_ids: np.ndarray, num_bins: int) -> Dict:
    """Build a bin-major device layout from (n, d) values and their (n,)
    bin assignments. Returns dict with corpus_sorted (n_pad, d),
    sorted_to_orig (n_pad,), start (num_bins,), size (num_bins,),
    max_bin (python int)."""
    values = np.asarray(values, dtype=np.float32)
    n = values.shape[0]
    order = np.argsort(bin_ids[:n], kind="stable")
    sizes = np.bincount(bin_ids[:n], minlength=num_bins).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    n_pad = round_up(max(n, 1), 128)
    corpus_sorted = np.pad(values[order], ((0, n_pad - n), (0, 0)))
    sorted_to_orig = np.full((n_pad,), -1, np.int32)
    sorted_to_orig[:n] = order.astype(np.int32)
    return dict(
        corpus_sorted=jnp.asarray(corpus_sorted),
        sorted_to_orig=jnp.asarray(sorted_to_orig),
        start=jnp.asarray(starts),
        size=jnp.asarray(sizes),
        max_bin=int(sizes.max()) if n else 1,
        num_bins=num_bins,
    )


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "q_blk", "r_blk", "metric", "use_approx"),
)
def scan_one_probe(
    queries,         # (Q, d)
    bins,            # (Q,) int32 bin id per query
    corpus_sorted,   # (n_pad, d)
    sorted_to_orig,  # (n_pad,) int32
    start,           # (k,) int32
    size,            # (k,) int32
    top_k: int,
    q_blk: int,
    r_blk: int,
    metric: str = "sq_euclidean",
    use_approx: bool = False,
):
    """Dense per-bin scan for one probe rank. Returns (dists (Q, top_k),
    orig_rows (Q, top_k) int32)."""
    q_n, d = queries.shape
    k = start.shape[0]
    n_pad = corpus_sorted.shape[0]

    order = jnp.argsort(bins, stable=True)
    bins_sorted = bins[order]
    q_sorted = queries[order]
    qcount = jnp.zeros((k,), jnp.int32).at[bins_sorted].add(1)
    qstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(qcount)[:-1].astype(jnp.int32)]
    )
    q_pad = jnp.pad(q_sorted, ((0, q_blk), (0, 0)))
    res_d = jnp.full((q_n + q_blk, top_k), jnp.inf, jnp.float32)
    res_i = jnp.full((q_n + q_blk, top_k), -1, jnp.int32)

    def per_bin(carry, c):
        res_d, res_i = carry
        qs = qstart[c]
        rs = start[c]
        rc = size[c]
        qb = jax.lax.dynamic_slice(q_pad, (qs, 0), (q_blk, d))
        base = jnp.minimum(rs, n_pad - r_blk)
        rb = jax.lax.dynamic_slice(corpus_sorted, (base, 0), (r_blk, d))
        dist = pairwise_distance(qb, rb, metric)
        local = jax.lax.broadcasted_iota(jnp.int32, (1, r_blk), 1)
        valid = (base + local >= rs) & (base + local < rs + rc)
        dist = jnp.where(valid, dist, jnp.inf)
        if use_approx:
            # TPU PartialReduce top-k: ~5-10x cheaper than lax.top_k
            # inside the per-bin loop; the cross-probe merge re-ranks
            # exactly anyway
            bd, bi = jax.lax.approx_min_k(
                dist, min(top_k, r_blk), recall_target=0.99
            )
        else:
            bd, bi = topk_smallest(dist, min(top_k, r_blk))
        if bd.shape[1] < top_k:
            padn = top_k - bd.shape[1]
            bd = jnp.pad(bd, ((0, 0), (0, padn)), constant_values=jnp.inf)
            bi = jnp.pad(bi, ((0, 0), (0, padn)), constant_values=0)
        rows = jnp.where(jnp.isfinite(bd), base + bi, -1)
        res_d = jax.lax.dynamic_update_slice(res_d, bd, (qs, 0))
        res_i = jax.lax.dynamic_update_slice(res_i, rows, (qs, 0))
        return (res_d, res_i), None

    (res_d, res_i), _ = jax.lax.scan(
        per_bin, (res_d, res_i), jnp.arange(k, dtype=jnp.int32)
    )
    inv = jnp.argsort(order, stable=True)
    pos = res_i[:q_n][inv]
    dists = res_d[:q_n][inv]
    orig = jnp.where(pos >= 0, sorted_to_orig[jnp.clip(pos, 0, None)], -1)
    return dists, orig


@functools.partial(jax.jit, static_argnames=("top_k",))
def merge_probe_results(all_d, all_i, top_k: int):
    """Merge (Q, P*top_k) candidates from P probes: drop duplicate ids
    (a row can surface from several probes/trees), then final top-k.
    Returns (dists (Q, top_k), ids (Q, top_k))."""
    q_n = all_d.shape[0]
    pos_sorted = jnp.sort(all_i, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((q_n, 1), bool),
         (pos_sorted[:, 1:] == pos_sorted[:, :-1]) & (pos_sorted[:, 1:] >= 0)],
        axis=1,
    )
    rank = jnp.argsort(jnp.argsort(all_i, axis=1, stable=True), axis=1, stable=True)
    dup = jnp.take_along_axis(dup_sorted, rank, axis=1)
    all_d = jnp.where(dup, jnp.inf, all_d)
    fin_d, sel = topk_smallest(all_d, top_k)
    fin_i = jnp.take_along_axis(all_i, sel, axis=1)
    fin_i = jnp.where(jnp.isfinite(fin_d), fin_i, -1)
    return fin_d, fin_i


def binned_topk(
    queries: jnp.ndarray,
    probe_bins: Sequence[jnp.ndarray],   # per probe rank: (Q,) bin ids
    layouts: Sequence[Dict],             # per probe rank (may repeat)
    top_k: int,
    metric: str = "sq_euclidean",
):
    """Full binned search across probe ranks. Layouts may differ per
    rank (RP-forest: one per tree) or repeat (IVF: shared). Returns
    (dists (Q, top_k), orig_row_ids (Q, top_k) int32)."""
    q_n = queries.shape[0]
    out_d, out_i = [], []
    for bins, layout in zip(probe_bins, layouts):
        bins_h = np.asarray(bins)
        counts = np.bincount(bins_h, minlength=layout["num_bins"])
        q_blk = min(round_up(max(int(counts.max()), 1), 64), round_up(q_n, 8))
        r_blk = round_up(
            min(max(layout["max_bin"], top_k), layout["corpus_sorted"].shape[0]),
            128,
        )
        d, i = scan_one_probe(
            queries,
            jnp.asarray(bins_h.astype(np.int32)),
            layout["corpus_sorted"],
            layout["sorted_to_orig"],
            layout["start"],
            layout["size"],
            top_k=top_k,
            q_blk=q_blk,
            r_blk=r_blk,
            metric=metric,
            use_approx=jax.default_backend() == "tpu",
        )
        out_d.append(d)
        out_i.append(i)
    all_d = jnp.concatenate(out_d, axis=1)
    all_i = jnp.concatenate(out_i, axis=1)
    return merge_probe_results(all_d, all_i, top_k)
