"""Fused distance + streaming top-k Pallas kernel — the TPU-native
replacement for the reference's hand-written SIMD distance kernels
(`vers/src/indexes/base.rs:158-293`).

Design (per the TPU hardware model):

- grid = (query_tiles, corpus_chunks); for a fixed query tile the
  corpus streams through VMEM chunk by chunk (the query tile's block
  index is constant over the inner grid dim, so Mosaic keeps it
  resident and double-buffers only the corpus stream),
- the (QT, C) distance tile is an MXU matmul and never leaves VMEM,
- a running (QT, K) best set lives in VMEM scratch across the corpus
  scan — heaps become K unrolled min/argmin extraction passes,
- a cheap threshold test (`chunk min < per-row kth best`) skips the
  merge for chunks that cannot contribute, so the VPU merge cost is
  amortized away after the first few chunks.

Falls back to the pure-XLA ``fused_scan_topk`` on non-TPU backends and
for K > MAX_PALLAS_K.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vers_tpu.core import round_up
from vers_tpu.ops.topk import approx_scan_topk, fused_scan_topk

MAX_PALLAS_K = 128
DEFAULT_QUERY_TILE = 256
DEFAULT_CHUNK = 1024


def _merge_topk(best_d, best_i, dist, rows, k: int, ids=None):
    """Merge a (QT, C) candidate tile into the running (QT, K) best set.
    ``rows`` is (1, C) and AFFINE in the column (``rows[0, 0] + col`` —
    both kernels build it as base + iota). Returns (new_d, new_i).

    ``ids`` (optional, (1, C) int32, arbitrary values): merge these ids
    instead of the affine rows — the binned kernel's id-stream mode,
    where the picked id needs a one-hot extraction per pass (the affine
    trick reads ``base + argmin``). The extraction was measured
    time-neutral in the flat kernel (2026-08-19 A/B).

    Two phases (fori_loops, so VMEM holds one live buffer, not K
    unrolled copies):
      1. K extract-min passes over the TILE alone: the affine rows mean
         the picked id is just ``base + argmin`` — no index one-hot
         extraction and no (QT, K+C) concat buffer. Same-day A/B
         (2026-08-19, 16k IVF batch): time-neutral (8.38 vs 8.46 ms —
         the argmin/min reductions dominate each pass, not the
         extraction), but ~1MB less live VMEM per merge.
      2. An extract-min merge of the two ascending K-lists at width 2K
         (negligible). Same result and tie rule as one extract-min over
         [best | tile]: carry entries win ties, then lower column.
    """
    qt, _ = dist.shape
    base = rows[0, 0] if ids is None else None
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)

    def body(t, carry):
        cand, out_d, out_i = carry
        am = jnp.argmin(cand, axis=1)  # ties -> lowest col
        m = jnp.min(cand, axis=1)
        at_t = col_k == t  # masked column write (Mosaic has no DUS on values)
        out_d = jnp.where(at_t, m[:, None], out_d)
        if ids is None:
            picked_i = (base + am).astype(jnp.int32)
        else:
            picked_i = jnp.sum(
                jnp.where(col == am[:, None], ids, 0), axis=1
            ).astype(jnp.int32)
        out_i = jnp.where(at_t, picked_i[:, None], out_i)
        cand = jnp.where(col == am[:, None], jnp.inf, cand)
        return cand, out_d, out_i

    _, tile_d, tile_i = jax.lax.fori_loop(
        0,
        k,
        body,
        (
            dist,
            jnp.full((qt, k), jnp.inf, jnp.float32),
            jnp.full((qt, k), -1, jnp.int32),
        ),
    )

    cand_d0 = jnp.concatenate([best_d, tile_d], axis=1)  # (QT, 2K)
    cand_i = jnp.concatenate([best_i, tile_i], axis=1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, cand_d0.shape, 1)

    def body2(t, carry):
        cand_d, out_d, out_i = carry
        am = jnp.argmin(cand_d, axis=1)  # ties -> lowest col -> carry first
        m = jnp.min(cand_d, axis=1)
        picked = col2 == am[:, None]
        got_i = jnp.sum(jnp.where(picked, cand_i, 0), axis=1).astype(jnp.int32)
        at_t = col_k == t
        out_d = jnp.where(at_t, m[:, None], out_d)
        out_i = jnp.where(at_t, got_i[:, None], out_i)
        cand_d = jnp.where(picked, jnp.inf, cand_d)
        return cand_d, out_d, out_i

    _, out_d, out_i = jax.lax.fori_loop(
        0,
        k,
        body2,
        (
            cand_d0,
            jnp.full((qt, k), jnp.inf, jnp.float32),
            jnp.full((qt, k), -1, jnp.int32),
        ),
    )
    return out_d, out_i


def _kernel(n_valid_ref, q_ref, x_ref, xx_ref, out_d_ref, out_i_ref,
            best_d, best_i, *, k: int, chunk: int, metric: str,
            precision: str = "highest"):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.full_like(best_i, -1)

    # keep native dtype into the MXU (bf16 inputs run at full MXU rate);
    # accumulate in f32 always
    q = q_ref[:]
    x = x_ref[:]
    dot = jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dict(
            highest=jax.lax.Precision.HIGHEST,
            high=jax.lax.Precision.HIGH,
            default=jax.lax.Precision.DEFAULT,
        )[precision],
    )  # (QT, C)
    if metric == "cosine":
        dist = 1.0 - dot
    else:
        qf = q.astype(jnp.float32)
        qq = jnp.sum(qf * qf, axis=1, keepdims=True)
        dist = jnp.maximum(qq + xx_ref[:] - 2.0 * dot, 0.0)  # xx is (1, C)

    rows = j * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    n_valid = n_valid_ref[0, 0]
    dist = jnp.where(rows < n_valid, dist, jnp.inf)

    # skip the merge when no candidate beats any row's current kth best
    kth = jnp.max(best_d[:], axis=1, keepdims=True)  # (QT, 1)
    improves = jnp.any(dist < kth)

    @pl.when(improves)
    def _merge():
        new_d, new_i = _merge_topk(best_d[:], best_i[:], dist, rows, k)
        best_d[:] = new_d
        best_i[:] = new_i

    @pl.when(j == n_chunks - 1)
    def _flush():
        out_d_ref[:] = best_d[:]
        out_i_ref[:] = jnp.where(jnp.isfinite(best_d[:]), best_i[:], -1)


def _values_kernel(vals_ref, ids_ref, out_d_ref, out_i_ref, best_d, best_i,
                   *, k: int):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.full_like(best_i, -1)

    vals = vals_ref[:]
    kth = jnp.max(best_d[:], axis=1, keepdims=True)
    improves = jnp.any(vals < kth)

    @pl.when(improves)
    def _merge():
        cand_d = jnp.concatenate([best_d[:], vals], axis=1)
        cand_i = jnp.concatenate([best_i[:], ids_ref[:]], axis=1)
        qt = cand_d.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
        col_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)

        def body(t, carry):
            cd, od, oi = carry
            am = jnp.argmin(cd, axis=1)
            m = jnp.min(cd, axis=1)
            picked = col == am[:, None]
            got_i = jnp.sum(jnp.where(picked, cand_i, 0), axis=1).astype(
                jnp.int32
            )
            at_t = col_k == t
            od = jnp.where(at_t, m[:, None], od)
            oi = jnp.where(at_t, got_i[:, None], oi)
            cd = jnp.where(picked, jnp.inf, cd)
            return cd, od, oi

        _, od, oi = jax.lax.fori_loop(
            0, k, body,
            (cand_d,
             jnp.full((qt, k), jnp.inf, jnp.float32),
             jnp.full((qt, k), -1, jnp.int32)),
        )
        best_d[:] = od
        best_i[:] = oi

    @pl.when(j == n_chunks - 1)
    def _flush():
        out_d_ref[:] = best_d[:]
        out_i_ref[:] = jnp.where(jnp.isfinite(best_d[:]), best_i[:], -1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "query_tile", "chunk_size", "interpret"),
)
def pallas_topk_values(
    vals: jnp.ndarray,
    ids: jnp.ndarray,
    k: int,
    query_tile: int = 128,
    chunk_size: int = 1024,
    interpret: bool = False,
):
    """Exact top-k (smallest) of precomputed (Q, W) f32 values with
    carried int32 ids — the streaming-merge kernel without the distance
    matmul. Exists because XLA's sorts at moderate widths are the
    slowest op in the bucket-scan pipeline (lax.top_k: 47ms,
    lax.approx_min_k: 36ms at (16k, 6272); this kernel: ~2ms).

    Returns (vals (Q, k) ascending, ids (Q, k); +inf/-1 padding).
    """
    q_n, w = vals.shape
    qt = min(query_tile, round_up(q_n, 8))
    chunk = max(128, min(chunk_size, round_up(w, 128)))
    q_pad = round_up(q_n, qt)
    w_pad = round_up(w, chunk)
    if q_pad != q_n or w_pad != w:
        vals = jnp.pad(
            vals, ((0, q_pad - q_n), (0, w_pad - w)),
            constant_values=jnp.inf,
        )
        ids = jnp.pad(
            ids, ((0, q_pad - q_n), (0, w_pad - w)), constant_values=-1
        )
    grid = (q_pad // qt, w_pad // chunk)
    out_d, out_i = pl.pallas_call(
        functools.partial(_values_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qt, k), jnp.float32),
            pltpu.VMEM((qt, k), jnp.int32),
        ],
        interpret=interpret,
    )(vals, ids)
    return out_d[:q_n], out_i[:q_n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "query_tile", "chunk_size", "interpret", "precision"
    ),
)
def pallas_distance_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    n_valid,
    k: int,
    metric: str = "sq_euclidean",
    query_tile: int = DEFAULT_QUERY_TILE,
    chunk_size: int = DEFAULT_CHUNK,
    interpret: bool = False,
    precision: str = "highest",
):
    """Exact top-k via the fused Pallas kernel.

    queries (Q, d), corpus (N_pad, d); rows >= n_valid ignored.
    Returns (dists (Q, k) f32 ascending, indices (Q, k) int32).
    """
    if metric not in ("sq_euclidean", "cosine"):
        raise ValueError(f"unknown metric {metric!r}")
    q_n, d = queries.shape
    n_pad = corpus.shape[0]

    qt = min(query_tile, round_up(q_n, 8))
    chunk = min(chunk_size, n_pad)

    # pad shapes so grid tiles exactly
    q_pad = round_up(q_n, qt)
    if q_pad != q_n:
        queries = jnp.pad(queries, ((0, q_pad - q_n), (0, 0)))
    rem = (-n_pad) % chunk
    if rem:
        corpus = jnp.pad(corpus, ((0, rem), (0, 0)))
        n_pad += rem
    d_pad = round_up(d, 128)
    if d_pad != d:
        queries = jnp.pad(queries, ((0, 0), (0, d_pad - d)))
        corpus = jnp.pad(corpus, ((0, 0), (0, d_pad - d)))

    xx = jnp.sum(corpus.astype(jnp.float32) ** 2, axis=1)[None, :]  # (1, N_pad)
    n_valid_arr = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)

    grid = (q_pad // qt, n_pad // chunk)
    kernel = functools.partial(
        _kernel, k=k, chunk=chunk, metric=metric, precision=precision
    )

    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid (1, 1)
            pl.BlockSpec((qt, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qt, k), jnp.float32),
            pltpu.VMEM((qt, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d_pad,
            bytes_accessed=(q_pad // qt) * n_pad * d_pad * corpus.dtype.itemsize
            + q_pad * d_pad * queries.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_valid_arr, queries, corpus, xx)

    return out_d[:q_n], out_i[:q_n]


def distance_topk(
    queries,
    corpus,
    n_valid,
    k: int,
    metric: str = "sq_euclidean",
    chunk_size: int = 16384,
    force: str | None = None,
    precision: str = "highest",
):
    """Dispatcher: fused Pallas kernel on TPU (k <= MAX_PALLAS_K), pure
    XLA ``fused_scan_topk`` otherwise. ``force`` in {"pallas", "xla",
    "approx"} pins a path (tests / speed). ``precision``: "highest"
    (f32-exact distances), or "default" (bf16 matmul — fastest; fine
    for ranking, distances good to ~3 decimal digits).

    "approx" routes to ``approx_scan_topk`` (TPU PartialReduce top-k,
    ~4x faster, recall ~0.99 vs exact); "bucket" routes to the
    bucket-min Pallas scan (``ops.pallas_bucket``, fastest at large N,
    recall ~0.99, exact f32 distances via shortlist rescore)."""
    if force == "approx":
        return approx_scan_topk(queries, corpus, n_valid, k, metric=metric)
    if force == "bucket":
        from vers_tpu.ops.pallas_bucket import bucket_scan_topk

        return bucket_scan_topk(
            queries, corpus, n_valid, k, metric=metric,
            interpret=jax.default_backend() != "tpu",
        )
    use_pallas = (
        force == "pallas"
        or (
            force is None
            and jax.default_backend() == "tpu"
            and k <= MAX_PALLAS_K
        )
    )
    if use_pallas:
        return pallas_distance_topk(
            queries, corpus, n_valid, k, metric=metric,
            interpret=jax.default_backend() != "tpu",
            precision=precision,
        )
    return fused_scan_topk(
        queries, corpus, n_valid, k, metric=metric, chunk_size=chunk_size
    )
