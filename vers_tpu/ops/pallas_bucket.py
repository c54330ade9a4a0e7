"""Bucketed approximate top-k scan — Pallas kernel for the flat
(brute-force) search path at large N.

TPU re-expression of the reference's exhaustive scan
(`vers/src/utils.rs:68-82`) tuned for HBM roofline instead of SIMD
lanes. The XLA ``approx_scan_topk`` path (lax.approx_min_k) is bound by
the (Q, chunk) f32 score intermediate it round-trips through HBM
(~17GB per 16k x 100k batch ≈ peak BW ≈ 21ms). This kernel never lets
scores leave VMEM:

- grid = (query_tiles, corpus_chunks); each step computes a (QT, C)
  distance tile on the MXU (bf16 inputs, f32 accumulation) — measured
  alone this runs at ~190 TF/s-equiv, the v5e speed of light;
- the tile reduces on the VPU to 128 running bucket minima
  (bucket b = columns congruent to b mod 128 — static 128-lane slices,
  unrolled; NO reshape, which would force a costly relayout);
- minima accumulate in VMEM scratch across ``superchunk`` consecutive
  chunks before flushing, so the bucket table stays ~targeted-size no
  matter how big N is (1M rows -> ~8k buckets, not 125k);
- HBM sees only corpus tiles + the small bucket table;
- stage 2 (XLA): ``lax.approx_min_k`` shortlist over the bucket table
  (exact lax.top_k here costs 44ms at width 6272 — the one op to
  avoid), then an exact-f32 rescore to undo bf16 ranking noise.

Approximation: two true top-k rows in the same (superchunk, lane)
bucket keep only the nearer one. With ~6-8k buckets,
P(top-10 collision) < 1% -> recall@10 ~0.999 measured, better than
approx_min_k's 0.9885 at the same operating point.

Tie rule: strictly-less updates everywhere, so the lowest row index
wins equal distances — matching the stable sorts of the exact paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vers_tpu.core import round_up
from vers_tpu.ops.topk import topk_smallest

DEFAULT_QUERY_TILE = 1024
DEFAULT_CHUNK = 2048
TARGET_BUCKETS = 8192
_LANES = 128


def _kernel(n_valid_ref, q_ref, x_ref, xx_ref, out_d_ref, out_i_ref,
            acc_d, acc_i, *, chunk: int, superchunk: int, metric: str):
    j = pl.program_id(1)
    qt = q_ref.shape[0]
    groups = chunk // _LANES

    @pl.when(j % superchunk == 0)
    def _init():
        acc_d[:] = jnp.full_like(acc_d, jnp.inf)
        acc_i[:] = jnp.full_like(acc_i, -1)

    q = q_ref[:]
    x = x_ref[:]
    dot = jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QT, C)
    if metric == "cosine":
        dist = 1.0 - dot
    else:
        qf = q.astype(jnp.float32)
        qq = jnp.sum(qf * qf, axis=1, keepdims=True)
        dist = jnp.maximum(qq + xx_ref[:] - 2.0 * dot, 0.0)

    rows = j * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    n_valid = n_valid_ref[0, 0]
    dist = jnp.where(rows < n_valid, dist, jnp.inf)

    # bucket b = columns with col % 128 == b. Static 128-lane slices,
    # unrolled over the groups — all ops stay on the natural (QT, 128)
    # lane layout. Strictly-less updates: lowest row index wins ties.
    lane = jax.lax.broadcasted_iota(jnp.int32, (qt, _LANES), 1)
    m = acc_d[:]
    widx = acc_i[:]
    base = j * chunk
    for g in range(groups):
        cand = dist[:, g * _LANES:(g + 1) * _LANES]
        win = cand < m
        m = jnp.where(win, cand, m)
        widx = jnp.where(win, base + g * _LANES + lane, widx)
    acc_d[:] = m
    acc_i[:] = widx

    @pl.when(j % superchunk == superchunk - 1)
    def _flush():
        out_d_ref[:] = acc_d[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "query_tile", "chunk_size", "shortlist",
        "target_buckets", "rescore", "interpret",
    ),
)
def bucket_scan_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    n_valid,
    k: int,
    metric: str = "sq_euclidean",
    query_tile: int = DEFAULT_QUERY_TILE,
    chunk_size: int = DEFAULT_CHUNK,
    shortlist: int = 32,
    target_buckets: int = TARGET_BUCKETS,
    rescore: bool = False,
    interpret: bool = False,
):
    """Approximate top-k via the bucket-min Pallas scan.

    Same signature/return convention as ``fused_scan_topk``:
    queries (Q, d) f32, corpus (N_pad, d) f32; returns
    (dists (Q, k) f32 ascending, indices (Q, k) int32; -1/inf padding).

    ``rescore=False`` (default): distances come from the bf16 matmul
    (f32 accumulation, ~3 decimal digits); ranking noise costs ~0.01
    recall@10. ``rescore=True`` gathers a ``shortlist``-wide candidate
    set and recomputes exact f32 distances (recall ~0.999, exact
    distance values) at the cost of one (Q, s, d) gather (~15ms at
    16k x 32 x 300 — gathers are the slow op on TPU).
    """
    if metric not in ("sq_euclidean", "cosine"):
        raise ValueError(f"unknown metric {metric!r}")
    q_n, d = queries.shape
    corpus_f32 = corpus
    n_pad0 = corpus.shape[0]

    qt = min(query_tile, round_up(q_n, 8))
    chunk = max(_LANES, min(chunk_size, round_up(n_pad0, _LANES)))

    # superchunks keep the bucket table near target_buckets wide
    n_chunks0 = (n_pad0 + chunk - 1) // chunk
    superchunk = max(1, (n_chunks0 * _LANES) // max(target_buckets, _LANES))

    q_pad = round_up(q_n, qt)
    qs = queries
    if q_pad != q_n:
        qs = jnp.pad(qs, ((0, q_pad - q_n), (0, 0)))
    n_pad = n_pad0
    rem = (-n_pad0) % (chunk * superchunk)
    xs = corpus
    if rem:
        xs = jnp.pad(xs, ((0, rem), (0, 0)))
        n_pad += rem
    d_pad = round_up(d, 128)
    if d_pad != d:
        qs = jnp.pad(qs, ((0, 0), (0, d_pad - d)))
        xs = jnp.pad(xs, ((0, 0), (0, d_pad - d)))

    # bf16 into the MXU: halves corpus stream traffic, f32 accumulate
    qs_nav = qs.astype(jnp.bfloat16)
    xs_nav = xs.astype(jnp.bfloat16)
    xx = jnp.sum(xs.astype(jnp.float32) ** 2, axis=1)[None, :]
    n_valid_arr = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)

    n_chunks = n_pad // chunk
    n_super = n_chunks // superchunk
    grid = (q_pad // qt, n_chunks)
    kernel = functools.partial(
        _kernel, chunk=chunk, superchunk=superchunk, metric=metric
    )

    bd, bi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((qt, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, _LANES),
                         lambda i, j, s=superchunk: (i, j // s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, _LANES),
                         lambda i, j, s=superchunk: (i, j // s),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, n_super * _LANES), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, n_super * _LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qt, _LANES), jnp.float32),
            pltpu.VMEM((qt, _LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d_pad,
            bytes_accessed=(q_pad // qt) * n_pad * d_pad * 2
            + q_pad * d_pad * 2
            + 2 * q_pad * n_super * _LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_valid_arr, qs_nav, xs_nav, xx)

    bd = bd[:q_n]
    bi = bi[:q_n]

    # stage 2: top-s over the bucket table with the streaming Pallas
    # merge — XLA's sorts at this width are the most expensive op of
    # the whole pipeline (lax.top_k 47ms, lax.approx_min_k 36ms at
    # (16k, 6272); the Pallas merge ~2ms)
    from vers_tpu.ops.pallas_topk import pallas_topk_values

    s = max(k, min(shortlist, bd.shape[1])) if rescore else k
    sd, cand = pallas_topk_values(bd, bi, s, interpret=interpret)
    if not rescore:
        return sd, cand

    # exact f32 rescore of the shortlist
    safe = jnp.clip(cand, 0, corpus_f32.shape[0] - 1)
    v = jnp.take(corpus_f32, safe, axis=0).astype(jnp.float32)  # (Q, s, d)
    qf = queries.astype(jnp.float32)
    dots = jnp.einsum(
        "qsd,qd->qs", v, qf,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if metric == "cosine":
        exact = 1.0 - dots
    else:
        qq = jnp.sum(qf * qf, axis=1, keepdims=True)
        vv = jnp.sum(v * v, axis=2)
        exact = jnp.maximum(qq + vv - 2.0 * dots, 0.0)
    exact = jnp.where(cand >= 0, exact, jnp.inf)
    fd, fsel = topk_smallest(exact, k)
    fi = jnp.take_along_axis(cand, fsel, axis=1)
    fi = jnp.where(jnp.isfinite(fd), fi, -1)
    return fd, fi
