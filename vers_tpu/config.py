"""Configuration dataclasses for vers_tpu.

The reference has no config system at all — every hyperparameter is a
positional literal at a call site (e.g. HNSW ``(12, 100, 32, 24)`` at
`vers/src/main.rs:70-79`). We promote them to explicit dataclasses so
benchmarks / CLIs can sweep them, while keeping the same positional
constructor signatures on the index classes for parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class FlatConfig:
    """Exact brute-force index (the `search_exhaustive` equivalent,
    `vers/src/utils.rs:68-82`, promoted to a first-class index)."""

    metric: str = "sq_euclidean"  # or "cosine"
    dtype: str = "float32"  # compute dtype for the distance matmul
    chunk_size: int = 16384  # corpus rows per fused-scan step
    # Search engine: "auto" (alias of "exact" — a Flat index stays
    # exact by default; the exact path already picks Pallas on TPU with
    # an XLA fallback, so "auto" here mirrors the IVF/LSH knob),
    # "exact" (Pallas fused scan / XLA fallback, exact top-k),
    # "approx" (lax.approx_min_k scan, recall ~0.99), "bucket"
    # (bucket-min Pallas scan, fastest at large N, recall ~0.99; pass
    # bucket_rescore for exact f32 distances at ~0.999 recall).
    engine: str = "auto"
    bucket_rescore: bool = False


@dataclasses.dataclass(frozen=True)
class IVFFlatConfig:
    """IVFFlat: k-means partitioning + nearest-cluster scan
    (`vers/src/indexes/ivfflat.rs`)."""

    num_clusters: int = 64
    num_attempts: int = 2  # random restarts, best by k-means cost
    max_iterations: int = 10  # Lloyd iteration cap
    # The reference has no nprobe: its search adaptively scans more
    # clusters only while fewer than top_k candidates were found
    # (`ivfflat.rs:166-195`). nprobe=0 selects that adaptive behavior:
    # exactly on the single-query parity path (`search_approximate`),
    # and on the batched path via per-query probe depth — each query
    # probes just enough nearest clusters for their live-member sum
    # (capped at top_k per cluster, like the walk) to reach top_k.
    # nprobe>=1 scans a fixed number of nearest clusters for every
    # query (the BASELINE.json config 4 sweep).
    nprobe: int = 0
    seed: int = 0
    dtype: str = "float32"
    # matmul precision of the batched scan: "highest" = f32-exact
    # distance values (default; measured: the scan is not
    # matmul-bound, so bf16 "default" saves nothing here and costs
    # ~1% recall).
    precision: str = "highest"
    # batched-search engine: "pallas" = packed-scan kernel (exact
    # top-k, fastest on TPU), "xla" = lax.scan path (approx_min_k on
    # TPU), "auto" = pallas on TPU when top_k allows, else xla.
    engine: str = "auto"


@dataclasses.dataclass(frozen=True)
class LSHConfig:
    """Random-hyperplane projection forest (Annoy-style), called "LSH"
    in the reference (`vers/src/indexes/lsh.rs`)."""

    num_trees: int = 8
    max_node_size: int = 100
    seed: int = 0
    dtype: str = "float32"
    # batched-search engine: "pallas" = packed-scan kernel, "xla" =
    # lax.scan path, "auto" = pallas on TPU when top_k allows.
    engine: str = "auto"


@dataclasses.dataclass(frozen=True)
class HNSWConfig:
    """HNSW graph index (`vers/src/indexes/hnsw.rs`). Build runs on
    host (graph construction is inherently sequential); queries run as a
    batched beam scan on TPU."""

    num_layers: int = 8
    ef_construction: int = 100
    ef_search: int = 32
    num_neighbours: int = 16  # M; layer 0 uses 2*M (`hnsw.rs:400-404`)
    seed: int = 0
    dtype: str = "float32"
    # Cap on the padded adjacency width for the TPU beam scan. None →
    # 2*num_neighbours (the layer-0 degree bound).
    max_degree: Optional[int] = None
    # dtype of the beam loop's navigation vector table ("bfloat16"
    # halves the gather HBM traffic vs f32; "int8" halves it again via
    # symmetric per-row quantization; final top-k is f32-rescored).
    nav_dtype: str = "bfloat16"
    # Neighborhood-inlined navigation (ops/beam_inline.py): when set,
    # the device cache additionally holds, per node, the concatenation
    # of its layer-0 neighbours' ``nav_inline_dp``-dim PCA-projected
    # bf16 vectors, and the layer-0 beam gathers Q*expand WIDE rows per
    # step instead of Q*expand*deg thin ones. TPU row gathers are
    # row-op-bound (~15.5 ns/row; benchmarks/tpu_gather_micro.py), so
    # this removes the measured 1M-scale bottleneck at the cost of
    # (n, deg*dp) bf16 of HBM and PCA-approximate navigation (the final
    # beam is always exact-f32 rescored).
    # "auto" (default): size-aware policy at device-cache build — on
    # when the corpus is large enough that the row-gather bound
    # dominates (>= ~200k rows; measured qps-neutral at 131k, 2.8x at
    # 1M), the layer gather width capped at
    # ``min(max_degree or 32, 32)`` (index/hnsw.py INLINE_DEG_CAP —
    # the measured-best 1M operating point runs max_degree=32; the
    # uncapped reference-default graph, M=24 -> width 49, read 26.6k
    # vs 40.0k qps) and dp picked to fit ``inline_hbm_budget_gb``
    # (64, then 32, else classic gathers + no cap). The reference's
    # users pass four ints and get its best behavior (`main.rs:70-79`);
    # so should ours. None/0 -> classic row gathers; an int forces
    # that dp (and leaves max_degree alone).
    nav_inline_dp: Optional[object] = "auto"
    # HBM budget for the (n_pad, cap*dp) bf16 inline table when
    # nav_inline_dp="auto" picks dp (the table is exactly 4GiB at
    # 1M x deg32 x dp64 next to a 1.2GB corpus on a 16GB chip; 4.5
    # leaves margin so the knife-edge case stays on dp=64).
    inline_hbm_budget_gb: float = 4.5
    # Exact-refine width for the inline beam. Projection-only beam
    # RETENTION collapses when true neighbours differ at
    # projection-noise scale (measured 0.50 recall at 1M x 300,
    # 244-member clusters, dp=64) — so by default each step exact-bf16
    # rescores the top ``2*ef`` projection-filtered candidates and the
    # beam ranks in exact space end to end (rows gathered per step:
    # refine width instead of expand*deg). None -> auto (2*ef);
    # 0 -> pure projected navigation (fastest, data-dependent recall).
    nav_inline_refine: Optional[int] = None
    # Beam width for the routing layers (> 0). The reference uses
    # ef_search on every layer (`hnsw.rs:526-536`), but routing only
    # has to land the entry point for the layer below. Measured on TPU
    # (20k x 300, ef 16/32/64): recall@10 identical to the full-width
    # beam, 1.3-2.1x faster. None -> ef_search everywhere (reference
    # behavior). See PARITY.md D13.
    ef_route: Optional[int] = 8
    # Query-beam expansion fan-out: how many best unexpanded beam
    # entries expand per lockstep iteration (construction beams use the
    # same value; see ops/hnsw_build.py). Measured at 131k x 300
    # ef=32: expand=8 is 2.3x the qps of expand=4 at equal recall
    # (13.8k vs 6.0k @ 0.996) — the per-step gather cost is linear in
    # expand while step count shrinks ~expand-fold, so the fixed
    # per-iteration costs (merge top-k, dup mask) amortize. With the
    # INLINE beam the per-step gather is expand WIDE rows (not
    # expand*deg thin ones) and expand=4 measured best at 1M
    # (40.0k vs cap-6's 46.4k @ -0.006 recall; CLAUDE.md r3).
    # None (default) -> 8 on the classic gather beam and construction
    # beams, 4 on the inline beam; an int forces that value everywhere.
    beam_expand: Optional[int] = None
    # Cap on the query beam's lockstep iterations. None -> auto: the
    # legacy bound max(4*ef, 64) on the classic gather beam, but
    # ceil(ef/expand) on the INLINE beam (the lockstep while_loop runs
    # until every query in the batch converges, so stragglers alone
    # set wall-clock; ceil(ef/expand) expands ef candidates and is the
    # measured 1M operating point's beam_steps=8 at ef=32/expand=4 —
    # CLAUDE.md r3 40k qps). A tight cap trades straggler-query recall
    # for wall-clock (A/B in benchmarks/tpu_query_beam_ab.py).
    beam_steps: Optional[int] = None
    # Batched-query routing strategy. "scan" (default): ONE brute-force
    # bf16 MXU scan over the layer-1 node subset (~n/(2M) rows — every
    # node of every layer >= 1 is in layer 1, so the scan strictly
    # dominates a routing descent) picks the top-``route_seeds`` entry
    # points and seeds the layer-0 beam with all of them. "beam": the
    # reference-shaped greedy descent through layers L-2..1 (PARITY
    # D13). The routing beams are serial random-gather chains
    # (row-op-bound); the scan is a dense matmul — measured 2.9x qps
    # at 131k x 300 ef=32 (43.0k vs 14.9k, recall 0.9888 vs 0.9884;
    # benchmarks/tpu_route_scan_ab.py) with equal-or-better recall
    # (the seeds are exact layer-1 nearest, not greedy-routed
    # approximations).
    route_mode: str = "scan"
    # Entry seeds the routing scan feeds the layer-0 beam. 0 -> auto
    # (min(ef_search, 8); the A/B's best — more seeds only widen the
    # initial gather, recall is flat from 1 to 32 seeds).
    route_seeds: int = 0
