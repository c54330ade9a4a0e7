"""PartitionedANNIndex: corpus-partitioned RP-forest — capacity axis.

The reference holds the whole forest in one host's RAM (`vers/src/
indexes/lsh.rs:53`); `parallel/lsh.ShardedANNIndex` replicates that
state per chip and shards queries (throughput axis). This class closes
the CAPACITY axis the same way `parallel/hnsw_partitioned` does for the
graph: corpus rows split into contiguous blocks, one independent forest
per shard over its local rows, so per-chip state is ~1/n_shards.

Query = ONE program: the query batch replicates, every shard runs the
same single-dispatch fused forest search as the single-chip path
(multiprobe descent + packed binned scan + merge,
`index/lsh._forest_search`) over its LOCAL stacked layout, local result
rows offset into global padded rows, and the k·n_shards candidates
all_gather (implicit at the shard_map boundary) into one final top-k.
Shards cover disjoint rows, so the merge needs no dedup.

The per-shard tile plans unify to common statics (q_blk / r_blk /
w_rank / num_bins maxima across shards; per-shard group tables pad by
repeating their last bin boundary — zero queries, zero tiles) so one
compiled program serves every shard.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from jax import shard_map

from vers_tpu.core import device_id_map, round_up
from vers_tpu.index.lsh import ANNIndex, _forest_search
from vers_tpu.ops.binned import stack_group_tables, static_groups
from vers_tpu.ops.topk import topk_smallest
from vers_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from vers_tpu.parallel.partitioned import PartitionedIndexBase


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "n_probes", "num_bins", "top_k", "q_blk", "r_blk",
        "w_rank", "use_approx", "rank_rows", "deficit_k", "pern",
    ),
)
def _partitioned_forest_search(
    queries,    # (Q, d) replicated
    coeffs,     # (S, T, L, TC, d) row-sharded on axis 0
    consts,     # (S, T, L, TC)
    splits,     # (S, T, L, SC)
    buckets,    # (S, T, L, SC)
    offsets,    # (S, T)
    sizes,      # (S*kb,) int32
    corpus,     # (S*per, d) bin-major per shard
    rbin,       # (S*per,)
    s2o,        # (S*per,) local original rows
    g_first,    # (S, T, G+1)
    g_rstart,   # (S, T, G)
    mesh,
    n_probes: int,
    num_bins: int,
    top_k: int,
    q_blk: int,
    r_blk: int,
    w_rank: int,
    use_approx: bool,
    rank_rows: tuple,
    deficit_k: int,
    pern: int,
):
    def local(q, cf, cn, sp, bk, of, sz, co, rb, so, gf, gr):
        d, internal = _forest_search(
            q, cf[0], cn[0], sp[0], bk[0], of[0], sz, co, rb, so,
            gf[0], gr[0],
            n_probes=n_probes, num_bins=num_bins, top_k=top_k,
            q_blk=q_blk, r_blk=r_blk, w_rank=w_rank,
            use_approx=use_approx, rank_rows=rank_rows,
            deficit_k=deficit_k,
        )
        off = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32) * pern
        return d, jnp.where(internal >= 0, internal + off, -1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),) + (P(SHARD_AXIS),) * 11,
        out_specs=(P(None, SHARD_AXIS), P(None, SHARD_AXIS)),
        check_vma=False,
    )
    all_d, all_i = fn(
        queries, coeffs, consts, splits, buckets, offsets, sizes,
        corpus, rbin, s2o, g_first, g_rstart,
    )
    fin_d, sel = topk_smallest(all_d, top_k)
    fin_i = jnp.take_along_axis(all_i, sel, axis=1)
    return fin_d, jnp.where(jnp.isfinite(fin_d), fin_i, -1)


class PartitionedANNIndex(PartitionedIndexBase):
    """One RP-forest per mesh shard over that shard's corpus rows.

    ``shards`` are single-chip `ANNIndex` objects whose ids are LOCAL
    input ordinals (0..block_rows-1); ``gids[s]`` maps shard s's input
    ordinals to external ids.

    Adds always invalidate the assembled cache (base default): a
    leaf-split rewrites the shard's tree tables and bin-major corpus
    order, so there is no cheap row-scatter patch — and re-assembly is
    host-side only (forest shards keep host `_values`; nothing is
    downloaded).
    """

    _manifest_format = "vers_tpu.partitioned_lsh.v1"
    _shard_cls = ANNIndex

    def __init__(self, shards, gids=None, mesh=None):
        super().__init__(shards, gids=gids, mesh=mesh)
        self._plans = {}

    @staticmethod
    def _shard_rows(shard) -> int:
        return len(shard._ids)

    @classmethod
    def build_index(
        cls,
        num_trees: int,
        max_node_size: int,
        vectors: np.ndarray,
        vector_ids=None,
        config=None,
        mesh=None,
    ) -> "PartitionedANNIndex":
        mesh = mesh or make_mesh()
        n_shards = mesh.shape[SHARD_AXIS]
        vectors = np.asarray(vectors, dtype=np.float32)
        n = vectors.shape[0]
        if n < n_shards:
            raise ValueError(
                f"corpus of {n} rows cannot partition over {n_shards} shards"
            )
        if vector_ids is None:
            vector_ids = np.arange(n, dtype=np.int64)
        vector_ids = np.asarray(vector_ids, np.int64)
        base = -(-n // n_shards)
        shards, gids = [], []
        for s in range(n_shards):
            lo, hi = s * base, min((s + 1) * base, n)
            block = vectors[lo:hi]
            shard = ANNIndex.build_index(
                num_trees, max_node_size, block,
                np.arange(hi - lo), config=config,
            )
            shards.append(shard)
            gids.append(vector_ids[lo:hi].copy())
        return cls(shards, gids=gids, mesh=mesh)

    # -- device cache ------------------------------------------------------

    def _ensure_device_cache(self):
        if self._device_cache is not None:
            return self._device_cache
        for s in self.shards:
            s._rebuild_dirty()
        n_shards = self.mesh.shape[SHARD_AXIS]
        gs = [s._combined_host_arrays() for s in self.shards]
        T = gs[0]["coeffs"].shape[0]
        if any(g["coeffs"].shape[0] != T for g in gs):
            raise ValueError("all shards must share num_trees")
        L = max(g["coeffs"].shape[1] for g in gs)
        TC = max(g["coeffs"].shape[2] for g in gs)
        SC = max(g["splits"].shape[2] for g in gs)
        kb = max(g["num_bins"] for g in gs)
        per = round_up(max(g["corpus"].shape[0] for g in gs), 8)
        pern = max(s._values.shape[0] for s in self.shards)
        d = self.dim

        coeffs = np.zeros((n_shards, T, L, TC, d), np.float32)
        consts = np.zeros((n_shards, T, L, TC), np.float32)
        splits = np.full((n_shards, T, L, SC), -1, np.int32)
        buckets = np.full((n_shards, T, L, SC), -1, np.int32)
        offsets = np.zeros((n_shards, T), np.int32)
        sizes = np.zeros((n_shards * kb,), np.int32)
        corpus = np.zeros((n_shards * per, d), np.float32)
        rbin = np.full((n_shards * per,), -1, np.int32)
        s2o = np.full((n_shards * per,), -1, np.int32)
        row_to_gid = np.full((n_shards * pern,), -1, np.int64)
        host_layouts = []
        for s, g in enumerate(gs):
            _, l, tc, _ = g["coeffs"].shape
            sc = g["splits"].shape[2]
            coeffs[s, :, :l, :tc] = g["coeffs"]
            consts[s, :, :l, :tc] = g["consts"]
            splits[s, :, :l, :sc] = g["splits"]
            buckets[s, :, :l, :sc] = g["buckets"]
            offsets[s] = g["offsets"]
            sizes[s * kb : s * kb + g["num_bins"]] = g["sizes_host"]
            rows = g["corpus"].shape[0]
            corpus[s * per : s * per + rows] = g["corpus"]
            rbin[s * per : s * per + rows] = g["rbin"]
            s2o[s * per : s * per + rows] = g["s2o"]
            ids = self.shards[s]._ids  # internal row -> local ordinal
            row_to_gid[s * pern : s * pern + len(ids)] = self.gids[s][ids]
            host_layouts.append(
                dict(
                    sizes_host=g["sizes_host"],
                    starts_host=g["starts_host"],
                    max_bin=g["max_bin"],
                    num_bins=g["num_bins"],
                    bin_bounds=g["bin_bounds"],
                    n_rows=rows,
                    n_values=self.shards[s]._values.shape[0],
                )
            )

        sh = NamedSharding(self.mesh, P(SHARD_AXIS))
        self._device_cache = dict(
            coeffs=jax.device_put(coeffs, sh),
            consts=jax.device_put(consts, sh),
            splits=jax.device_put(splits, sh),
            buckets=jax.device_put(buckets, sh),
            offsets=jax.device_put(offsets, sh),
            sizes=jax.device_put(sizes, sh),
            corpus=jax.device_put(corpus, sh),
            rbin=jax.device_put(rbin, sh),
            s2o=jax.device_put(s2o, sh),
            per=per,
            pern=pern,
            kb=kb,
            T=T,
            host_layouts=host_layouts,
            row_to_gid=row_to_gid,
            row_to_gid_dev=device_id_map(row_to_gid),
        )
        self._plans = {}
        return self._device_cache

    def _plan(self, q_n: int, top_k: int, n_probes: int):
        """Unified tile plan across shards (statics = maxima; per-shard
        group tables pad by repeating their last bin boundary)."""
        cache = self._ensure_device_cache()
        key = (q_n, top_k, n_probes)
        if key in self._plans:
            return self._plans[key]
        n_shards = len(self.shards)
        T = cache["T"]
        # r_blk: each shard's natural target, unified by max
        r_blk = 128
        for hl in cache["host_layouts"]:
            n_tree = max(int(hl["sizes_host"].sum()) // max(T, 1), 1)
            r_target = max(
                hl["max_bin"], top_k, min(8192, max(1024, n_tree // 16))
            )
            r_blk = max(r_blk, min(round_up(r_target, 128), cache["per"]))
        tables_per_shard = []
        g_total_min = None
        g_max = 1
        for hl in cache["host_layouts"]:
            tables = [
                static_groups(hl, r_blk, int(hl["bin_bounds"][t]),
                              int(hl["bin_bounds"][t + 1]))
                for t in range(T)
            ]
            tables_per_shard.append(tables)
            g_tot = sum(len(r) for _, r in tables)
            g_total_min = g_tot if g_total_min is None else min(g_total_min, g_tot)
            g_max = max(g_max, max(len(r) for _, r in tables))
        # q_blk sized by the busiest (fewest-groups) shard, uniform
        q_blk = min(
            round_up(max(64, q_n // max(g_total_min, 1) * 2), 64),
            round_up(q_n, 8),
        )
        w_rank = (q_n + q_blk - 1) // q_blk + g_max
        # stack per-shard (T, G+1) tables padded to the global G
        gf = np.zeros((n_shards, T, g_max + 1), np.int32)
        gr = np.zeros((n_shards, T, g_max), np.int32)
        for s, tables in enumerate(tables_per_shard):
            f, r = stack_group_tables(tables)
            gf[s, :, : f.shape[1]] = f
            gf[s, :, f.shape[1] :] = f[:, -1:]
            gr[s, :, : r.shape[1]] = r
        sh = NamedSharding(self.mesh, P(SHARD_AXIS))
        plan = dict(
            q_blk=q_blk, r_blk=r_blk, w_rank=w_rank,
            rank_rows=tuple(t for t in range(T) for _ in range(n_probes)),
            g_first=jax.device_put(gf, sh),
            g_rstart=jax.device_put(gr, sh),
        )
        self._plans[key] = plan
        return plan

    # -- Index API -----------------------------------------------------------

    def _search_batch_rows(
        self, queries, top_k: int, probes_per_tree: Optional[int] = None
    ):
        cache = self._ensure_device_cache()
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        q_n = q.shape[0]
        if probes_per_tree is None:
            n_probes = max(s._auto_probes(top_k) for s in self.shards)
            deficit_k = top_k if n_probes > 1 else 0
        else:
            n_probes = max(1, probes_per_tree)
            deficit_k = 0
        plan = self._plan(q_n, top_k, n_probes)
        bd, bi = _partitioned_forest_search(
            jnp.asarray(q),
            cache["coeffs"], cache["consts"], cache["splits"],
            cache["buckets"], cache["offsets"], cache["sizes"],
            cache["corpus"], cache["rbin"], cache["s2o"],
            plan["g_first"], plan["g_rstart"],
            self.mesh,
            n_probes=n_probes, num_bins=cache["kb"], top_k=top_k,
            q_blk=plan["q_blk"], r_blk=plan["r_blk"],
            w_rank=plan["w_rank"],
            use_approx=jax.default_backend() == "tpu",
            rank_rows=plan["rank_rows"], deficit_k=deficit_k,
            pern=cache["pern"],
        )
        return bd, bi

