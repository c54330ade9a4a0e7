"""ShardedANNIndex: replicated forest, query-sharded fused search.

Scale-out story for the RP-tree forest (the reference searches trees
with a rayon thread pool inside one host's RAM, `vers/src/indexes/
lsh.rs:264-281`): every chip of a 1-D mesh holds the full stacked
forest layout (level tables + bin-major corpus) and the QUERY batch
shards across chips. Each chip runs the same single-dispatch fused
program as the single-chip path — multiprobe descent + packed binned
scan + merge (`index/lsh.py _forest_search`) — inside one shard_map, so
serving throughput scales with the mesh and the query path needs no
cross-chip collectives at all (the same ICI profile as
`parallel/hnsw.py ShardedHNSWIndex`).

Tree-parallelism (the reference's axis) deliberately does NOT map to
chips: trees share the corpus, and candidates from different trees must
be deduplicated before ranking — an all_gather + dedup barrier per
batch. Query-sharding keeps the dedup on-chip (the packed scan's
bin-equality mask) and rides the embarrassingly parallel axis instead.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from jax import shard_map

from vers_tpu.index.lsh import ANNIndex, _forest_search
from vers_tpu.models.candidates import SearchResult
from vers_tpu.ops.binned import forest_tile_plan
from vers_tpu.parallel.mesh import SHARD_AXIS, make_mesh


class ShardedANNIndex:
    """Query-sharded serving wrapper around a built ANNIndex.
    Construction, adds, and persistence delegate to the wrapped index;
    only the batched search fans out over the mesh."""

    def __init__(self, base: ANNIndex, mesh=None):
        self.base = base
        self.mesh = mesh or make_mesh()
        self.dim = base.dim

    @classmethod
    def build_index(
        cls,
        num_trees: int,
        max_node_size: int,
        vectors: np.ndarray,
        vector_ids=None,
        config=None,
        mesh=None,
    ) -> "ShardedANNIndex":
        if vector_ids is None:
            vector_ids = np.arange(len(vectors))
        base = ANNIndex.build_index(
            num_trees, max_node_size, vectors, vector_ids, config=config
        )
        return cls(base, mesh=mesh)

    def save_index(self, file_path: str) -> None:
        self.base.save_index(file_path)

    @classmethod
    def load_index(cls, file_path: str, dim: Optional[int] = None,
                   mesh=None) -> "ShardedANNIndex":
        return cls(ANNIndex.load_index(file_path, dim=dim), mesh=mesh)

    def add(self, embedding, vec_id: int) -> None:
        self.base.add(embedding, vec_id)

    def search_approximate(self, query, top_k: int):
        return self.base.search_approximate(query, top_k)

    def _search_batch_rows(
        self, queries, top_k: int, probes_per_tree: Optional[int] = None
    ):
        base = self.base
        base._rebuild_dirty()
        comb = base._ensure_combined()
        layout = comb["layout"]
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        q_n = q.shape[0]
        n_shards = self.mesh.shape[SHARD_AXIS]
        # local tile plans want a lane-friendly per-shard block
        q_pad = -(-q_n // (64 * n_shards)) * (64 * n_shards)
        qp = np.pad(q, ((0, q_pad - q_n), (0, 0)))
        q_local = q_pad // n_shards
        if probes_per_tree is None:
            n_probes = base._auto_probes(top_k)
            deficit_k = top_k if n_probes > 1 else 0
        else:
            n_probes = max(1, probes_per_tree)
            deficit_k = 0
        plan = forest_tile_plan(
            layout, q_local, top_k, comb["bin_bounds"], n_probes
        )
        use_approx = jax.default_backend() == "tpu"

        def local(qs, coeffs, consts, splits, buckets, offsets, sizes,
                  corpus_sorted, rbin, s2o, g_first, g_rstart):
            return _forest_search(
                qs, coeffs, consts, splits, buckets, offsets, sizes,
                corpus_sorted, rbin, s2o, g_first, g_rstart,
                n_probes=n_probes, num_bins=layout["num_bins"],
                top_k=top_k, q_blk=plan["q_blk"], r_blk=plan["r_blk"],
                w_rank=plan["w_rank"], use_approx=use_approx,
                rank_rows=plan["rank_rows"], deficit_k=deficit_k,
            )

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(SHARD_AXIS),) + (P(),) * 11,
            out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
            check_vma=False,
        )
        dists, internal = fn(
            jax.device_put(qp, NamedSharding(self.mesh, P(SHARD_AXIS))),
            comb["coeffs"], comb["consts"], comb["splits"],
            comb["buckets"], comb["offsets"], layout["sizes_dev"],
            layout["corpus_sorted"], layout["rbin"],
            layout["sorted_to_orig"], plan["g_first"], plan["g_rstart"],
        )
        return np.asarray(dists)[:q_n], np.asarray(internal)[:q_n]

    def search_batch(
        self, queries, top_k: int, probes_per_tree: Optional[int] = None
    ) -> SearchResult:
        dists, internal = self._search_batch_rows(
            queries, top_k, probes_per_tree
        )
        ids = self.base._ids
        ext = np.where(
            internal >= 0, ids[np.clip(internal, 0, len(ids) - 1)], -1
        )
        return SearchResult(ids=ext.astype(np.int64), distances=dists)
