"""ShardedANNIndex: replicated shared-corpus forest, query-sharded search.

Scale-out story for the RP-tree forest (the reference searches trees
with a rayon thread pool inside one host's RAM, `vers/src/indexes/
lsh.rs:264-281`): every chip of a 1-D mesh holds the full forest in the
SHARED-corpus layout (`ops/forest_shared`: ONE corpus copy + per-tree
int32 index tables — the reference's own memory shape, `lsh.rs:44,53`)
and the QUERY batch shards across chips. Each chip runs the same
single-dispatch program as the single-chip path — multiprobe descent +
lax.scan over trees with the packed-scan engine + dedup merge
(`index/lsh._search_batch_internal`) — inside one shard_map, so serving
throughput scales with the mesh and the query path needs no cross-chip
collectives at all (the same ICI profile as `parallel/hnsw.py`).

Replicating the shared layout (not the stacked one) is what makes this
layer hold the reference's headline forest at all: at 1M x 300 x 8
trees the stacked layout is ~2 corpus copies PER TREE (~20GB/chip,
structurally impossible on a 16GB chip) while the shared layout is one
~1.2GB corpus + ~4·T·n bytes of int32 tables + one live gathered tree
view (~2.5GB peak) — see docs/MULTICHIP.md.

Tree-parallelism (the reference's axis) deliberately does NOT map to
chips: trees share the corpus, and candidates from different trees must
be deduplicated before ranking — an all_gather + dedup barrier per
batch. Query-sharding keeps the dedup on-chip (the lax.scan's id-dedup
merge) and rides the embarrassingly parallel axis instead.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from jax import shard_map

from vers_tpu.index.lsh import ANNIndex
from vers_tpu.models.candidates import SearchResult
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
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        q_n = q.shape[0]
        n_shards = self.mesh.shape[SHARD_AXIS]
        if probes_per_tree is None:
            n_probes = base._auto_probes(top_k)
            deficit_k = top_k if n_probes > 1 else 0
        else:
            n_probes = max(1, probes_per_tree)
            deficit_k = 0
        engine = base._shared_engine(top_k)
        # per-shard block aligned to the engine's query-tile floor: the
        # tile plan below is built for the PER-CHIP count
        blk = 128 if engine == "pallas" else 64
        q_pad = -(-q_n // (blk * n_shards)) * (blk * n_shards)
        qp = np.pad(q, ((0, q_pad - q_n), (0, 0)))
        q_local = q_pad // n_shards
        sh, plan = base._shared_plan(q_local, top_k, n_probes, engine)

        if engine == "pallas":
            from vers_tpu.ops.forest_shared import (
                forest_search_shared_pallas,
            )

            def local(qs, cf, cn, cb, splits, buckets, offsets,
                      sizes_dev, corpus_pad, xx, src, rbin, g_first):
                return forest_search_shared_pallas(
                    qs, cf, cn, cb, splits, buckets, offsets,
                    sizes_dev, corpus_pad, xx, src, rbin, g_first,
                    n_probes=n_probes, num_bins=sh["num_bins"],
                    top_k=top_k, deficit_k=deficit_k, **plan,
                )

            reps = (
                sh["coeffs"], sh["consts"], sh["cbase"], sh["splits"],
                sh["buckets"], sh["offsets"], sh["sizes_dev"],
                sh["corpus_pad"], sh["xx"], sh["src"], sh["rbin"],
                sh["g_first"],
            )
        else:
            from vers_tpu.ops.forest_shared import forest_search_shared_xla

            def local(qs, cf, cn, cb, splits, buckets, offsets,
                      sizes_dev, corpus_pad, order, rbin_sorted,
                      g_first, g_rstart):
                return forest_search_shared_xla(
                    qs, cf, cn, cb, splits, buckets, offsets,
                    sizes_dev, corpus_pad, order, rbin_sorted,
                    g_first, g_rstart,
                    n_probes=n_probes, num_bins=sh["num_bins"],
                    top_k=top_k, deficit_k=deficit_k, **plan,
                )

            reps = (
                sh["coeffs"], sh["consts"], sh["cbase"], sh["splits"],
                sh["buckets"], sh["offsets"], sh["sizes_dev"],
                sh["corpus_pad"], sh["order"], sh["rbin_sorted"],
                sh["g_first"], sh["g_rstart"],
            )

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(SHARD_AXIS),) + (P(),) * len(reps),
            out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
            check_vma=False,
        )
        dists, internal = fn(
            jax.device_put(qp, NamedSharding(self.mesh, P(SHARD_AXIS))),
            *reps,
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
