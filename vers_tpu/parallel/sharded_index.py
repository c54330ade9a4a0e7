"""ShardedFlatIndex: corpus rows sharded across a device mesh with
exact fused search per shard + cross-chip top-k merge, and sharded
save/load (one file per shard + a manifest) with an export path to the
single-file format.

This is the BASELINE.md config-5 deliverable (GloVe-1.2M on v5e-8):
the scale-out story the single-host reference cannot express.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from vers_tpu.core import device_id_map
from vers_tpu.index.base import Index
from vers_tpu.index.flat import FlatIndex
from vers_tpu.io.bincode import Reader, Writer
from vers_tpu.models.candidates import SearchResult
from vers_tpu.parallel.mesh import SHARD_AXIS, make_mesh, shard_rows
from vers_tpu.parallel.search import sharded_topk


class ShardedFlatIndex(Index):
    """Exact search over a row-sharded corpus.

    External ids are arbitrary; rows are distributed round-robin-free
    (contiguous blocks) across shards with per-shard padding.
    """

    def __init__(self, vectors, ids=None, mesh=None, metric: str = "sq_euclidean"):
        vectors = np.asarray(vectors, dtype=np.float32)
        self.mesh = mesh or make_mesh()
        self.metric = metric
        self.dim = vectors.shape[1]
        n = vectors.shape[0]
        self._ids = np.asarray(
            ids if ids is not None else np.arange(n), dtype=np.int64
        )
        self._host_vectors = vectors  # kept for add/save
        self._place()

    def _place(self):
        self._data, self._counts = shard_rows(self._host_vectors, self.mesh)
        n_shards = self.mesh.shape[SHARD_AXIS]
        per = self._data.shape[0] // n_shards
        counts = np.asarray(self._counts)
        # global padded row -> external id
        mapping = np.full(self._data.shape[0], -1, np.int64)
        orig = 0
        for s in range(n_shards):
            c = int(counts[s])
            mapping[s * per : s * per + c] = self._ids[orig : orig + c]
            orig += c
        self._row_to_id = mapping

    @classmethod
    def build_index(cls, vectors, ids=None, mesh=None, metric="sq_euclidean"):
        return cls(vectors, ids=ids, mesh=mesh, metric=metric)

    # -- Index API ----------------------------------------------------

    def add(self, embedding, vec_id: int) -> None:
        emb = np.asarray(embedding, dtype=np.float32).reshape(1, -1)
        self._host_vectors = np.concatenate([self._host_vectors, emb], axis=0)
        self._ids = np.append(self._ids, np.int64(vec_id))
        self._place()  # re-shard (bulk adds should batch)

    def _search_batch_rows(self, queries, top_k: int):
        """Sharded search returning (dists (Q,k) f32, global padded ROW
        indices (Q,k), -1 = empty) — id mapping left to the callers."""
        if not isinstance(queries, jax.Array):
            queries = jnp.asarray(np.asarray(queries, dtype=np.float32))
        if queries.ndim == 1:
            queries = queries[None]
        return sharded_topk(
            queries,
            self._data,
            self._counts,
            top_k,
            self.mesh,
            metric=self.metric,
        )

    def search_batch_device(self, queries, top_k: int):
        """Device-resident sharded search: (dists (Q,k) f32, external
        ids (Q,k) int32) jax arrays — the pipelined path (the id map
        rides along on device).

        External ids must fit in int32; raises ValueError otherwise
        (use ``search_batch``, which maps ids on the host in int64)."""
        d, i = self._search_batch_rows(queries, top_k)
        cached = getattr(self, "_row_to_id_dev", None)
        if cached is None or cached[0] is not self._row_to_id:
            self._row_to_id_dev = (
                self._row_to_id,
                device_id_map(self._row_to_id),
            )
            cached = self._row_to_id_dev
        idmap = cached[1]
        if idmap is None:
            raise ValueError(
                "external ids exceed int32 range; the device-resident "
                "path cannot map them — use search_batch()"
            )
        ids = jnp.where(
            i >= 0, jnp.take(idmap, jnp.clip(i, 0, idmap.shape[0] - 1)), -1
        )
        return d, ids

    def search_batch(self, queries, top_k: int) -> SearchResult:
        d, i = self._search_batch_rows(queries, top_k)
        i = np.asarray(i)
        hi = max(len(self._row_to_id) - 1, 0)
        ids = np.where(i >= 0, self._row_to_id[np.clip(i, 0, hi)], -1)
        return SearchResult(
            ids=ids.astype(np.int64), distances=np.asarray(d)
        )

    # -- sharded persistence -------------------------------------------

    def save_index(self, file_path: str) -> None:
        """Writes <path>.manifest.json + one <path>.shard{k} file per
        shard (each shard file is the single-file Flat layout: values
        matrix + ids)."""
        n_shards = self.mesh.shape[SHARD_AXIS]
        counts = np.asarray(self._counts)
        per = self._data.shape[0] // n_shards
        manifest = {
            "format": "vers_tpu.sharded_flat.v1",
            "dim": self.dim,
            "metric": self.metric,
            "num_shards": int(n_shards),
            "counts": counts.tolist(),
        }
        with open(file_path + ".manifest.json", "w") as fp:
            json.dump(manifest, fp)
        data = np.asarray(self._data)
        for s in range(n_shards):
            rows = data[s * per : s * per + counts[s]]
            ids = self._row_to_id[s * per : s * per + counts[s]]
            with open(f"{file_path}.shard{s}", "wb") as fp:
                w = Writer(fp)
                w.vec_f32_matrix(rows)
                w.vec_u64(ids.astype(np.uint64))

    @classmethod
    def load_index(
        cls, file_path: str, dim: Optional[int] = None, mesh=None
    ) -> "ShardedFlatIndex":
        with open(file_path + ".manifest.json") as fp:
            manifest = json.load(fp)
        dim = dim or manifest["dim"]
        all_rows: List[np.ndarray] = []
        all_ids: List[np.ndarray] = []
        for s in range(manifest["num_shards"]):
            with open(f"{file_path}.shard{s}", "rb") as fp:
                r = Reader(fp)
                all_rows.append(r.vec_f32_matrix(dim))
                all_ids.append(r.vec_u64().astype(np.int64))
        vectors = np.concatenate(all_rows) if all_rows else np.zeros((0, dim), np.float32)
        ids = np.concatenate(all_ids) if all_ids else np.zeros((0,), np.int64)
        return cls(vectors, ids=ids, mesh=mesh, metric=manifest["metric"])

    def export_single_file(self, file_path: str) -> None:
        """Export to the single-file Flat layout (loads in FlatIndex)."""
        FlatIndex(self._host_vectors, ids=self._ids).save_index(file_path)
