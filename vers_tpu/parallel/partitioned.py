"""Shared scaffolding for corpus-partitioned indexes.

A partitioned index holds one independent single-chip sub-index per
mesh shard over that shard's corpus rows (capacity scale-out — the
reference keeps each whole index in one host's RAM, e.g.
`vers/src/indexes/hnsw.rs:26`, `lsh.rs:53`). This base class carries
everything that is identical between the graph and forest variants:

- emptiest-shard add routing (with an in-place device-cache patch hook
  so a single insert does not force a full re-assembly + re-upload),
- the single-query parity search (per-shard host descent, global merge),
- global-row -> external-id mapping for `search_batch` /
  `search_batch_device` (incl. the int32-overflow guard on the
  device-resident path),
- the manifest + per-shard-file + ids-file persistence layout.

Subclasses provide the device cache, the batched search program and
the shard class; see `parallel/hnsw_partitioned.py` /
`parallel/lsh_partitioned.py`.
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from vers_tpu.io.bincode import Reader, Writer
from vers_tpu.models.candidates import SearchResult
from vers_tpu.parallel.mesh import SHARD_AXIS, make_mesh


class PartitionedIndexBase:
    """Common behavior for corpus-partitioned indexes.

    ``shards`` are plain single-chip index objects with LOCAL ids
    (0..n_s-1); ``gids[s]`` maps shard s's local rows to external ids.
    """

    _manifest_format: str = ""   # manifest "format" value
    _shard_cls = None            # single-chip index class (save/load)

    def __init__(self, shards: List, gids=None, mesh=None):
        self.mesh = mesh or make_mesh()
        n_shards = self.mesh.shape[SHARD_AXIS]
        if len(shards) != n_shards:
            raise ValueError(
                f"{len(shards)} shards for a {n_shards}-device mesh"
            )
        self.shards = shards
        self.dim = next((s.dim for s in shards if s.dim), 0)
        if gids is None:
            offs = np.cumsum(
                [0] + [self._shard_rows(s) for s in shards]
            )
            gids = [
                np.arange(offs[i], offs[i + 1], dtype=np.int64)
                for i in range(n_shards)
            ]
        self.gids = [np.asarray(g, np.int64) for g in gids]
        self._device_cache = None

    # -- subclass hooks ----------------------------------------------------

    @staticmethod
    def _shard_rows(shard) -> int:
        """Occupied row count of one shard (default-gids + routing)."""
        raise NotImplementedError

    def _search_batch_rows(self, queries, top_k: int, **kw):
        """Batched mesh search returning (dists, global padded rows)."""
        raise NotImplementedError

    def _patch_device_cache(
        self, s: int, local_id: int, emb: np.ndarray, vec_id: int
    ) -> bool:
        """Try to apply one insert to the assembled device cache in
        place. Return False to drop the cache instead (the next search
        re-assembles). Default: always re-assemble."""
        return False

    # -- Index API -----------------------------------------------------------

    def add(self, embedding, vec_id: int) -> None:
        """Route the insert to the emptiest shard (its local incremental
        add — leaf-split / graph-insert semantics live in the shard);
        per-chip state stays ~1/n_shards as the index grows. The
        assembled device cache is patched in place when the subclass
        supports it, else invalidated (re-assembled lazily)."""
        s = int(np.argmin([len(g) for g in self.gids]))
        shard = self.shards[s]
        emb = np.asarray(embedding, np.float32).reshape(-1)
        local_id = int(len(self.gids[s]))
        shard.add(emb, local_id)
        self.gids[s] = np.append(self.gids[s], np.int64(vec_id))
        if self._device_cache is not None and not self._patch_device_cache(
            s, local_id, emb, vec_id
        ):
            self._device_cache = None

    def search_approximate(self, query, top_k: int):
        """Single-query parity path: every shard's host descent, global
        merge by distance."""
        out = []
        for s, shard in enumerate(self.shards):
            for lid, dist in shard.search_approximate(query, top_k):
                out.append((float(dist), int(self.gids[s][lid])))
        out.sort()
        return [(gid, dist) for dist, gid in out[:top_k]]

    def search_batch(self, queries, top_k: int, **kw) -> SearchResult:
        bd, bi = self._search_batch_rows(queries, top_k, **kw)
        cache = self._device_cache
        bi = np.asarray(bi)
        hi = max(len(cache["row_to_gid"]) - 1, 0)
        ids = np.where(
            bi >= 0, cache["row_to_gid"][np.clip(bi, 0, hi)], -1
        )
        return SearchResult(
            ids=ids.astype(np.int64), distances=np.asarray(bd)
        )

    def search_batch_device(self, queries, top_k: int, **kw):
        """Device-resident variant (int32 external ids required)."""
        bd, bi = self._search_batch_rows(queries, top_k, **kw)
        idmap = self._device_cache["row_to_gid_dev"]
        if idmap is None:
            raise ValueError(
                "external ids exceed int32 range; use search_batch()"
            )
        ids = jnp.where(
            bi >= 0,
            jnp.take(idmap, jnp.clip(bi, 0, idmap.shape[0] - 1)),
            -1,
        )
        return bd, ids

    # -- persistence -----------------------------------------------------------

    def save_index(self, file_path: str) -> None:
        """<path>.manifest.json + one <path>.shard{s} per shard (each a
        standard single-file bincode layout with LOCAL ids, loadable by
        the single-chip class) + <path>.ids (bincode: one vec_u64 of
        external ids per shard, local-row order)."""
        manifest = {
            "format": self._manifest_format,
            "dim": self.dim,
            "num_shards": len(self.shards),
        }
        with open(file_path + ".manifest.json", "w") as fp:
            json.dump(manifest, fp)
        for s, shard in enumerate(self.shards):
            shard.save_index(f"{file_path}.shard{s}")
        with open(file_path + ".ids", "wb") as fp:
            w = Writer(fp)
            for g in self.gids:
                w.vec_u64(g.astype(np.uint64))

    @classmethod
    def load_index(
        cls, file_path: str, dim: Optional[int] = None, mesh=None
    ):
        with open(file_path + ".manifest.json") as fp:
            manifest = json.load(fp)
        fmt = manifest.get("format")
        if fmt != cls._manifest_format:
            raise ValueError(
                f"{file_path}: manifest format {fmt!r} is not "
                f"{cls._manifest_format!r}"
            )
        dim = dim or manifest.get("dim")
        shards = [
            cls._shard_cls.load_index(f"{file_path}.shard{s}", dim=dim)
            for s in range(manifest["num_shards"])
        ]
        with open(file_path + ".ids", "rb") as fp:
            r = Reader(fp)
            gids = [
                r.vec_u64().astype(np.int64)
                for _ in range(manifest["num_shards"])
            ]
        return cls(shards, gids=gids, mesh=mesh)
