"""RP-forest index ("LSH" in the reference) — TPU-native rebuild of
`vers/src/indexes/lsh.rs`.

Build: level-synchronous batched hyperplane splitting on device
(`vers_tpu.ops.rpforest`) instead of host recursion + rayon
(`lsh.rs:132-161`). Exact-duplicate vectors are dropped first (parity
with `deduplicate`, `lsh.rs:113-130`).

Search (batched): each tree routes the query batch to a leaf bucket via
the jitted descent, then all trees' buckets are scanned with the shared
dense binned engine (`vers_tpu.ops.binned`) and merged — replacing the
rayon per-tree recursion + DashSet candidate union (`lsh.rs:264-281`).

Search (single query): host-side recursion with exact behavioral parity
with `tree_result` (`lsh.rs:163-216`) including the deficit/backup
branch rule.

Documented deviations from the reference:
- tree depth is bounded (`ops/rpforest.depth_bound`); pathologically
  unbalanced nodes freeze into oversized leaves instead of recursing
  forever,
- ``add`` overflow splits just the overflowing leaf into a subtree,
  same as the reference (`lsh.rs:236-246`), with a seeded PRNG for the
  sampled hyperplanes and a bounded-attempt freeze for non-separating
  nodes (D1/D2); only if the descent falls off the recorded tables
  (defensive, loaded/degenerate trees) is the whole tree lazily
  rebuilt,
- ``add`` stores the new vector's *internal* index in tree leaves; the
  reference stores the external id (`lsh.rs:255-262`), which is only
  correct when no duplicates were removed — observable behavior is
  identical in that case and ours is also correct otherwise.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vers_tpu.config import LSHConfig
from vers_tpu.core import (
    as_query_matrix,
    deduplicate,
    device_id_map,
    round_up,
    to_device,
)
from vers_tpu.index.base import Index
from vers_tpu.io.bincode import Reader, Writer
from vers_tpu.models.candidates import SearchResult
from vers_tpu.ops import rpforest
from vers_tpu.ops.pallas_topk import MAX_PALLAS_K


class _Tree:
    """Host mirror of one tree: level tables + leaf membership."""

    def __init__(self, coeff, const, split, bucket, leaf_of_vec, num_buckets):
        # np.array (not asarray): device-built tables arrive as
        # read-only jax views, and leaf splits mutate them in place
        self.coeff = np.array(coeff, np.float32)    # (L, T, d)
        self.const = np.array(const, np.float32)    # (L, T)
        self.split = np.array(split, np.int32)      # (L, S)
        self.bucket = np.array(bucket, np.int32)    # (L, S)
        self.leaf_of_vec = np.array(leaf_of_vec, np.int32)  # (n,)
        self.num_buckets = int(num_buckets)
        self.members: List[List[int]] = [[] for _ in range(self.num_buckets)]
        for i, b in enumerate(self.leaf_of_vec):
            if b >= 0:
                self.members[int(b)].append(i)


class ANNIndex(Index):
    def __init__(
        self,
        max_node_size: int,
        trees: List[_Tree],
        values: np.ndarray,
        ids: np.ndarray,
        config: LSHConfig = LSHConfig(),
    ):
        self.config = config
        self.max_node_size = int(max_node_size)
        self._trees = trees
        self._values = np.asarray(values, dtype=np.float32)
        self._ids = np.asarray(ids, dtype=np.int64)
        self.dim = self._values.shape[1]
        self._dirty_trees: set = set()
        self._shared = None    # shared-corpus device state (single chip)

    def _stacked_descent_tables(self):
        """Stacked per-tree level tables (T, L, ...) numpy, padded to
        common shapes — the `ops/rpforest.descend_forest` input."""
        L = max(t.coeff.shape[0] for t in self._trees)
        TC = max(t.coeff.shape[1] for t in self._trees)
        SC = max(t.split.shape[1] for t in self._trees)
        T = len(self._trees)
        coeffs = np.zeros((T, L, TC, self.dim), np.float32)
        consts = np.zeros((T, L, TC), np.float32)
        splits = np.full((T, L, SC), -1, np.int32)
        buckets = np.full((T, L, SC), -1, np.int32)
        for i, t in enumerate(self._trees):
            l, tc, _ = t.coeff.shape
            sc = t.split.shape[1]
            coeffs[i, :l, :tc] = t.coeff
            consts[i, :l, :tc] = t.const
            splits[i, :l, :sc] = t.split
            buckets[i, :l, :sc] = t.bucket
        return coeffs, consts, splits, buckets

    def _flat_descent_tables(self):
        """Packed hyperplane tables for `rpforest.descend_forest_flat`:
        (coeff_flat (total, d) f32, const_flat (total,) f32,
        cbase (T, L) i32, splits (T, L, SC) i32, buckets (T, L, SC)
        i32). Test slots are allocated contiguously per level (device
        builder: cumsum slots, `ops/rpforest.build_tree`; host inserts:
        next-free `_alloc_inner`), so level l's live rows are
        0..max(split_l)+1. The dense (T, L, TC, d) layout this replaces
        was ~95% padding at 1M scale (2.2GB @ 8 trees; HBM OOM @ 16)."""
        T = len(self._trees)
        L = max(t.coeff.shape[0] for t in self._trees)
        SC = max(t.split.shape[1] for t in self._trees)
        splits = np.full((T, L, SC), -1, np.int32)
        buckets = np.full((T, L, SC), -1, np.int32)
        nt = np.zeros((T, L), np.int64)
        for i, t in enumerate(self._trees):
            l_t, sc_t = t.split.shape
            splits[i, :l_t, :sc_t] = t.split
            buckets[i, :l_t, :sc_t] = t.bucket
            for l in range(l_t):
                m = t.split[l]
                nt[i, l] = int(m.max()) + 1 if (m >= 0).any() else 0
        total = max(int(nt.sum()), 1)
        coeff_flat = np.zeros((total, self.dim), np.float32)
        const_flat = np.zeros((total,), np.float32)
        cbase = np.zeros((T, L), np.int32)
        pos = 0
        for i, t in enumerate(self._trees):
            for l in range(t.coeff.shape[0]):
                k = int(nt[i, l])
                cbase[i, l] = pos
                coeff_flat[pos : pos + k] = t.coeff[l, :k]
                const_flat[pos : pos + k] = t.const[l, :k]
                pos += k
            cbase[i, t.coeff.shape[0] :] = pos
        return coeff_flat, const_flat, cbase, splits, buckets

    def _max_bin(self) -> int:
        return max(
            (len(m) for t in self._trees for m in t.members), default=1
        )

    def _ensure_shared(self, r_blk: int) -> dict:
        """Shared-corpus device state (`ops/forest_shared`): ONE corpus
        copy + per-tree INDEX tables — the reference's memory shape
        (`lsh.rs:44,53`: corpus once, trees hold ids), which is what
        makes a single-chip 1M x 300 8-tree forest possible at all
        (the stacked layout needs ~2 corpus copies PER TREE). Single
        slot cached per r_blk; the corpus upload survives table
        rebuilds."""
        if self._shared is not None and self._shared["r_blk"] == r_blk:
            return self._shared
        from vers_tpu.ops.forest_shared import shared_tree_tables

        corpus_pad = xx = None
        if self._shared is not None:
            corpus_pad = self._shared["corpus_pad"]
            xx = self._shared["xx"]
        t = shared_tree_tables(
            [tr.leaf_of_vec for tr in self._trees],
            [tr.num_buckets for tr in self._trees],
            r_blk,
        )
        if corpus_pad is None:
            n, d = self._values.shape
            n_pad = round_up(max(n, 1), 128)
            d_pad = round_up(d, 128)
            corpus_pad = to_device(
                np.pad(self._values, ((0, n_pad - n), (0, d_pad - d)))
            )
            xx = jnp.sum(corpus_pad.astype(jnp.float32) ** 2, axis=1)
        coeff_flat, const_flat, cbase, splits, buckets = (
            self._flat_descent_tables()
        )
        self._shared = dict(
            r_blk=r_blk,
            corpus_pad=corpus_pad,
            xx=xx,
            coeffs=to_device(coeff_flat),
            consts=jnp.asarray(const_flat),
            cbase=jnp.asarray(cbase),
            splits=jnp.asarray(splits),
            buckets=jnp.asarray(buckets),
            offsets=jnp.asarray(t["offsets"]),
            sizes_dev=jnp.asarray(t["sizes"].astype(np.int32)),
            src=jnp.asarray(t["src"]),
            rbin=jnp.asarray(t["rbin"]),
            g_first=jnp.asarray(t["g_first"]),
            g_rstart=jnp.asarray(t["g_rstart"]),
            order=jnp.asarray(t["order"]),
            rbin_sorted=jnp.asarray(t["rbin_sorted"]),
            g_max=t["g_max"],
            g_total=t["g_total"],
            num_bins=t["num_bins"],
            max_bin=t["max_bin"],
        )
        return self._shared

    # -- build ---------------------------------------------------------

    @classmethod
    def build_index(
        cls,
        num_trees: int,
        max_size: int,
        vectors: np.ndarray,
        vector_ids,
        config: Optional[LSHConfig] = None,
    ) -> "ANNIndex":
        """Parity signature with `lsh.rs:132-161` (dedup first, then
        num_trees independent random trees)."""
        if max_size < 2:
            raise ValueError("max_node_size must be >= 2")
        config = config or LSHConfig(num_trees=num_trees, max_node_size=max_size)
        vectors = np.asarray(vectors, dtype=np.float32)
        dedup_vecs, dedup_ids = deduplicate(vectors, np.asarray(vector_ids))
        n, d = dedup_vecs.shape
        n_pad = round_up(max(n, 1), 128)
        data = to_device(np.pad(dedup_vecs, ((0, n_pad - n), (0, 0))))
        max_depth = rpforest.depth_bound(n, max_size)
        key = jax.random.PRNGKey(config.seed)
        trees = []
        for t in range(num_trees):
            tables = rpforest.build_tree(
                jax.random.fold_in(key, t), data, n, max_size, max_depth
            )
            trees.append(
                _Tree(
                    tables.coeff,
                    tables.const,
                    tables.split,
                    tables.bucket,
                    np.asarray(tables.leaf_of_vec)[:n],
                    int(tables.num_buckets),
                )
            )
        return cls(max_size, trees, dedup_vecs, dedup_ids, config)

    # -- Index API -------------------------------------------------------

    def add(self, embedding, vec_id: int) -> None:
        """Parity surface with `Index::add` (`lsh.rs:253-262`): append
        the vector, then insert into every tree; when a leaf overflows
        max_node_size, rebuild JUST that leaf into a subtree
        (`lsh.rs:236-246` -> `build_a_tree`). Every other bucket is
        untouched (tested bit-identical in tests/test_lsh.py)."""
        emb = np.asarray(embedding, dtype=np.float32).reshape(1, -1)
        internal = self._values.shape[0]
        self._values = np.concatenate([self._values, emb], axis=0)
        self._ids = np.append(self._ids, np.int64(vec_id))
        for t, tree in enumerate(self._trees):
            b, lvl, v, on_path = self._descend_host_pos(tree, emb[0])
            tree.leaf_of_vec = np.append(tree.leaf_of_vec, np.int32(b))
            tree.members[b].append(internal)
            if len(tree.members[b]) > self.max_node_size:
                if on_path:
                    self._split_leaf(tree, t, lvl, v, b)
                else:
                    # defensive: the descent fell off the recorded
                    # tables (loaded/degenerate tree) — lazy whole-tree
                    # rebuild restores the invariant
                    self._dirty_trees.add(t)
        self._shared = None  # values grew: corpus re-uploads too

    def _descend_host_pos(self, tree: _Tree, q: np.ndarray):
        """Main-path descent returning (bucket, level, position,
        on_path). ``on_path`` is False when the descent hit an
        unrecorded node (then bucket 0 is the defensive answer and the
        position is meaningless)."""
        v = 0
        for lvl in range(tree.split.shape[0]):
            b = tree.bucket[lvl][v] if v < tree.bucket.shape[1] else -1
            if b >= 0:
                return int(b), lvl, int(v), True
            s = tree.split[lvl][v] if v < tree.split.shape[1] else -1
            if s < 0:
                return 0, lvl, int(v), False
            side = 1 if float(tree.coeff[lvl][s] @ q + tree.const[lvl][s]) >= 0 else 0
            v = 2 * int(s) + side
        return 0, tree.split.shape[0] - 1, 0, False

    # -- leaf split (`lsh.rs:236-246` insert overflow -> build_a_tree) --

    @staticmethod
    def _grow_level_tables(tree: _Tree, lvl: int, pos: int) -> None:
        """Ensure the level tables cover level ``lvl`` and position
        ``pos`` (grafted subtrees may deepen or widen a level)."""
        L, S = tree.split.shape
        if lvl >= L:
            grow = lvl - L + 1
            tree.split = np.pad(tree.split, ((0, grow), (0, 0)), constant_values=-1)
            tree.bucket = np.pad(tree.bucket, ((0, grow), (0, 0)), constant_values=-1)
            tree.coeff = np.pad(tree.coeff, ((0, grow), (0, 0), (0, 0)))
            tree.const = np.pad(tree.const, ((0, grow), (0, 0)))
        if pos >= tree.split.shape[1]:
            grow = pos - tree.split.shape[1] + 1
            tree.split = np.pad(tree.split, ((0, 0), (0, grow)), constant_values=-1)
            tree.bucket = np.pad(tree.bucket, ((0, 0), (0, grow)), constant_values=-1)

    def _place_leaf(self, tree: _Tree, lvl: int, v: int, mem, reuse) -> None:
        self._grow_level_tables(tree, lvl, v)
        if reuse:
            b = reuse.pop()
            tree.members[b] = list(mem)
        else:
            b = tree.num_buckets
            tree.num_buckets += 1
            tree.members.append(list(mem))
        tree.bucket[lvl][v] = b
        tree.split[lvl][v] = -1
        for m in mem:
            tree.leaf_of_vec[m] = b

    def _alloc_inner(self, tree: _Tree, lvl: int, v: int,
                     normal: np.ndarray, const: float) -> int:
        self._grow_level_tables(tree, lvl, v)
        s_new = int(tree.split[lvl].max()) + 1  # next free slot
        if s_new >= tree.coeff.shape[1]:
            grow = s_new - tree.coeff.shape[1] + 1
            tree.coeff = np.pad(tree.coeff, ((0, 0), (0, grow), (0, 0)))
            tree.const = np.pad(tree.const, ((0, 0), (0, grow)))
        tree.coeff[lvl][s_new] = normal
        tree.const[lvl][s_new] = const
        tree.split[lvl][v] = s_new
        tree.bucket[lvl][v] = -1
        # children live at (lvl+1, 2*s_new / 2*s_new+1)
        self._grow_level_tables(tree, lvl + 1, 2 * s_new + 1)
        return s_new

    def _split_leaf(self, tree: _Tree, t_idx: int, lvl0: int, v0: int,
                    b0: int) -> None:
        """Rebuild the overflowing leaf's members into a subtree rooted
        at its position — the reference's insert-overflow behavior
        (`lsh.rs:236-246`): hyperplane from two sampled members
        (normal = b - a, through the midpoint, `lsh.rs:58-95`), recurse
        until every leaf holds < max_node_size. Deviations kept from
        the build path (PARITY D1/D2): a seeded PRNG replaces
        thread_rng, and a non-separating node freezes into an oversized
        leaf after bounded attempts instead of recursing forever."""
        members0 = list(tree.members[b0])
        rng = np.random.default_rng(
            (self.config.seed, 0x5EAF, t_idx, len(self._values))
        )
        reuse = [b0]
        stack = [(members0, lvl0, v0)]
        while stack:
            mem, lvl, v = stack.pop()
            if len(mem) < self.max_node_size:
                self._place_leaf(tree, lvl, v, mem, reuse)
                continue
            marr = np.asarray(mem, dtype=np.int64)
            for _ in range(8):
                i, j = rng.choice(len(mem), size=2, replace=False)
                a_v = self._values[mem[i]]
                b_v = self._values[mem[j]]
                normal = b_v - a_v
                const = -float(normal @ ((a_v + b_v) / 2.0))
                above = self._values[marr] @ normal + const >= 0
                if 0 < int(above.sum()) < len(mem):
                    break
            else:  # could not separate: freeze as oversized leaf (D2)
                self._place_leaf(tree, lvl, v, mem, reuse)
                continue
            s_new = self._alloc_inner(tree, lvl, v, normal, const)
            below_m = [m for m, s in zip(mem, above) if not s]
            above_m = [m for m, s in zip(mem, above) if s]
            stack.append((below_m, lvl + 1, 2 * s_new))      # left = below
            stack.append((above_m, lvl + 1, 2 * s_new + 1))  # right = above

    def _rebuild_dirty(self) -> None:
        if not self._dirty_trees:
            return
        from vers_tpu.ops import rpforest as rpf

        n, d = self._values.shape
        n_pad = round_up(max(n, 1), 128)
        data = to_device(np.pad(self._values, ((0, n_pad - n), (0, 0))))
        max_depth = rpf.depth_bound(n, self.max_node_size)
        key = jax.random.PRNGKey(self.config.seed + 1)
        for t in sorted(self._dirty_trees):
            tables = rpf.build_tree(
                jax.random.fold_in(key, 1000 + t), data, n,
                self.max_node_size, max_depth,
            )
            self._trees[t] = _Tree(
                tables.coeff, tables.const, tables.split, tables.bucket,
                np.asarray(tables.leaf_of_vec)[:n], int(tables.num_buckets),
            )
        self._dirty_trees.clear()
        if self._shared is not None:
            # trees changed, values did not: rebuild the index tables
            # on next search but keep the uploaded corpus
            self._shared["r_blk"] = -1

    def _descend_host(self, tree: _Tree, q: np.ndarray) -> int:
        v = 0
        for lvl in range(tree.split.shape[0]):
            b = tree.bucket[lvl][v]
            if b >= 0:
                return int(b)
            s = tree.split[lvl][v]
            if s < 0:
                # empty/non-occupied node: no recorded leaf. Fall back
                # to bucket 0 (cannot happen on the main path of a
                # vector-built tree; defensive for loaded trees).
                return 0
            side = 1 if float(tree.coeff[lvl][s] @ q + tree.const[lvl][s]) >= 0 else 0
            v = 2 * int(s) + side
        return 0

    def _ids_device(self):
        """Cached device copy of the internal->external id map (int32),
        or None when any external id exceeds int32 range."""
        cached = getattr(self, "_ids_dev", None)
        if cached is None or cached[0] is not self._ids:
            self._ids_dev = (self._ids, device_id_map(self._ids))
            cached = self._ids_dev
        return cached[1]

    def search_batch_device(
        self, queries, top_k: int, probes_per_tree: Optional[int] = None
    ):
        """Device-resident variant of ``search_batch``: returns
        (dists (Q,k) f32, external ids (Q,k) int32) jax arrays with no
        host transfer — the pipelined-serving path.

        External ids must fit in int32; raises ValueError otherwise
        (use ``search_batch``, which maps ids on the host in int64)."""
        dists, internal = self._search_batch_internal(
            queries, top_k, probes_per_tree
        )
        idmap = self._ids_device()
        if idmap is None:
            raise ValueError(
                "external ids exceed int32 range; the device-resident "
                "path cannot map them — use search_batch()"
            )
        ext = jnp.where(
            internal >= 0,
            jnp.take(idmap, jnp.clip(internal, 0, idmap.shape[0] - 1)),
            -1,
        )
        return dists, ext

    def search_batch(
        self, queries, top_k: int, probes_per_tree: Optional[int] = None
    ) -> SearchResult:
        """SINGLE dispatch: multiprobe descent through the whole forest
        + packed binned scan + merge, one compiled program.

        ``probes_per_tree=None`` (default) emulates the reference's
        deficit/backup rule (`lsh.rs:203-214`) size-aware: the static
        probe count comes from the leaf-size histogram (enough
        min-margin sibling probes that min(leaf, top_k) sums can reach
        top_k), and each (query, tree) deactivates ranks once its own
        running candidate count reaches top_k. An explicit int probes a
        fixed number of min-margin siblings per tree."""
        dists, internal = self._search_batch_internal(
            queries, top_k, probes_per_tree
        )
        internal = np.asarray(internal)
        dists = np.asarray(dists)
        ext = np.where(
            internal >= 0,
            self._ids[np.clip(internal, 0, len(self._ids) - 1)],
            -1,
        )
        return SearchResult(ids=ext.astype(np.int64), distances=dists)

    def _auto_probes(self, top_k: int) -> int:
        """Static probe depth for the deficit-rule emulation: the
        worst-case number of leaves (sizes capped at top_k, adversarial
        smallest-first order, same rule as the IVF walk bound) any
        query could need to reach top_k candidates in ONE tree; capped
        at 8 ranks (beyond that the min-margin probes stray far from
        the backup branches anyway)."""
        from vers_tpu.ops.binned import adaptive_probe_depth

        depth = 1
        for tree in self._trees:
            sizes = np.asarray(
                [len(m) for m in tree.members] or [1], np.int64
            )
            depth = max(depth, adaptive_probe_depth(sizes, top_k))
        return min(depth, 8)

    def _shared_engine(self, top_k: int) -> str:
        """Engine rule for the shared-corpus path (shared with the
        sharded serving layer): Pallas packed scan on TPU for small k,
        XLA fused scan otherwise."""
        engine = self.config.engine
        if engine == "auto":
            engine = (
                "pallas"
                if jax.default_backend() == "tpu" and top_k <= MAX_PALLAS_K
                else "xla"
            )
        return engine

    def _shared_plan(self, q_n: int, top_k: int, n_probes: int,
                     engine: str):
        """Shared-corpus device state + static tile plan for a
        per-program query count ``q_n`` (the query-sharded layer passes
        its PER-CHIP count, `parallel/lsh.ShardedANNIndex`). Returns
        (shared state dict, statics dict) for
        `ops.forest_shared.forest_search_shared_{pallas,xla}`."""
        max_bin = self._max_bin()
        n = self._values.shape[0]
        n_pad = round_up(max(n, 1), 128)
        if engine == "pallas":
            chunk = 1024
            r_blk = round_up(max(1024, max_bin, top_k), chunk)
            sh = self._ensure_shared(r_blk)
            q_blk = 128 if jax.default_backend() == "tpu" else 64
            q_pad_rank = round_up(q_n, q_blk)
            # p>1 uses the combined (query, rank) pair sort per tree
            # (ops/binned._pallas_fused_core): blocks scale with p
            blocks = (
                n_probes * q_pad_rank if n_probes > 1 else q_pad_rank
            ) // q_blk
            w_rank = blocks + sh["g_max"] + 1
            return sh, dict(
                q_blk=q_blk, r_blk=r_blk, chunk=chunk, w_rank=w_rank,
                q_pad_rank=q_pad_rank,
                interpret=jax.default_backend() != "tpu",
            )
        # per-tree tile targets (the stacked path's forest plan,
        # re-derived for one tree spanning all n rows)
        r_target = max(max_bin, top_k, min(8192, max(1024, n // 16)))
        r_blk = min(round_up(r_target, 128), n_pad)
        sh = self._ensure_shared(r_blk)
        q_blk = min(
            round_up(max(64, q_n // max(sh["g_total"], 1) * 2), 64),
            round_up(q_n, 8),
        )
        w_rank = (q_n + q_blk - 1) // q_blk + sh["g_max"]
        return sh, dict(
            q_blk=q_blk, r_blk=r_blk, w_rank=w_rank,
            use_approx=jax.default_backend() == "tpu",
        )

    def _search_batch_internal(
        self, queries, top_k: int, probes_per_tree: Optional[int] = None
    ):
        """Single-chip batched search on the SHARED-corpus device state
        (`ops/forest_shared`): multiprobe descent + per-tree packed scan
        (lax.scan — one tree's gathered view live at a time) + dedup
        merge, ONE device dispatch. Memory parity with the reference
        (`lsh.rs:44,53`): the corpus lives on device exactly once."""
        self._rebuild_dirty()
        qdev = as_query_matrix(queries)
        q_n = qdev.shape[0]
        if probes_per_tree is None:
            n_probes = self._auto_probes(top_k)
            deficit_k = top_k if n_probes > 1 else 0
        else:
            n_probes = max(1, probes_per_tree)
            deficit_k = 0
        engine = self._shared_engine(top_k)
        sh, plan = self._shared_plan(q_n, top_k, n_probes, engine)
        if engine == "pallas":
            from vers_tpu.ops.forest_shared import (
                forest_search_shared_pallas,
            )

            dists, internal = forest_search_shared_pallas(
                qdev, sh["coeffs"], sh["consts"], sh["cbase"],
                sh["splits"], sh["buckets"], sh["offsets"],
                sh["sizes_dev"],
                sh["corpus_pad"], sh["xx"], sh["src"], sh["rbin"],
                sh["g_first"],
                n_probes=n_probes, num_bins=sh["num_bins"], top_k=top_k,
                deficit_k=deficit_k, **plan,
            )
        else:
            from vers_tpu.ops.forest_shared import forest_search_shared_xla

            dists, internal = forest_search_shared_xla(
                qdev, sh["coeffs"], sh["consts"], sh["cbase"],
                sh["splits"], sh["buckets"], sh["offsets"],
                sh["sizes_dev"],
                sh["corpus_pad"], sh["order"], sh["rbin_sorted"],
                sh["g_first"], sh["g_rstart"],
                n_probes=n_probes, num_bins=sh["num_bins"], top_k=top_k,
                deficit_k=deficit_k, **plan,
            )
        return dists, internal

    # -- single-query parity path (deficit/backup rule) ------------------

    def _tree_result(
        self, tree: _Tree, q: np.ndarray, n: int, lvl: int, v: int, cand: set
    ) -> int:
        """Exact behavioral parity with `tree_result` (`lsh.rs:163-216`),
        expressed as an explicit-stack DFS (depth-proof; adds can deepen
        a tree arbitrarily). The recursive budget threading is
        equivalent to one global remaining counter because the DFS
        visits a main subtree completely before its sibling backup, and
        backup nodes are only expanded while the deficit persists."""
        remaining = n
        stack = [(lvl, v)]
        while stack:
            lvl, v = stack.pop()
            if remaining <= 0:
                break
            if lvl >= tree.split.shape[0]:
                continue
            b = tree.bucket[lvl][v] if v < tree.bucket.shape[1] else -1
            s = tree.split[lvl][v] if v < tree.split.shape[1] else -1
            if s < 0:
                members = tree.members[int(b)] if b >= 0 else []
                if len(members) < remaining:
                    cand.update(members)
                    remaining -= len(members)
                else:
                    m = np.asarray(members, dtype=np.int64)
                    d2 = np.sum((self._values[m] - q[None, :]) ** 2, axis=1)
                    o = np.argsort(d2, kind="stable")[:remaining]
                    cand.update(int(m[i]) for i in o)
                    remaining = 0
                continue
            above = float(tree.coeff[lvl][s] @ q + tree.const[lvl][s]) >= 0
            main = 2 * int(s) + (1 if above else 0)
            backup = 2 * int(s) + (0 if above else 1)
            stack.append((lvl + 1, backup))
            stack.append((lvl + 1, main))
        return n - remaining

    def search_approximate(self, query, top_k: int) -> List[Tuple[int, float]]:
        self._rebuild_dirty()
        q = np.asarray(query, dtype=np.float32).reshape(-1)
        cand: set = set()
        for tree in self._trees:
            self._tree_result(tree, q, top_k, 0, 0, cand)
        if not cand:
            return []
        m = np.asarray(sorted(cand), dtype=np.int64)
        d2 = np.sum((self._values[m] - q[None, :]) ** 2, axis=1)
        o = np.argsort(d2, kind="stable")[:top_k]
        return [(int(self._ids[m[i]]), float(d2[i])) for i in o]

    # -- persistence (bincode parity: `lsh.rs:31-55` layout) -------------

    def _write_tree(self, w: Writer, tree: _Tree) -> None:
        """Pre-order bincode emit of one tree via an explicit stack —
        depth-proof (adds can deepen a tree past any recursion limit)."""
        stack = [(0, 0)]
        while stack:
            lvl, v = stack.pop()
            s = tree.split[lvl][v] if lvl < tree.split.shape[0] else -1
            b = tree.bucket[lvl][v] if lvl < tree.bucket.shape[0] else -1
            if s >= 0:
                w.u32(0)  # Node::Inner variant tag
                w.f32_array(tree.coeff[lvl][s])
                w.f32(float(tree.const[lvl][s]))
                # pre-order: left (below) before right (above)
                stack.append((lvl + 1, 2 * int(s) + 1))
                stack.append((lvl + 1, 2 * int(s)))
            else:
                w.u32(1)  # Node::Leaf
                members = tree.members[int(b)] if b >= 0 else []
                w.vec_u64(np.asarray(members, dtype=np.uint64))

    def save_index(self, file_path: str) -> None:
        self._rebuild_dirty()
        with open(file_path, "wb") as fp:
            w = Writer(fp)
            w.u64(self.max_node_size)
            w.u64(len(self._trees))
            for tree in self._trees:
                self._write_tree(w, tree)
            w.vec_f32_matrix(self._values)
            w.vec_u64(self._ids.astype(np.uint64))

    @classmethod
    def load_index(
        cls,
        file_path: str,
        dim: Optional[int] = None,
        config: LSHConfig = LSHConfig(),
    ) -> "ANNIndex":
        if dim is None:
            # the file doesn't store dim (parity with the reference's
            # const-generic N, `base.rs:45-58`); candidate-scan + full
            # structural validation recovers it
            from vers_tpu.io.infer import infer_dim_lsh

            dim = infer_dim_lsh(file_path)
        with open(file_path, "rb") as fp:
            r = Reader(fp)
            max_node_size = r.u64()
            num_trees = r.u64()
            raw_trees = [_parse_node(r, dim) for _ in range(num_trees)]
            values = r.vec_f32_matrix(dim)
            ids = r.vec_u64().astype(np.int64)
        trees = [_raw_to_tables(raw, values.shape[0], dim) for raw in raw_trees]
        return cls(max_node_size, trees, values, ids, config)


def _parse_node(r: Reader, dim: int):
    """Pre-order bincode parse of one tree via an explicit hole stack
    (depth-proof). Inner nodes are ["inner", coeff, const, left, right]
    lists (same positional scheme the recursive tuples used)."""
    root = [None]
    stack = [(root, 0)]  # (container, slot) awaiting the next node
    while stack:
        holder, slot = stack.pop()
        tag = r.u32()
        if tag == 0:
            node = ["inner", r.f32_array(dim), r.f32(), None, None]
            holder[slot] = node
            # pre-order: fill left (slot 3) before right (slot 4)
            stack.append((node, 4))
            stack.append((node, 3))
        elif tag == 1:
            holder[slot] = ("leaf", r.vec_u64().astype(np.int64))
        else:
            raise ValueError(f"bad Node enum tag {tag}")
    return root[0]


def _raw_to_tables(raw, n: int, dim: int) -> _Tree:
    """Convert a parsed recursive tree into level tables (BFS,
    inner-node slot = per-level inner count; children at 2s / 2s+1)."""
    levels: List[List] = [[raw]]
    while True:
        nxt: List = []
        for node in levels[-1]:
            if node is not None and node[0] == "inner":
                nxt.extend([node[3], node[4]])
            else:
                nxt.extend([None, None])
        if all(x is None for x in nxt):
            break
        # compact: children are indexed 2s/2s+1 by the PARENT's inner
        # slot, so rebuild the level in that order
        parents = [x for x in levels[-1] if x is not None and x[0] == "inner"]
        nxt = []
        for p in parents:
            nxt.extend([p[3], p[4]])
        levels.append(nxt)

    L = len(levels)
    t_caps = [max(sum(1 for x in lv if x is not None and x[0] == "inner"), 1) for lv in levels]
    T = max(t_caps)
    S = max(len(lv) for lv in levels)
    coeff = np.zeros((L, T, dim), np.float32)
    const = np.zeros((L, T), np.float32)
    split = np.full((L, S), -1, np.int32)
    bucket = np.full((L, S), -1, np.int32)
    leaf_of_vec = np.full((n,), -1, np.int32)
    members: List[List[int]] = []
    for lvl, lv in enumerate(levels):
        slot = 0
        for v, node in enumerate(lv):
            if node is None:
                continue
            if node[0] == "inner":
                coeff[lvl][slot] = node[1]
                const[lvl][slot] = node[2]
                split[lvl][v] = slot
                slot += 1
            else:
                b = len(members)
                bucket[lvl][v] = b
                mem = [int(x) for x in node[1]]
                members.append(mem)
                for i in mem:
                    if 0 <= i < n:
                        leaf_of_vec[i] = b

    tree = _Tree(coeff, const, split, bucket, leaf_of_vec, len(members))
    tree.members = members
    return tree
