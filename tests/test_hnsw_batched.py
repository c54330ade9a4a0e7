"""Batched (wave-parallel) HNSW construction: recall parity vs ground
truth and vs the sequential (reference-faithful) build."""

import numpy as np
import pytest

from vers_tpu.index.hnsw import HNSWIndex
from vers_tpu.ops.hnsw_build import draw_insertion_layers
from vers_tpu.utils.harness import recall_at_k

# heavy tier (wave builds / shard_map surfaces / subprocess dryruns):
# skipped by `make test`, run by `make test-all` (VERDICT r3 #7)
pytestmark = pytest.mark.slow


def _normed(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_insertion_layer_distribution():
    ins = draw_insertion_layers(20000, 6, 12, seed=0)
    # exponential decay with rate 1/ln(M): P(l >= 1) = e^{-ln 12} = 1/12
    frac = (ins >= 1).mean()
    assert 0.04 < frac < 0.14
    assert ins.max() <= 5 and ins.min() == 0


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(21)
    return _normed(rng, 600, 24)


def test_batched_build_recall(corpus):
    x = corpus
    idx = HNSWIndex.build_index_batched(4, 48, 32, 8, x, wave_cap=128)
    nodes = idx.get_num_nodes_in_layers()
    assert nodes[0] == 600
    assert all(a >= b for a, b in zip(nodes, nodes[1:]))
    q = x[:64]
    truth = np.argsort(-(q @ x.T), axis=1)[:, :10]
    res = idx.search_batch(q, 10)
    assert recall_at_k(res.ids, truth) > 0.85
    # host parity search also works on the wave-built graph
    single = idx.search_approximate(x[3], 10)
    assert single[0][0] == 3


def test_pending_fast_path_matches_materialized(corpus):
    # the device cache built straight from the wave-build arrays
    # (pending fast path) must give the same results as the cache
    # rebuilt from the materialized host dicts
    x = corpus
    a = HNSWIndex.build_index_batched(4, 48, 32, 8, x, seed=5)
    b = HNSWIndex.build_index_batched(4, 48, 32, 8, x, seed=5)
    q = x[:40]
    r_fast = a.search_batch(q, 10)          # pending fast path
    b._materialize_layers()                 # dict path
    assert b._pending_graph is None
    r_dict = b.search_batch(q, 10)
    assert a.get_num_nodes_in_layers() == b.get_num_nodes_in_layers()
    for i in range(len(q)):
        fast = set(r_fast.ids[i]) - {-1}
        slow = set(r_dict.ids[i]) - {-1}
        assert len(fast & slow) >= len(slow) - 1, i  # tie-order slack


def test_batched_vs_sequential_recall(corpus):
    x = corpus
    q = x[100:140]
    truth = np.argsort(-(q @ x.T), axis=1)[:, :10]
    seq = HNSWIndex.build_index(4, 48, 32, 8, x)
    bat = HNSWIndex.build_index_batched(4, 48, 32, 8, x, wave_cap=128)
    r_seq = recall_at_k(seq.search_batch(q, 10).ids, truth)
    r_bat = recall_at_k(bat.search_batch(q, 10).ids, truth)
    assert r_bat > r_seq - 0.1  # parity within tolerance


def test_batched_roundtrip(tmp_path, corpus):
    x = corpus
    idx = HNSWIndex.build_index_batched(4, 48, 32, 8, x, wave_cap=128)
    p = str(tmp_path / "hb.index")
    idx.save_index(p)
    re = HNSWIndex.load_index(p, dim=24)
    assert re.get_num_nodes_in_layers() == idx.get_num_nodes_in_layers()
    assert re.search_approximate(x[9], 10) == idx.search_approximate(x[9], 10)


def test_int8_nav_and_ef_route(corpus):
    """int8 navigation table + narrow routing beam: same quality as the
    bf16 full-ef path (both end in an exact f32 rescore)."""
    from vers_tpu.config import HNSWConfig

    x = corpus
    idx = HNSWIndex.build_index_batched(4, 48, 32, 8, x, wave_cap=128)
    q = x[:64]
    truth = np.argsort(-(q @ x.T), axis=1)[:, :10]
    base = recall_at_k(idx.search_batch(q, 10).ids, truth)
    import dataclasses

    idx.config = dataclasses.replace(idx.config, nav_dtype="int8", ef_route=4)
    idx._device_cache = None  # rebuild nav table
    fast = recall_at_k(idx.search_batch(q, 10).ids, truth)
    assert fast > base - 0.05, (fast, base)


def test_max_degree_caps_adjacency(corpus):
    from vers_tpu.config import HNSWConfig
    from vers_tpu.index.hnsw import HNSWIndex

    x = corpus[:300]
    idx = HNSWIndex.build_index(4, 32, 32, 8, x)
    widths_full = [a.shape[1] for a in idx._ensure_device_cache()["adjs"]]
    assert max(widths_full) > 4  # uncapped rows exceed the cap we'll set

    capped = HNSWIndex.build_index(4, 32, 32, 8, x)
    capped.config = HNSWConfig(
        num_layers=4, ef_construction=32, ef_search=32, num_neighbours=8,
        max_degree=4,
    )
    widths = [a.shape[1] for a in capped._ensure_device_cache()["adjs"]]
    assert max(widths) <= 4
    # capped search still returns sane self-hits
    res = capped.search_batch(x[:8], 5)
    assert (res.ids[:, 0] == np.arange(8)).mean() >= 0.75


def test_commit_edges_matches_numpy_reference():
    """The reverse-edge slack ranking + row compaction (the wave step's
    scatter commit) against a direct numpy re-enactment: per target v,
    incoming (u, d) edges ranked by (d, arrival order) win the slack
    slots; touched rows are then compacted to the deg closest."""
    import jax.numpy as jnp
    from vers_tpu.ops.hnsw_build import _commit_edges

    rng = np.random.default_rng(5)
    n_pad, deg, slack, w = 64, 5, 3, 8
    width = deg + slack
    rows_total = n_pad + 1  # +1 dump row, as build_graph pads

    adj = np.full((rows_total, width), -1, np.int64)
    dist = np.full((rows_total, width), np.inf, np.float32)
    # pre-populate some forward rows with sorted finite distances
    for r in range(0, n_pad, 3):
        m = rng.integers(1, deg + 1)
        adj[r, :m] = rng.choice(n_pad, size=m, replace=False)
        dist[r, :m] = np.sort(rng.random(m).astype(np.float32))

    rank_map = np.arange(n_pad, dtype=np.int64)
    u_ids = rng.choice(n_pad, size=w, replace=False).astype(np.int64)
    s = deg
    sel_i = rng.integers(0, n_pad, size=(w, s)).astype(np.int64)
    sel_d = np.sort(rng.random((w, s)).astype(np.float32), axis=1)
    # sprinkle invalid slots
    sel_i[0, -1] = -1
    sel_d[0, -1] = np.inf
    connect = np.ones(w, bool)
    connect[3] = False

    out_adj, out_dist = _commit_edges(
        jnp.asarray(adj, jnp.int32), jnp.asarray(dist),
        jnp.asarray(rank_map, jnp.int32), jnp.asarray(u_ids, jnp.int32),
        jnp.asarray(sel_i, jnp.int32), jnp.asarray(sel_d),
        jnp.asarray(connect), deg=deg, slack=slack,
    )
    out_adj = np.asarray(out_adj)
    out_dist = np.asarray(out_dist)

    # ---- numpy re-enactment ----
    ref_adj = adj.copy()
    ref_dist = dist.copy()
    for i in range(w):                       # forward rows
        if connect[i]:
            ref_adj[u_ids[i], :s] = sel_i[i]
            ref_adj[u_ids[i], s:] = -1
            ref_dist[u_ids[i], :s] = sel_d[i]
            ref_dist[u_ids[i], s:] = np.inf
    incoming = {}                            # reverse edges by target
    for i in range(w):
        if not connect[i]:
            continue
        for j in range(s):
            v = sel_i[i, j]
            if v >= 0 and np.isfinite(sel_d[i, j]):
                incoming.setdefault(int(v), []).append(
                    (float(sel_d[i, j]), int(u_ids[i]))
                )
    touched = set()
    for v, edges in incoming.items():
        edges.sort(key=lambda t: t[0])
        for r, (dv, uv) in enumerate(edges[:slack]):
            ref_adj[v, deg + r] = uv
            ref_dist[v, deg + r] = dv
        touched.add(v)
    for v in touched:                        # compaction to deg closest
        row_d = np.where(ref_adj[v] >= 0, ref_dist[v], np.inf)
        order = np.argsort(row_d, kind="stable")[:deg]
        ni = np.full(width, -1, np.int64)
        nd = np.full(width, np.inf, np.float32)
        keep = np.isfinite(row_d[order])
        ni[: keep.sum()] = ref_adj[v][order][keep]
        nd[: keep.sum()] = row_d[order][keep]
        ref_adj[v] = ni
        ref_dist[v] = nd

    np.testing.assert_array_equal(out_adj[:n_pad], ref_adj[:n_pad])
    np.testing.assert_allclose(out_dist[:n_pad], ref_dist[:n_pad], rtol=1e-6)


def test_slack_columns_cleared_after_build(corpus):
    """Invariant the beam's sliced adjacency gather relies on: outside
    `_commit_edges`, every column >= deg is -1 (forward writes pad
    them; reverse-edge compaction clears them), so construction and
    query beams may gather only the forward columns."""
    from vers_tpu.ops.hnsw_build import build_graph

    m = 8
    ins, layers = build_graph(corpus, 4, 48, m, wave_cap=128,
                              as_arrays=True)
    slack = max(m, 8)
    for l, (mem, adj, dist) in enumerate(layers):
        if len(mem) == 0:
            continue
        deg = (2 * m if l == 0 else m) + 1
        assert adj.shape[1] == deg + slack
        assert (adj[:, deg:] == -1).all(), f"layer {l} slack not cleared"
        assert np.isinf(dist[:, deg:]).all()


def test_route_scan_vs_beam(corpus):
    # the brute-force layer-1 routing scan (route_mode="scan", the
    # default) must match or beat the greedy routing-beam descent on
    # recall, for both the wave-built (pending) and materialized caches
    import dataclasses

    x = corpus
    idx = HNSWIndex.build_index_batched(4, 48, 32, 8, x, seed=9)
    q = x[:64]
    truth = np.argsort(-(q @ x.T), axis=1)[:, :10]
    base = idx.config
    assert base.route_mode == "scan"
    cache = idx._ensure_device_cache()
    assert cache["l1_tab"] is not None
    assert cache["n1"] == idx.get_num_nodes_in_layers()[1]
    r_scan = recall_at_k(idx.search_batch(q, 10).ids, truth)
    idx.config = dataclasses.replace(base, route_mode="beam")
    r_beam = recall_at_k(idx.search_batch(q, 10).ids, truth)
    idx.config = base
    assert r_scan >= r_beam - 0.02
    assert r_scan > 0.85
    # seeds knob: a single seed still works
    idx.config = dataclasses.replace(base, route_seeds=1)
    r_one = recall_at_k(idx.search_batch(q, 10).ids, truth)
    idx.config = base
    assert r_one > 0.7

    # materialized-dict cache path builds the same l1 table
    idx._materialize_layers()
    idx._device_cache = None
    cache2 = idx._ensure_device_cache()
    assert cache2["n1"] == cache["n1"]
    r_mat = recall_at_k(idx.search_batch(q, 10).ids, truth)
    assert abs(r_mat - r_scan) < 0.05


def test_route_scan_build_recall(corpus):
    # brute-force-routed construction (build_graph(route_scan=True)):
    # same layer statistics as the beam-routed wave build and recall
    # parity within tolerance on the standard query path
    x = corpus
    q = x[:64]
    truth = np.argsort(-(q @ x.T), axis=1)[:, :10]
    beam = HNSWIndex.build_index_batched(4, 48, 32, 8, x, seed=5, wave_cap=128)
    scan = HNSWIndex.build_index_batched(
        4, 48, 32, 8, x, seed=5, wave_cap=128, route_scan=True
    )
    # membership is drawn up front from the same seed -> identical sizes
    assert scan.get_num_nodes_in_layers() == beam.get_num_nodes_in_layers()
    r_beam = recall_at_k(beam.search_batch(q, 10).ids, truth)
    r_scan = recall_at_k(scan.search_batch(q, 10).ids, truth)
    assert r_scan > r_beam - 0.05
    assert r_scan > 0.8
    # host parity search works on the scan-built graph too
    single = scan.search_approximate(x[3], 10)
    assert single[0][0] == 3


def test_insert_inline_build_recall(corpus):
    # neighborhood-inlined insertion beams (build_graph(insert_inline=
    # True), the build-side D17): same layer statistics (membership is
    # seed-drawn) and recall parity with the classic wave build; the
    # inline table only steers candidate EXPLORATION (exact-refine
    # ranks in nav space), so edge quality must track the classic path
    x = corpus
    q = x[:64]
    truth = np.argsort(-(q @ x.T), axis=1)[:, :10]
    beam = HNSWIndex.build_index_batched(4, 48, 32, 8, x, seed=5, wave_cap=128)
    inl = HNSWIndex.build_index_batched(
        4, 48, 32, 8, x, seed=5, wave_cap=128,
        insert_inline=True, inline_dp=16, inline_refine=48,
    )
    assert inl.get_num_nodes_in_layers() == beam.get_num_nodes_in_layers()
    r_beam = recall_at_k(beam.search_batch(q, 10).ids, truth)
    r_inl = recall_at_k(inl.search_batch(q, 10).ids, truth)
    assert r_inl > r_beam - 0.05
    assert r_inl > 0.8
    # host parity search works on the inline-built graph too
    single = inl.search_approximate(x[3], 10)
    assert single[0][0] == 3


def test_device_add_no_materialization(corpus):
    """VERDICT r2 #4: `add` on a wave-built index must patch the pending
    arrays + device cache in place — no layer-dict materialization, no
    cache invalidation."""
    rng = np.random.default_rng(33)
    x = corpus[:512]
    idx = HNSWIndex.build_index_batched(4, 48, 32, 8, x, wave_cap=128)
    idx.search_batch(x[:4], 5)  # warm the device cache
    cache_before = idx._device_cache
    assert cache_before is not None

    new = rng.normal(size=(24,)).astype(np.float32)
    new /= np.linalg.norm(new)
    idx.add(new, 512)

    # fast-path invariants
    assert idx._pending_graph is not None  # no materialization
    assert idx._device_cache is cache_before  # same cache dict, patched
    assert all(not l.adjacency for l in idx.layers)  # dicts never built
    assert idx._rows_used == 513

    # the new vector is its own nearest neighbour on the batched path
    res = idx.search_batch(new[None], 5)
    assert res.ids[0, 0] == 512
    assert res.distances[0, 0] == pytest.approx(0.0, abs=1e-5)

    # reverse edges exist: the new node is reachable from a nearby query
    near = new + 0.01 * rng.normal(size=(24,)).astype(np.float32)
    near /= np.linalg.norm(near)
    res2 = idx.search_batch(near[None], 5)
    assert 512 in set(int(i) for i in res2.ids[0])


def test_device_add_many_and_roundtrip(tmp_path, corpus):
    rng = np.random.default_rng(34)
    x = corpus[:500]
    idx = HNSWIndex.build_index_batched(3, 32, 32, 6, x, wave_cap=128)
    extra = rng.normal(size=(24, 24)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    for i, e in enumerate(extra):
        idx.add(e, 500 + i)
    assert idx._pending_graph is not None  # every add took the fast path
    full = np.concatenate([x, extra])
    res = idx.search_batch(extra, 1)
    assert (res.ids[:, 0] == np.arange(500, 524)).all()  # self-hits
    q = full[:64]
    truth = np.argsort(-(q @ full.T), axis=1)[:, :10]
    rec = recall_at_k(idx.search_batch(q, 10).ids, truth)
    assert rec > 0.85, rec

    # save (materializes) -> reload -> identical batched results
    p = str(tmp_path / "added.index")
    before = idx.search_batch(q, 10)
    idx.save_index(p)
    re = HNSWIndex.load_index(p)
    after = re.search_batch(q, 10)
    assert recall_at_k(after.ids, truth) > 0.8

    # the single-query parity path agrees on the self-hit
    one = re.search_approximate(extra[0], 3)
    assert one[0][0] == 500
