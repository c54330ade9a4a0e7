"""ShardedANNIndex on the 8-virtual-device CPU mesh: query-sharded
fused forest search must match the single-chip batched path (same
forest tables, same fused program, fanned out over queries)."""

import numpy as np
import jax
import pytest

from vers_tpu.config import LSHConfig
from vers_tpu.index.lsh import ANNIndex
from vers_tpu.parallel.lsh import ShardedANNIndex
from vers_tpu.parallel.mesh import make_mesh
from vers_tpu.utils.harness import exhaustive_batch, recall_at_k


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 24)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_matches_single_chip(mesh, corpus):
    base = ANNIndex.build_index(4, 24, corpus, np.arange(len(corpus)))
    sharded = ShardedANNIndex(base, mesh=mesh)
    q = corpus[:50]
    single = base.search_batch(q, 10)
    multi = sharded.search_batch(q, 10)
    np.testing.assert_array_equal(single.ids, multi.ids)
    np.testing.assert_allclose(
        single.distances, multi.distances, rtol=1e-5, atol=1e-6
    )


def test_recall_on_mesh(mesh, corpus):
    sharded = ShardedANNIndex.build_index(6, 24, corpus, mesh=mesh,
        config=LSHConfig(num_trees=6, max_node_size=24, seed=1))
    q = corpus[:64]
    truth = exhaustive_batch(corpus, q, 10)
    res = sharded.search_batch(q, 10)
    assert recall_at_k(res.ids, truth) > 0.6  # forest @ auto probes


def test_uneven_query_count(mesh, corpus):
    base = ANNIndex.build_index(4, 24, corpus, np.arange(len(corpus)))
    sharded = ShardedANNIndex(base, mesh=mesh)
    res = sharded.search_batch(corpus[:13], 5)
    assert res.ids.shape == (13, 5)
    assert (res.ids[:, 0] == np.arange(13)).all()  # self-hit


def test_add_then_search(mesh, corpus):
    base = ANNIndex.build_index(4, 24, corpus[:-1],
        np.arange(len(corpus) - 1))
    sharded = ShardedANNIndex(base, mesh=mesh)
    sharded.add(corpus[-1], 9999)
    res = sharded.search_batch(corpus[-1:], 3)
    assert res.ids[0, 0] == 9999


def test_roundtrip(tmp_path, mesh, corpus):
    sharded = ShardedANNIndex.build_index(3, 24, corpus, mesh=mesh,
        config=LSHConfig(num_trees=3, max_node_size=24, seed=2))
    p = str(tmp_path / "slsh.index")
    sharded.save_index(p)
    re = ShardedANNIndex.load_index(p, mesh=mesh)  # dim inferred
    q = corpus[:8]
    np.testing.assert_array_equal(
        sharded.search_batch(q, 5).ids, re.search_batch(q, 5).ids
    )
