import numpy as np
import pytest

from vers_tpu.index.lsh import ANNIndex
from vers_tpu.utils.harness import exhaustive_batch, recall_at_k


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(800, 16)).astype(np.float32)
    ids = np.arange(800)
    idx = ANNIndex.build_index(4, 40, x, ids)
    return x, idx


def test_build_dedup_and_buckets(built):
    x, idx = built
    assert idx._values.shape[0] == 800  # no duplicates in random data
    for tree in idx._trees:
        assert tree.num_buckets >= 1
        # every vector in exactly one leaf
        assert (tree.leaf_of_vec >= 0).all()
        sizes = [len(m) for m in tree.members]
        assert sum(sizes) == 800


def test_dedup_drops_duplicates():
    x = np.ones((10, 8), np.float32)
    x[5:] = 2.0
    idx = ANNIndex.build_index(2, 4, x, np.arange(10))
    assert idx._values.shape[0] == 2
    assert list(idx._ids) == [0, 5]


def test_search_batch_recall(built):
    x, idx = built
    rng = np.random.default_rng(8)
    q = x[rng.integers(0, 800, size=32)]
    truth = exhaustive_batch(x, q, 10)
    res = idx.search_batch(q, 10)
    # forest probes 4 leaves of ~40: recall should be decent for
    # self-queries (the query's own row always hits its main leaf)
    assert recall_at_k(res.ids[:, :1], truth[:, :1]) == 1.0
    assert recall_at_k(res.ids, truth) > 0.3


def test_search_single_parity_deficit_rule(built):
    x, idx = built
    q = x[11]
    res = idx.search_approximate(q, 10)
    assert len(res) == 10
    assert res[0][0] == 11 and res[0][1] < 1e-6
    d = [r[1] for r in res]
    assert d == sorted(d)


def test_add_appends(built):
    x, idx = built
    v = np.random.default_rng(9).normal(size=16).astype(np.float32)
    idx.add(v, 4242)
    got = idx.search_approximate(v, 1)
    assert got[0][0] == 4242
    got_b = idx.search_batch(v[None], 1)
    assert got_b.ids[0, 0] == 4242


def test_roundtrip(tmp_path, built):
    x, idx = built
    p = str(tmp_path / "lsh.index")
    idx.save_index(p)
    re = ANNIndex.load_index(p, dim=16)
    assert re.max_node_size == idx.max_node_size
    assert len(re._trees) == len(idx._trees)
    np.testing.assert_allclose(re._values, idx._values)
    q = x[3]
    assert re.search_approximate(q, 10) == idx.search_approximate(q, 10)
    res_orig = idx.search_batch(x[:8], 5)
    res_re = re.search_batch(x[:8], 5)
    np.testing.assert_array_equal(res_orig.ids, res_re.ids)


def test_add_overflow_triggers_rebuild():
    rng = np.random.default_rng(33)
    x = rng.normal(size=(30, 8)).astype(np.float32)
    idx = ANNIndex.build_index(2, 4, x, np.arange(30))
    # overflow several leaves
    for i in range(12):
        idx.add(rng.normal(size=8).astype(np.float32), 100 + i)
    assert idx._dirty_trees  # at least one leaf overflowed
    res = idx.search_batch(x[:4], 5)  # triggers lazy rebuild
    assert not idx._dirty_trees
    for tree in idx._trees:
        assert tree.leaf_of_vec.shape[0] == 42
        sizes = [len(m) for m in tree.members]
        # rebuilt trees respect the leaf bound again (bounded depth may
        # leave rare oversized leaves; none expected at this scale)
        assert max(sizes) <= 4 + 1
    assert res.ids.shape == (4, 5)
