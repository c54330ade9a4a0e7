import numpy as np
import pytest

from vers_tpu.index.hnsw import HNSWIndex
from vers_tpu.utils.harness import exhaustive_batch, recall_at_k


def _normed(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(11)
    x = _normed(rng, 400, 16)
    idx = HNSWIndex.build_index(4, 32, 16, 8, x, seed=0)
    return x, idx


def test_layers_populated(built):
    x, idx = built
    nodes = idx.get_num_nodes_in_layers()
    assert nodes[0] == 400  # every node reaches layer 0
    assert all(a >= b for a, b in zip(nodes, nodes[1:]))  # decaying occupancy
    assert nodes[-1] >= 1


def test_search_single_quality(built):
    x, idx = built
    # cosine ground truth
    sims = x @ x[5]
    truth = set(np.argsort(-sims)[:10])
    res = idx.search_approximate(x[5], 10)
    assert len(res) == 10
    got = set(r[0] for r in res)
    assert len(got & truth) >= 7
    assert res[0][0] == 5 and res[0][1] < 1e-5
    d = [r[1] for r in res]
    assert d == sorted(d)


def test_search_batch_matches_quality(built):
    x, idx = built
    q = x[:64]
    res = idx.search_batch(q, 10)
    truth_ids = np.argsort(-(q @ x.T), axis=1)[:, :10]
    assert recall_at_k(res.ids, truth_ids) > 0.8
    assert res.ids[3, 0] == 3


def test_single_layer_quirk():
    # num_layers == 1 -> reference returns no results (hnsw.rs:526)
    rng = np.random.default_rng(12)
    x = _normed(rng, 20, 8)
    idx = HNSWIndex.build_index(1, 16, 8, 4, x)
    assert idx.search_approximate(x[0], 5) == []
    r = idx.search_batch(x[:2], 5)
    assert (r.ids == -1).all()


def test_query_beam_knobs(built):
    # beam_expand / beam_steps are observable config knobs: a generous
    # cap must not hurt recall, and expand=8 must keep quality.
    import dataclasses

    x, idx = built
    q = x[:64]
    truth_ids = np.argsort(-(q @ x.T), axis=1)[:, :10]
    base_cfg = idx.config
    try:
        for e, cap in ((8, None), (4, 64), (8, 24)):
            idx.config = dataclasses.replace(
                base_cfg, beam_expand=e, beam_steps=cap
            )
            res = idx.search_batch(q, 10)
            assert recall_at_k(res.ids, truth_ids) > 0.8, (e, cap)
            assert res.ids[3, 0] == 3
    finally:
        idx.config = base_cfg


def test_add_after_build(built):
    x, idx = built
    rng = np.random.default_rng(13)
    v = _normed(rng, 1, 16)[0]
    idx.add(v, 4000)
    res = idx.search_approximate(v, 3)
    assert res[0][0] == 4000


def test_roundtrip(tmp_path, built):
    x, idx = built
    p = str(tmp_path / "hnsw.index")
    idx.save_index(p)
    re = HNSWIndex.load_index(p, dim=16)
    assert re.get_num_nodes_in_layers() == idx.get_num_nodes_in_layers()
    assert re.ef_search == idx.ef_search
    assert abs(re.layer_multiplier - idx.layer_multiplier) < 1e-6
    # decoded graph gives identical searches
    for probe in (0, 7, 99):
        assert re.search_approximate(x[probe], 10) == idx.search_approximate(
            x[probe], 10
        )


def test_build_index_device():
    # fully device-resident build: identical search quality to the
    # host-input batched build; save/add work via lazy host download
    import jax.numpy as jnp

    from vers_tpu.core import pad_rows

    rng = np.random.default_rng(7)
    n, d = 500, 16
    x = _normed(rng, n, d)
    corpus, _ = pad_rows(jnp.asarray(x), 128)
    idx = HNSWIndex.build_index_device(4, 32, 32, 8, corpus, n_valid=n, seed=0)
    assert idx.get_num_nodes_in_layers()[0] == n
    q = x[:32]
    truth_ids = np.argsort(-(q @ x.T), axis=1)[:, :10]
    res = idx.search_batch(q, 10)
    assert recall_at_k(res.ids, truth_ids) > 0.85
    assert res.ids[5, 0] == 5
    # host paths trigger the lazy corpus download
    single = idx.search_approximate(x[9], 5)
    assert single[0][0] == 9
    assert np.allclose(idx._vecs[:n], x, atol=1e-6)
    # adds invalidate the device corpus and keep working
    v = _normed(rng, 1, d)[0]
    idx.add(v, 9000)
    assert idx.search_approximate(v, 3)[0][0] == 9000


def test_build_index_device_rejects_unpadded():
    import jax.numpy as jnp

    x = jnp.zeros((100, 8), jnp.float32)
    with pytest.raises(ValueError):
        HNSWIndex.build_index_device(3, 16, 8, 4, x)
