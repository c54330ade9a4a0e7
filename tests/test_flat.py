import numpy as np

from vers_tpu.index.flat import FlatIndex
from vers_tpu.utils.harness import exhaustive_batch, search_exhaustive


def test_flat_exact_matches_numpy(rng, tmp_path):
    x = rng.normal(size=(500, 32)).astype(np.float32)
    q = rng.normal(size=(13, 32)).astype(np.float32)
    idx = FlatIndex.build_index(x)
    res = idx.search_batch(q, 10)
    truth = exhaustive_batch(x, q, 10)
    for r in range(q.shape[0]):
        assert set(res.ids[r]) == set(truth[r])

    # single-query parity API
    pairs = idx.search_approximate(q[0], 5)
    ref = search_exhaustive(x, q[0], 5)
    assert [p[0] for p in pairs] == [p[0] for p in ref]
    np.testing.assert_allclose(
        [p[1] for p in pairs], [p[1] for p in ref], rtol=1e-4
    )


def test_flat_add_and_roundtrip(rng, tmp_path):
    x = rng.normal(size=(50, 8)).astype(np.float32)
    idx = FlatIndex.build_index(x)
    new = rng.normal(size=(8,)).astype(np.float32)
    idx.add(new, 777)
    res = idx.search_approximate(new, 1)
    assert res[0][0] == 777
    assert res[0][1] < 1e-5

    path = str(tmp_path / "flat.index")
    idx.save_index(path)
    re = FlatIndex.load_index(path, dim=8)
    res2 = re.search_approximate(new, 1)
    assert res2[0][0] == 777


def test_flat_topk_larger_than_corpus(rng):
    x = rng.normal(size=(5, 4)).astype(np.float32)
    idx = FlatIndex.build_index(x)
    res = idx.search_batch(x[:2], 10)
    assert res.ids.shape == (2, 10)
    assert (res.ids[:, 5:] == -1).all()


def test_flat_engine_options():
    """config.engine routes to the approx / bucket scans; results stay
    near-exact on a small corpus."""
    from vers_tpu.config import FlatConfig

    rng = np.random.default_rng(11)
    x = rng.normal(size=(700, 48)).astype(np.float32)
    exact = FlatIndex.build_index(x).search_batch(x[:32], 10)
    for engine in ("approx", "bucket"):
        idx = FlatIndex.build_index(x, config=FlatConfig(engine=engine))
        got = idx.search_batch(x[:32], 10)
        assert got.ids[0][0] == 0  # self-hit survives every engine
        overlap = sum(
            len(set(exact.ids[i]) & set(got.ids[i])) for i in range(32)
        ) / (32 * 10)
        assert overlap > 0.9, (engine, overlap)
