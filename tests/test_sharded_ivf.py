import numpy as np
import pytest

from vers_tpu.parallel.ivf import ShardedIVFFlatIndex
from vers_tpu.parallel.mesh import make_mesh
from vers_tpu.utils.harness import exhaustive_batch, recall_at_k


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(41)
    centers = rng.normal(size=(8, 12)).astype(np.float32) * 5
    assign = rng.integers(0, 8, size=700)
    x = (centers[assign] + rng.normal(size=(700, 12))).astype(np.float32)
    mesh = make_mesh(8)
    idx = ShardedIVFFlatIndex.build_index(8, 2, 10, x, mesh=mesh)
    return x, idx


def test_sharded_build(built):
    x, idx = built
    assert idx.num_centroids == 8
    assert sum(len(v) for v in idx._shard_values) == 700
    assert idx._centroids.shape == (8, 12)


def test_sharded_search_recall(built):
    x, idx = built
    rng = np.random.default_rng(42)
    q = x[rng.integers(0, 700, size=24)] + 0.01 * rng.normal(size=(24, 12)).astype(np.float32)
    truth = exhaustive_batch(x, q, 10)
    res = idx.search_batch(q, 10, nprobe=4)
    assert recall_at_k(res.ids, truth) > 0.9
    assert (np.diff(res.distances, axis=1) >= -1e-5).all()


def test_sharded_roundtrip_and_export(built, tmp_path):
    x, idx = built
    base = str(tmp_path / "sivf")
    idx.save_index(base)
    re = ShardedIVFFlatIndex.load_index(base)
    q = x[:8]
    r1 = idx.search_batch(q, 5, nprobe=2)
    r2 = re.search_batch(q, 5, nprobe=2)
    np.testing.assert_array_equal(r1.ids, r2.ids)

    # single-file reference-format export loads in IVFFlatIndex
    from vers_tpu.index.ivfflat import IVFFlatIndex

    idx.export_single_file(str(tmp_path / "ivf.index"))
    single = IVFFlatIndex.load_index(str(tmp_path / "ivf.index"), dim=12)
    assert single.num_centroids == 8
    res = single.search_approximate(x[0], 5)
    assert len(res) == 5


def test_sharded_add(built):
    x, idx = built
    v = np.random.default_rng(43).normal(size=12).astype(np.float32)
    idx.add(v, 9999)
    res = idx.search_batch(v[None], 1, nprobe=2)
    assert res.ids[0, 0] == 9999
