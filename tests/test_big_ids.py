"""External ids are u64 in the bincode formats (`models.rs` /
`lsh.rs` serde layouts), so ids >= 2**31 are valid. The device-resident
search paths carry an int32 id map that cannot represent them: they
must raise (not silently wrap), and the host `search_batch` wrappers
must return the exact int64 ids."""

import numpy as np
import pytest

BIG = np.int64(2**31)


def _corpus(n=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_lsh_big_ids():
    from vers_tpu.index.lsh import ANNIndex

    x = _corpus()
    ids = BIG + 3 * np.arange(len(x), dtype=np.int64)
    idx = ANNIndex.build_index(2, 8, x, ids)
    res = idx.search_batch(x[:4], 3)
    assert res.ids.dtype == np.int64
    for i in range(4):
        assert ids[i] in res.ids[i]
    with pytest.raises(ValueError, match="int32"):
        idx.search_batch_device(x[:4], 3)


def test_lsh_small_ids_device_path_still_works():
    from vers_tpu.index.lsh import ANNIndex

    x = _corpus()
    ids = np.arange(len(x), dtype=np.int64)
    idx = ANNIndex.build_index(2, 8, x, ids)
    d, i = idx.search_batch_device(x[:4], 3)
    assert np.asarray(i).shape == (4, 3)


def test_hnsw_big_ids():
    from vers_tpu.index.hnsw import HNSWIndex

    x = _corpus(n=48)
    ids = BIG + 7 * np.arange(len(x), dtype=np.int64)
    idx = HNSWIndex(ef_construction=16, ef_search=16, num_layers=3,
                    num_neighbours=4)
    for vec, vid in zip(x, ids):
        idx.add(vec, int(vid))
    res = idx.search_batch(x[:4], 3)
    assert res.ids.dtype == np.int64
    hits = sum(ids[i] in res.ids[i] for i in range(4))
    assert hits >= 3  # HNSW is approximate; self-hit should dominate
    with pytest.raises(ValueError, match="int32"):
        idx.search_batch_device(x[:4], 3)


def test_sharded_flat_big_ids(mesh=None):
    from vers_tpu.parallel.sharded_index import ShardedFlatIndex

    x = _corpus()
    ids = BIG + np.arange(len(x), dtype=np.int64)
    idx = ShardedFlatIndex.build_index(x, ids=ids)
    res = idx.search_batch(x[:4], 3)
    assert res.ids.dtype == np.int64
    for i in range(4):
        assert res.ids[i][0] == ids[i]  # exact search: self is rank 0
    with pytest.raises(ValueError, match="int32"):
        idx.search_batch_device(x[:4], 3)
