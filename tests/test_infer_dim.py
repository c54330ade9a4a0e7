"""load_index without dim= — inference from file structure (parity
with the reference's no-arg load, where N is a const generic,
`base.rs:45-58`)."""

import numpy as np
import pytest

from vers_tpu.index.flat import FlatIndex
from vers_tpu.index.hnsw import HNSWIndex
from vers_tpu.index.ivfflat import IVFFlatIndex
from vers_tpu.index.lsh import ANNIndex


@pytest.mark.parametrize("dim", [8, 17, 300])
def test_flat(tmp_path, dim):
    x = np.random.default_rng(0).normal(size=(50, dim)).astype(np.float32)
    idx = FlatIndex.build_index(x)
    p = str(tmp_path / "f.index")
    idx.save_index(p)
    re = FlatIndex.load_index(p)
    assert re.dim == dim
    np.testing.assert_array_equal(
        re.search_batch(x[:4], 3).ids, idx.search_batch(x[:4], 3).ids
    )


@pytest.mark.parametrize("dim", [8, 17])
def test_ivfflat(tmp_path, dim):
    x = np.random.default_rng(1).normal(size=(120, dim)).astype(np.float32)
    idx = IVFFlatIndex.build_index(4, 1, 5, x)
    p = str(tmp_path / "i.index")
    idx.save_index(p)
    re = IVFFlatIndex.load_index(p)
    assert re.dim == dim
    assert re.search_approximate(x[0], 5) == idx.search_approximate(x[0], 5)


@pytest.mark.parametrize("dim", [8, 17])
def test_lsh(tmp_path, dim):
    x = np.random.default_rng(2).normal(size=(90, dim)).astype(np.float32)
    idx = ANNIndex.build_index(3, 10, x, np.arange(90))
    p = str(tmp_path / "l.index")
    idx.save_index(p)
    re = ANNIndex.load_index(p)
    assert re.dim == dim
    assert re.search_approximate(x[5], 5) == idx.search_approximate(x[5], 5)


def test_lsh_all_leaf_forest(tmp_path):
    # corpus smaller than max_node_size: every tree is a single leaf
    x = np.random.default_rng(3).normal(size=(6, 9)).astype(np.float32)
    idx = ANNIndex.build_index(2, 50, x, np.arange(6))
    p = str(tmp_path / "leaf.index")
    idx.save_index(p)
    re = ANNIndex.load_index(p)
    assert re.dim == 9


@pytest.mark.parametrize("dim", [8, 33])
def test_hnsw(tmp_path, dim):
    x = np.random.default_rng(4).normal(size=(60, dim)).astype(np.float32)
    idx = HNSWIndex.build_index(3, 16, 16, 4, x)
    p = str(tmp_path / "h.index")
    idx.save_index(p)
    re = HNSWIndex.load_index(p)
    assert re.dim == dim
    assert re.search_approximate(x[0], 5) == idx.search_approximate(x[0], 5)


def test_wrong_layout_raises(tmp_path):
    p = str(tmp_path / "junk.index")
    with open(p, "wb") as fp:
        fp.write(b"\x03\x00\x00\x00\x00\x00\x00\x00junkjunk")
    with pytest.raises(ValueError):
        FlatIndex.load_index(p)


def test_dim_override_still_wins(tmp_path):
    x = np.random.default_rng(5).normal(size=(20, 12)).astype(np.float32)
    idx = FlatIndex.build_index(x)
    p = str(tmp_path / "f12.index")
    idx.save_index(p)
    re = FlatIndex.load_index(p, dim=12)
    assert re.dim == 12
