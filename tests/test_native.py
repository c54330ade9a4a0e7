"""Native C++ IO runtime (`vers_tpu/native`) parity tests.

The native library replaces the Python `.vec` parser and the HNSW
bincode reader byte-for-byte; these tests pin that equivalence. They
skip if the toolchain is unavailable (the Python fallback is itself
covered by test_bincode.py / test_harness.py).
"""

import os
import tempfile

import numpy as np
import pytest

from vers_tpu import native
from vers_tpu.index.hnsw import HNSWIndex
from vers_tpu.utils import data

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_parse_vec_matches_python(tmp_path):
    words = ["king", "queen", "naïve", "héllo", "x"]
    rng = np.random.default_rng(0)
    embs = rng.normal(size=(5, 8)).astype(np.float32)
    p = str(tmp_path / "t.vec")
    data.write_vec_file(p, words, embs)

    w_nat, e_nat = native.parse_vec(p, 8)
    # Python reference path (bypass the native fast path)
    w_py, e_py = [], []
    with open(p, encoding="utf-8") as fp:
        fp.readline()
        for line in fp:
            parts = line.rstrip("\n").split(" ")
            w_py.append(parts[0])
            e_py.append(np.asarray(parts[1:9], dtype=np.float32))
    assert w_nat == w_py
    np.testing.assert_allclose(e_nat, np.stack(e_py), rtol=1e-6)


def test_parse_vec_no_header_max_rows(tmp_path):
    words = [f"w{i}" for i in range(10)]
    embs = np.arange(40, dtype=np.float32).reshape(10, 4)
    p = str(tmp_path / "nh.vec")
    data.write_vec_file(p, words, embs, header=False)
    w, e = native.parse_vec(p, 4, header=False, max_rows=3)
    assert w == words[:3]
    np.testing.assert_allclose(e, embs[:3], rtol=1e-6)


def test_parse_vec_skips_short_lines(tmp_path):
    p = str(tmp_path / "bad.vec")
    with open(p, "w") as fp:
        fp.write("3 4\n")
        fp.write("good 1 2 3 4\n")
        fp.write("short 1 2\n")          # too few dims -> skipped
        fp.write("\n")                    # blank -> skipped
        fp.write("also_good 5 6 7 8\n")
    w, e = native.parse_vec(p, 4)
    assert w == ["good", "also_good"]
    np.testing.assert_allclose(e, [[1, 2, 3, 4], [5, 6, 7, 8]])


def test_parse_vec_missing_file():
    with pytest.raises(FileNotFoundError):
        native.parse_vec("/nonexistent/nope.vec", 4)


def _build_small_hnsw(n=60, d=16, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return HNSWIndex.build_index(
        num_layers=4, ef_construction=16, ef_search=8, num_neighbours=4,
        vectors=x,
    ), x


def test_hnsw_native_load_matches_python(tmp_path, monkeypatch):
    idx, x = _build_small_hnsw()
    p = str(tmp_path / "h.index")
    idx.save_index(p)

    nat = HNSWIndex.load_index(p, dim=16)
    # force the Python reader for the reference decode
    import vers_tpu.native as nmod

    monkeypatch.setattr(nmod, "hnsw_scan", lambda *a, **k: None)
    py = HNSWIndex.load_index(p, dim=16)

    assert nat.ef_construction == py.ef_construction
    assert nat.ef_search == py.ef_search
    assert nat.num_neighbours == py.num_neighbours
    assert nat.layer_multiplier == pytest.approx(py.layer_multiplier)
    assert len(nat.layers) == len(py.layers)
    for ln, lp in zip(nat.layers, py.layers):
        assert set(ln.adjacency) == set(lp.adjacency)
        for nid in lp.adjacency:
            a, b = ln.adjacency[nid], lp.adjacency[nid]
            assert a.neighbours == b.neighbours
            assert sorted(a._heap) == sorted(b._heap)
    # vector table parity
    assert nat._id_row.keys() == py._id_row.keys()
    for nid in py._id_row:
        np.testing.assert_array_equal(
            nat._vecs[nat._id_row[nid]], py._vecs[py._id_row[nid]]
        )
    # observable behavior: identical single-query results
    q = x[0] + 0.01
    assert nat.search_approximate(q, 5) == py.search_approximate(q, 5)


def test_hnsw_native_truncated_file(tmp_path):
    idx, _ = _build_small_hnsw(n=30)
    p = str(tmp_path / "h.index")
    idx.save_index(p)
    blob = open(p, "rb").read()
    with open(p, "wb") as fp:
        fp.write(blob[: len(blob) // 2])
    with pytest.raises(EOFError):
        HNSWIndex.load_index(p, dim=16)
