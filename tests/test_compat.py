"""The reference README's Python API (`README.md:83-97`), end to end:
load_wiki -> HNSW(...) -> build_index -> search, plus the LSH/IVFFlat
counterparts and raw-ndarray input."""

import numpy as np

import vers_tpu


def test_readme_flow_hnsw():
    embeddings = vers_tpu.load_wiki()  # synthetic fallback corpus
    hnsw = vers_tpu.HNSW(
        ef_construction=40, num_layers=4, ef_search=16, num_neighbours=8,
        batched_build=False,
    )
    # keep it quick: subset with the royal words in front
    sub = vers_tpu.Embeddings(
        embeddings.words[:400], embeddings.vectors[:400]
    )
    hnsw.build_index(sub)
    results = hnsw.search(sub.get("king"), top_k=10)
    assert len(results) == 10
    words = [w for w, _ in results]
    assert "king" in words
    # royal cluster should dominate the neighbours of "king"
    royal = set(vers_tpu.utils.data.ROYAL_WORDS)
    assert len([w for w in words if w in royal]) >= 5
    dists = [d for _, d in results]
    assert dists == sorted(dists)


def test_readme_flow_ivfflat_ndarray():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 16)).astype(np.float32)
    ivf = vers_tpu.IVFFlat(num_clusters=8, num_attempts=1, max_iterations=5)
    ivf.build_index(x)
    results = ivf.search(x[7], top_k=3)
    assert results[0][0] == 7  # self first; int ids for ndarray input
    assert isinstance(results[0][0], int)
    r = ivf.search_batch(x[:4], 3)
    assert r.ids.shape == (4, 3)


def test_readme_flow_lsh():
    embeddings = vers_tpu.load_wiki()
    sub = vers_tpu.Embeddings(embeddings.words[:300], embeddings.vectors[:300])
    lsh = vers_tpu.LSH(num_trees=4, max_node_size=32)
    lsh.build_index(sub)
    results = lsh.search(sub.get("queen"), top_k=5)
    assert len(results) == 5
    assert results[0][0] == "queen"


def test_embeddings_mapping():
    e = vers_tpu.Embeddings(["a", "b"], np.eye(2, dtype=np.float32))
    assert "a" in e and "c" not in e
    assert len(e) == 2
    np.testing.assert_array_equal(e.get("b"), [0.0, 1.0])
    assert e.word_of(0) == "a"


def test_vers_py_module_functions(tmp_path):
    """Parity with the vers_py module functions
    (`vers-py/src/lib.rs:125-186`): load_wiki_vector 4-tuple,
    test_wiki_ivfflat harness, get_sum toy add."""
    import os
    import numpy as np
    from vers_tpu.compat import get_sum, load_wiki_vector, test_wiki_ivfflat
    from vers_tpu.utils.data import synthetic_words_dataset, write_vec_file

    words, embs = synthetic_words_dataset(n_words=300, dim=32, seed=0)
    path = str(tmp_path / "mini.vec")
    write_vec_file(path, words, embs)

    vectors, w2i, i2w, test_embs = load_wiki_vector(path, dim=32)
    assert "queen" not in w2i and len(test_embs) == 1
    assert abs(float(np.linalg.norm(vectors[0])) - 1.0) < 1e-5

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        out = test_wiki_ivfflat(vectors, w2i, i2w, 8, 1, 5, test_embs)
    finally:
        os.chdir(cwd)
    assert any(w in ("queen", "king", "kings", "royal", "monarch",
                     "empress", "queens", "reign", "emperor", "crown",
                     "prince", "ruler", "kingdom", "princess", "throne")
               for w, _ in out[:3])

    s = get_sum(np.ones(300, np.float32), np.full(300, 2.0, np.float32))
    assert s.shape == (300,) and float(s[0]) == 3.0
