"""PartitionedANNIndex on the 8-virtual-device CPU mesh: one forest per
shard (capacity scale-out), queries replicated, all_gather top-k merge.
VERDICT r2 item #1 ("do LSH the same way")."""

import numpy as np
import jax
import pytest

from vers_tpu.index.lsh import ANNIndex
from vers_tpu.parallel.lsh_partitioned import PartitionedANNIndex
from vers_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from vers_tpu.utils.harness import exhaustive_batch, recall_at_k

# heavy tier (wave builds / shard_map surfaces / subprocess dryruns):
# skipped by `make test`, run by `make test-all` (VERDICT r3 #7)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(12)
    centers = rng.normal(size=(40, 20)).astype(np.float32) * 3
    assign = rng.integers(0, 40, size=1600)
    x = (centers[assign] + rng.normal(size=(1600, 20)) * 0.4).astype(np.float32)
    return x


@pytest.fixture(scope="module")
def built(mesh, corpus):
    return PartitionedANNIndex.build_index(4, 32, corpus, mesh=mesh)


def test_capacity_partitioned(built, mesh, corpus):
    cache = built._ensure_device_cache()
    n_shards = mesh.shape[SHARD_AXIS]
    # shared-corpus layout (VERDICT r4 #1): each chip holds its ~n/S
    # corpus rows exactly ONCE (128-row padded), NOT stacked x T trees
    assert cache["pern"] <= -(-corpus.shape[0] // n_shards // 128) * 128
    shard_shapes = {s.data.shape for s in cache["corpus"].addressable_shards}
    assert len(shard_shapes) == 1
    assert next(iter(shard_shapes))[0] == cache["pern"]
    assert all(len(s._ids) == 200 for s in built.shards)


def test_recall_vs_single_forest(built, mesh, corpus):
    q = corpus[:128]
    truth = exhaustive_batch(corpus, q, 10)
    rec_part = recall_at_k(built.search_batch(q, 10).ids, truth)
    single = ANNIndex.build_index(4, 32, corpus, np.arange(len(corpus)))
    rec_single = recall_at_k(single.search_batch(q, 10).ids, truth)
    # each shard's forest is searched in full at the same probe policy:
    # the union must not trail the single forest materially
    assert rec_part >= rec_single - 0.01, (rec_part, rec_single)
    assert rec_part > 0.7, rec_part


def test_multiprobe_and_device_ids(built, corpus):
    q = corpus[:32]
    res1 = built.search_batch(q, 5, probes_per_tree=1)
    res2 = built.search_batch(q, 5, probes_per_tree=2)
    assert (res1.ids[:, 0] == np.arange(32)).all()  # self-hit
    truth = exhaustive_batch(corpus, q, 5)
    assert recall_at_k(res2.ids, truth) >= recall_at_k(res1.ids, truth)
    _, dev_ids = built.search_batch_device(q, 5)
    assert (np.asarray(dev_ids)[:, 0] == np.arange(32)).all()


def test_single_query_parity_path(built, corpus):
    res = built.search_approximate(corpus[3], 10)
    assert len(res) == 10
    assert res[0][0] == 3
    assert res[0][1] == pytest.approx(0.0, abs=1e-4)


def test_roundtrip_and_add(tmp_path, mesh, corpus):
    idx = PartitionedANNIndex.build_index(4, 32, corpus[:800], mesh=mesh)
    p = str(tmp_path / "plsh.index")
    idx.save_index(p)
    re = PartitionedANNIndex.load_index(p, mesh=mesh)
    q = corpus[:16]
    np.testing.assert_array_equal(
        idx.search_batch(q, 5).ids, re.search_batch(q, 5).ids
    )
    # shard files are standard single-file layouts
    one = ANNIndex.load_index(p + ".shard0")
    assert one.dim == corpus.shape[1]
    # add routes to the emptiest shard and is findable
    probe = corpus[900]
    re.add(probe, 777_000)
    res = re.search_batch(probe[None], 3)
    assert res.ids[0, 0] == 777_000


def test_external_ids(mesh, corpus):
    ids = np.arange(800, dtype=np.int64) * 3 + 5_000_000
    idx = PartitionedANNIndex.build_index(
        4, 32, corpus[:800], vector_ids=ids, mesh=mesh
    )
    res = idx.search_batch(corpus[:20], 5)
    assert (res.ids[:, 0] == ids[:20]).all()
