"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vers_tpu.ops.kmeans import build_kmeans
from vers_tpu.parallel.kmeans import sharded_build_kmeans, sharded_lloyd_step
from vers_tpu.parallel.mesh import make_mesh, shard_rows
from vers_tpu.parallel.search import sharded_topk
from vers_tpu.utils.harness import exhaustive_batch


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_shard_rows(mesh):
    x = np.arange(100 * 4, dtype=np.float32).reshape(100, 4)
    xs, counts = shard_rows(x, mesh)
    assert xs.shape[0] % 8 == 0
    assert int(np.asarray(counts).sum()) == 100


def test_sharded_topk_exact(mesh, rng):
    x = rng.normal(size=(500, 16)).astype(np.float32)
    q = rng.normal(size=(9, 16)).astype(np.float32)
    xs, counts = shard_rows(x, mesh)
    d, i = sharded_topk(jnp.asarray(q), xs, counts, 10, mesh, chunk_size=64)
    i = np.asarray(i)
    # map padded global ids back to original rows
    per = xs.shape[0] // 8
    counts_h = np.asarray(counts)
    mapping = np.full(xs.shape[0], -1, np.int64)
    orig = 0
    for s in range(8):
        for r in range(counts_h[s]):
            mapping[s * per + r] = orig
            orig += 1
    got = np.where(i >= 0, mapping[np.clip(i, 0, None)], -1)
    truth = exhaustive_batch(x, q, 10)
    for r in range(q.shape[0]):
        assert set(got[r]) == set(truth[r])


def test_sharded_lloyd_matches_single_device(mesh, rng):
    x = rng.normal(size=(300, 8)).astype(np.float32)
    c0 = x[:4].copy()
    xs, counts = shard_rows(x, mesh)
    new_c, cost = sharded_lloyd_step(xs, counts, jnp.asarray(c0), mesh, chunk_size=64)
    # single-device reference
    d2 = ((x[:, None, :] - c0[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(1)
    ref = np.zeros((4, 8), np.float32)
    np.add.at(ref, assign, x)
    cnt = np.bincount(assign, minlength=4)
    ref = np.where(cnt[:, None] > 0, ref / np.maximum(cnt, 1)[:, None], 0.0)
    # Lloyd matmuls run in bf16 (see ops/kmeans.partial_sums)
    np.testing.assert_allclose(np.asarray(new_c), ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(float(cost), d2.min(1).sum(), rtol=1e-2)


def test_sharded_build_kmeans_runs(mesh, rng):
    a = rng.normal(size=(64, 8)).astype(np.float32) + 10
    b = rng.normal(size=(64, 8)).astype(np.float32) - 10
    x = np.concatenate([a, b])
    xs, counts = shard_rows(x, mesh)
    c, cost = sharded_build_kmeans(
        jax.random.PRNGKey(0), xs, counts, 2, 10, mesh, chunk_size=64
    )
    c = np.asarray(c)
    assert np.isfinite(cost)
    got = sorted(c.mean(1).tolist())
    np.testing.assert_allclose(got, [-10, 10], atol=1.5)
