"""Bucket-min Pallas scan (ops/pallas_bucket.py) vs the exact scan.

Runs in interpret mode on CPU (conftest pins the cpu backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vers_tpu.ops.pallas_bucket import bucket_scan_topk
from vers_tpu.ops.topk import fused_scan_topk


def _data(n, d, q, seed=0, normalized=False):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    qs = rng.normal(size=(q, d)).astype(np.float32)
    if normalized:
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return jnp.asarray(x), jnp.asarray(qs)


def test_exact_when_buckets_cover_rows():
    # chunk=128 -> every bucket holds exactly one row: no collisions,
    # result must match the exact scan 1:1
    x, q = _data(256, 32, 24)
    ed, ei = fused_scan_topk(q, x, 256, 5)
    bd, bi = bucket_scan_topk(
        q, x, 256, 5, chunk_size=128, rescore=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))
    np.testing.assert_allclose(np.asarray(ed), np.asarray(bd), atol=2e-3)


def test_recall_with_collisions():
    # 2048 rows, chunk 256 -> 8 chunks x 128 lanes = 1024 buckets of 2
    # rows each. Recall@10 stays high: a winner is lost only when two
    # top-10 rows share a (chunk, lane) bucket.
    x, q = _data(2048, 48, 64, seed=1)
    ed, ei = fused_scan_topk(q, x, 2048, 10)
    bd, bi = bucket_scan_topk(
        q, x, 2048, 10, chunk_size=256, interpret=True
    )
    truth = np.asarray(ei)
    got = np.asarray(bi)
    hits = sum(
        len(set(truth[i]) & set(got[i])) for i in range(truth.shape[0])
    )
    recall = hits / truth.size
    assert recall > 0.9, recall


def test_n_valid_masks_padding():
    x, q = _data(300, 16, 8)
    xp = jnp.pad(x, ((0, 212), (0, 0)))  # pad to 512 with zero rows
    bd, bi = bucket_scan_topk(
        q, xp, 300, 4, chunk_size=128, rescore=True, interpret=True
    )
    assert int(np.asarray(bi).max()) < 300
    ed, ei = fused_scan_topk(q, x, 300, 4)
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))


def test_cosine_metric():
    x, q = _data(256, 32, 16, normalized=True)
    ed, ei = fused_scan_topk(q, x, 256, 5, metric="cosine")
    bd, bi = bucket_scan_topk(
        q, x, 256, 5, metric="cosine", chunk_size=128, rescore=True,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))
    np.testing.assert_allclose(np.asarray(ed), np.asarray(bd), atol=2e-3)


def test_k_larger_than_valid_rows_pads():
    x, q = _data(6, 16, 4)
    xp = jnp.pad(x, ((0, 122), (0, 0)))
    bd, bi = bucket_scan_topk(q, xp, 6, 10, chunk_size=128, interpret=True)
    bi = np.asarray(bi)
    bd = np.asarray(bd)
    assert (bi[:, 6:] == -1).all()
    assert np.isinf(bd[:, 6:]).all()


def test_no_rescore_ranking_close():
    # bf16 ranking without the f32 rescore: ids overlap must stay high
    x, q = _data(1024, 64, 32, seed=2)
    ed, ei = fused_scan_topk(q, x, 1024, 10)
    bd, bi = bucket_scan_topk(q, x, 1024, 10, chunk_size=128, interpret=True)
    truth = np.asarray(ei)
    got = np.asarray(bi)
    hits = sum(len(set(truth[i]) & set(got[i])) for i in range(truth.shape[0]))
    assert hits / truth.size > 0.9


def test_superchunk_accumulation():
    # force superchunk > 1: 4096 rows, chunk 128 -> 32 chunks; target 512
    # buckets -> superchunk 8 -> 4 flushed superchunks * 128 = 512
    x, q = _data(4096, 32, 16, seed=3)
    ed, ei = fused_scan_topk(q, x, 4096, 10)
    bd, bi = bucket_scan_topk(
        q, x, 4096, 10, chunk_size=128, target_buckets=512,
        rescore=True, interpret=True,
    )
    truth = np.asarray(ei)
    got = np.asarray(bi)
    hits = sum(len(set(truth[i]) & set(got[i])) for i in range(truth.shape[0]))
    assert hits / truth.size > 0.8, hits / truth.size


def test_pallas_topk_values_exact():
    """The streaming value-merge kernel == lax.top_k on (Q, W) inputs,
    including +inf padding and non-multiple widths."""
    from vers_tpu.ops.pallas_topk import pallas_topk_values
    from vers_tpu.ops.topk import topk_smallest

    rng = np.random.default_rng(9)
    vals = rng.normal(size=(40, 700)).astype(np.float32)
    vals[3, 100:] = np.inf  # row with few finite entries
    ids = rng.integers(0, 10_000, size=(40, 700)).astype(np.int32)
    vd, vi = pallas_topk_values(
        jnp.asarray(vals), jnp.asarray(ids), 8,
        query_tile=16, chunk_size=256, interpret=True,
    )
    ed, sel = topk_smallest(jnp.asarray(vals), 8)
    ei = np.take_along_axis(ids, np.asarray(sel), axis=1)
    np.testing.assert_allclose(np.asarray(vd), np.asarray(ed))
    # values equal => the carried ids must match row-wise as SETS per
    # distinct value (tie order may differ between the two algorithms)
    vd_np, vi_np = np.asarray(vd), np.asarray(vi)
    ed_np = np.asarray(ed)
    for r in range(40):
        finite = np.isfinite(ed_np[r])
        assert set(vi_np[r][finite].tolist()) == set(ei[r][finite].tolist())
        assert (vi_np[r][~finite] == -1).all()
