"""Distributed Lloyd k-means: per-shard fused assignment+accumulation
(`vers_tpu.ops.kmeans.partial_sums`) + `psum` of (sums, counts, cost)
across the mesh — the multi-chip version of IVFFlat's build
(`vers/src/indexes/ivfflat.rs:73-100`, whose parallelism was a rayon
pool on one host).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vers_tpu.core import bitwise_equal
from vers_tpu.ops.kmeans import centroids_from_sums, partial_sums
from vers_tpu.parallel.mesh import SHARD_AXIS


def _psum_partials(mesh: Mesh, axis: str, chunk_size: int):
    def local(x, nv, centroids):
        sums, counts, cost = partial_sums(x, nv[0], centroids, chunk_size)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        cost = jax.lax.psum(cost, axis)
        return sums, counts, cost

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )


def sharded_lloyd_step(
    data_sharded: jax.Array,
    counts_sharded: jax.Array,
    centroids: jax.Array,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
    chunk_size: int = 65536,
):
    """One global Lloyd iteration. Returns (new_centroids, cost)."""
    sums, counts, cost = jax.jit(_psum_partials(mesh, axis, chunk_size))(
        data_sharded, counts_sharded, centroids
    )
    return centroids_from_sums(sums, counts), cost


def sharded_build_kmeans(
    key,
    data_sharded: jax.Array,
    counts_sharded: jax.Array,
    k: int,
    max_iterations: int,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
    chunk_size: int = 65536,
):
    """Full distributed Lloyd run with the reference's bitwise
    convergence rule (`ivfflat.rs:84-93`). Host-orchestrated loop;
    every iteration is one jitted sharded step. Returns (centroids,
    cost)."""
    import numpy as np

    n_pad, d = data_sharded.shape
    counts_h = np.asarray(counts_sharded)
    per = n_pad // counts_h.shape[0]
    # init from VALID rows only (shards are padded independently)
    valid_rows = np.concatenate(
        [s * per + np.arange(c) for s, c in enumerate(counts_h)]
    )
    pick = jax.random.randint(key, (k,), 0, max(len(valid_rows), 1))
    idx = jnp.asarray(valid_rows, jnp.int32)[pick]
    centroids = jnp.asarray(data_sharded)[idx]

    cost = jnp.inf
    for _ in range(max_iterations):
        new_centroids, cost = sharded_lloyd_step(
            data_sharded, counts_sharded, centroids, mesh, axis, chunk_size
        )
        if bool(bitwise_equal(centroids, new_centroids)):
            break
        centroids = new_centroids
    _, final_cost = sharded_lloyd_step(
        data_sharded, counts_sharded, centroids, mesh, axis, chunk_size
    )
    return centroids, final_cost
