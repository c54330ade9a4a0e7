"""Device mesh helpers — the "distributed backend" of vers_tpu.

The reference is single-process shared-memory (rayon work stealing +
DashSet, see SURVEY §2); its scale-out axis is absent. Here the corpus
axis ``n`` shards across a 1-D `jax.sharding.Mesh` over ICI: each chip
scans its rows with the same fused kernels, and cross-chip merges ride
XLA collectives (`psum` for k-means reductions, `all_gather` for
top-k candidate merges).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None, axis: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_rows(
    x: np.ndarray, mesh: Mesh, axis: str = SHARD_AXIS
) -> Tuple[jax.Array, jax.Array]:
    """Pad axis 0 to a multiple of the mesh size and place the array
    row-sharded. Returns (sharded (n_pad, ...), per-shard valid counts
    (n_shards,) int32 row-sharded as (1,) each)."""
    n_shards = mesh.shape[axis]
    n = x.shape[0]
    per = -(-n // n_shards)
    # round per-shard rows up to the f32 sublane so local scans tile
    per = ((per + 7) // 8) * 8
    n_pad = per * n_shards
    pad = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
    xp = np.pad(np.asarray(x), pad)
    counts = np.asarray(
        [max(0, min(per, n - s * per)) for s in range(n_shards)], dtype=np.int32
    )
    xs = jax.device_put(xp, NamedSharding(mesh, P(axis)))
    cs = jax.device_put(counts, NamedSharding(mesh, P(axis)))
    return xs, cs
