"""Logging/observability — the reference has println! only (SURVEY §5);
we provide a standard logger plus per-index stats dicts."""

from __future__ import annotations

import logging
import os


def get_logger(name: str = "vers_tpu") -> logging.Logger:
    log = logging.getLogger(name)
    if not log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        log.addHandler(handler)
        log.setLevel(os.environ.get("VERS_LOG", "WARNING").upper())
    return log


def index_stats(index) -> dict:
    """Small observability dict per index (includes the reference's
    `get_num_nodes_in_layers` parity for HNSW, `hnsw.rs:480-485`)."""
    stats = {"type": type(index).__name__, "dim": getattr(index, "dim", None)}
    if hasattr(index, "get_num_nodes_in_layers"):
        stats["num_nodes_per_layer"] = index.get_num_nodes_in_layers()
    if hasattr(index, "num_centroids"):
        stats["num_centroids"] = index.num_centroids
        if getattr(index, "_ids", None) is not None:
            stats["cluster_sizes"] = [len(c) for c in index._ids]
        elif getattr(index, "_layout", None) is not None:
            # device-built index: sizes known without host materialization
            sizes = index._layout.get(
                "true_sizes_host", index._layout["sizes_host"]
            )  # slacked layouts keep capacities in sizes_host
            stats["cluster_sizes"] = [int(s) for s in sizes]
    if hasattr(index, "_trees"):
        stats["num_trees"] = len(index._trees)
        stats["buckets_per_tree"] = [t.num_buckets for t in index._trees]
    return stats
