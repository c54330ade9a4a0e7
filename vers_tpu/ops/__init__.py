from vers_tpu.ops.distance import (
    pairwise_sq_euclidean,
    pairwise_cosine_distance,
    pairwise_distance,
)
from vers_tpu.ops.topk import topk_smallest, fused_scan_topk

__all__ = [
    "pairwise_sq_euclidean",
    "pairwise_cosine_distance",
    "pairwise_distance",
    "topk_smallest",
    "fused_scan_topk",
]
