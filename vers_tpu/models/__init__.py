from vers_tpu.models.candidates import (
    DistanceCandidatePair,
    AdjacencyItem,
    SearchResult,
)

__all__ = ["DistanceCandidatePair", "AdjacencyItem", "SearchResult"]
