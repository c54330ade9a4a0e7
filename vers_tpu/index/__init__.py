from vers_tpu.index.base import Index
from vers_tpu.index.flat import FlatIndex
from vers_tpu.index.ivfflat import IVFFlatIndex
from vers_tpu.index.lsh import ANNIndex
from vers_tpu.index.hnsw import HNSWIndex

__all__ = ["Index", "FlatIndex", "IVFFlatIndex", "ANNIndex", "HNSWIndex"]
