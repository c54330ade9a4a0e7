from vers_tpu.parallel.mesh import make_mesh, shard_rows
from vers_tpu.parallel.search import sharded_topk
from vers_tpu.parallel.kmeans import sharded_lloyd_step, sharded_build_kmeans
from vers_tpu.parallel.sharded_index import ShardedFlatIndex
from vers_tpu.parallel.ivf import ShardedIVFFlatIndex
from vers_tpu.parallel.hnsw import ShardedHNSWIndex
from vers_tpu.parallel.hnsw_partitioned import PartitionedHNSWIndex
from vers_tpu.parallel.lsh import ShardedANNIndex
from vers_tpu.parallel.lsh_partitioned import PartitionedANNIndex

__all__ = [
    "make_mesh",
    "shard_rows",
    "sharded_topk",
    "sharded_lloyd_step",
    "sharded_build_kmeans",
    "ShardedFlatIndex",
    "ShardedIVFFlatIndex",
    "ShardedHNSWIndex",
    "PartitionedHNSWIndex",
    "ShardedANNIndex",
    "PartitionedANNIndex",
]
