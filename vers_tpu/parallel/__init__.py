from vers_tpu.parallel.mesh import make_mesh, shard_rows
from vers_tpu.parallel.search import sharded_topk
from vers_tpu.parallel.kmeans import sharded_lloyd_step, sharded_build_kmeans

__all__ = [
    "make_mesh",
    "shard_rows",
    "sharded_topk",
    "sharded_lloyd_step",
    "sharded_build_kmeans",
]
