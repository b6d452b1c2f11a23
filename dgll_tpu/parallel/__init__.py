from dgll_tpu.parallel.dp import ShardedDataLoader, make_dp_block_step, stack_block_lists
from dgll_tpu.parallel.gp import (
    make_gp_gcn_train_step,
    make_sharded_spmm,
    shard_partitioned_graph,
)
from dgll_tpu.parallel.mesh import make_mesh, replicated, sharded_dim0
from dgll_tpu.parallel.partition import PartitionedGraph, partition_graph

__all__ = [
    "make_mesh",
    "replicated",
    "sharded_dim0",
    "PartitionedGraph",
    "partition_graph",
    "shard_partitioned_graph",
    "make_sharded_spmm",
    "make_gp_gcn_train_step",
    "ShardedDataLoader",
    "make_dp_block_step",
    "stack_block_lists",
]
