"""Mesh/sharding layer: device meshes, graph partitioning, halo exchange."""

from gigl_tpu.parallel.feature_lookup import (
    request_capacity,
    routed_gather,
    routed_sample_neighbors,
)
from gigl_tpu.parallel.halo import (
    RingSchedule,
    build_ring_schedule,
    put_ring_schedule,
    ring_sharded_aggregate,
    ring_spmm,
)
from gigl_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharded,
    initialize_distributed,
    make_mesh,
    put_data_sharded,
    put_replicated,
    replicated,
)
from gigl_tpu.parallel.partition import (
    GraphPartition,
    PartitionBook,
    minimal_uint_dtype,
    partition_edges,
    partition_graph,
    shard_features_rowwise,
    shard_graph_features,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "GraphPartition",
    "PartitionBook",
    "RingSchedule",
    "build_ring_schedule",
    "data_sharded",
    "initialize_distributed",
    "make_mesh",
    "minimal_uint_dtype",
    "partition_edges",
    "partition_graph",
    "put_data_sharded",
    "put_replicated",
    "put_ring_schedule",
    "replicated",
    "request_capacity",
    "ring_sharded_aggregate",
    "ring_spmm",
    "routed_gather",
    "routed_sample_neighbors",
    "shard_features_rowwise",
    "shard_graph_features",
]
