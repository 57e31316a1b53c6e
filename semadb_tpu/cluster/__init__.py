"""Cluster layer: rendezvous routing, shard placement/management, RPC mesh."""

from semadb_tpu.cluster.hashing import file_hash, rendezvous_hash  # noqa: F401
from semadb_tpu.cluster.node import (  # noqa: F401
    ClusterNode,
    ClusterNodeConfig,
    FailedPoint,
    FailedRange,
    curate_failed_points,
)
from semadb_tpu.cluster.placement import ShardInfo, distribute_points  # noqa: F401
from semadb_tpu.cluster.shardmgr import ShardManager  # noqa: F401
from semadb_tpu.cluster.sync import sync  # noqa: F401
