"""Shard placement: greedy fill of points into shards.

Parity reference: cluster/placement.go distributePoints — fill existing
shards in order respecting maxShardSize (bytes) and maxShardPointCount,
creating new shards on demand via callback.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Tuple

from semadb_tpu.models.point import Point


@dataclass
class ShardInfo:
    id: str
    size: int = 0
    point_count: int = 0


def distribute_points(
    shards: List[ShardInfo],
    points: List[Point],
    max_shard_size: int,
    max_shard_point_count: int,
    create_shard_fn: Callable[[], str],
) -> Dict[str, Tuple[int, int]]:
    """Returns shardId → [start, end) range into the sorted points list."""
    assignments: Dict[str, Tuple[int, int]] = {}
    shards = list(shards)
    if not shards and points:
        shards.append(ShardInfo(id=create_shard_fn()))
    last = 0
    i = 0
    while i < len(shards):
        shard = shards[i]
        j = last
        running_size = shard.size
        running_count = shard.point_count
        while j < len(points):
            running_size += len(points[j].data) + 16  # uuid bytes
            running_count += 1
            if running_size > max_shard_size or running_count > max_shard_point_count:
                break
            j += 1
        if j > last:
            assignments[shard.id] = (last, j)
        last = j
        if i == len(shards) - 1 and last < len(points):
            shards.append(ShardInfo(id=create_shard_fn()))
        i += 1
    return assignments
