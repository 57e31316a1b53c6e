"""Unit tests for shard sub-components: id counter, pointstore, backup,
config, compare/sort utilities.

Mirrors shard/idcounter_test.go, pointstore tests, utils/backup_test.go,
utils/compare coverage.
"""

import os
import time
import uuid

import pytest

from semadb_tpu.models.point import Point, SearchResult
from semadb_tpu.models.query import SortOption
from semadb_tpu.shard.idcounter import IdCounter
from semadb_tpu.shard import pointstore
from semadb_tpu.store.diskstore import Bucket, DiskStore
from semadb_tpu.utils.backup import backup_with_retention
from semadb_tpu.utils.compare import compare_any, sort_search_results


def test_idcounter_allocation_and_reuse():
    b = Bucket()
    c = IdCounter(b)
    assert c.next_id() == 2  # 0 nil, 1 start reserved
    assert c.next_id() == 3
    c.free_id(2)
    assert c.next_id() == 2  # reuse
    assert c.next_id() == 4
    c.flush()
    # persistence
    c2 = IdCounter(b)
    assert c2.next_id() == 5
    c2.free_id(3)
    c2.flush()
    c3 = IdCounter(b)
    assert c3.next_id() == 3


def test_pointstore_roundtrip():
    b = Bucket()
    pid = uuid.uuid4()
    sp = pointstore.ShardPoint(Point(id=pid, data=b"hello"), node_id=7)
    pointstore.set_point(b, sp)
    assert pointstore.check_point_exists(b, pid)
    assert pointstore.get_point_node_id_by_uuid(b, pid) == 7
    got = pointstore.get_point_by_node_id(b, 7)
    assert got.point.id == pid and got.point.data == b"hello"
    got2 = pointstore.get_point_by_uuid(b, pid)
    assert got2.node_id == 7
    # without data
    got3 = pointstore.get_point_by_node_id(b, 7, with_data=False)
    assert got3.point.data == b""
    pointstore.delete_point(b, sp)
    assert not pointstore.check_point_exists(b, pid)
    with pytest.raises(Exception):
        pointstore.get_point_by_node_id(b, 7)


def test_backup_retention(tmp_path):
    path = str(tmp_path / "db")
    s = DiskStore(path)
    s.write(lambda bm: bm.get("b").put(b"k", b"v"))
    made = []
    for i in range(5):
        dest = backup_with_retention(s, path, count=3)
        assert dest is not None
        made.append(dest)
        time.sleep(1.1)  # distinct timestamps
    backups = [f for f in os.listdir(tmp_path) if f.endswith(".backup")]
    assert len(backups) == 3  # retention pruned the oldest
    # frequency gate: immediate re-backup skipped
    assert backup_with_retention(s, path, count=3, min_interval=60) is None


def test_compare_any():
    assert compare_any(1, 2) == -1
    assert compare_any(2.5, 2) == 1
    assert compare_any("a", "b") == -1
    assert compare_any(None, 1) == 1  # missing last
    assert compare_any(1, None) == -1
    assert compare_any(None, None) == 0
    assert compare_any(True, False) == 1


def test_sort_search_results_multikey():
    def res(d):
        r = SearchResult(point=None)
        r.decoded_data = d
        return r

    rs = [
        res({"a": 2, "b": "x"}),
        res({"a": 1, "b": "z"}),
        res({"a": 1, "b": "y"}),
        res({"b": "w"}),  # missing a → last
    ]
    sort_search_results(
        rs, [SortOption("a", False), SortOption("b", True)]
    )
    assert [r.decoded_data.get("a") for r in rs] == [1, 1, 2, None]
    assert [r.decoded_data.get("b") for r in rs][:2] == ["z", "y"]  # b desc


def test_config_loading(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        """
debug: true
clusterNode:
  rpcPort: 1234
  servers: [a:1, b:2]
  maxShardPointCount: 99
httpApi:
  httpPort: 4321
  userPlans:
    PRO: {name: PRO, maxCollections: 42}
"""
    )
    from semadb_tpu.utils.config import load_config

    cfg = load_config(str(cfg_file))
    assert cfg.debug is True
    assert cfg.cluster_node.rpc_port == 1234
    assert cfg.cluster_node.servers == ["a:1", "b:2"]
    assert cfg.cluster_node.max_shard_point_count == 99
    assert cfg.http_api.http_port == 4321
    assert cfg.http_api.user_plans["PRO"].max_collections == 42
    # env fallback
    os.environ["SEMADB_CONFIG"] = str(cfg_file)
    try:
        assert load_config().debug is True
    finally:
        del os.environ["SEMADB_CONFIG"]
    with pytest.raises(ValueError):
        load_config("")


def test_grow_policy():
    """Capacity growth: first growth jumps to the floor bucket, then ×4;
    wide rows get a byte-bounded floor; no change when max_id fits."""
    from semadb_tpu.utils.grow import next_capacity

    # fits: unchanged
    assert next_capacity(4096, 4095, 512) == 4096
    # first growth from the tiny initial bucket jumps to the 4096 floor
    assert next_capacity(128, 128, 512) == 4096
    assert next_capacity(128, 200, 512) == 4096
    # past the floor: ×4 steps
    assert next_capacity(4096, 4096, 512) == 16384
    assert next_capacity(16384, 70000, 512) == 262144
    # wide rows (e.g. 1536d = 6144 B): floor bounded by GROW_MIN_BYTES
    cap = next_capacity(128, 129, 6144)
    assert cap * 6144 <= 4 * (2**23)  # within 4x of the byte floor
    assert cap > 129
    # result always holds max_id
    for cur, mid, rb in [(128, 10**6, 512), (4096, 123456, 64)]:
        assert next_capacity(cur, mid, rb) > mid


def test_uuidstrcache_invalidate_during_lookup_not_cached():
    """ADVICE r4 (high): a delete committing + invalidating between the
    cache's fetch and its insert must not leave the PRE-delete UUID cached
    for a node id that a new insert immediately reuses (LIFO free list)."""
    import uuid as uuid_mod

    from semadb_tpu.store.diskstore import DiskStore

    db = DiskStore("")
    cache = pointstore.UuidStrCache()
    old_id = uuid_mod.UUID(int=111)
    new_id = uuid_mod.UUID(int=222)

    def w(bm):
        b = bm.get(pointstore.POINTS_BUCKET_NAME)
        pointstore.set_point(b, pointstore.ShardPoint(Point(id=old_id, data=b"x"), 7))

    db.write(w)

    class RacingBucket:
        """Bucket proxy whose multi_get simulates the interleaving: the
        fetch returns pre-delete state, then the delete commits and
        invalidates BEFORE the cache inserts."""

        def __init__(self, inner):
            self._inner = inner

        def multi_get(self, keys):
            out = self._inner.multi_get(keys)
            # delete commits + reuses the node id, then invalidates
            def w2(bm):
                b = bm.get(pointstore.POINTS_BUCKET_NAME)
                pointstore.delete_point(
                    b, pointstore.ShardPoint(Point(id=old_id, data=b""), 7)
                )
                pointstore.set_point(
                    b, pointstore.ShardPoint(Point(id=new_id, data=b"y"), 7)
                )
            db.write(w2)
            cache.invalidate([7])
            return out

    def r(bm):
        b = bm.get(pointstore.POINTS_BUCKET_NAME)
        got = cache.lookup(RacingBucket(b), [7])
        # The racing lookup itself returns the pre-delete snapshot it
        # fetched (fine: that read began before the delete committed)...
        assert got == [str(old_id)]

    db.read(r)

    # ...but it must NOT have poisoned the cache: a fresh lookup resolves
    # the REUSED id to the new point's UUID.
    def r2(bm):
        b = bm.get(pointstore.POINTS_BUCKET_NAME)
        assert cache.lookup(b, [7]) == [str(new_id)]

    db.read(r2)


def test_shard_write_version_unique_across_reopen(tmp_path):
    """ADVICE r4 (medium): write_version must not collide across a close +
    reopen of the same shard file — the mesh cache compares versions by
    equality, so a counter restarting at 0 could false-match."""
    import uuid as uuid_mod

    from semadb_tpu.models import Collection, IndexSchema, UserPlan
    from semadb_tpu.shard.shard import Shard
    from semadb_tpu.store.diskstore import DiskStore

    col = Collection(
        user_id="u", id="c",
        index_schema=IndexSchema.from_dict(
            {"v": {"type": "vectorFlat", "vectorFlat": {
                "vectorSize": 2, "distanceMetric": "euclidean"}}}
        ),
        user_plan=UserPlan(),
    )
    path = str(tmp_path / "s.db")
    seen = set()
    for _ in range(3):
        db = DiskStore(path)
        sh = Shard(db, col)
        sh.insert_points([Point.from_map({"v": [1.0, 2.0]}, uuid_mod.uuid4())])
        assert sh.write_version not in seen
        seen.add(sh.write_version)
        sh.close()
