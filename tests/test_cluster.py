"""Cluster layer tests.

Mirrors the reference strategy (SURVEY §4): a single-node cluster exercises
the full routing path because every handler self-routes when it owns the
key — plus a real two-node network test over the msgpack RPC mesh.
"""

import uuid

import numpy as np
import pytest

from semadb_tpu.cluster import (
    ClusterNode,
    ClusterNodeConfig,
    curate_failed_points,
    distribute_points,
    rendezvous_hash,
)
from semadb_tpu.cluster.placement import ShardInfo
from semadb_tpu.models import (
    Collection,
    ExistsError,
    IndexSchema,
    NotFoundError,
    Point,
    QuotaReachedError,
    SearchRequest,
    UserPlan,
)

RNG = np.random.default_rng(9)


def schema():
    return IndexSchema.from_dict(
        {
            "vector": {
                "type": "vectorVamana",
                "vectorVamana": {
                    "vectorSize": 2,
                    "distanceMetric": "euclidean",
                    "searchSize": 36,
                    "degreeBound": 32,
                },
            },
            "n": {"type": "integer"},
        }
    )


def make_node(tmp_path=None, **cfg_kw) -> ClusterNode:
    cfg = ClusterNodeConfig(
        root_dir=str(tmp_path) if tmp_path else "",
        servers=["localhost:0"],
        rpc_port=0,
        shard_timeout=300,
        **cfg_kw,
    )
    node = ClusterNode(cfg)
    # single-node: identity == the only server (no real socket needed)
    node.my_hostname = "localhost:0"
    node.servers = ["localhost:0"]
    return node


def make_points(n, offset=0):
    return [
        Point.from_map(
            {"vector": [float(offset + i), float(offset + i)], "n": offset + i},
            uuid.UUID(int=offset + i + 1),
        )
        for i in range(n)
    ]


def test_rendezvous_hash_stable():
    servers = ["a:1", "b:2", "c:3"]
    r1 = rendezvous_hash("key1", servers, 3)
    r2 = rendezvous_hash("key1", list(reversed(servers)), 3)
    assert r1 == r2  # order-independent
    assert len(rendezvous_hash("key1", servers, 1)) == 1
    assert len(rendezvous_hash("key1", servers, 10)) == 3
    # different keys spread across servers
    owners = {rendezvous_hash(f"k{i}", servers, 1)[0] for i in range(50)}
    assert len(owners) == 3


def test_distribute_points():
    # mirrors cluster/placement_test.go Test_distributePoints
    points = make_points(10)
    created = []

    def create():
        sid = f"s{len(created)}"
        created.append(sid)
        return sid

    # Empty shard list → creates shards as needed, point count cap 4
    a = distribute_points([], points, 10**9, 4, create)
    assert sum(e - s for s, e in a.values()) == 10
    assert len(created) == 3  # 4+4+2
    # Existing partially-filled shard
    created.clear()
    shards = [ShardInfo(id="pre", size=0, point_count=3)]
    a = distribute_points(shards, points, 10**9, 4, create)
    assert a["pre"] == (0, 1)


def test_curate_failed_points():
    ids = [uuid.UUID(int=i) for i in range(5)]
    out = curate_failed_points(ids, {ids[0], ids[2]}, complete=True)
    assert [f.id for f in out] == [ids[1], ids[3], ids[4]]
    assert all(f.error == "not found" for f in out)
    out2 = curate_failed_points(ids, set(), complete=False)
    assert all(f.error == "shard unavailable" for f in out2)


def test_collection_lifecycle():
    node = make_node()
    col = Collection(user_id="u1", id="c1", index_schema=schema(), user_plan=UserPlan())
    node.create_collection(col)
    with pytest.raises(ExistsError):
        node.create_collection(col)
    got = node.get_collection("u1", "c1")
    assert got.id == "c1" and got.user_id == "u1"
    assert [c.id for c in node.list_collections("u1")] == ["c1"]
    assert node.list_collections("u2") == []
    with pytest.raises(NotFoundError):
        node.get_collection("u1", "nope")
    # collection quota
    plan = UserPlan(max_collections=1)
    col2 = Collection(user_id="u1", id="c2", index_schema=schema(), user_plan=plan)
    with pytest.raises(QuotaReachedError):
        node.create_collection(col2)
    node.delete_collection(got)
    with pytest.raises(NotFoundError):
        node.get_collection("u1", "c1")


def test_insert_search_update_delete_roundtrip(tmp_path):
    node = make_node(tmp_path)
    col = Collection(user_id="u1", id="c1", index_schema=schema(), user_plan=UserPlan())
    node.create_collection(col)
    pts = make_points(25)
    failed = node.insert_points(col, pts)
    assert failed == []
    assert len(col.shard_ids) >= 1
    # collection entry was updated with shard ids by CreateShard
    col2 = node.get_collection("u1", "c1")
    assert col2.shard_ids == col.shard_ids

    sr = SearchRequest.from_dict(
        {
            "query": {
                "property": "vector",
                "vectorVamana": {
                    "vector": [7.0, 7.0],
                    "operator": "near",
                    "searchSize": 36,
                    "limit": 5,
                },
            },
            "limit": 5,
            "select": ["*"],
        }
    )
    res = node.search_points(col2, sr)
    assert len(res) == 5
    assert res[0].point.as_map()["n"] == 7

    # update: merge new field into point 7
    up = Point.from_map({"n": 700}, res[0].point.id)
    failed_up = node.update_points(col2, [up])
    assert failed_up == []
    res2 = node.search_points(col2, sr)
    assert res2[0].point.as_map()["n"] == 700

    # update of unknown point reports failure
    ghost = Point.from_map({"n": 1}, uuid.uuid4())
    failed_up2 = node.update_points(col2, [ghost])
    assert len(failed_up2) == 1 and failed_up2[0].error == "not found"

    # delete
    failed_del = node.delete_points(col2, [res[0].point.id])
    assert failed_del == []
    res3 = node.search_points(col2, sr)
    assert res3[0].point.as_map()["n"] != 700


def test_multi_shard_distribution(tmp_path):
    node = make_node(tmp_path, max_shard_point_count=10)
    col = Collection(user_id="u1", id="c1", index_schema=schema(), user_plan=UserPlan())
    node.create_collection(col)
    pts = make_points(25)
    assert node.insert_points(col, pts) == []
    col = node.get_collection("u1", "c1")
    assert len(col.shard_ids) == 3  # 10+10+5
    sr = SearchRequest.from_dict(
        {
            "query": {
                "property": "vector",
                "vectorVamana": {
                    "vector": [0.0, 0.0],
                    "operator": "near",
                    "searchSize": 36,
                    "limit": 10,
                },
            },
            "limit": 10,
            "select": ["*"],
        }
    )
    res = node.search_points(col, sr)
    assert len(res) == 10
    # scatter-gather must find the true global nearest despite sharding
    assert res[0].point.as_map()["n"] == 0
    ns = [r.point.as_map()["n"] for r in res]
    assert ns == sorted(ns)

    # broadcast delete probes all shards
    failed = node.delete_points(col, [pts[0].id, pts[20].id])
    assert failed == []


def test_point_quota(tmp_path):
    node = make_node(tmp_path)
    plan = UserPlan(max_collection_point_count=10)
    col = Collection(user_id="u1", id="c1", index_schema=schema(), user_plan=plan)
    node.create_collection(col)
    with pytest.raises(QuotaReachedError):
        node.insert_points(col, make_points(11))


def test_two_node_network(tmp_path):
    """Real two-node mesh over the msgpack RPC: keys route to their owners."""
    cfg_a = ClusterNodeConfig(root_dir=str(tmp_path / "a"), rpc_host="127.0.0.1", rpc_port=0)
    node_a = ClusterNode(cfg_a)
    node_a.serve()
    cfg_b = ClusterNodeConfig(root_dir=str(tmp_path / "b"), rpc_host="127.0.0.1", rpc_port=0)
    node_b = ClusterNode(cfg_b)
    node_b.serve()
    servers = [node_a.my_hostname, node_b.my_hostname]
    node_a.servers = servers
    node_b.servers = servers
    try:
        col = Collection(
            user_id="u1", id="c1", index_schema=schema(), user_plan=UserPlan()
        )
        node_a.create_collection(col)
        # Visible from both nodes regardless of who owns the metadata
        assert node_b.get_collection("u1", "c1").id == "c1"
        pts = make_points(12)
        assert node_a.insert_points(col, pts) == []
        col = node_b.get_collection("u1", "c1")
        sr = SearchRequest.from_dict(
            {
                "query": {
                    "property": "vector",
                    "vectorVamana": {
                        "vector": [3.0, 3.0],
                        "operator": "near",
                        "searchSize": 36,
                        "limit": 3,
                    },
                },
                "limit": 3,
                "select": ["*"],
            }
        )
        res = node_b.search_points(col, sr)
        assert res[0].point.as_map()["n"] == 3
    finally:
        node_a.close()
        node_b.close()


def test_shardmgr_cleanup_race_with_inflight_request(tmp_path):
    """A cleanup timer that fired but lost the race to a new request must
    not close the shard under it: _cleanup re-checks in_use under the
    manager lock (shardmgr.go's RLock-vs-cleanup discipline)."""
    import threading
    import time as _time

    from semadb_tpu.cluster.shardmgr import ShardManager
    from semadb_tpu.models import Collection, IndexSchema, UserPlan

    col = Collection(
        user_id="u", id="c",
        index_schema=IndexSchema.from_dict({}), user_plan=UserPlan(),
    )
    mgr = ShardManager(str(tmp_path), shard_timeout=0.01)
    mgr.do_with_shard(col, "s1", lambda sh: sh.point_count())
    # Let the timer fire while we immediately re-enter; repeat to catch the
    # interleaving where the blocked cleanup wins ms.lock after our cancel.
    errors = []

    def hammer():
        try:
            for _ in range(60):
                def use(sh):
                    n = sh.point_count()
                    _time.sleep(0.004)
                    return n
                mgr.do_with_shard(col, "s1", use)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    mgr.unload_all()


def test_hbm_budget_evicts_and_reloads(tmp_path):
    """Loading more device indices than the HBM budget holds must evict LRU
    indices (cache/manager.go:39-120 maxCacheSize parity) and transparently
    reload them (snapshot + journal) with correct results on next access."""
    import numpy as np

    from semadb_tpu.cluster.shardmgr import ShardManager
    from semadb_tpu.models import (
        Collection,
        IndexSchema,
        Point,
        SearchRequest,
        UserPlan,
    )

    schema = IndexSchema.from_dict(
        {
            "v": {
                "type": "vectorVamana",
                "vectorVamana": {
                    "vectorSize": 2,
                    "distanceMetric": "euclidean",
                    "searchSize": 36,
                    "degreeBound": 32,
                },
            }
        }
    )
    col = Collection(user_id="u", id="c", index_schema=schema, user_plan=UserPlan())
    # One capacity-128 vamana graph is ~18KB (vectors 1KB + adjacency 16KB
    # + exists); a 40KB budget holds two.
    mgr = ShardManager(str(tmp_path), shard_timeout=300.0, max_cache_size=40_000)

    import uuid as uuid_mod

    def insert(shard, base):
        pts = [
            Point.from_map({"v": [float(base + i), float(base + i)]}, uuid_mod.UUID(int=base + i + 1))
            for i in range(20)
        ]
        shard.insert_points(pts)

    for s in range(4):
        mgr.do_with_shard(col, f"s{s}", lambda sh, s=s: insert(sh, 100 * s))
    assert mgr.hbm_budget.evictions > 0, "budget should have evicted indices"

    # Every shard must still answer correctly (evicted ones reload)
    for s in range(4):
        req = SearchRequest.from_dict(
            {
                "query": {
                    "property": "v",
                    "vectorVamana": {
                        "vector": [100.0 * s + 7, 100.0 * s + 7],
                        "operator": "near",
                        "searchSize": 36,
                        "limit": 1,
                    },
                },
                "limit": 1,
            }
        )
        res = mgr.do_with_shard(col, f"s{s}", lambda sh: sh.search_points(req))
        assert res[0].point.id == uuid_mod.UUID(int=100 * s + 8), f"shard s{s}"
    mgr.unload_all()


def test_hbm_budget_evicts_and_reloads_ivf(tmp_path):
    """Same LRU budget contract for the IVF engine, whose device state now
    carries SOAR copies, slab norms, and (at high dim) a PCA projection —
    eviction must serialize all of it and reload with identical results."""
    import uuid as uuid_mod

    import numpy as np

    from semadb_tpu.cluster.shardmgr import ShardManager
    from semadb_tpu.models import (
        Collection,
        IndexSchema,
        Point,
        SearchRequest,
        UserPlan,
    )

    schema = IndexSchema.from_dict(
        {
            "v": {
                "type": "vectorIVF",
                "vectorIVF": {
                    "vectorSize": 160,  # > PROJ_DIM: projected traversal
                    "distanceMetric": "euclidean",
                    "assignCopies": 2,
                },
            }
        }
    )
    col = Collection(user_id="u", id="c", index_schema=schema, user_plan=UserPlan())
    mgr = ShardManager(str(tmp_path), shard_timeout=300.0, max_cache_size=200_000)
    rng = np.random.default_rng(5)
    vecs = {}

    def insert(shard, base):
        vs = rng.standard_normal((600, 160)).astype(np.float32)
        vecs[base] = vs
        pts = [
            Point.from_map({"v": vs[i].tolist()}, uuid_mod.UUID(int=base + i + 1))
            for i in range(len(vs))
        ]
        shard.insert_points(pts)

    for s in range(3):
        mgr.do_with_shard(col, f"s{s}", lambda sh, s=s: insert(sh, 1000 * (s + 1)))
    assert mgr.hbm_budget.evictions > 0, "budget should have evicted indices"

    for s in range(3):
        base = 1000 * (s + 1)
        req = SearchRequest.from_dict(
            {
                "query": {
                    "property": "v",
                    "vectorIVF": {"vector": vecs[base][7].tolist(), "limit": 1},
                },
                "limit": 1,
            }
        )
        res = mgr.do_with_shard(col, f"s{s}", lambda sh: sh.search_points(req))
        assert res[0].point.id == uuid_mod.UUID(int=base + 8), f"shard s{s}"
    mgr.unload_all()


def test_request_during_timeout_unload_waits_for_close(tmp_path, monkeypatch):
    """VERDICT r4 #4: a request arriving while the idle-timeout cleanup is
    mid-close (a multi-minute compaction at 10M) must WAIT for the close
    and then reload — not open a second Shard handle on the same store
    file while the first is still flushing."""
    import threading
    import time as _time
    import uuid as _uuid

    import numpy as np

    from semadb_tpu.cluster.shardmgr import ShardManager
    from semadb_tpu.models import (
        Collection, IndexSchema, Point, SearchRequest, UserPlan,
    )
    from semadb_tpu.shard.shard import Shard

    schema = IndexSchema.from_dict(
        {"v": {"type": "vectorFlat",
               "vectorFlat": {"vectorSize": 4, "distanceMetric": "euclidean"}}}
    )
    col = Collection(user_id="u", id="c", index_schema=schema, user_plan=UserPlan())
    mgr = ShardManager(str(tmp_path), shard_timeout=0.05)

    closing_started = threading.Event()
    release_close = threading.Event()
    orig_close = Shard.close
    live_handles = []

    def slow_close(self):
        closing_started.set()
        release_close.wait(5.0)  # simulate a long compaction
        orig_close(self)

    monkeypatch.setattr(Shard, "close", slow_close)

    pts = [Point.from_map({"v": [float(i), 0.0, 0.0, 0.0]}, _uuid.UUID(int=i + 1))
           for i in range(8)]
    mgr.do_with_shard(col, "s1", lambda sh: (live_handles.append(sh), sh.insert_points(pts)))
    # let the idle timer fire and reach the slow close
    assert closing_started.wait(5.0)

    got = []

    def request():
        sr = SearchRequest.from_dict(
            {"query": {"property": "v",
                       "vectorFlat": {"vector": [3.0, 0, 0, 0], "limit": 1}},
             "limit": 1}
        )
        def use(sh):
            live_handles.append(sh)
            return sh.search_points(sr)
        got.append(mgr.do_with_shard(col, "s1", use))

    t = threading.Thread(target=request)
    t.start()
    _time.sleep(0.3)
    # the request must still be BLOCKED (close not finished), with only
    # the original Shard handle alive
    assert t.is_alive()
    assert len(live_handles) == 1
    release_close.set()
    t.join(10.0)
    assert not t.is_alive()
    # the request reloaded a FRESH shard and saw the persisted data
    assert len(live_handles) == 2 and live_handles[1] is not live_handles[0]
    assert got and got[0][0].point.id == _uuid.UUID(int=4)
    release_close.set()
    mgr.unload_all()
