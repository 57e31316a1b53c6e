"""Disk store tests: Python and native C++ backends through one interface.

Mirrors diskstore/diskstore_test.go coverage: bucket CRUD, prefix/range
scans, transactions, persistence, backup — run against both backends.
"""

import os

import pytest

from semadb_tpu.store.diskstore import DiskStore, open_store

try:
    from semadb_tpu.store.native import NativeDiskStore, load_library

    HAVE_NATIVE = load_library() is not None
except Exception:
    HAVE_NATIVE = False

BACKENDS = ["python"] + (["native"] if HAVE_NATIVE else [])


def make_store(backend, path):
    if backend == "python":
        return DiskStore(path)
    return NativeDiskStore(path)


@pytest.mark.parametrize("backend", BACKENDS)
def test_bucket_crud(backend, tmp_path):
    s = make_store(backend, str(tmp_path / "db"))

    def writer(bm):
        b = bm.get("stuff")
        b.put(b"a", b"1")
        b.put(b"b", b"2")
        b.put(b"c", b"3")
        b.delete(b"b")

    s.write(writer)

    def reader(bm):
        b = bm.get("stuff")
        assert b.get(b"a") == b"1"
        assert b.get(b"b") is None
        assert b.get(b"c") == b"3"
        assert list(b.items()) == [(b"a", b"1"), (b"c", b"3")]

    s.read(reader)
    s.close()


@pytest.mark.parametrize("backend", BACKENDS)
def test_scans(backend, tmp_path):
    s = make_store(backend, str(tmp_path / "db"))

    def writer(bm):
        b = bm.get("scan")
        for k in [b"p/1", b"p/2", b"q/1", b"a", b"z"]:
            b.put(k, k)

    s.write(writer)

    def reader(bm):
        b = bm.get("scan")
        assert [k for k, _ in b.prefix_scan(b"p/")] == [b"p/1", b"p/2"]
        assert [k for k, _ in b.range_scan(b"p/1", b"q/1")] == [b"p/1", b"p/2", b"q/1"]

    s.read(reader)
    s.close()


@pytest.mark.parametrize("backend", BACKENDS)
def test_persistence_and_backup(backend, tmp_path):
    path = str(tmp_path / "db")
    s = make_store(backend, path)
    s.write(lambda bm: bm.get("b").put(b"k", b"v" * 100))
    s.backup_to_file(str(tmp_path / "bak"))
    s.close()

    # reopen original
    s2 = open_store(path)
    out = []
    s2.read(lambda bm: out.append(bm.get("b").get(b"k")))
    assert out[0] == b"v" * 100
    s2.close()

    # reopen backup through the auto-dispatching opener
    s3 = open_store(str(tmp_path / "bak"))
    out2 = []
    s3.read(lambda bm: out2.append(bm.get("b").get(b"k")))
    assert out2[0] == b"v" * 100
    s3.close()


@pytest.mark.parametrize("backend", BACKENDS)
def test_read_only_enforced(backend, tmp_path):
    s = make_store(backend, str(tmp_path / "db"))
    with pytest.raises(RuntimeError):
        s.read(lambda bm: bm.get("x").put(b"k", b"v"))
    s.close()


@pytest.mark.skipif(not HAVE_NATIVE, reason="native engine not built")
def test_native_crash_torn_tail(tmp_path):
    """Torn log tails (crash mid-append) are ignored on replay."""
    path = str(tmp_path / "db")
    s = NativeDiskStore(path)
    s.write(lambda bm: bm.get("b").put(b"good", b"1"))
    # Close WITHOUT compaction to keep raw log (use low-level handle close)
    s.lib.sdb_close(s.handle)
    s.handle = None
    with open(path, "ab") as f:
        f.write(b"\x01\xff\xff")  # truncated record
    s2 = NativeDiskStore(path)
    out = []
    s2.read(lambda bm: out.append(bm.get("b").get(b"good")))
    assert out[0] == b"1"
    s2.close()


@pytest.mark.skipif(not HAVE_NATIVE, reason="native engine not built")
def test_native_compaction_shrinks(tmp_path):
    path = str(tmp_path / "db")
    s = NativeDiskStore(path)
    for i in range(50):
        s.write(lambda bm: bm.get("b").put(b"same-key", b"x" * 1000))
    size_before = os.path.getsize(path)
    s.compact()
    size_after = os.path.getsize(path)
    assert size_after < size_before
    out = []
    s.read(lambda bm: out.append(bm.get("b").get(b"same-key")))
    assert out[0] == b"x" * 1000
    s.close()


@pytest.mark.skipif(not HAVE_NATIVE, reason="native engine not built")
def test_shard_on_native_store(tmp_path):
    """Full shard engine on the native backend."""
    import uuid

    import numpy as np

    from semadb_tpu.models import Collection, IndexSchema, Point, SearchRequest, UserPlan
    from semadb_tpu.shard import Shard

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
    path = str(tmp_path / "shard.native")
    col = Collection(user_id="u", id="c", index_schema=schema, user_plan=UserPlan())
    shard = Shard(NativeDiskStore(path), col)
    pts = [
        Point.from_map({"v": [float(i), float(i)]}, uuid.UUID(int=i + 1))
        for i in range(20)
    ]
    shard.insert_points(pts)
    shard.close()

    shard2 = Shard(NativeDiskStore(path), col)
    assert shard2.point_count() == 20
    res = shard2.search_points(
        SearchRequest.from_dict(
            {
                "query": {
                    "property": "v",
                    "vectorVamana": {
                        "vector": [5.0, 5.0],
                        "operator": "near",
                        "searchSize": 36,
                        "limit": 3,
                    },
                },
                "limit": 3,
            }
        )
    )
    assert res[0].point.id == pts[5].id
    shard2.close()


@pytest.mark.skipif(not HAVE_NATIVE, reason="native engine not built")
def test_native_concurrent_readers_vs_writer(tmp_path):
    """Readers (get + ordered scans) racing a writer must never crash or
    observe torn values: sdb_get copies under the store mutex and cursors
    re-seek per step instead of holding live map iterators (the reference's
    bbolt gives readers snapshot isolation; this is the engine's analog).
    Notably deletes of the key a cursor just returned must be safe."""
    import threading

    s = NativeDiskStore(str(tmp_path / "race.db"))
    s.write(lambda bm: [bm.get("b").put(f"k{i:05d}".encode(), b"v" * 64) for i in range(500)])
    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        while not stop.is_set():
            j = i % 500
            def fn(bm, j=j, i=i):
                b = bm.get("b")
                if i % 3 == 2:
                    b.delete(f"k{j:05d}".encode())
                else:
                    b.put(f"k{j:05d}".encode(), bytes([i % 251]) * 64)
            s.write(fn)
            i += 1

    def reader():
        try:
            while not stop.is_set():
                def fn(bm):
                    b = bm.get("b")
                    for k, v in b.prefix_scan(b"k0"):
                        # values are always a uniform 64-byte run — a torn
                        # read would mix bytes from two writes
                        assert len(v) == 64 and len(set(v)) == 1, (k, v)
                    b.get(b"k00250")
                s.read(fn)
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(3)
    ]
    for t in threads:
        t.start()
    import time

    time.sleep(1.5)
    stop.set()
    for t in threads:
        t.join()
    assert not errors, errors
    s.close()
