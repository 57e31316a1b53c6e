"""Incremental (chunked, dirty-tracked) device-state snapshots.

VERDICT r3 weak #2: the full-snapshot flush serialised the entire device
state every FLUSH_EVERY_TXNS write txns — a multi-minute stall at 10M.
These tests pin the replacement: flushes write only dirty chunks
(O(delta), the bbolt per-txn contract — diskstore/diskstore.go:45-95),
crash replay works across an incremental snapshot + journal tail, and
legacy single-blob shard files stay readable.
"""

import uuid

import numpy as np
import pytest

from semadb_tpu.models import (
    Collection,
    IndexSchema,
    Point,
    SearchRequest,
    UserPlan,
)
from semadb_tpu.shard import Shard
from semadb_tpu.shard import snapshot as snap
from semadb_tpu.store import open_store

RNG = np.random.default_rng(11)
DIM = 8


@pytest.fixture(autouse=True)
def tiny_chunks(monkeypatch):
    """Shrink the chunk grid so chunk-level behavior shows at test scale."""
    monkeypatch.setattr(snap, "CHUNK_TARGET_BYTES", 1024)
    monkeypatch.setattr(snap, "SMALL_MAX_BYTES", 128)


def ivf_schema() -> IndexSchema:
    return IndexSchema.from_dict(
        {
            "emb": {
                "type": "vectorIVF",
                "vectorIVF": {"vectorSize": DIM, "distanceMetric": "euclidean"},
            }
        }
    )


def vamana_schema() -> IndexSchema:
    return IndexSchema.from_dict(
        {
            "emb": {
                "type": "vectorVamana",
                "vectorVamana": {
                    "vectorSize": DIM,
                    "distanceMetric": "euclidean",
                    "searchSize": 36,
                    "degreeBound": 32,
                    "alpha": 1.2,
                },
            }
        }
    )


def make_shard(path, schema) -> Shard:
    col = Collection(
        user_id="u1", id="c1", index_schema=schema, user_plan=UserPlan()
    )
    return Shard(open_store(path), col)


def make_points(n, offset=0):
    pts = []
    for i in range(n):
        x = offset + i
        vec = RNG.standard_normal(DIM).astype(np.float32)
        vec[0] += x  # spread so nearest-neighbour checks are stable
        pts.append(Point.from_map({"emb": vec.tolist()}, uuid.UUID(int=x + 1)))
    return pts


def query(vec, limit=5, prop_type="vectorIVF"):
    q = {
        "property": "emb",
        prop_type: {"vector": list(vec), "limit": limit},
    }
    if prop_type == "vectorVamana":
        q[prop_type]["operator"] = "near"
        q[prop_type]["searchSize"] = 36
    return SearchRequest.from_dict({"query": q, "limit": limit})


def ids_of(results):
    return [r.point.id for r in results]


def test_ivf_incremental_flush_writes_fewer_chunks(tmp_path):
    shard = make_shard(str(tmp_path / "s.sdb"), ivf_schema())
    pts = make_points(400)
    shard.insert_points(pts)
    first = shard.flush()
    assert first > 4  # the full state really is chunked at this scale

    # A small write touches a handful of rows -> a handful of chunks
    shard.insert_points(make_points(3, offset=400))
    second = shard.flush()
    assert 0 < second < first / 2, (first, second)

    # Reopened state must match exactly
    probe = np.zeros(DIM, np.float32)
    probe[0] = 200.0
    want = ids_of(shard.search_points(query(probe)))
    shard.close()
    shard2 = make_shard(str(tmp_path / "s.sdb"), ivf_schema())
    assert ids_of(shard2.search_points(query(probe))) == want
    shard2.close()


def test_crash_replay_across_incremental_snapshot(tmp_path):
    path = str(tmp_path / "s.sdb")
    shard = make_shard(path, ivf_schema())
    shard.insert_points(make_points(300))
    shard.flush()
    shard.insert_points(make_points(50, offset=300))  # incremental chunks
    shard.flush()
    # Post-snapshot writes live only in the journal (no flush = "crash")
    shard.insert_points(make_points(5, offset=350))
    probe = np.zeros(DIM, np.float32)
    probe[0] = 352.0
    want = ids_of(shard.search_points(query(probe)))
    del shard  # abandon without close: journal tail must replay

    shard2 = make_shard(path, ivf_schema())
    assert ids_of(shard2.search_points(query(probe))) == want
    shard2.close()


def test_vamana_incremental_roundtrip(tmp_path):
    path = str(tmp_path / "s.sdb")
    shard = make_shard(path, vamana_schema())
    shard.insert_points(make_points(120))
    first = shard.flush()

    shard.insert_points(make_points(4, offset=120))
    pts = make_points(120)
    shard.delete_points({pts[7].id, pts[13].id})
    second = shard.flush()
    assert second < first, (first, second)  # vectors/exists stay O(delta)

    probe = np.zeros(DIM, np.float32)
    probe[0] = 121.0
    want = ids_of(shard.search_points(query(probe, prop_type="vectorVamana")))
    shard.close()

    shard2 = make_shard(path, vamana_schema())
    got = ids_of(shard2.search_points(query(probe, prop_type="vectorVamana")))
    assert got == want
    # deleted points must not resurface
    deleted = {pts[7].id, pts[13].id}
    assert not (set(got) & deleted)
    shard2.close()


def test_legacy_blob_still_readable(tmp_path):
    """Old shard files hold one `_deviceState` blob; they must load and
    convert to the chunked format on the next flush."""
    from semadb_tpu.shard.shard import _pack_arrays

    path = str(tmp_path / "s.sdb")
    shard = make_shard(path, ivf_schema())
    shard.insert_points(make_points(60))
    # Rewrite the bucket as a legacy blob (what a round-3 file contains)
    name = None
    for n, idx in shard.device_indices.items():
        name = n
        blob = _pack_arrays(idx.to_arrays())

    def writer(bm):
        b = bm.get(name)
        b.put(snap.LEGACY_STATE_KEY, blob)
        b.delete(snap.DS_META_KEY)
        for k, _ in list(b.prefix_scan(snap.DS_CHUNK_PREFIX)):
            b.delete(k)

    shard.db.write(writer)
    shard.db.close()

    shard2 = make_shard(path, ivf_schema())
    probe = np.zeros(DIM, np.float32)
    probe[0] = 30.0
    res = shard2.search_points(query(probe))
    assert len(res) == 5
    shard2.flush()  # converts to chunked

    legacy = [None]

    def reader(bm):
        legacy[0] = bm.get(name).get(snap.LEGACY_STATE_KEY)

    shard2.db.read(reader)
    assert legacy[0] is None  # blob replaced by meta + chunks
    shard2.close()

    shard3 = make_shard(path, ivf_schema())
    assert ids_of(shard3.search_points(query(probe))) == ids_of(res)
    shard3.close()


def test_journal_only_durability_long_journal(tmp_path):
    """Default cadence: NO hot-path flush — the per-txn journal alone
    carries durability, and load replays it (coalesced) over the last
    consistent cut. Interleaves inserts, updates and deletes of the SAME
    ids across txns so the coalescing group-cut logic (repeated id ends a
    group) is exercised, then reopens without close ("crash")."""
    import msgpack as mp

    from semadb_tpu.shard import shard as shardmod

    assert shardmod.FLUSH_EVERY_TXNS == 0  # journal-only is the default

    path = str(tmp_path / "s.sdb")
    shard = make_shard(path, ivf_schema())
    shard.insert_points(make_points(200))
    shard.flush()  # one consistent cut
    # 12 journaled txns, never flushed: inserts + updates + deletes that
    # revisit ids from earlier txns (forces group cuts during replay).
    for t in range(6):
        shard.insert_points(make_points(20, offset=200 + t * 20))
        upd = []
        for i in range(3):
            x = 200 + t * 20 + i
            vec = np.zeros(DIM, np.float32)
            vec[0] = 10_000 + x  # moved far away
            upd.append(Point(id=uuid.UUID(int=x + 1),
                             data=mp.packb({"emb": vec.tolist()})))
        shard.update_points(upd)
        shard.delete_points({uuid.UUID(int=200 + t * 20 + 5 + 1)})
    assert shard._delta_txns >= 12  # nothing flushed them

    probe = np.zeros(DIM, np.float32)
    probe[0] = 10_302.0  # near an UPDATED vector (x=302, updated in t=5)
    want_updated = ids_of(shard.search_points(query(probe)))
    probe2 = np.zeros(DIM, np.float32)
    probe2[0] = 245.0  # near a DELETED vector (x=245, deleted in t=2)
    want_deleted_absent = ids_of(shard.search_points(query(probe2)))
    assert uuid.UUID(int=303) in want_updated
    assert uuid.UUID(int=246) not in want_deleted_absent
    del shard  # crash: journal tail only

    shard2 = make_shard(path, ivf_schema())
    assert ids_of(shard2.search_points(query(probe))) == want_updated
    assert ids_of(shard2.search_points(query(probe2))) == want_deleted_absent
    shard2.close()


def test_flush_journal_mb_trigger(tmp_path, monkeypatch):
    """SEMADB_FLUSH_JOURNAL_MB: retained-journal-bytes threshold compacts
    on the write path when opted in."""
    from semadb_tpu.shard import shard as shardmod

    monkeypatch.setattr(shardmod, "FLUSH_JOURNAL_MB", 0.01)  # ~10 KiB
    shard = make_shard(str(tmp_path / "s.sdb"), ivf_schema())
    shard.insert_points(make_points(400))  # >> 10 KiB of journal
    assert shard._delta_txns == 0  # the trigger flushed and reset
    assert shard._journal_bytes == 0

    records = [0]

    def reader(bm):
        from semadb_tpu.shard.shard import DELTA_PREFIX

        for name, _ in shard.device_indices.items():
            records[0] += sum(1 for _ in bm.get(name).prefix_scan(DELTA_PREFIX))

    shard.db.read(reader)
    assert records[0] == 0  # journal truncated by the compaction
    shard.close()


def test_derived_arrays_not_persisted_and_row_bounded(tmp_path):
    """VERDICT r4 #4: slabs/slab_sq/ovf_vecs are derived from
    vectors+ids+proj and must NOT be persisted (they re-dirty wholesale
    under scatter-heavy writes); the vectors matrix is row-bounded so
    capacity padding never crosses the store. Reopen must reconstruct an
    engine with identical search behaviour."""
    import msgpack

    path = str(tmp_path / "s.sdb")
    shard = make_shard(path, ivf_schema())
    shard.insert_points(make_points(400))
    shard.flush()

    meta = [None]

    def reader(bm):
        for name in list(shard.device_indices.keys()):
            raw = bm.get(name).get(snap.DS_META_KEY)
            meta[0] = msgpack.unpackb(raw, raw=False, strict_map_key=False)

    shard.db.read(reader)
    arrays = meta[0]["arrays"]
    small = meta[0]["small"]
    for banned in ("slabs", "slab_sq", "ovf_vecs"):
        assert banned not in arrays and banned not in small, banned
    # vectors row-bounded: stored rows cover the 400 points (+2 reserved
    # ids), NOT the growth-policy capacity bucket
    vec_rows = None
    for src in (arrays, small):
        if "vectors" in src:
            vec_rows = (
                src["vectors"]["shape"][0]
                if src is arrays
                else len(src["vectors"])
            )
    name, idx = next(iter(shard.device_indices.items()))
    assert vec_rows is not None and vec_rows <= 403
    assert idx.capacity > vec_rows  # the engine itself is bucket-padded

    probe = np.zeros(DIM, np.float32)
    probe[0] = 123.0
    want = ids_of(shard.search_points(query(probe)))
    shard.close()

    shard2 = make_shard(path, ivf_schema())
    name2, idx2 = next(iter(shard2.device_indices.items()))
    # reconstruction restored full shapes on device
    assert idx2.slabs.shape == idx.slabs.shape
    assert idx2.capacity == idx.capacity  # same policy bucket as pre-close
    assert ids_of(shard2.search_points(query(probe))) == want
    # and the reopened engine keeps accepting writes + searching
    shard2.insert_points(make_points(5, offset=500))
    probe2 = np.zeros(DIM, np.float32)
    probe2[0] = 503.0
    got = ids_of(shard2.search_points(query(probe2)))
    assert uuid.UUID(int=504) in got
    shard2.close()


def test_row_growth_keeps_incremental_chunks(tmp_path):
    """Row-bounded snapshots must stay INCREMENTAL as the corpus grows:
    appending rows rewrites only the partial tail chunk + new chunks, not
    the whole array."""
    shard = make_shard(str(tmp_path / "s.sdb"), ivf_schema())
    shard.insert_points(make_points(400))
    first = shard.flush()
    shard.insert_points(make_points(6, offset=400))
    second = shard.flush()
    assert 0 < second < first / 2, (first, second)
    # the reopened state sees all 406 points
    shard.close()
    shard2 = make_shard(str(tmp_path / "s.sdb"), ivf_schema())
    probe = np.zeros(DIM, np.float32)
    probe[0] = 405.0
    assert uuid.UUID(int=406) in ids_of(shard2.search_points(query(probe)))
    shard2.close()


def test_device_corpus_bulk_load_snapshot_roundtrip(tmp_path, monkeypatch):
    """Round-5 regression: the device-corpus bulk-adoption branch bypassed
    _ensure_capacity, so _max_seen stayed 0 and the row-bounded snapshot
    persisted a 1-ROW vectors matrix — crash reopen lost the corpus
    (probe parity 0.053 at 10M). The bound must survive that branch."""
    import jax.numpy as jnp

    import semadb_tpu.utils.grow as grow
    from semadb_tpu.index.ivf import IndexIVF
    from semadb_tpu.models.schema import VectorIVFParams

    monkeypatch.setattr(grow, "PREGROW_ROWS", 3000)
    n = 2000
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    idx = IndexIVF(VectorIVFParams(vector_size=DIM, distance_metric="euclidean"))
    idx.insert_bulk(
        np.arange(2, n + 2, dtype=np.int64), jnp.asarray(vecs), defer_fit=True
    )
    idx.flush_pending()
    assert idx.snapshot_row_bounds()["vectors"] >= n + 1

    from semadb_tpu.store import open_store

    db = open_store(str(tmp_path / "s.sdb"))
    wrote = [0]

    def w(bm):
        wrote[0] = snap.write_snapshot(bm.get("b"), idx)

    db.write(w)
    out = [None]

    def r(bm):
        out[0] = snap.read_snapshot(bm.get("b"))

    db.read(r)
    assert out[0]["vectors"].shape[0] >= n + 1
    idx2 = IndexIVF.from_arrays(idx.params, out[0])
    q = vecs[77:78]
    _, i1 = idx.search_batch(q, 10)
    _, i2 = idx2.search_batch(q, 10)
    assert set(np.asarray(i1)[0].tolist()) == set(np.asarray(i2)[0].tolist())


def test_pregrow_reload_capacity_matches_live(monkeypatch):
    """Round-5 regression (10M crash-reopen OOM): from_arrays computed
    max(bucket-chain-from-128, pregrow capacity), letting a growth-bucket
    OVERSHOOT beat the deliberate pregrow shape — at 10M the reopened
    vectors matrix re-padded to the 16.7M bucket (8.6 GB) instead of the
    live process's 10.07M pregrow rows (5.16 GB), and the extra 3.4 GB
    next to the derived-slab rebuild OOMed the chip. Reload capacity
    must equal the pre-crash (pregrow) capacity."""
    import semadb_tpu.utils.grow as grow
    from semadb_tpu.index.ivf import IndexIVF
    from semadb_tpu.models.schema import VectorIVFParams

    # pregrow 5000 -> capacity 8192; rows 4500 -> the 128-chain bucket
    # is 16384, which the old max() picked.
    monkeypatch.setattr(grow, "PREGROW_ROWS", 5000)
    n = 4500
    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    idx = IndexIVF(VectorIVFParams(vector_size=DIM, distance_metric="euclidean"))
    idx.insert_bulk(np.arange(2, n + 2, dtype=np.int64), vecs)
    assert idx.capacity == 8192
    arrays = {k: np.asarray(v) for k, v in idx.device_arrays().items()}
    arrays["vectors"] = arrays["vectors"][: idx.snapshot_row_bounds()["vectors"]]
    idx2 = IndexIVF.from_arrays(idx.params, arrays)
    assert idx2.capacity == idx.capacity, (idx2.capacity, idx.capacity)
    q = vecs[77:78]
    _, i1 = idx.search_batch(q, 10)
    _, i2 = idx2.search_batch(q, 10)
    assert set(np.asarray(i1)[0].tolist()) == set(np.asarray(i2)[0].tolist())
