"""Generic write-back ItemCache tests.

Mirrors shard/cache/itemcache_test.go: get/put/delete through the cache,
dirty tracking, flush persistence, delete-on-empty encode, ForEach over
bucket ∪ cache with foreign-key filtering (two caches sharing one bucket,
the text.go layout).
"""

import struct

import msgpack

from semadb_tpu.store.diskstore import Bucket
from semadb_tpu.utils.itemcache import Codec, ItemCache


def int_codec(prefix: bytes) -> Codec:
    return Codec(
        key_bytes=lambda k: prefix + struct.pack("<Q", k),
        key_from=lambda kb: (
            struct.unpack("<Q", kb[len(prefix):])[0]
            if kb.startswith(prefix) and len(kb) == len(prefix) + 8
            else None
        ),
        encode=lambda v: msgpack.packb(sorted(v)) if v else None,
        decode=lambda raw: set(msgpack.unpackb(raw)),
    )


def test_write_back_and_flush():
    b = Bucket()
    c = ItemCache(b, int_codec(b"x"))
    c.put(1, {10, 11})
    c.get_or_create(2, set).add(20)
    # nothing hits the bucket before flush (write-back, itemcache.go:204)
    assert b.get(b"x" + struct.pack("<Q", 1)) is None
    c.flush()
    assert set(msgpack.unpackb(b.get(b"x" + struct.pack("<Q", 1)))) == {10, 11}
    # a fresh cache reads the persisted state
    c2 = ItemCache(b, int_codec(b"x"))
    assert c2.get(1) == {10, 11}
    assert c2.get(2) == {20}
    assert c2.get(99) is None


def test_delete_and_delete_on_empty():
    b = Bucket()
    c = ItemCache(b, int_codec(b"x"))
    c.put(1, {10})
    c.put(2, {20})
    c.flush()
    c.delete(1)
    # emptied value deletes its key on flush (text.go delete-on-empty)
    c.get_or_create(2, set).clear()
    c.flush()
    assert b.get(b"x" + struct.pack("<Q", 1)) is None
    assert b.get(b"x" + struct.pack("<Q", 2)) is None
    assert c.get(1) is None


def test_for_each_merges_bucket_and_cache_and_filters_foreign_keys():
    b = Bucket()
    # two caches share one bucket with disjoint prefixes (text.go t/d keys)
    cx = ItemCache(b, int_codec(b"x"))
    cy = ItemCache(b, int_codec(b"y"))
    cx.put(1, {1})
    cx.flush()
    cy.put(7, {70})
    cy.flush()
    cx.put(2, {2})          # cache-only, not yet flushed
    cx.get_or_create(1, set).add(100)  # shadows the bucket copy
    got = dict(cx.for_each())
    assert got == {1: {1, 100}, 2: {2}}  # y-keys filtered, cache shadows


def test_mutate_without_get_or_create_stays_clean():
    b = Bucket()
    c = ItemCache(b, int_codec(b"x"))
    c.put(5, {50})
    c.flush()
    _ = c.get(5)
    c.flush()  # no dirty entries: nothing rewritten
    assert c.get(5) == {50}
