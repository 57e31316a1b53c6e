"""Unit tests for inverted + text indices and byte-sortable codecs.

Mirrors shard/index/inverted/*_test.go and text/text_test.go coverage.
"""

import numpy as np
import pytest

from semadb_tpu.index.inverted import (
    IndexInverted,
    IndexInvertedArray,
    float64_to_sortable,
    int64_to_sortable,
    sortable_to_float64,
    sortable_to_int64,
)
from semadb_tpu.index.text import IndexText, analyse
from semadb_tpu.models.query import TextOptions
from semadb_tpu.store.diskstore import Bucket


def test_int64_sortable_order():
    vals = [-(2**62), -5, -1, 0, 1, 5, 2**62]
    keys = [int64_to_sortable(v) for v in vals]
    assert keys == sorted(keys)
    assert [sortable_to_int64(k) for k in keys] == vals


def test_float64_sortable_order():
    vals = [-1e300, -1.5, -0.0001, 0.0, 0.0001, 1.5, 1e300]
    keys = [float64_to_sortable(v) for v in vals]
    assert keys == sorted(keys)
    assert [sortable_to_float64(k) for k in keys] == pytest.approx(vals)


def test_inverted_integer_operators():
    inv = IndexInverted(Bucket(), "integer")
    for nid, v in [(1, 5), (2, 10), (3, 10), (4, -3), (5, 20)]:
        inv.insert(nid, v)
    assert inv.search(10, None, "equals") == {2, 3}
    assert inv.search(10, None, "notEquals") == {1, 4, 5}
    assert inv.search(5, None, "greaterThan") == {2, 3, 5}
    assert inv.search(5, None, "greaterThanOrEquals") == {1, 2, 3, 5}
    assert inv.search(10, None, "lessThan") == {1, 4}
    assert inv.search(10, None, "lessThanOrEquals") == {1, 2, 3, 4}
    assert inv.search(0, 15, "inRange") == {1, 2, 3}
    inv.delete(2, 10)
    assert inv.search(10, None, "equals") == {3}
    inv.update(3, 10, 99)
    assert inv.search(99, None, "equals") == {3}


def test_inverted_string_case_folding():
    inv = IndexInverted(Bucket(), "string", case_sensitive=False)
    inv.insert(1, "Hello")
    inv.insert(2, "HELLO")
    inv.insert(3, "world")
    assert inv.search("hello", None, "equals") == {1, 2}
    assert inv.search("hel", None, "startsWith") == {1, 2}
    # case-sensitive keeps them apart
    cs = IndexInverted(Bucket(), "string", case_sensitive=True)
    cs.insert(1, "Hello")
    cs.insert(2, "HELLO")
    assert cs.search("Hello", None, "equals") == {1}


def test_inverted_array():
    arr = IndexInvertedArray(Bucket())
    arr.insert(1, ["a", "b"])
    arr.insert(2, ["b", "c"])
    arr.insert(3, ["c"])
    assert arr.search(["b"], "containsAny") == {1, 2}
    assert arr.search(["b", "c"], "containsAll") == {2}
    assert arr.search(["a", "c"], "containsAny") == {1, 2, 3}
    arr.update(1, ["a", "b"], ["c"])
    assert arr.search(["a"], "containsAny") == set()
    assert arr.search(["c"], "containsAny") == {1, 2, 3}
    arr.delete(3, ["c"])
    assert arr.search(["c"], "containsAny") == {1, 2}


def test_analyser():
    tokens = analyse("The QUICK brown Fox, and the lazy dog!")
    assert "the" not in tokens and "and" not in tokens  # stop words
    assert tokens == ["quick", "brown", "fox", "lazy", "dog"]


@pytest.mark.parametrize(
    "text,want",
    [
        # UAX #29 word-segmentation parity with bleve's standard analyser
        # (text.go:69-96): apostrophes/periods join when medial
        ("don't stop now", ["don't", "stop", "now"]),
        ("John's book", ["john's", "book"]),
        ("dogs' bones", ["dogs", "bones"]),  # trailing ' breaks
        ("visit example.com today", ["visit", "example.com", "today"]),
        ("3.14 and 1,000", ["3.14", "1,000"]),
        # CJK: Han/Hiragana tokenize per character, Katakana runs join
        ("機械学習の本", ["機", "械", "学", "習", "の", "本"]),
        ("カタカナ テスト", ["カタカナ", "テスト"]),
        ("naïve café", ["naïve", "café"]),
        ("state-of-the-art", ["state", "art"]),  # hyphens break, stops drop
    ],
)
def test_analyser_unicode_segmentation(text, want):
    assert analyse(text) == want


def test_text_tfidf_ranking():
    t = IndexText(Bucket())
    t.insert(1, "gandalf the wizard")
    t.insert(2, "gandalf gandalf gandalf speaks")
    t.insert(3, "a hobbit of the shire")
    t.insert(4, "orcs in moria")
    t.insert(5, "elves of lothlorien")  # N=5, df=2 → idf > 0
    rset, results = t.search(TextOptions(value="gandalf", operator="containsAny", limit=10))
    assert rset == {1, 2}
    # doc 2 has higher term frequency → higher score
    assert results[0].node_id == 2
    assert results[0].score > results[1].score

    # containsAll
    rset, _ = t.search(TextOptions(value="gandalf wizard", operator="containsAll", limit=10))
    assert rset == {1}

    # delete removes from postings
    t.delete(2)
    rset, _ = t.search(TextOptions(value="gandalf", operator="containsAny", limit=10))
    assert rset == {1}

    # update re-analyses
    t.update(1, "bilbo baggins")
    rset, _ = t.search(TextOptions(value="gandalf", operator="containsAny", limit=10))
    assert rset == set()
    rset, _ = t.search(TextOptions(value="bilbo", operator="containsAny", limit=10))
    assert rset == {1}


def test_text_limit_truncates_set():
    t = IndexText(Bucket())
    for i in range(10):
        t.insert(i, "common term here")
    rset, results = t.search(TextOptions(value="common", operator="containsAny", limit=3))
    assert len(results) == 3 and len(rset) == 3


def test_text_filter():
    t = IndexText(Bucket())
    t.insert(1, "alpha beta")
    t.insert(2, "alpha gamma")
    rset, _ = t.search(
        TextOptions(value="alpha", operator="containsAny", limit=10), filter_set={2}
    )
    assert rset == {2}


def test_postings_cache_survives_txns_and_scraps_on_failure(tmp_path):
    """VERDICT r4 #8: scalar inverted postings decode once and survive
    across transactions (cache/manager.go:116-303 parity); a failed txn
    scraps the cache (it may hold rolled-back mutations)."""
    import uuid as uuid_mod

    import numpy as np

    from semadb_tpu.index import inverted as inv_mod
    from semadb_tpu.models import Collection, IndexSchema, Point, UserPlan
    from semadb_tpu.models.query import SearchRequest
    from semadb_tpu.shard.shard import Shard
    from semadb_tpu.store import open_store

    schema = IndexSchema.from_dict(
        {"n": {"type": "integer", "integer": {}},
         "v": {"type": "vectorFlat",
               "vectorFlat": {"vectorSize": 2, "distanceMetric": "euclidean"}}}
    )
    col = Collection(user_id="u", id="c", index_schema=schema, user_plan=UserPlan())
    sh = Shard(open_store(str(tmp_path / "s.sdb")), col)

    def pts(lo, hi):
        return [
            Point.from_map({"n": i, "v": [float(i), 0.0]}, uuid_mod.UUID(int=i + 1))
            for i in range(lo, hi)
        ]

    sh.insert_points(pts(0, 50))

    def rng_search(lo, hi, limit=100):
        sr = SearchRequest.from_dict(
            {"query": {"property": "n", "integer": {
                "value": lo, "endValue": hi, "operator": "inRange"}},
             "limit": limit}
        )
        return {r.point.id.int - 1 for r in sh.search_points(sr)}

    assert rng_search(10, 12) == {10, 11, 12}
    # cache must survive into the NEXT txn: count raw decodes
    decodes = []
    orig = inv_mod._decode_set

    def spy(raw):
        decodes.append(1)
        return orig(raw)

    inv_mod._decode_set = spy
    try:
        assert rng_search(10, 12) == {10, 11, 12}
        assert not decodes, "postings were re-decoded despite the cache"
        # a write in a new txn updates the cached postings coherently
        sh.insert_points(pts(50, 55))
        assert rng_search(49, 51) == {49, 50, 51}
        sh.delete_points([uuid_mod.UUID(int=51)])
        assert rng_search(49, 51) == {49, 51}

        # failed txn: duplicate id raises AFTER the cache may have been
        # touched; the scrap must restore store-consistent state
        try:
            sh.insert_points(
                [Point.from_map({"n": 999, "v": [9.0, 0.0]}, uuid_mod.UUID(int=49 + 1))]
            )
        except Exception:
            pass
        assert rng_search(995, 1000) == set()
        assert rng_search(49, 51) == {49, 51}
    finally:
        inv_mod._decode_set = orig
    sh.close()

    # persistence: reopen sees the same postings
    sh2 = Shard(open_store(str(tmp_path / "s.sdb")), col)
    sr = SearchRequest.from_dict(
        {"query": {"property": "n", "integer": {
            "value": 49, "endValue": 51, "operator": "inRange"}}, "limit": 10}
    )
    assert {r.point.id.int - 1 for r in sh2.search_points(sr)} == {49, 51}
    sh2.close()
