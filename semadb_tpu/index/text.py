"""Full-text index with TF-IDF ranking.

Parity reference: shard/index/text/text.go — bleve "standard" analyser
(unicode word tokenization, lowercasing, English stop-word removal), term →
doc-id postings plus per-doc term-frequency maps, TF-IDF scoring
``tf * log10(N / (df + 1))`` with tf = freq/doc_length (text.go:353-372),
containsAll → intersection / containsAny → union, filter intersection, sort
by score descending and truncate both results and result set to the limit
(text.go:305-396).
"""

from __future__ import annotations

import math
import re
import struct
from typing import Dict, Optional, Set, Tuple

import msgpack

from semadb_tpu.models import constants as C
from semadb_tpu.models.point import SearchResult
from semadb_tpu.models.query import TextOptions
from semadb_tpu.store.diskstore import Bucket
from semadb_tpu.utils.itemcache import Codec, ItemCache

# Lucene/bleve classic English stop set (the "standard" analyser's filter)
STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

# UAX #29 word segmentation, the way bleve's "standard" tokenizer does it
# (text.go:69-96 → blevesearch/segment). The practically load-bearing
# rules, as a regex over explicit script classes:
#   - katakana runs stay one token (Katakana × Katakana)
#   - Han/Hiragana ideographs tokenize ONE PER CHARACTER (they carry no
#     ALetter property, so every boundary breaks)
#   - apostrophes (' ’) and periods are MidNumLet: they JOIN when medial
#     between alphanumerics ("don't", "john's", "example.com" are single
#     tokens; trailing/leading ones split)
#   - comma is MidNum: joins digits only ("1,000" one token, "a,b" two)
#   - everything else (hyphens, whitespace, punctuation) breaks
_CJK = "一-鿿㐀-䶿豈-﫿぀-ゟ゠-ヿㇰ-ㇿ"
_ALNUM = rf"[^\W_{_CJK}]"  # unicode letters+digits minus CJK scripts
_TOKEN_RE = re.compile(
    rf"[゠-ヿㇰ-ㇿ]+"  # katakana run
    rf"|[一-鿿㐀-䶿豈-﫿぀-ゟ]"  # han/hiragana, 1/char
    rf"|{_ALNUM}+(?:['’.]{_ALNUM}+|(?<=\d),(?=\d)\d+)*",
    re.UNICODE,
)

NUM_DOCS_KEY = b"_numDocs"
_SET_PREFIX = b"t"  # t<term>s → postings (text.go key layout)
_DOC_PREFIX = b"d"  # d<8B docId> → {term: freq} + length


def analyse(value: str) -> list[str]:
    """Standard analyser: unicode word tokens, lowercased, stop words removed."""
    return [t for t in (m.group(0).lower() for m in _TOKEN_RE.finditer(value)) if t not in STOP_WORDS]


def _set_key(term: str) -> bytes:
    return _SET_PREFIX + term.encode("utf-8") + b"s"


def _doc_key(doc_id: int) -> bytes:
    return _DOC_PREFIX + struct.pack("<Q", doc_id)


def _postings_codec() -> "Codec[str, Set[int]]":
    """t<term>s → sorted id list; empty set deletes the key (text.go
    setCacheItem delete-on-empty)."""
    return Codec(
        key_bytes=_set_key,
        key_from=lambda kb: (
            kb[len(_SET_PREFIX) : -1].decode("utf-8")
            if kb.startswith(_SET_PREFIX) and kb.endswith(b"s")
            else None
        ),
        encode=lambda ids: msgpack.packb(sorted(ids)) if ids else None,
        decode=lambda raw: set(msgpack.unpackb(raw)),
    )


def _doc_codec() -> "Codec[int, Tuple[Dict[str, int], int]]":
    """d<8B docId> → ({term: freq}, length) (text.go docCacheItem)."""
    return Codec(
        key_bytes=_doc_key,
        key_from=lambda kb: (
            struct.unpack("<Q", kb[1:])[0]
            if kb.startswith(_DOC_PREFIX) and len(kb) == 9
            else None
        ),
        encode=lambda dv: msgpack.packb({"terms": dv[0], "length": dv[1]}),
        decode=lambda raw: (
            (lambda o: (o["terms"], o["length"]))(msgpack.unpackb(raw, raw=False))
        ),
    )


class IndexText:
    """Write-back cached text index (text.go:400-535 setCacheItem/
    docCacheItem parity): postings AND per-doc term maps each sit behind a
    generic :class:`~semadb_tpu.utils.itemcache.ItemCache` — decode once
    per batch, mutate in memory, persist once on ``flush``."""

    def __init__(self, bucket: Bucket, analyser: str = "standard"):
        if analyser != "standard":
            raise ValueError(f"unknown analyser {analyser}")
        self.bucket = bucket
        self._postings: ItemCache[str, Set[int]] = ItemCache(
            bucket, _postings_codec()
        )
        self._docs: ItemCache[int, Tuple[Dict[str, int], int]] = ItemCache(
            bucket, _doc_codec()
        )
        self._ndocs: Optional[int] = None

    # -- helpers -----------------------------------------------------------
    @property
    def num_docs(self) -> int:
        if self._ndocs is None:
            raw = self.bucket.get(NUM_DOCS_KEY)
            self._ndocs = struct.unpack("<Q", raw)[0] if raw else 0
        return self._ndocs

    def _set_num_docs(self, n: int) -> None:
        self._ndocs = max(n, 0)

    def _get_postings(self, term: str) -> Set[int]:
        return self._postings.get(term) or set()

    def _get_doc(self, doc_id: int) -> Optional[Tuple[Dict[str, int], int]]:
        return self._docs.get(doc_id)

    def flush(self) -> None:
        """Persist dirty postings/docs + doc count (ItemCache.Flush)."""
        self._postings.flush()
        self._docs.flush()
        if self._ndocs is not None:
            self.bucket.put(NUM_DOCS_KEY, struct.pack("<Q", self._ndocs))

    # -- writes ------------------------------------------------------------
    def insert(self, doc_id: int, value: str) -> None:
        tokens = analyse(value)
        freqs: Dict[str, int] = {}
        for t in tokens:
            freqs[t] = freqs.get(t, 0) + 1
        self._docs.put(doc_id, (freqs, max(len(tokens), 1)))
        for term in freqs:
            self._postings.get_or_create(term, set).add(doc_id)
        self._set_num_docs(self.num_docs + 1)

    def delete(self, doc_id: int) -> None:
        doc = self._get_doc(doc_id)
        if doc is None:
            return
        freqs, _ = doc
        for term in freqs:
            self._postings.get_or_create(term, set).discard(doc_id)
        self._docs.delete(doc_id)
        self._set_num_docs(self.num_docs - 1)

    def update(self, doc_id: int, value: str) -> None:
        self.delete(doc_id)
        self.insert(doc_id, value)

    # -- search ------------------------------------------------------------
    def search(
        self, options: TextOptions, filter_set: Optional[Set[int]] = None
    ) -> Tuple[Set[int], list[SearchResult]]:
        query_terms = set(analyse(options.value))
        sets = [self._get_postings(t) for t in query_terms]
        if not sets:
            final: Set[int] = set()
        elif options.operator == C.OPERATOR_CONTAINS_ALL:
            final = sets[0].copy()
            for s in sets[1:]:
                final &= s
        else:
            final = set()
            for s in sets:
                final |= s
        if filter_set is not None:
            final &= filter_set
        weight = options.weight if options.weight is not None else 1.0
        n_docs = self.num_docs
        results = []
        df = {t: len(self._get_postings(t)) for t in query_terms}
        for doc_id in final:
            doc = self._get_doc(doc_id)
            if doc is None:
                continue
            freqs, length = doc
            score = 0.0
            for term in query_terms:
                tf = freqs.get(term, 0) / length
                idf = math.log10(n_docs / (df[term] + 1)) if n_docs else 0.0
                score += tf * idf
            results.append(
                SearchResult(
                    point=None, node_id=doc_id, score=score, hybrid_score=score * weight
                )
            )
        results.sort(key=lambda r: -r.score)
        if len(results) > options.limit:
            results = results[: options.limit]
            final = {r.node_id for r in results}
        return final, results
