"""Rendezvous hashing and file checksums.

Parity reference: cluster/hashing.go — xxhash64(key+server) scored,
ascending order, top-K selection; FileHash for shard transfer checksums.
"""

from __future__ import annotations

from typing import List

import xxhash


def rendezvous_hash(key: str, servers: List[str], top_k: int) -> List[str]:
    scores = sorted(
        (xxhash.xxh64_intdigest(key + server), server) for server in servers
    )
    return [s for _, s in scores[: min(top_k, len(servers))]]


def file_hash(path: str) -> int:
    h = xxhash.xxh64()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
    return h.intdigest()
