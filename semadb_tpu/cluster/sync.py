"""Startup sync: re-home metadata and shard files after membership change.

Parity reference: cluster/sync.go — on boot, (1) scan the nodedb for
user-collection entries whose rendezvous owner is no longer this node,
batch-send them with SetNodeKeyValue and delete local copies on ack
(sync.go:20-122); (2) walk the shard directories, and for every shard whose
owner moved, stream the whole shard file in 8MB chunks with an xxhash
checksum, deleting the local copy after verification (sync.go:124-267).
No live rebalancing by design (README.md:206).
"""

from __future__ import annotations

import os
import shutil

import xxhash

from semadb_tpu.cluster.node import USER_COLLECTIONS_BUCKET, ClusterNode

CHUNK_SIZE = 8 * 1024 * 1024


def sync_user_collections(node: ClusterNode) -> int:
    """Returns the number of re-homed entries."""
    to_move: dict[str, dict[str, bytes]] = {}

    def reader(bm):
        b = bm.get(USER_COLLECTIONS_BUCKET)
        for k, v in b.items():
            user_id = k.decode().split("/", 1)[0]
            owner = node._owner(user_id)
            if owner != node.my_hostname:
                to_move.setdefault(owner, {})[k.decode()] = v

    node.nodedb.read(reader)
    moved = 0
    for owner, kvs in to_move.items():
        node._call(owner, "SetNodeKeyValue", {"bucket": USER_COLLECTIONS_BUCKET, "keyValues": kvs})

        def writer(bm):
            b = bm.get(USER_COLLECTIONS_BUCKET)
            for k in kvs:
                b.delete(k.encode())

        node.nodedb.write(writer)
        moved += len(kvs)
    return moved


def sync_shards(node: ClusterNode) -> int:
    """Ship misplaced shard files to their new owners; returns count moved."""
    root = node.cfg.root_dir
    if not root or not os.path.isdir(root):
        return 0
    moved = 0
    for user_id in os.listdir(root):
        upath = os.path.join(root, user_id)
        if not os.path.isdir(upath):
            continue
        for col_id in os.listdir(upath):
            cpath = os.path.join(upath, col_id)
            if not os.path.isdir(cpath):
                continue
            for shard_id in os.listdir(cpath):
                spath = os.path.join(cpath, shard_id, "sharddb.sdb")
                if not os.path.exists(spath):
                    continue
                owner = node._owner(shard_id)
                if owner == node.my_hostname:
                    continue
                _send_shard_file(node, owner, user_id, col_id, shard_id, spath)
                shutil.rmtree(os.path.dirname(spath), ignore_errors=True)
                moved += 1
    return moved


def _send_shard_file(
    node: ClusterNode, dest: str, user_id: str, col_id: str, shard_id: str, path: str
) -> None:
    h = xxhash.xxh64()
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        offset = 0
        while True:
            chunk = f.read(CHUNK_SIZE)
            if not chunk:
                break
            h.update(chunk)
            final = offset + len(chunk) >= size
            node._call(
                dest,
                "SendShard",
                {
                    "userId": user_id,
                    "collectionId": col_id,
                    "shardId": shard_id,
                    "offset": offset,
                    "chunk": chunk,
                    "final": final,
                    "checksum": h.intdigest() if final else 0,
                },
            )
            offset += len(chunk)


def sync(node: ClusterNode) -> dict:
    """clusterNode.Sync (sync.go:269-283)."""
    return {
        "collectionsMoved": sync_user_collections(node),
        "shardsMoved": sync_shards(node),
    }
