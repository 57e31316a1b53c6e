"""Device-mesh serving path: one sharded search dispatch per query batch.

The reference's ONLY data plane is host RPC fan-out — SearchPoints spawns
one goroutine per shard, each walking its own index, results merged on the
coordinator (cluster/actions.go:274-378). Here a collection can opt into
``shardPlacement: "device"``: this node stacks its LOCAL shards' device
indices along a ``jax.sharding.Mesh`` axis (parallel/fanout.py) and serves
eligible vector queries with a single ``sharded_*_search`` dispatch whose
per-shard top-k merge rides ICI all-gather — the TPU-native replacement
for the goroutine fan-out, with an EXACT global top-k instead of the
Poisson per-shard limit approximation.

Eligibility (everything else falls back to the host fan-out transparently):
  - plain vector query (vectorVamana / vectorIVF), no filter, no _and/_or
  - every shard of the collection owned by this node
  - IVF shards not in PQ mode (stack_ivf_states rejects codes/ADC tables
    explicitly rather than mis-scoring them)

Staleness: stacked arrays are copies. Each search compares the shards'
``write_version`` counters (host ints) against the cached stack and
rebuilds on any change — a read-heavy serving node restacks only after
writes, matching the shared-cache read/write interlock role of
cache/manager.go:116-303.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from semadb_tpu.models import constants as C
from semadb_tpu.models.collection import Collection
from semadb_tpu.models.query import Query
from semadb_tpu.utils.logging import get_logger

LOG = get_logger("meshsearch")


def maybe_mesh():
    """A 1-D shard mesh over all local devices, or None on one device."""
    import jax

    if len(jax.devices()) < 2:
        return None
    from semadb_tpu.parallel.mesh import shard_mesh

    return shard_mesh()


@dataclass
class _Stacked:
    kind: str  # "vamana" | "ivf"
    stacked: object
    shard_ids: List[str]
    versions: Tuple[int, ...]
    config: object = None  # GraphConfig (vamana)
    probes: int = 0  # default probe count (ivf)


class MeshSearcher:
    def __init__(self, shard_manager, mesh=None):
        self.shard_manager = shard_manager
        self.mesh = mesh if mesh is not None else maybe_mesh()
        self._cache: Dict[Tuple[str, str, str], _Stacked] = {}
        self._mu = threading.Lock()

    # -- eligibility ---------------------------------------------------------
    def eligible_query(self, col: Collection, query: Query) -> Optional[str]:
        """Return the queried property when the mesh path can serve this
        query, else None (caller falls back to host fan-out)."""
        if self.mesh is None or col.shard_placement != "device":
            return None
        if not col.shard_ids or len(col.shard_ids) > self.mesh.devices.size:
            return None
        if query.property in ("_and", "_or", "_id"):
            return None
        params = col.index_schema.get(query.property)
        if params is None:
            return None
        if params.type == C.INDEX_TYPE_VECTOR_VAMANA:
            opts = query.vector_vamana
        elif params.type == C.INDEX_TYPE_VECTOR_IVF:
            opts = query.vector_ivf
        else:
            return None
        if opts is None or opts.filter is not None:
            return None
        return query.property

    # -- stacking --------------------------------------------------------------
    def _collect(self, col: Collection, prop: str):
        """Capture a consistent per-shard snapshot under the shard locks.

        The capture happens INSIDE the do_with_shard callback (the per-
        shard lock serialises it against writes routed through the shard
        manager) — reading engine attributes after the lock is released
        could hand the stacker a torn view, e.g. new slab_ids with old
        slabs. Vamana's GraphState is replaced wholesale per write, so
        capturing the reference is the snapshot; IVF captures its array
        set under the engine's own write lock (capture_stack_view)."""
        from semadb_tpu.index.ivf import IndexIVF
        from semadb_tpu.index.manager import IndexManager
        from semadb_tpu.index.vamana import IndexVamana

        params = col.index_schema.get(prop)
        bucket = IndexManager.bucket_name(params.type, prop)
        out = []
        for sid in col.shard_ids:
            def fn(shard):
                idx = shard.device_indices.get(bucket)
                if isinstance(idx, IndexVamana):
                    cap = ("vamana", idx.state, idx.config)
                elif isinstance(idx, IndexIVF):
                    cap = ("ivf", idx.capture_stack_view(), None)
                else:
                    cap = None
                return cap, shard.write_version

            cap, ver = self.shard_manager.do_with_shard(col, sid, fn)
            if cap is None:
                return None
            out.append((cap, ver))
        return out

    def _build(self, col: Collection, prop: str) -> Optional[_Stacked]:
        from semadb_tpu.parallel.fanout import stack_ivf_states, stack_states

        pairs = self._collect(col, prop)
        if pairs is None:
            return None
        caps = [p[0] for p in pairs]
        versions = tuple(p[1] for p in pairs)
        if all(c[0] == "vamana" for c in caps):
            states = [c[1] for c in caps]
            cap = max(s.capacity for s in states)
            states = [_pad_state(s, cap) for s in states]
            stacked = stack_states(states, self.mesh)
            return _Stacked(
                kind="vamana", stacked=stacked, shard_ids=list(col.shard_ids),
                versions=versions, config=caps[0][2],
            )
        if all(c[0] == "ivf" for c in caps):
            views = [c[1] for c in caps]
            stacked = stack_ivf_states(views, self.mesh)  # raises on PQ
            return _Stacked(
                kind="ivf", stacked=stacked, shard_ids=list(col.shard_ids),
                versions=versions, probes=views[0]._num_probes(0),
            )
        return None

    def _get(self, col: Collection, prop: str) -> Optional[_Stacked]:
        key = (col.user_id, col.id, prop)
        with self._mu:
            cached = self._cache.get(key)
        if cached is not None and cached.shard_ids == list(col.shard_ids):
            fresh = self._versions(col)
            if fresh == cached.versions:
                return cached
        built = self._build(col, prop)
        if built is None:
            return None
        with self._mu:
            self._cache[key] = built
        LOG.debug("mesh stack rebuilt", collection=col.id, prop=prop)
        return built

    def _versions(self, col: Collection) -> Tuple[int, ...]:
        def fn(shard):
            return shard.write_version

        return tuple(
            self.shard_manager.do_with_shard(col, sid, fn)
            for sid in col.shard_ids
        )

    # -- search -----------------------------------------------------------------
    def search_batch(
        self,
        col: Collection,
        prop: str,
        queries: np.ndarray,  # f32[B, D]
        k: int,
        search_size: int = 0,
        num_probes: int = 0,
    ) -> Optional[List[List[Tuple[float, str, int]]]]:
        """→ per query: [(distance, shard_id, local node id), ...] best-k
        across all shards, or None when the mesh path can't serve it."""
        import jax.numpy as jnp

        from semadb_tpu.parallel.fanout import sharded_ivf_search, sharded_search

        try:
            st = self._get(col, prop)
        except NotImplementedError as e:
            LOG.warn("mesh path unsupported, host fan-out", reason=str(e))
            return None
        if st is None:
            return None
        B = queries.shape[0]
        Bp = 8
        while Bp < B:
            Bp *= 2
        q = np.zeros((Bp, queries.shape[1]), np.float32)
        q[:B] = queries
        qd = jnp.asarray(q)
        if st.kind == "vamana":
            L = max(search_size or st.config.search_size, k)
            d, i, s = sharded_search(st.stacked, qd, st.config, L, k, self.mesh)
        else:
            p = num_probes or st.probes
            d, i, s = sharded_ivf_search(
                st.stacked, qd, p, k, self.mesh,
                metric=col.index_schema.get(prop).vector_ivf.distance_metric,
            )
        d = np.asarray(d)[:B]
        i = np.asarray(i)[:B]
        s = np.asarray(s)[:B]
        out: List[List[Tuple[float, str, int]]] = []
        for b in range(B):
            row = []
            for dist, nid, sh in zip(d[b], i[b], s[b]):
                if nid < 0 or not np.isfinite(dist):
                    continue
                row.append((float(dist), st.shard_ids[int(sh)], int(nid)))
            out.append(row)
        return out


def _pad_state(state, capacity: int):
    """Pad a GraphState to ``capacity`` rows (stacking needs one shape)."""
    import jax.numpy as jnp

    from semadb_tpu.index.vamana.graph import NIL, GraphState

    extra = capacity - state.capacity
    if extra == 0:
        return state
    return GraphState(
        vectors=jnp.pad(state.vectors, ((0, extra), (0, 0))),
        adjacency=jnp.pad(
            state.adjacency, ((0, extra), (0, 0)), constant_values=NIL
        ),
        exists=jnp.pad(state.exists, (0, extra)),
    )
