"""Device compute ops: distances, top-k, bit packing, beam search kernels."""

from semadb_tpu.ops.distance import (  # noqa: F401
    distance,
    gather_bit_distance,
    gather_distance,
    is_bit_metric,
    pairwise_bit_distance,
    pairwise_distance,
    validate_metric,
)
from semadb_tpu.ops.topk import (  # noqa: F401
    INF,
    INVALID_ID,
    dedup_by_id,
    masked_top_k,
    merge_topk,
    sort_by_distance,
    top_k_smallest,
)
