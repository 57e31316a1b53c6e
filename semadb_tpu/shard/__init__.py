"""Per-shard storage + index engine."""

from semadb_tpu.shard.idcounter import IdCounter  # noqa: F401
from semadb_tpu.shard.shard import Shard  # noqa: F401
