"""Timestamped store backups with frequency gating and retention.

Parity reference: utils/backup.go BackupBBolt — writes
``<file>.<unix_ts>.backup`` siblings, skips if the newest backup is younger
than the frequency gate, prunes to the retention count (backup.go:19-76).
"""

from __future__ import annotations

import os
import time
from typing import List


def _existing_backups(base_path: str) -> List[str]:
    d = os.path.dirname(base_path) or "."
    base = os.path.basename(base_path)
    if not os.path.isdir(d):
        return []
    out = [
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.startswith(base + ".") and f.endswith(".backup")
    ]
    return sorted(out)  # timestamps sort lexically at fixed width


def backup_with_retention(
    store, base_path: str, count: int, min_interval: float = 0.0
) -> str | None:
    """Create a timestamped backup; returns its path or None if gated."""
    if not base_path:
        return None
    backups = _existing_backups(base_path)
    if min_interval > 0 and backups:
        newest = backups[-1]
        try:
            ts = int(newest.rsplit(".", 2)[-2])
            if time.time() - ts < min_interval:
                return None
        except ValueError:
            pass
    dest = f"{base_path}.{int(time.time()):012d}.backup"
    store.backup_to_file(dest)
    backups.append(dest)
    while count > 0 and len(backups) > count:
        victim = backups.pop(0)
        try:
            os.remove(victim)
        except OSError:
            pass
    return dest
