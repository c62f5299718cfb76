"""Shared micro-batch fixture helper for the ``q_stream_*`` driver queries.

Every streaming driver query materializes its input as three micro-batch
parquet dirs and relies on ``FileStreamSource`` processing them oldest-
mtime-first (with ``maxFilesPerTrigger=1``). The fixtures used to sleep
50 ms between writes to get distinct mtimes — which silently depends on
the filesystem's mtime granularity being finer than 50 ms; on coarse
filesystems the order degrades to path tie-breaking and the gate becomes
environment-sensitive. :func:`stamp_batch_mtime` pins the order
explicitly instead, making batch order a property of the fixture, not of
the filesystem clock.
"""

from __future__ import annotations

import glob
import os

# Fixed epoch base: only the ORDER matters, and 10-second gaps dwarf any
# filesystem's mtime granularity.
_MTIME_BASE = 1_600_000_000


def stamp_batch_mtime(batch_dir: str, k: int) -> None:
    """Set every file under a just-written micro-batch dir (and the dir
    itself) to the deterministic mtime ``base + 10*k`` seconds, so batch
    ``k`` always sorts k-th in ``FileStreamSource``'s modification-time
    order regardless of how fast the writes ran or how coarse the
    filesystem clock is."""
    t = _MTIME_BASE + 10 * k
    for p in glob.glob(os.path.join(batch_dir, "**"), recursive=True):
        os.utime(p, (t, t))
    os.utime(batch_dir, (t, t))
