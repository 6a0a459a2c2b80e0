"""Per-process scratch directories with stale-sibling sweeping.

Demo queries that materialize intermediate files (CSV round-trip,
partitioned-sink demo, streaming checkpoints) get a pid-suffixed dir so
concurrent driver processes never clobber each other, and each call
sweeps same-prefix dirs older than an hour so repeated runs cannot fill
/tmp. Fresh dirs of live processes are never touched.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

STALE_AFTER_SEC = 3600


def scratch_dir(prefix: str, unique: bool = False) -> str:
    """A scratch path under /tmp. ``unique=False`` → one stable dir per
    (prefix, pid), reused across calls; ``unique=True`` → a fresh subdir
    per call (for streaming checkpoints, which must not be shared)."""
    base = tempfile.gettempdir()
    cutoff = time.time() - STALE_AFTER_SEC
    pid_suffix = f"_{os.getpid()}"
    for name in os.listdir(base):
        if name.startswith(prefix) and pid_suffix not in name:
            p = os.path.join(base, name)
            try:
                if os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    stable = os.path.join(base, f"{prefix}{pid_suffix}")
    if not unique:
        return stable
    os.makedirs(stable, exist_ok=True)
    return tempfile.mkdtemp(dir=stable)
