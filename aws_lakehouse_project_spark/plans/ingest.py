"""Idempotent file ingestion — Delta's ``COPY INTO`` re-derived on the
transaction layer.

The reference's landing flow drops raw files into a prefix and loads
them into tables (``/root/reference/README.md`` raw→staged flow); the
operational contract every warehouse gives that shape is COPY INTO:
*load each source file exactly once, however many times the command
re-runs*. The loaded-file ledger rides the table's commit ``meta``
(the same channel materialized-view watermarks and replication
watermarks use), so idempotency holds across processes and fresh
handles with no driver-side state:

- Each ``copy_into`` commit stores the CUMULATIVE set of ingested
  source files (path-keyed); the current ledger is the most recent
  commit that carries one — one backward history walk, no scan.
- A re-run diffs the source listing against the ledger and appends
  ONLY the new files, in one atomic commit; a no-op re-run commits
  nothing and reports ``files_loaded=0``.
- Source files are read schema-enforced against the table (the
  ``append`` contract): a drifting file fails the whole command, it
  never half-loads.

100 TB shape: the listing diff is driver-side metadata (file names,
same class as the engine's other bounded file-list operations); the
data plane reads only the NEW files — ingestion cost is proportional
to what arrived, never to the table or to the history of prior loads.

Interplay contracts:

- **VACUUM never forfeits the ledger**: when a vacuum would drop the
  last ledger-carrying manifest, the ledger rides the vacuum's
  horizon-marker commit (``plans/versioned.py``) — including the
  no-data-released case, where the marker fires just for the rescue.
  Without this, the next COPY INTO would silently re-ingest every
  already-loaded file.
- **RESTORE does not rewind the ledger** (Delta's COPY INTO contract):
  the backward walk finds the newest ledger in the log regardless of
  the restored content, so files loaded after the restore point are
  NOT re-ingested. Re-loading them after a restore is an explicit
  decision — truncate-and-reload with a fresh table.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from .versioned import VersionedTable

_META_KEY = "copy_into_loaded"


def loaded_files(vt: VersionedTable) -> list[str]:
    """The cumulative ingestion ledger: most recent commit meta that
    carries one (empty for a table never COPY'd into)."""
    if not vt.exists():
        return []
    for v in reversed(vt.versions()):
        m = vt._manifest(v)["meta"]  # noqa: SLF001
        if _META_KEY in m:
            return list(m[_META_KEY])
    return []


def copy_into(
    spark: SparkSession,
    vt: VersionedTable,
    src: str,
    pattern: str = "*.parquet",
) -> dict:
    """Load every not-yet-ingested file matching ``src/pattern`` into
    ``vt`` as ONE append commit. Returns ``{"version", "files_loaded",
    "rows_loaded"}``; a no-op re-run commits nothing."""
    listing = sorted(glob.glob(os.path.join(src, pattern)))
    if not listing:
        raise FileNotFoundError(
            f"COPY INTO: no files match {os.path.join(src, pattern)!r}"
        )
    seen = set(loaded_files(vt))
    new = [f for f in listing if f not in seen]
    if not new:
        return {
            "version": vt.latest_version(),
            "files_loaded": 0,
            "rows_loaded": 0,
        }
    # per-file footer check BEFORE reading: spark.read.parquet samples
    # one file's schema for the whole batch, so a mixed batch (one
    # drifting file among good ones) would otherwise coerce silently —
    # missing columns as NULLs or an extra column dropped. Footers are
    # driver-side metadata (same class as the listing diff).
    import pyarrow.parquet as pq

    if vt.exists():
        want = {
            f["name"]
            for f in vt._manifest()["schema"]["fields"]  # noqa: SLF001
        }
    else:
        want = set(pq.read_schema(new[0]).names)
    for f in new:
        got = set(pq.read_schema(f).names)
        if got != want:
            raise ValueError(
                f"COPY INTO: {f!r} columns {sorted(got)} != expected "
                f"{sorted(want)} — nothing loaded (fix or remove the "
                "drifting file)"
            )
    df: DataFrame = spark.read.parquet(*new)
    n_rows = df.count()
    meta = {_META_KEY: sorted(seen | set(new))}
    if vt.exists():
        v = vt.append(df, meta=meta)
    else:
        v = vt.write_full(df, meta=meta)
    return {"version": v, "files_loaded": len(new), "rows_loaded": n_rows}
