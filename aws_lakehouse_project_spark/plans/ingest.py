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
  source files (keyed by canonical ``os.path.realpath`` so relative /
  symlinked / CWD-dependent spellings of one physical file collapse to
  one ledger entry); the current ledger is the UNION of every
  ledger in the retained log — raw-manifest reads (meta-only, no
  snapshot replay), one backward walk. Union, not newest-wins: ledgers
  only grow, so the union equals the newest under single-writer
  operation, and under races (a vacuum marker carrying a
  snapshot-stale ledger concurrent with a fresh COPY INTO) the union
  is the correct superset where newest-wins would silently forget
  loads and re-ingest them.
- A re-run diffs the source listing against the ledger and appends
  ONLY the new files, in one atomic commit; a no-op re-run commits
  nothing and reports ``files_loaded=0``.
- Every new file's parquet FOOTER is checked against the expected
  schema — names AND arrow types — before anything is read:
  ``spark.read.parquet`` samples one file's schema for the whole
  batch, so a mixed batch would otherwise coerce silently. After the
  read, the batch's Spark schema must equal the table's exactly
  (name + type): a drifting batch fails whole, nothing half-loads.
- ``rows_loaded`` comes from the footers' row counts — driver-side
  metadata; the data plane reads each new file exactly once (the
  append itself).

100 TB shape: the listing diff and footer checks are driver-side
metadata (file names + footers, same class as the engine's other
bounded file-list operations); the data plane reads only the NEW
files — ingestion cost is proportional to what arrived, never to the
table or to the history of prior loads.

Interplay contracts:

- **VACUUM never forfeits the ledger**: when a vacuum would drop the
  last ledger-carrying manifest, the union of the dropped ledgers
  rides the vacuum's horizon-marker commit (``plans/versioned.py``) —
  including the no-data-released case, where the marker fires just for
  the rescue. Without this, the next COPY INTO would silently
  re-ingest every already-loaded file.
- **RESTORE does not rewind the ledger** (Delta's COPY INTO contract):
  the walk unions every ledger in the log regardless of the restored
  content, so files loaded after the restore point are NOT
  re-ingested. Re-loading them after a restore is an explicit
  decision — truncate-and-reload with a fresh table.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .versioned import VersionedTable

_META_KEY = "copy_into_loaded"


def loaded_files(vt: VersionedTable) -> list[str]:
    """The cumulative ingestion ledger: union of every ledger in the
    retained log (meta-only raw-manifest reads; empty for a table
    never COPY'd into)."""
    out: set[str] = set()
    if vt.exists():
        for v in vt.versions():
            m = vt._raw_manifest(v).get("meta", {})  # noqa: SLF001
            # realpath on read migrates ledgers written before path
            # normalization (relative/symlinked spellings) to the
            # canonical form the diff below compares against.
            out.update(os.path.realpath(f) for f in m.get(_META_KEY, ()))
    return sorted(out)


def copy_into(
    spark: SparkSession,
    vt: VersionedTable,
    src: str,
    pattern: str = "*.parquet",
) -> dict:
    """Load every not-yet-ingested file matching ``src/pattern`` into
    ``vt`` as ONE append commit. Returns ``{"version", "files_loaded",
    "rows_loaded"}``; a no-op re-run commits nothing."""
    # Canonicalize the listing (realpath) so a relative vs absolute
    # src, a different CWD, or a symlinked prefix never makes an
    # already-loaded file look new: the ledger stores and the diff
    # compares ONE spelling per physical file. The set also collapses
    # two directory ENTRIES resolving to the same physical file (a
    # 'latest' symlink beside its target) — without it both spellings
    # survive the diff and the file's rows would load twice in one
    # commit.
    listing = sorted(
        {os.path.realpath(f) for f in glob.glob(os.path.join(src, pattern))}
    )
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
    # per-file footer check BEFORE reading: names AND types, against
    # the first new file (creation) or the table's footprint via the
    # post-read Spark-schema check below. Footers are driver-side
    # metadata (same class as the listing diff) and also yield the
    # exact row count for free — no counting scan.
    import pyarrow.parquet as pq

    if vt.exists():
        want_names = {
            f["name"]
            for f in vt._manifest()["schema"]["fields"]  # noqa: SLF001
        }
    else:
        want_names = set(pq.read_schema(new[0]).names)
    first_schema = pq.read_schema(new[0])
    n_rows = 0
    for f in new:
        sch = pq.read_schema(f)
        if set(sch.names) != want_names:
            raise ValueError(
                f"COPY INTO: {f!r} columns {sorted(sch.names)} != expected "
                f"{sorted(want_names)} — nothing loaded (fix or remove the "
                "drifting file)"
            )
        if not sch.equals(first_schema, check_metadata=False):
            raise ValueError(
                f"COPY INTO: {f!r} schema differs from {new[0]!r} "
                f"({sch} vs {first_schema}) — a mixed batch would coerce "
                "silently; nothing loaded"
            )
        n_rows += pq.read_metadata(f).num_rows
    df: DataFrame = spark.read.parquet(*new)
    if vt.exists():
        # type drift vs the TABLE (names alone can't catch it): the
        # batch's Spark schema must match field-for-field
        table_schema = StructType.fromJson(
            vt._manifest()["schema"]  # noqa: SLF001
        )
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in table_schema.fields}
        drift = {n: (got[n], want[n]) for n in want if got.get(n) != want[n]}
        if drift:
            raise ValueError(
                f"COPY INTO: batch column types drift from the table: "
                f"{drift} — nothing loaded"
            )
    meta = {_META_KEY: sorted(seen | set(new))}
    if vt.exists():
        v = vt.append(df, meta=meta)
    else:
        v = vt.write_full(df, meta=meta)
    return {"version": v, "files_loaded": len(new), "rows_loaded": n_rows}
