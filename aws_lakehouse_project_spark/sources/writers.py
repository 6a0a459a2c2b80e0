"""Curated-zone writers (S5-S7, S10).

The reference's curated layout: Parquet partitioned by (dt, store_id)
with Z-Order clustering (reference README.md:3, :12, :35). Without
delta-spark, Z-order is approximated writer-side: range-repartition on
the cluster keys + sortWithinPartitions, which gives parquet row-group
min/max pruning on those keys — for 2 columns this captures most of
Z-order's benefit (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str) -> None:
    """S5 CSV sink (reference local_runner.py:159-166)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: Sequence[str], merge_schema: bool = False
) -> None:
    """S6 partitioned parquet sink; mergeSchema on read handles S10
    (`on_schema_change: sync_all_columns`, dbt_project.yml:15)."""
    writer = df.write.mode("overwrite").partitionBy(*partition_cols)
    if merge_schema:
        writer = writer.option("mergeSchema", "true")
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int,
    bucket_cols: Sequence[str],
    path: str | None = None,
) -> None:
    """Bucketed table write: co-locates rows by hash(bucket_cols) so
    later joins/aggregations on those keys need NO shuffle (the
    bucketing metadata lives in the session catalog). At warehouse scale
    this is how the big fact↔fact joins avoid their exchanges entirely;
    `n_buckets` should match the downstream parallelism."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def write_zorder_approx(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    cluster_cols: Sequence[str],
    n_files_per_partition: int = 1,
) -> None:
    """S7 Z-order-approximate layout: within each Hive partition, cluster
    rows by range on the cluster keys and sort within files so parquet
    row-group stats prune multi-column predicates.

    At 100 TB, `n_files_per_partition` controls file sizing (target
    ~128-1024 MB per file); locally 1 file per partition keeps the tree
    small.
    """
    clustered = df.repartitionByRange(
        max(n_files_per_partition, 1), *[*partition_cols, *cluster_cols]
    ).sortWithinPartitions(*[*partition_cols, *cluster_cols])
    clustered.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def compact_table(
    spark,
    path: str,
    target_rows_per_file: int,
    sort_within: Sequence[str] = (),
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into
    ceil(rows / target_rows_per_file) files, optionally re-sorting rows
    within files to restore cluster locality (the maintenance half of the
    reference's Z-order story, README.md:107 'OPTIMIZE'-style upkeep).

    Streaming sinks and incremental merges accrete small files; scans
    then pay per-file open/footer costs and lose row-group pruning. The
    rewrite is one job: read → repartition to the target file count
    (repartitionByRange when a sort is requested, so files stay
    range-disjoint) → swap via a staged directory (the old tree is moved
    aside BEFORE the staged tree moves in, so a crash at any point
    leaves either the old or the new table intact — never neither; the
    rename pair is not a single atomic operation, an object-store
    production build would commit via a manifest instead). Returns
    (files_before, files_after). At warehouse scale this runs per
    partition directory, parallel across partitions, with target sized
    to the HDFS/S3 block sweet spot instead of a row count.
    """
    import math
    import os
    import shutil

    def count_data_files(p: str) -> int:
        # one predicate for before AND after, so the returned pair is
        # comparable even on mixed-format directories
        return sum(1 for n in os.listdir(p) if n.endswith(".parquet"))

    files_before = count_data_files(path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / max(1, target_rows_per_file)))
    if sort_within:
        compacted = df.repartitionByRange(n_files, *sort_within).sortWithinPartitions(
            *sort_within
        )
    else:
        compacted = df.coalesce(n_files) if n_files < files_before else df.repartition(
            n_files
        )
    staged = path.rstrip("/") + ".__compact__"
    compacted.write.mode("overwrite").parquet(staged)
    # crash-safe swap: park the old tree first, then move the staged
    # tree in; only after both renames succeed is the old tree deleted.
    # A crash between the renames leaves the table recoverable at
    # path.__old__ instead of lost.
    old = path.rstrip("/") + ".__old__"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.replace(path, old)
    try:
        os.replace(staged, path)
    except BaseException:
        os.replace(old, path)  # roll back so the table never vanishes
        raise
    shutil.rmtree(old)
    files_after = count_data_files(path)
    return files_before, files_after


def zorder_value(cols: Sequence, mins: Sequence[float], maxs: Sequence[float], bits: int = 16):
    """Bit-interleaved Z-order key over numeric columns (true Morton
    order, not the lexicographic approximation): each column is linearly
    scaled to a ``bits``-wide integer over its [min, max] range, then the
    columns' bits are interleaved so nearby (x, y) pairs share long
    z-value prefixes in BOTH dimensions.

    Pure integer Column arithmetic — shiftleft/or over 2·bits terms,
    whole-stage-codegen'd, no UDFs. min/max come from a one-row aggregate
    of the input (reference README.md:12's curated-layout Z-order claim,
    done for real).

    The interleaved key must fit a signed 64-bit long: at
    ``len(cols) * bits > 63`` the top shift lands on the sign bit, so
    high-coordinate rows would sort FIRST and destroy locality —
    ``bits`` is scaled down to ``63 // len(cols)`` when the requested
    width would overflow (keys stay non-negative at any column count)."""
    n_cols = max(1, len(cols))
    if n_cols * bits > 63:
        bits = 63 // n_cols
    scaled = []
    top = (1 << bits) - 1
    for c, lo, hi in zip(cols, mins, maxs):
        span = (hi - lo) or 1.0
        s = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top).cast(
                    "long"
                ),
            ),
        )
        scaled.append(s)
    z = F.lit(0).cast("long")
    n = len(scaled)
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """True Z-order clustered write: range-partition and sort by the
    Morton key so every file covers a compact hyper-rectangle of the
    cluster space — multi-column min/max pruning works for predicates on
    ANY clustered column, where a lexicographic sort only prunes the
    leading one.

    One aggregate for the per-column ranges (driver-side, 1 row), one
    range exchange on the z key. The z column is dropped before write;
    projection after sort preserves row order."""
    stats = df.agg(
        *[
            f
            for c in cluster_cols
            for f in (F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}"))
        ]
    ).collect()[0]
    mins = [float(stats[f"lo_{c}"]) for c in cluster_cols]
    maxs = [float(stats[f"hi_{c}"]) for c in cluster_cols]
    z = zorder_value(list(cluster_cols), mins, maxs, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(max(n_files, 1), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
