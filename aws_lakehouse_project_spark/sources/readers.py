"""Raw-zone readers: schema-enforced CSV and JSON-lines scans (S1/S2).

The reference discovers schemas with Glue crawlers / pandas inference
(reference ``terraform/main.tf:33-41``, ``local_runner.py:47-53``) and then
validates against a fixed contract. Here the contract comes first: reads
use an explicit ``StructType`` in PERMISSIVE mode with a corrupt-record
column, so malformed rows are quarantined instead of poisoning types —
at 100 TB, inference is both a correctness and a cost bug (it scans
twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import SchemaContractError

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Headered CSV scan with enforced schema (S1 — reference
    local_runner.py:52 `pd.read_csv`). Corrupt rows land in
    ``_corrupt_record`` and are split off by the caller/validator."""
    return (
        spark.read.option("header", True)
        # enforceSchema=false: a header whose column order/names differ
        # from the contract fails the read with a clear message (the P13
        # ordered-column gate at file level) instead of silently mapping
        # values positionally and dying later in a staging cast
        .option("enforceSchema", False)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(_with_corrupt(schema))
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan (S2 — reference local_runner.py:49-51
    `pd.read_json(lines=True)`), one object per line, nested fields
    per the supplied schema (e.g. the web_events metadata map)."""
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(_with_corrupt(schema))
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) — clean rows lose the corrupt column."""
    if CORRUPT_COL not in df.columns:
        return df, df.sparkSession.createDataFrame([], df.schema)
    # Spark refuses to query the corrupt column straight off a raw file
    # scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the parsed
    # frame first. localCheckpoint rather than the error message's
    # cache(): lineage truncation makes every derivative legal too, and
    # the blocks free with GC instead of pinning session storage.
    df = df.localCheckpoint(eager=True)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def enforce_ordered_columns(df: DataFrame, expected: list[str]) -> DataFrame:
    """P13: the ordered-column contract (reference GE suites line 3,
    interpreter local_runner.py:73-79). Raises SchemaContractError on any
    mismatch — including order — like the reference's fail-fast gate."""
    actual = [c for c in df.columns if c != CORRUPT_COL]
    if actual != list(expected):
        raise SchemaContractError(
            f"ordered column mismatch: expected {list(expected)}, got {actual}"
        )
    return df
