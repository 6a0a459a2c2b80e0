"""Multimodal-column plumbing (SURVEY.md §7.2 M6, BASELINE.json north
star): image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched Pandas functions via ``mapInPandas``.

The decode step itself is STUBBED — the container has no image/audio
libraries — but everything Spark-side is real and tested: the schema, the
partitioning posture, the ``mapInPandas`` batch iterator signature, and a
deterministic fake feature extractor so pipelines downstream of decode
can be exercised end-to-end. Swapping the nested ``fake_features`` for a real
decoder (PIL/torchvision/ffmpeg) changes no Spark code.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .registry import demo_query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),  # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — NOT AVAILABLE in this environment (no PIL /
    cv2). Kept as the single seam a real deployment implements."""
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. PIL); "
        "this environment ships none — use extract_features' fake path"
    )


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """media → per-item feature vectors via mapInPandas.

    The iterator-of-batches signature is the 100 TB shape: Arrow batches
    stream through the Python worker without materializing a partition,
    so payload size bounds memory, not row count. Partitioning is
    whatever upstream chose — callers repartition by size/bucket before
    this when payloads skew.
    """
    import pandas as pd

    # everything the workers run is NESTED here, deliberately:
    # cloudpickle ships closures by value, while module-level functions
    # are pickled by reference and break on workers that don't have this
    # package on their import path (e.g. driver launched from another
    # cwd without --py-files)
    dim = FEATURE_DIM

    def fake_features(payload: bytes) -> list[float]:
        # deterministic stand-in for decode→embed: byte-bucket histogram
        # normalized by length (stable across runs/partitions)
        if not payload:
            return [0.0] * dim
        counts = [0] * dim
        for b in payload:
            counts[b % dim] += 1
        n = float(len(payload))
        return [c / n for c in counts]

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = [
                fake_features(bytes(p)) if p is not None else [0.0] * dim
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        batches, schema=FEATURES_SCHEMA
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: utf-8 payload bytes +
    typed metadata. Stands in for an image/audio lake table whose binary
    column came from object storage."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


@demo_query(
    "q_multimodal_features",
    # the Arrow path's OUTPUT is SQL-derivable even though its execution
    # is Python: payloads are utf-8 text bytes (ASCII corpus → length ≡
    # chars) and the deterministic fake extractor emits one FEATURE_DIM
    # vector per item — so the aggregate is fully oracle-checkable
    oracle="""
    SELECT 'image' AS media_type,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_feature_vectors
    FROM documents
    """,
)
def q_multimodal_features(spark, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: synthesize media from
    documents, extract features via mapInPandas, aggregate per media
    bucket. Integer sums only, so the result is order-independent — and
    SQL-derivable, so the Arrow path is value-verified, not just
    rows-counted."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_if(F.size("features") == FEATURE_DIM).alias("n_feature_vectors"),
    )


@demo_query(
    "q_scan_binaryfile",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct
    FROM documents WHERE doc_id < 8
    """,
)
def q_scan_binaryfile(spark, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the ingest path for media blobs: each file
    becomes one row of (path, modificationTime, length, content). Stages
    a bounded document slice as .bin files, reads them back, and reduces
    to content statistics (bytes + distinct-payload count), which a SQL
    oracle can compute from the same text — proving the binary round-trip
    is byte-exact. At scale the source parallelizes over files and
    supports pathGlobFilter/recursiveFileLookup partition discovery; pair
    with maxPartitionBytes so a partition holds a bounded payload volume.
    """
    import os

    from ..functions.scratch import scratch_dir

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 8)
        .select("doc_id", "text")
    )
    work = scratch_dir("spark_graft_binaryfile", unique=True)
    for row in docs.collect():  # bounded slice: 8 rows staged driver-side
        with open(os.path.join(work, f"{row['doc_id']}.bin"), "wb") as fh:
            fh.write(row["text"].encode("utf-8"))
    blobs = spark.read.format("binaryFile").load(work)
    return blobs.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.length("content")).cast("bigint").alias("total_bytes"),
        F.countDistinct(F.md5("content")).alias("n_distinct"),
    )
