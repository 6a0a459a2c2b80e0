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


# ---------------------------------------------------------------------------
# frame sampling + resize — the remaining mandated media ops. Same
# contract as extract_features: the byte-level transform runs in the
# Python worker over streaming Arrow batches (where a real ffmpeg/PIL
# call would go), while the frame/stride arithmetic is deterministic so
# the OUTPUT is byte-exact SQL-derivable (ASCII payloads: char slicing
# ≡ byte slicing).
# ---------------------------------------------------------------------------

FRAME_BYTES = 64  # fixed "frame" width in the fake container format
FRAME_STRIDE = 4  # keep every 4th frame
RESIZE_STRIDE = 4  # keep every 4th byte ("downsample")

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """1→N frame sampling via mapInPandas: split each payload into
    FRAME_BYTES-wide frames, keep every FRAME_STRIDE-th, emit one row
    per kept frame. The output explodes INSIDE the Arrow batch loop —
    no driver materialization, memory bounded by batch payload bytes.
    A real video pipeline swaps the byte-slice for a keyframe decode;
    the Spark plumbing (iterator signature, 1→N fan-out, schema) is
    exactly this."""
    import hashlib

    import pandas as pd

    fb, fs = FRAME_BYTES, FRAME_STRIDE

    def batches(it):
        for pdf in it:
            ids, idxs, lens, digs = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                for i in range(0, (len(p) + fb - 1) // fb):
                    if i % fs:
                        continue
                    fr = p[i * fb : (i + 1) * fb]
                    ids.append(mid)
                    idxs.append(i)
                    lens.append(len(fr))
                    digs.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_len": lens,
                    "frame_md5": digs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=FRAMES_SCHEMA
    )


@demo_query(
    "q_multimodal_frames",
    oracle=f"""
    WITH f AS (
      SELECT doc_id AS media_id,
             unnest(generate_series(0,
               CAST(FLOOR((length(text) - 1) / {FRAME_BYTES}) AS BIGINT))) AS i,
             text
      FROM documents WHERE source = 'src0'
    )
    SELECT media_id, i AS frame_idx,
           CAST(length(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES}))
                AS BIGINT) AS frame_len,
           md5(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
    FROM f WHERE i % {FRAME_STRIDE} = 0
    """,
)
def q_multimodal_frames(spark, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline over one source bucket: media synthesis →
    mapInPandas frame explode → per-frame rows. Every emitted frame's
    md5 is hash-checked against the SQL byte-slicing twin, so the Arrow
    1→N path is value-verified frame-for-frame."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source") == "src0"
    )
    return sample_frames(documents_as_media(docs))


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_media(media: DataFrame) -> DataFrame:
    """Stride-downsample each payload (every RESIZE_STRIDE-th byte) in
    the Python worker — the stand-in for a real thumbnail/resample
    kernel, with the same Arrow-batch memory posture as
    extract_features."""
    import hashlib

    import pandas as pd

    rs = RESIZE_STRIDE

    def batches(it):
        for pdf in it:
            # Empty/null payloads yield NO row — mirrors the SQL twin,
            # whose generate_series(1, 0, stride) produces no rows so
            # the doc drops out of the GROUP BY entirely.
            rows = [
                (mid, bytes(p))
                for mid, p in zip(pdf["media_id"], pdf["payload"])
                if p is not None and len(p) > 0
            ]
            orig = [p for _, p in rows]
            small = [p[::rs] for p in orig]
            yield pd.DataFrame(
                {
                    # explicit int64 dtype so an all-filtered (empty)
                    # batch still Arrow-converts to the long schema
                    "media_id": pd.Series(
                        [mid for mid, _ in rows], dtype="int64"
                    ),
                    "orig_bytes": pd.Series(
                        [len(p) for p in orig], dtype="int64"
                    ),
                    "resized_bytes": pd.Series(
                        [len(s) for s in small], dtype="int64"
                    ),
                    "resized_md5": pd.Series(
                        [hashlib.md5(s).hexdigest() for s in small],
                        dtype="object",
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


@demo_query(
    "q_multimodal_resize",
    oracle=f"""
    WITH s AS (
      SELECT doc_id AS media_id, length(text) AS n,
             string_agg(substr(text, i, 1), '' ORDER BY i) AS small
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text), {RESIZE_STRIDE}))
                     AS i
            FROM documents WHERE source = 'src0')
      GROUP BY doc_id, length(text), text
    )
    SELECT media_id, CAST(n AS BIGINT) AS orig_bytes,
           CAST(length(small) AS BIGINT) AS resized_bytes,
           md5(small) AS resized_md5
    FROM s
    """,
)
def q_multimodal_resize(spark, sf_dir: str) -> DataFrame:
    """Resize pipeline over one source bucket: every payload stride-
    downsampled in the Arrow worker; output md5s hash-match the SQL
    every-Nth-char reconstruction, so the resize path is value-verified
    byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source") == "src0"
    )
    return resize_media(documents_as_media(docs))
