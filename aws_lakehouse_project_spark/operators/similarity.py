"""Similarity search over the ``embeddings`` table (SURVEY.md §7.2 M6c).

Two paths:

- brute-force cosine top-k (the correctness baseline): broadcast the query
  vector, one scan, TakeOrderedAndProject — O(N·d), no shuffle of the
  corpus.
- LSH-bucketed ANN (the scale path): sign-random-projection buckets from
  deterministic hyperplanes shared with the oracle; search touches only
  the query's bucket.

All vector math is array built-ins (zip_with + aggregate fold) on doubles.
Both Spark's ``aggregate`` and DuckDB's ``list_inner_product`` fold
sequentially left-to-right, so dot products are bit-identical — the
top-k boundary is therefore deterministic across engines.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import demo_query

_DIM = 64
_QUERY_VEC_ID = 0
_TOPK = 20


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


_TOPK_ORACLE = f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label,
           ROUND(
             list_inner_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_inner_product(q.qv, q.qv))), 6) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> {_QUERY_VEC_ID}
    ORDER BY list_inner_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_inner_product(q.qv, q.qv))) DESC,
             e.vec_id
    LIMIT {_TOPK}
"""


def brute_topk(emb: DataFrame, query_vec_id: int, k: int = _TOPK) -> DataFrame:
    """Brute-force cosine top-k for one query vector.

    The query vector is a one-row broadcast cross join (no shuffle of the
    corpus side); orderBy+limit compiles to TakeOrderedAndProject, i.e.
    per-partition top-k then a driver merge of k·partitions rows — the
    correct brute-force shape at any scale.
    """
    q = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(as_double("embedding").alias("qv"))
        # query norm rides in the 1-row broadcast instead of being
        # re-folded per corpus row (bit-identical: same expression)
        .withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    )
    e = emb.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id", "label", as_double("embedding").alias("ev")
    )
    joined = e.crossJoin(F.broadcast(q))
    cosine = dot(F.col("ev"), F.col("qv")) / (
        F.sqrt(dot(F.col("ev"), F.col("ev"))) * F.col("qn")
    )
    return (
        joined.select("vec_id", "label", cosine.alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(k)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


@demo_query("q_similarity_topk", oracle=_TOPK_ORACLE)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k baseline (see ``brute_topk``)."""
    return brute_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_VEC_ID)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------

_N_PLANES = 4  # 16 buckets; testdata has 500-2000 vectors → ~30-125 per bucket
_MAX_PLANES = 32  # master list; callers slice a prefix (bands × bits ≤ 32)
# Hard cap on planes per single bucket id: bit j contributes 2^j and the
# id is a 32-bit int, so 32 planes would put 2^31 in bit 31 and overflow
# the ANSI int cast for ~half the vectors. 31 bits ≤ 2^31-1 always fits.
_CAP_PLANES = 31
_rng = random.Random(1337)
# deterministic hyperplanes, shared verbatim with the oracle SQL. The
# master list extends the SAME seeded stream row-by-row, so the first
# _N_PLANES rows are bit-identical to every earlier round's planes (the
# oracle literals never move) while scale-aware callers can take a
# longer prefix: bucket-occupancy stays constant only if the bit count
# grows with log2(corpus) — n_planes = log2(N / target_bucket_size).
# The cost of more bits is recall at a given cosine threshold
# (p(θ)^n_planes, p = 1 - θ/π); the production corrective is multi-band
# LSH (b independent bands OR-ed together — the layout minhash_pairs
# already ships), not holding the bucket count fixed while N grows.
_PLANES = [
    [round(_rng.uniform(-1.0, 1.0), 6) for _ in range(_DIM)] for _ in range(_MAX_PLANES)
]


def _bucket_expr(vec: Column, n_planes: int = _N_PLANES) -> Column:
    """Sign-random-projection bucket id: bit j = (vec · plane_j) > 0."""
    if n_planes > _CAP_PLANES:
        raise ValueError(
            f"n_planes={n_planes} > {_CAP_PLANES}: bit {n_planes - 1} would "
            "overflow the 32-bit bucket id (ANSI CAST_OVERFLOW)"
        )
    bits = [
        F.when(dot(vec, F.array(*[F.lit(w) for w in plane])) > 0, F.lit(1 << j))
        .otherwise(0)
        for j, plane in enumerate(_PLANES[:n_planes])
    ]
    return sum(bits).cast("int")


def planes_for(n_vectors: int, target_occupancy: int = 125) -> int:
    """Scale rule for the sign-LSH bit count: enough hyperplanes that
    the EXPECTED bucket occupancy stays ~target (n_planes =
    ceil(log2(N / target))), floored at the oracle default. Callers at
    10× corpus pass ``n_planes=planes_for(df.count())`` to keep the
    bucket self-join linear in N instead of quadratic-in-occupancy
    (BASELINE.md round-6 soak: 16 fixed buckets at 10× vectors made
    q_similarity_pairs 94× slower; +3 bits restored ~linear)."""
    import math

    if n_vectors <= target_occupancy:
        return _N_PLANES
    # cap at _CAP_PLANES (31), not the 32-row master list: a 32-plane
    # bucket id would overflow its int cast (see _bucket_expr)
    return max(_N_PLANES, min(_CAP_PLANES, math.ceil(math.log2(n_vectors / target_occupancy))))


def _plane_lit(plane: list[float]) -> str:
    return "[" + ", ".join(repr(w) for w in plane) + "]::DOUBLE[]"


def _bucket_sql(expr: str) -> str:
    """DuckDB twin of ``_bucket_expr`` at the oracle-default 4 planes.
    Dynamic plane counts go through ``_bucket_sql_masked`` /
    ``_band_bucket_sql_masked`` instead."""
    terms = []
    for j, plane in enumerate(_PLANES[:_N_PLANES]):
        terms.append(
            f"(CASE WHEN list_inner_product({expr}, {_plane_lit(plane)}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


# --- data-dependent plane count (the planes_for scale rule, in SQL) --------
#
# The scaled oracle queries must agree with ``planes_for`` at EVERY SF the
# sweeps run (sf0.001 … sf10), so the oracle derives n_planes from
# COUNT(*) with the same formula, and the bucket id is a masked sum over
# the full 31-plane master prefix: term j contributes only when j < npl.
# Both engines divide as doubles and call libm log2, so the ceil boundary
# is bit-identical.

_SCALED_TARGET = 30  # occupancy target for the registered *scaled* demos:
# small enough that the driver's sf0.01 corpus (500 vectors) already
# needs 5 planes (> the 4-plane demo) and sf0.1 needs 7 — the rule is
# exercised, not floored. Production default stays planes_for's 125.


def _np_sql(target: int = _SCALED_TARGET) -> str:
    """CTE body computing the planes_for(count, target) scalar as npl.
    GREATEST(COUNT(*), 1) guards LOG2(0) on an empty table — Python's
    planes_for short-circuits n <= target to the 4-plane floor, and
    log2(1/target) < 0 lands on the same floor here."""
    return (
        f"SELECT GREATEST({_N_PLANES}, LEAST({_CAP_PLANES}, "
        f"CAST(CEIL(LOG2(GREATEST(COUNT(*), 1) / CAST({target} AS DOUBLE))) "
        f"AS INTEGER))) AS npl FROM embeddings"
    )


def _bucket_sql_masked(expr: str, np_ref: str = "npl") -> str:
    """Masked-sum bucket id: identical to ``_bucket_sql(expr, npl)`` for
    any npl ≤ 31, with npl supplied at query time (cross-joined CTE)."""
    terms = []
    for j, plane in enumerate(_PLANES[:_CAP_PLANES]):
        terms.append(
            f"(CASE WHEN {j} < {np_ref} AND "
            f"list_inner_product({expr}, {_plane_lit(plane)}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


_LSH_ORACLE = f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv,
             {_bucket_sql("embedding::DOUBLE[]")} AS bucket
      FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
    ),
    cand AS (
      SELECT e.vec_id, e.label, e.embedding::DOUBLE[] AS ev, q.qv
      FROM embeddings e, q
      WHERE {_bucket_sql("e.embedding::DOUBLE[]")} = q.bucket
        AND e.vec_id <> {_QUERY_VEC_ID}
    )
    SELECT vec_id, label,
           ROUND(list_inner_product(ev, qv)
                 / (sqrt(list_inner_product(ev, ev))
                    * sqrt(list_inner_product(qv, qv))), 6) AS cosine
    FROM cand
    ORDER BY list_inner_product(ev, qv)
             / (sqrt(list_inner_product(ev, ev)) * sqrt(list_inner_product(qv, qv)))
             DESC, vec_id
    LIMIT {_TOPK}
"""


def lsh_topk(emb: DataFrame, query_vec_id: int, k: int = _TOPK) -> DataFrame:
    """ANN via sign-random-projection LSH: assign every vector to one of
    2^N_PLANES buckets (deterministic hyperplanes), then rank only the query's
    bucket. At 100 TB the bucket column is precomputed at ingest and the
    table partitioned by it, turning ANN into a partition-pruned scan of
    ~1/2^N_PLANES of the corpus."""
    withb = emb.select(
        "vec_id", "label", as_double("embedding").alias("ev")
    ).withColumn("bucket", _bucket_expr(F.col("ev")))
    q = (
        withb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("ev").alias("qv"), F.col("bucket").alias("qbucket"))
        # query norm in the broadcast, not re-folded per candidate
        .withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    )
    cand = withb.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    ).filter(F.col("vec_id") != query_vec_id)
    cosine = dot(F.col("ev"), F.col("qv")) / (
        F.sqrt(dot(F.col("ev"), F.col("ev"))) * F.col("qn")
    )
    return (
        cand.select("vec_id", "label", cosine.alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(k)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


@demo_query("q_similarity_lsh", oracle=_LSH_ORACLE)
def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (see ``lsh_topk``)."""
    return lsh_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_VEC_ID)


# ---------------------------------------------------------------------------
# IVF ANN (inverted-file index — the k-means-style scale path)
# ---------------------------------------------------------------------------

_IVF_K = 8  # coarse-quantizer lists; centroids = vec_id 1.._IVF_K (deterministic)
_IVF_NPROBE = 2

_COS = (
    "list_inner_product({a}, {b}) / "
    "(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b})))"
)

_IVF_ORACLE = f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id BETWEEN 1 AND {_IVF_K}
    ),
    e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    assign AS (
      SELECT e.vec_id, e.label, e.v, c.cid
      FROM e, c
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY {_COS.format(a="e.v", b="c.cv")} DESC, c.cid
      ) = 1
    ),
    qv AS (SELECT v FROM e WHERE vec_id = {_QUERY_VEC_ID}),
    probe AS (
      SELECT c.cid FROM c, qv
      QUALIFY ROW_NUMBER() OVER (
        ORDER BY {_COS.format(a="qv.v", b="c.cv")} DESC, c.cid
      ) <= {_IVF_NPROBE}
    )
    SELECT a.vec_id, a.label,
           ROUND({_COS.format(a="a.v", b="qv.v")}, 6) AS cosine
    FROM assign a, qv
    WHERE a.cid IN (SELECT cid FROM probe) AND a.vec_id <> {_QUERY_VEC_ID}
    ORDER BY {_COS.format(a="a.v", b="qv.v")} DESC, a.vec_id
    LIMIT {_TOPK}
"""


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = _TOPK,
    nprobe: int = _IVF_NPROBE,
) -> DataFrame:
    """IVF ANN: assign every vector to its nearest of k coarse-quantizer
    centroids (here: the first k vectors, a deterministic stand-in for
    k-means — the assignment/probe machinery is identical), then search
    only the query's nprobe nearest lists.

    At 100 TB the assignment is precomputed at ingest and the table is
    partitioned by list id, so a query scans nprobe/k of the corpus;
    centroids are a driver-side broadcast (k·dim doubles — metadata
    sized)."""
    from pyspark.sql import Window

    # norms hoisted per vector/centroid: the k-way centroid crossJoin
    # re-folded both norms per (row, centroid) pair — ~3x the necessary
    # interpreted array-fold work. Same expressions ⇒ bit-identical.
    e = emb.select(
        "vec_id", "label", as_double("embedding").alias("v")
    ).withColumn("vn", F.sqrt(dot(F.col("v"), F.col("v"))))
    c = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _IVF_K))
        .select(F.col("vec_id").alias("cid"), as_double("embedding").alias("cv"))
        .withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    )

    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("cid")
    )
    assign = (
        e.crossJoin(F.broadcast(c))
        .withColumn(
            "sim",
            dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn")),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "v", "vn", "cid")
    )
    qv = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qvec"), F.col("vn").alias("qn")
    )
    probe = (
        c.crossJoin(F.broadcast(qv))
        .withColumn(
            "sim",
            dot(F.col("qvec"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        )
        .orderBy(F.col("sim").desc(), F.col("cid"))
        .limit(nprobe)
        .select("cid")
    )
    cand = assign.join(F.broadcast(probe), "cid").filter(
        F.col("vec_id") != query_vec_id
    )
    scored = cand.crossJoin(F.broadcast(qv)).withColumn(
        "cos_raw",
        dot(F.col("v"), F.col("qvec")) / (F.col("vn") * F.col("qn")),
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(k)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


@demo_query("q_similarity_ivf", oracle=_IVF_ORACLE)
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (see ``ivf_topk``)."""
    return ivf_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_VEC_ID)


_PAIRS_ORACLE = f"""
    WITH np AS ({_np_sql()}),
    b AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev,
             {_bucket_sql_masked("embedding::DOUBLE[]")} AS bucket
      FROM embeddings, np
    ),
    scored AS (
      SELECT a.vec_id AS v1, c.vec_id AS v2,
             ROUND(list_inner_product(a.ev, c.ev)
                   / (sqrt(list_inner_product(a.ev, a.ev))
                      * sqrt(list_inner_product(c.ev, c.ev))), 6) AS cosine
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT v1, v2, cosine FROM scored WHERE cosine >= 0.40
"""


@demo_query("q_similarity_pairs", oracle=_PAIRS_ORACLE)
def q_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup by embedding): bucket
    self-join on the LSH bucket, exact cosine filter — candidate
    generation is per-bucket, never all-pairs. The threshold (0.40) sits
    in the top tail of the testdata's cosine distribution (max observed
    ~0.51; no true dups are planted), so the demo returns a small
    non-empty set; recall is bounded by the LSH collision probability,
    which is the ANN trade-off this operator exists to make.

    The bit count comes from the corpus via ``planes_for`` — the
    occupancy-corrected configuration. Until round 7 this name pinned
    4 literal planes (16 buckets); that config is quadratic in
    occupancy and measured 65.9–69.5× wall at 10× data in the r7 soaks
    vs 4.3–4.8× corrected, so the fixed form is retired from the
    registered surface (still callable as
    ``similarity_pairs(emb, n_planes=4)`` for the contrast).

    Oracle-checked: ``_bucket_expr``'s hyperplanes are literal constants
    reproduced verbatim by the masked-sum SQL, the oracle derives the
    plane count from COUNT(*) with the same GREATEST/LEAST/CEIL/LOG2
    formula, and both engines fold the dot product sequentially
    left-to-right (module docstring), so bucket ids and 6-decimal
    cosines are engine-identical at every SF."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = planes_for(emb.count(), _SCALED_TARGET)
    return similarity_pairs(emb, n_planes=n)


def similarity_pairs(
    emb: DataFrame, threshold: float = 0.40, n_planes: int = _N_PLANES
) -> DataFrame:
    """(v1, v2, cosine) bucket-joined near-dup pairs. ``n_planes`` is
    the scale knob (see ``planes_for``): every registered caller derives
    it from the corpus size; a 10×-bigger corpus needs +log2(10)≈3 bits
    to hold bucket occupancy — and therefore join cost per vector —
    constant. A fixed small n_planes is the quadratic trap the r7 soaks
    measured (65.9× wall at 10× data for 4 planes)."""
    # norms hoisted to per-VECTOR columns before the join: inside the
    # join projection sqrt(dot(e,e)) is re-evaluated per candidate PAIR
    # (occupancy× the work, in interpreted higher-order folds — see
    # ``dot``); same expression per row ⇒ bit-identical cosines
    withb = (
        emb.select("vec_id", as_double("embedding").alias("ev"))
        .withColumn("bucket", _bucket_expr(F.col("ev"), n_planes))
        .withColumn("nrm", F.sqrt(dot(F.col("ev"), F.col("ev"))))
    )
    a = withb.select(
        F.col("vec_id").alias("v1"), F.col("ev").alias("e1"),
        F.col("nrm").alias("n1"), "bucket",
    )
    b = withb.select(
        F.col("vec_id").alias("v2"), F.col("ev").alias("e2"),
        F.col("nrm").alias("n2"), "bucket",
    )
    cosine = dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return (
        a.join(b, "bucket")
        .filter(F.col("v1") < F.col("v2"))
        .select("v1", "v2", F.round(cosine, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def similarity_pairs_banded(
    emb: DataFrame,
    threshold: float = 0.40,
    bands: int = 4,
    bits: int = 8,
) -> DataFrame:
    """(v1, v2, cosine) near-dup pairs via MULTI-BAND sign-LSH — the
    production recall corrective for scaled-up single-band bucketing
    (same OR-of-ANDs layout as ``minhash_pairs``): band j hashes planes
    [j*bits, (j+1)*bits); a pair is a candidate if ANY band agrees, so
    per-band recall p^bits becomes 1-(1-p^bits)^bands while per-band
    occupancy — and therefore join cost — stays the N/2^bits of the
    occupancy-corrected single band. ``bands*bits`` ≤ ``_MAX_PLANES``.

    Shape (mirrors minhash_pairs exactly): the band table carries
    (vec_id, band, bucket) keys ONLY — one self-join on (band, bucket),
    distinct candidate ids, then embeddings re-join for the exact
    cosine filter, so vectors never ride through the candidate
    explosion. Precision is exact (every emitted pair passes the true
    cosine threshold); only recall is probabilistic.
    """
    if bands * bits > _MAX_PLANES:
        raise ValueError(
            f"bands*bits={bands * bits} exceeds the {_MAX_PLANES}-plane "
            "master list"
        )
    if bits > _CAP_PLANES:
        raise ValueError(
            f"bits={bits} > {_CAP_PLANES}: bit {bits - 1} would overflow "
            "the per-band 32-bit bucket id (ANSI CAST_OVERFLOW)"
        )
    base = emb.select("vec_id", as_double("embedding").alias("ev"))
    band_cols = [
        F.struct(
            F.lit(j).alias("band"),
            sum(
                (
                    F.when(
                        dot(F.col("ev"), F.array(*[F.lit(w) for w in plane])) > 0,
                        F.lit(1 << i),
                    ).otherwise(0)
                )
                for i, plane in enumerate(_PLANES[j * bits : (j + 1) * bits])
            ).cast("int").alias("bucket"),
        )
        for j in range(bands)
    ]
    keyed = base.select(
        "vec_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2")
        )
        .distinct()
    )
    normed = base.withColumn("nrm", F.sqrt(dot(F.col("ev"), F.col("ev"))))
    e1 = normed.select(
        F.col("vec_id").alias("v1"), F.col("ev").alias("e1"),
        F.col("nrm").alias("n1"),
    )
    e2 = normed.select(
        F.col("vec_id").alias("v2"), F.col("ev").alias("e2"),
        F.col("nrm").alias("n2"),
    )
    cosine = dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return (
        cand.join(e1, "v1")
        .join(e2, "v2")
        .select("v1", "v2", F.round(cosine, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Scale-safe near-dup configs, oracle-checked (the configurations the
# 100 TB claims rest on — BASELINE.md r6 soak measured the fixed 4-plane
# demo quadratic-in-occupancy at 10×; these register the correctives).
# ---------------------------------------------------------------------------

_SCALED_PAIRS_T = 0.30  # scaled demos keep the richer 0.30 tail so the
# higher-plane buckets still surface non-empty candidate sets at sf0.01

_PAIRS_SCALED_ORACLE = f"""
    WITH np AS ({_np_sql()}),
    b AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev,
             {_bucket_sql_masked("embedding::DOUBLE[]")} AS bucket
      FROM embeddings, np
    ),
    scored AS (
      SELECT a.vec_id AS v1, c.vec_id AS v2,
             ROUND(list_inner_product(a.ev, c.ev)
                   / (sqrt(list_inner_product(a.ev, a.ev))
                      * sqrt(list_inner_product(c.ev, c.ev))), 6) AS cosine
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT v1, v2, cosine FROM scored WHERE cosine >= {_SCALED_PAIRS_T}
"""


@demo_query("q_similarity_pairs_scaled", oracle=_PAIRS_SCALED_ORACLE)
def q_similarity_pairs_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy-corrected near-dup pairs: the SAME operator as
    q_similarity_pairs but with the bit count derived from the corpus by
    ``planes_for`` — the configuration that stays linear as N grows
    (BASELINE.md r6: fixed 16 buckets went 94× at 10×; +3 bits restored
    ~linear). The oracle computes n_planes from COUNT(*) with the same
    GREATEST/LEAST/CEIL/LOG2 formula and masks the 31-term plane sum, so
    the rule itself — not just one frozen config — is engine-checked at
    every SF the sweeps run (500 vectors → 5 planes, 2 000 → 7)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # corpus-size scalar: at 100 TB this is ingest-time metadata, not a
    # per-query scan; here one count() against the parquet footer stats
    n = planes_for(emb.count(), _SCALED_TARGET)
    return similarity_pairs(emb, threshold=_SCALED_PAIRS_T, n_planes=n)


_BANDED_BANDS = 2
# per-band bit width cap: 2 bands must fit the 32-row master list
_BANDED_MAX_BITS = _MAX_PLANES // _BANDED_BANDS


def banded_bits_for(n_vectors: int, target_occupancy: int = _SCALED_TARGET) -> int:
    """Occupancy-corrected per-band bit width for the 2-band layout:
    the same ``planes_for`` rule, capped so both bands fit the master
    list. A FIXED bit width is the same quadratic trap banding exists
    to avoid — at 100× corpus, 8-bit bands went quadratic-in-occupancy
    and spilled out the r7 soak box; bits must grow with log2(N)."""
    return min(_BANDED_MAX_BITS, planes_for(n_vectors, target_occupancy))


def _band_bucket_sql_masked(expr: str, band: int, nb_ref: str = "nb") -> str:
    """DuckDB twin of band ``band``'s bucket id at runtime bit width
    ``nb_ref``: plane j belongs to band b iff b*nb <= j < (b+1)*nb,
    contributing bit weight 2^(j - b*nb) — expressed with integer
    shifts so any nb ≤ 16 uses the identical plane slice and weights
    as similarity_pairs_banded's _PLANES[b*bits:(b+1)*bits] slicing."""
    terms = []
    for j, plane in enumerate(_PLANES):
        terms.append(
            f"(CASE WHEN {j} >= {band} * {nb_ref} AND {j} < {band + 1} * {nb_ref}"
            f" AND list_inner_product({expr}, {_plane_lit(plane)}) > 0"
            f" THEN CAST((CAST(1 AS BIGINT) << {j}) >> ({band} * {nb_ref})"
            f" AS INTEGER) ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _banded_oracle() -> str:
    b0 = _band_bucket_sql_masked("embedding::DOUBLE[]", 0)
    b1 = _band_bucket_sql_masked("embedding::DOUBLE[]", 1)
    return f"""
    WITH np AS ({_np_sql()}),
    nb AS (SELECT LEAST({_BANDED_MAX_BITS}, npl) AS nb FROM np),
    b AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev,
             {b0} AS b0, {b1} AS b1
      FROM embeddings, nb
    ),
    scored AS (
      SELECT a.vec_id AS v1, c.vec_id AS v2,
             ROUND(list_inner_product(a.ev, c.ev)
                   / (sqrt(list_inner_product(a.ev, a.ev))
                      * sqrt(list_inner_product(c.ev, c.ev))), 6) AS cosine
      FROM b a JOIN b c
        ON (a.b0 = c.b0 OR a.b1 = c.b1) AND a.vec_id < c.vec_id
    )
    SELECT v1, v2, cosine FROM scored WHERE cosine >= {_SCALED_PAIRS_T}
"""


@demo_query("q_similarity_pairs_banded", oracle=_banded_oracle())
def q_similarity_pairs_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-band sign-LSH near-dup pairs at the occupancy-corrected
    per-band bit width (2 bands × banded_bits_for(N) bits): per-band
    occupancy — and join cost — stays that of the occupancy-corrected
    single band while recall doubles via the OR of two independent
    bands. Both the Spark side and the oracle derive the bit width from
    COUNT(*) (masked shift-weighted plane sums in SQL), so the banded
    scale rule itself is engine-checked: 500 vectors → 2×5 bands,
    2 000 → 2×7. The oracle joins on (band0 match OR band1 match) —
    exactly the OR-of-ANDs the banded candidate union computes;
    precision is exact on both sides (every emitted pair passes the
    true cosine threshold)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bits = banded_bits_for(emb.count())
    return similarity_pairs_banded(
        emb,
        threshold=_SCALED_PAIRS_T,
        bands=_BANDED_BANDS,
        bits=bits,
    )


_ANN_JOIN_ORACLE = f"""
    SELECT t.vec_id, t.cosine, d.lang, d.source,
           CAST(d.n_chars AS BIGINT) AS n_chars
    FROM ({_TOPK_ORACLE}) t
    JOIN documents d ON d.doc_id = t.vec_id
"""


@demo_query("q_ann_join_docs", oracle=_ANN_JOIN_ORACLE)
def q_ann_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval composite: cosine top-k over embeddings, then join the
    k survivors back to ``documents`` for their metadata — the
    vector-search → document-fetch pattern every retrieval pipeline runs.

    The k-row result side broadcasts into the documents join, so the
    fetch costs one pruned scan of documents regardless of corpus size;
    at 100 TB both tables share the id as sort/partition key and the
    fetch becomes a partition-pruned point lookup per survivor.
    """
    top = brute_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_VEC_ID)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    return (
        F.broadcast(top.select("vec_id", "cosine"))
        .join(docs, F.col("doc_id") == F.col("vec_id"))
        .select("vec_id", "cosine", "lang", "source", "n_chars")
    )


@demo_query(
    "q_embedding_centroids",
    oracle="""
    WITH flat AS (
      SELECT label,
             unnest(embedding) AS val,
             unnest(range(len(embedding))) AS pos
      FROM embeddings
    )
    SELECT label,
           CAST(pos AS INTEGER) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(CAST(SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1e7) AS BIGINT))
                      AS DOUBLE) / 1e7 / COUNT(*), 6) AS centroid_val
    FROM flat GROUP BY label, pos
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long format (label, dimension,
    mean) — the training step behind the IVF coarse quantizer and the
    class-prototype baseline.

    Cross-row float sums are partition-order-dependent, so the mean is
    computed over values quantized to 1e-7 (exact integer sums →
    deterministic on any engine/partitioning; a float's ×1e7 product is
    never exactly half-integer, so the rounding itself is
    engine-agnostic). One posexplode + one (label, pos) aggregation —
    the shuffle carries dims × labels rows, not vectors.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    qval = F.round(F.col("val").cast("double") * 1e7).cast("bigint")
    return flat.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(
            F.sum(qval).cast("double") / F.lit(1e7) / F.count(F.lit(1)), 6
        ).alias("centroid_val"),
    )


@demo_query(
    "q_embedding_quantize",
    oracle="""
    WITH q AS (
      SELECT label,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
             embedding
      FROM embeddings
    ),
    err AS (
      SELECT label,
             CAST(ROUND(list_avg(list_transform(embedding,
                   x -> pow(CAST(x AS DOUBLE)
                            - ROUND(CAST(x AS DOUBLE) / scale * 127) * scale / 127,
                            2))) * 1e12) AS BIGINT) AS mse_pico
      FROM q WHERE scale > 0
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(mse_pico) AS BIGINT) AS total_mse_pico
    FROM err GROUP BY label
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization with reconstruction-error accounting:
    per vector, symmetric max-abs scaling to [-127, 127] and the
    round-trip MSE; per label, exact integer totals of the per-vector
    error (quantized to picounits so cross-row float summation order
    cannot perturb the result — same discipline as the centroid op).

    Everything is per-row higher-order array math on the scan
    (transform/aggregate fold in both engines evaluates in element
    order → deterministic doubles); the only shuffle carries one
    (label, n, mse) row per label. This is the storage-shrink step
    (4 bytes → 1 byte/dim) run before shipping embeddings to ANN
    serving."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_scale = emb.select(
        "label", as_double("embedding").alias("v")
    ).withColumn(
        "scale", F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    ).filter(F.col("scale") > 0)
    qerr = F.transform(
        F.col("v"),
        lambda x: F.pow(
            x - F.round(x / F.col("scale") * 127) * F.col("scale") / 127, F.lit(2)
        ),
    )
    mse = F.aggregate(qerr, F.lit(0.0), lambda acc, e: acc + e) / F.size(F.col("v"))
    per_vec = with_scale.select(
        "label",
        F.round(mse * 1e12).cast("bigint").alias("mse_pico"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("mse_pico").cast("bigint").alias("total_mse_pico"),
    )


@demo_query("q_similarity_ivf_pruned", oracle=_IVF_ORACLE)
def q_similarity_ivf_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, the at-scale layout made REAL (the design ``ivf_topk``'s
    docstring promises): list assignment PRECOMPUTED AT INGEST and the
    index written as a parquet table PARTITIONED BY LIST ID, so the
    probe phase physically reads only nprobe/k of the corpus via static
    partition pruning — `cid IN (...)` reaches the scan as a
    PartitionFilter, and row groups of unprobed lists are never opened.

    The probe-list collect is k-bounded metadata (nprobe ids out of
    _IVF_K centroids), the same discipline as broadcasting the
    centroids themselves. Results are identical to ``q_similarity_ivf``
    (same oracle): layout changes WHERE the bytes live, not the math."""
    import os

    from pyspark.sql import Window

    from ..functions.scratch import scratch_dir

    emb = load_table(spark, sf_dir, "embeddings")
    # norms hoisted per vector/centroid (see ivf_topk — bit-identical);
    # vn is PERSISTED into the index so probes never re-fold it
    e = emb.select(
        "vec_id", "label", as_double("embedding").alias("v")
    ).withColumn("vn", F.sqrt(dot(F.col("v"), F.col("v"))))
    c = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _IVF_K))
        .select(F.col("vec_id").alias("cid"), as_double("embedding").alias("cv"))
        .withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    )

    # ingest: assign each vector to its nearest centroid list and write
    # the index partitioned by list id (one directory per list)
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cid"))
    assign = (
        e.crossJoin(F.broadcast(c))
        .withColumn(
            "sim", dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("cid", "vec_id", "label", "v", "vn")
    )
    index_path = os.path.join(scratch_dir("spark_graft_ivf_index", unique=True), "idx")
    assign.write.partitionBy("cid").parquet(index_path)

    # probe: nprobe nearest lists for the query vector — a k-bounded
    # driver-side list that becomes a static partition filter
    qv = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("v").alias("qvec"), F.col("vn").alias("qn")
    )
    probe_ids = [
        r["cid"]
        for r in c.crossJoin(F.broadcast(qv))
        .withColumn(
            "sim", dot(F.col("qvec"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
        .orderBy(F.col("sim").desc(), F.col("cid"))
        .limit(_IVF_NPROBE)
        .select("cid")
        .collect()
    ]
    index = spark.read.parquet(index_path).filter(
        F.col("cid").isin(probe_ids) & (F.col("vec_id") != _QUERY_VEC_ID)
    )
    scored = index.crossJoin(F.broadcast(qv)).withColumn(
        "cos_raw", dot(F.col("v"), F.col("qvec")) / (F.col("vn") * F.col("qn"))
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(_TOPK)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# batch ANN: many queries in one pass (the production retrieval shape)
# ---------------------------------------------------------------------------

_BATCH_Q = 5  # query set: vec_ids 0.._BATCH_Q-1
_BATCH_TOPK = 5

_BATCH_IVF_ORACLE = f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id BETWEEN 1 AND {_IVF_K}
    ),
    e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    assign AS (
      SELECT e.vec_id, e.label, e.v, c.cid
      FROM e, c
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY {_COS.format(a="e.v", b="c.cv")} DESC, c.cid
      ) = 1
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_BATCH_Q}),
    probe AS (
      SELECT q.qid, q.qv, c.cid
      FROM c, q
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q.qid
        ORDER BY {_COS.format(a="q.qv", b="c.cv")} DESC, c.cid
      ) <= {_IVF_NPROBE}
    ),
    cand AS (
      SELECT p.qid, a.vec_id, a.label, a.v, p.qv
      FROM assign a JOIN probe p ON a.cid = p.cid
      WHERE a.vec_id <> p.qid
    )
    SELECT CAST(qid AS BIGINT) AS qid, vec_id, label,
           ROUND({_COS.format(a="v", b="qv")}, 6) AS cosine
    FROM cand
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY qid ORDER BY {_COS.format(a="v", b="qv")} DESC, vec_id
    ) <= {_BATCH_TOPK}
"""


@demo_query("q_similarity_batch_ivf", oracle=_BATCH_IVF_ORACLE)
def q_similarity_batch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch IVF ANN — top-k per query for a whole QUERY SET in one pass,
    which is how production retrieval actually runs (requests arrive in
    batches, not one vector at a time).

    Shape: the corpus is assigned to coarse lists once (amortized at
    ingest — same assignment as q_similarity_ivf); the query batch and
    its per-query probe lists are metadata-sized broadcasts (Q·nprobe
    rows); candidates are only the union of probed lists tagged per
    query, so the ranking shuffle carries ~Q·(nprobe/k) of the corpus
    hashed by query id — per-reducer load is one query's candidate set,
    inherently balanced for any batch size. Never a corpus×queries
    all-pairs."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    # norms hoisted per vector/centroid/query (see ivf_topk —
    # bit-identical); qn rides inside the broadcast probe table
    e = emb.select(
        "vec_id", "label", as_double("embedding").alias("v")
    ).withColumn("vn", F.sqrt(dot(F.col("v"), F.col("v"))))
    c = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _IVF_K))
        .select(F.col("vec_id").alias("cid"), as_double("embedding").alias("cv"))
        .withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    )

    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("cid")
    )
    assign = (
        e.crossJoin(F.broadcast(c))
        .withColumn(
            "sim", dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "v", "vn", "cid")
    )
    q = e.filter(F.col("vec_id") < _BATCH_Q).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("vn").alias("qn"),
    )
    w_probe = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    probe = (
        q.crossJoin(F.broadcast(c))
        .withColumn(
            "sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("qid", "qv", "qn", "cid")
    )
    cand = assign.join(F.broadcast(probe), "cid").filter(
        F.col("vec_id") != F.col("qid")
    )
    w_rank = Window.partitionBy("qid").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        cand.withColumn(
            "cos_raw", dot(F.col("v"), F.col("qv")) / (F.col("vn") * F.col("qn"))
        )
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= _BATCH_TOPK)
        .select(
            "qid", "vec_id", "label", F.round("cos_raw", 6).alias("cosine")
        )
    )


# ---------------------------------------------------------------------------
# Semantic decontamination (train/eval split)
# ---------------------------------------------------------------------------

_EVAL_LABEL = 9  # the held-out split: ~10% of vectors in every testdata SF
_DECONTAM_T = 0.30  # cosine threshold; top tail of the corpus distribution


_DECONTAM_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS ev,
             {_bucket_sql("embedding::DOUBLE[]")} AS bucket
      FROM embeddings
    ),
    tr AS (SELECT * FROM b WHERE label <> {_EVAL_LABEL}),
    ev AS (SELECT * FROM b WHERE label = {_EVAL_LABEL}),
    contaminated AS (
      SELECT DISTINCT tr.vec_id, tr.label
      FROM tr JOIN ev ON tr.bucket = ev.bucket
      WHERE ROUND({_COS.format(a="tr.ev", b="ev.ev")}, 6) >= {_DECONTAM_T}
    )
    SELECT t.label,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(COUNT(c.vec_id) AS BIGINT) AS n_contaminated,
           CAST(COUNT(*) - COUNT(c.vec_id) AS BIGINT) AS n_clean
    FROM tr t LEFT JOIN contaminated c ON t.vec_id = c.vec_id
    GROUP BY t.label
"""


@demo_query("q_semantic_decontam", oracle=_DECONTAM_ORACLE)
def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-based decontamination: drop training vectors that are
    semantically too close to any held-out eval vector (the SemDeDup /
    eval-leakage guard every pretraining pipeline runs before training).

    Shape: both splits get the deterministic sign-random-projection
    bucket (same literal hyperplanes as q_similarity_pairs); candidates
    are the train↔eval BUCKET join — at 100 TB the eval side is tiny
    and broadcast, and the bucket equality prunes the probe to
    ~1/2^n_planes of each side, never train×eval all-pairs. Flagged ids
    are a distinct key set joined back on vec_id only (LEFT SEMI for
    this report; the removal itself is the same join LEFT ANTI — either
    way the corpus payload never reships). Output is the per-label
    survival report (n_train / n_contaminated / n_clean).

    Oracle-checked end-to-end: the hyperplanes are literals reproduced
    by ``_bucket_sql`` and both engines fold dot products sequentially
    (module docstring), so bucket ids and the 6-decimal cosine
    threshold boundary are engine-identical."""
    return semantic_decontam(load_table(spark, sf_dir, "embeddings"))


_DECONTAM_SCALED_ORACLE = f"""
    WITH np AS ({_np_sql()}),
    b AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS ev,
             {_bucket_sql_masked("embedding::DOUBLE[]")} AS bucket
      FROM embeddings, np
    ),
    tr AS (SELECT * FROM b WHERE label <> {_EVAL_LABEL}),
    ev AS (SELECT * FROM b WHERE label = {_EVAL_LABEL}),
    contaminated AS (
      SELECT DISTINCT tr.vec_id, tr.label
      FROM tr JOIN ev ON tr.bucket = ev.bucket
      WHERE ROUND({_COS.format(a="tr.ev", b="ev.ev")}, 6) >= {_DECONTAM_T}
    )
    SELECT t.label,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(COUNT(c.vec_id) AS BIGINT) AS n_contaminated,
           CAST(COUNT(*) - COUNT(c.vec_id) AS BIGINT) AS n_clean
    FROM tr t LEFT JOIN contaminated c ON t.vec_id = c.vec_id
    GROUP BY t.label
"""


@demo_query("q_semantic_decontam_scaled", oracle=_DECONTAM_SCALED_ORACLE)
def q_semantic_decontam_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination at the occupancy-corrected bit count (the scale
    config of q_semantic_decontam): ``planes_for(COUNT(*), 30)`` on both
    engines — see q_similarity_pairs_scaled for the masked-sum oracle
    device. Survival-report shape is unchanged (one row per train
    label), so this row stays stable across SFs while the bucket rule
    it certifies varies with the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = planes_for(emb.count(), _SCALED_TARGET)
    return semantic_decontam(emb, n_planes=n)


def semantic_decontam(emb: DataFrame, n_planes: int = _N_PLANES) -> DataFrame:
    """Per-label decontamination survival report. ``n_planes`` scales
    the bucket count with the corpus (``planes_for``); the demo keeps
    the oracle's 4 literal planes."""
    # per-vector norm hoist: see similarity_pairs (bit-identical)
    withb = (
        emb.select("vec_id", "label", as_double("embedding").alias("ev"))
        .withColumn("bucket", _bucket_expr(F.col("ev"), n_planes))
        .withColumn("nrm", F.sqrt(dot(F.col("ev"), F.col("ev"))))
    )
    train = withb.filter(F.col("label") != _EVAL_LABEL)
    hold = withb.filter(F.col("label") == _EVAL_LABEL).select(
        F.col("ev").alias("hv"), F.col("nrm").alias("hn"), "bucket"
    )
    cosine = dot(F.col("ev"), F.col("hv")) / (F.col("nrm") * F.col("hn"))
    contaminated = (
        train.join(F.broadcast(hold), "bucket")
        .filter(F.round(cosine, 6) >= _DECONTAM_T)
        .select("vec_id")
        .distinct()
    )
    flagged = train.join(contaminated, "vec_id", "left_semi").groupBy("label").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    totals = train.groupBy("label").agg(F.count(F.lit(1)).alias("n_train"))
    return (
        totals.join(flagged, "label", "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .select(
            "label",
            "n_train",
            "n_contaminated",
            (F.col("n_train") - F.col("n_contaminated")).alias("n_clean"),
        )
    )


# ---------------------------------------------------------------------------
# k-means (Lloyd's) — training the IVF coarse quantizer. Iterative
# algorithms are normally the canonical "rows-only" case; this one is
# fully oracle-checked by pinning the nondeterminism: fixed init
# (vec_id 1..k), a FIXED number of unrolled iterations, exact-decimal
# component sums for the centroid update (order-independent, unlike
# float sums), and 6-decimal rounding of each new centroid before the
# next assignment — every engine computes bit-identical centroids, so
# assignments match exactly.
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_ITERS = 2

_KM_DIST = (
    "(list_inner_product({x}, {x}) - 2 * list_inner_product({x}, {c})"
    " + list_inner_product({c}, {c}))"
)


def _km_oracle() -> str:
    p = ""
    prev = "c0"
    assign_tpl = """
    a{i} AS (
      SELECT e.vec_id, e.v, c.cid
      FROM e, {prev} c
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY {dist}, c.cid
      ) = 1
    )"""
    update_tpl = """
    m{i} AS (
      SELECT cid, dim,
             ROUND(CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM (SELECT cid, unnest(v) AS x,
                   generate_subscripts(v, 1) AS dim
            FROM a{i})
      GROUP BY cid, dim
    ),
    c{i} AS (
      SELECT cid, list(m ORDER BY dim) AS cv FROM m{i} GROUP BY cid
    )"""
    for i in range(1, _KM_ITERS + 1):
        p += "," + assign_tpl.format(
            i=i, prev=prev, dist=_KM_DIST.format(x="e.v", c="c.cv")
        )
        if i < _KM_ITERS:
            p += "," + update_tpl.format(i=i)
        prev = f"c{i}"
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    c0 AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND {_KM_K}
    ){p}
    SELECT vec_id, CAST(cid AS BIGINT) AS cid FROM a{_KM_ITERS}
    """


@demo_query("q_kmeans_assign", oracle=_km_oracle())
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embeddings table — the
    training step that produces a real IVF coarse quantizer (the other
    IVF queries use fixed seed centroids; this one LEARNS them).

    Per iteration: (1) assign — broadcast the k centroid arrays, argmin
    of the dot-product-expanded squared distance, deterministic cid
    tie-break; (2) update — posexplode assigned vectors to (cid, dim,
    component), sum components as DECIMAL(18,9) (exact, ORDER-
    INDEPENDENT — float sums would differ between engines and across
    partitionings), divide by count, round to 6 decimals, rebuild the
    centroid array with a sort-by-dim collect. ``localCheckpoint``
    truncates lineage per iteration (the standard iterative-algorithm
    discipline — without it the plan doubles per round).

    Scale shape: each iteration is one broadcast join over the corpus +
    one aggregation whose output is k×d rows (tiny); the corpus is
    scanned once per iteration and never reshuffled. Output is the
    final assignment (vec_id, cid), engine-identical because every
    centroid component is a rounded exact-decimal mean."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    cent = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _KM_K))
        .select(F.col("vec_id").alias("cid"), as_double("embedding").alias("cv"))
    )

    def dist2(x: Column, c: Column) -> Column:
        return dot(x, x) - 2 * dot(x, c) + dot(c, c)

    from pyspark.sql import Window

    assign = None
    for it in range(1, _KM_ITERS + 1):
        w = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("cid"))
        assign = (
            e.crossJoin(F.broadcast(cent))
            .withColumn("d2", dist2(F.col("v"), F.col("cv")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", "cid")
        )
        if it == _KM_ITERS:
            break
        comps = assign.select(
            "cid", F.posexplode("v").alias("dim", "x")
        ).select(
            "cid", (F.col("dim") + 1).alias("dim"), F.col("x").cast("decimal(18,9)").alias("xd")
        )
        means = comps.groupBy("cid", "dim").agg(
            F.round(
                F.sum("xd").cast("double") / F.count(F.lit(1)), 6
            ).alias("m")
        )
        cent = (
            means.groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    return assign.select("vec_id", F.col("cid").cast("bigint").alias("cid"))


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup, end-to-end: cosine pair edges →
# connected components → cluster profile (keep-one-per-cluster policy =
# "keep vec == component"). Composes two independently-verified pieces:
# the literal-hyperplane bucket pairs (q_similarity_pairs) and the CC
# iteration (operators/dedup.py::connected_components), with the
# recursive-CTE closure as the oracle.
# ---------------------------------------------------------------------------

_SEMCLUSTER_T = 0.30  # looser than q_similarity_pairs: richer components


def q_dedup_clusters_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNREGISTERED pedagogical contrast — the fixed-4-plane SemDeDup
    config this engine shipped until round 7. Kept callable (not on the
    registered surface) to demonstrate WHY the occupancy correction
    exists: with a frozen 16-bucket layout, per-bucket occupancy grows
    linearly with the corpus and the bucket self-join grows
    quadratically — the r7 registry soaks measured 43.2–44.6× wall at
    10× data for this form vs 4.3× for the corrected
    ``q_dedup_clusters_semantic_scaled``, which is the registered,
    oracle-checked SemDeDup query (identical semantics, ``planes_for``
    bit count). Use the scaled form for anything bigger than a demo."""
    return semantic_clusters(load_table(spark, sf_dir, "embeddings"))


_SEM_EDGES_SCALED_SQL = f"""
      SELECT a.vec_id AS d1, c.vec_id AS d2
      FROM (SELECT vec_id, embedding::DOUBLE[] AS ev,
                   {_bucket_sql_masked("embedding::DOUBLE[]")} AS bucket
            FROM embeddings, np) a
      JOIN (SELECT vec_id, embedding::DOUBLE[] AS ev,
                   {_bucket_sql_masked("embedding::DOUBLE[]")} AS bucket
            FROM embeddings, np) c
        ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      WHERE ROUND({_COS.format(a="a.ev", b="c.ev")}, 6) >= {_SEMCLUSTER_T}
"""

_SEMCLUSTER_SCALED_ORACLE = f"""
    WITH RECURSIVE np AS ({_np_sql()}),
    pairs AS (
{_SEM_EDGES_SCALED_SQL}
    ),
    edges AS (
      SELECT d1 AS src, d2 AS dst FROM pairs
      UNION
      SELECT d2 AS src, d1 AS dst FROM pairs
    ),
    reach AS (
      SELECT src AS node, dst AS r FROM edges
      UNION
      SELECT re.node, e.dst FROM reach re JOIN edges e ON re.r = e.src
    ),
    comp AS (
      SELECT node, LEAST(node, MIN(r)) AS component FROM reach GROUP BY node
    )
    SELECT component,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS vec_ids
    FROM comp GROUP BY component
"""


@demo_query("q_dedup_clusters_semantic_scaled", oracle=_SEMCLUSTER_SCALED_ORACLE)
def q_dedup_clusters_semantic_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup clusters at the occupancy-corrected bit count (the scale
    config of q_dedup_clusters_semantic): ``planes_for(COUNT(*), 30)``
    planes on both engines via the masked-sum oracle device (see
    q_similarity_pairs_scaled). Edges still join equal buckets only, so
    components stay bucket-local and CC runs in the single
    bucket_local_components stage at any plane count."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = planes_for(emb.count(), _SCALED_TARGET)
    return semantic_clusters(emb, n_planes=n)


def semantic_clusters(
    emb: DataFrame,
    threshold: float = _SEMCLUSTER_T,
    n_planes: int = _N_PLANES,
) -> DataFrame:
    """(component, n_vecs, vec_ids) SemDeDup cluster profile. ``n_planes``
    scales the bucket count with the corpus (``planes_for``); the
    registered query passes planes_for(COUNT(*)) — the 4-plane default
    exists only for the unregistered pedagogical contrast above."""
    from .dedup import bucket_local_components

    # per-vector norm hoist: see similarity_pairs (bit-identical)
    withb = (
        emb.select("vec_id", as_double("embedding").alias("ev"))
        .withColumn("bucket", _bucket_expr(F.col("ev"), n_planes))
        .withColumn("nrm", F.sqrt(dot(F.col("ev"), F.col("ev"))))
    )
    a = withb.select(
        F.col("vec_id").alias("d1"), F.col("ev").alias("e1"),
        F.col("nrm").alias("n1"), "bucket",
    )
    b = withb.select(
        F.col("vec_id").alias("d2"), F.col("ev").alias("e2"),
        F.col("nrm").alias("n2"), "bucket",
    )
    cosine = dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("d1") < F.col("d2"))
        .filter(F.round(cosine, 6) >= threshold)
        .select("bucket", "d1", "d2")
    )
    comps = bucket_local_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.array_join(
                F.sort_array(F.collect_list("node")), ","
            ).alias("vec_ids"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the compression layer a 100 TB embedding
# store actually ships — each vector becomes m sub-space code ids
# (here 4×log2(k) bits instead of 64 floats). Codebooks are fixed seed
# subvectors (training them is q_kmeans_assign's job); encoding is
# argmin over dot-expanded L2 per subspace, deterministic tie-break, so
# codes AND the reconstruction error are engine-identical.
# ---------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_DSUB = _DIM // _PQ_M
_PQ_K = 4  # centroids per subspace: codebook = subvectors of vec_id 1..4


def _pq_oracle() -> str:
    sub_cols = []
    for s in range(_PQ_M):
        lo = s * _PQ_DSUB + 1
        hi = (s + 1) * _PQ_DSUB
        dists = []
        for c in range(1, _PQ_K + 1):
            x = f"(e.v[{lo}:{hi}])"
            cv = f"(c{c}.v[{lo}:{hi}])"
            dists.append(
                f"(list_inner_product({x}, {x})"
                f" - 2 * list_inner_product({x}, {cv})"
                f" + list_inner_product({cv}, {cv}))"
            )
        best = f"LEAST({', '.join(dists)})"
        code = "CASE " + " ".join(
            f"WHEN {d} = {best} THEN {c}" for c, d in zip(range(1, _PQ_K + 1), dists)
        ) + " END"
        sub_cols.append((code, best))
    codes = ",\n           ".join(
        f"CAST({c} AS BIGINT) AS code{s}" for s, (c, _) in enumerate(sub_cols)
    )
    err = " + ".join(b for _, b in sub_cols)
    froms = ", ".join(
        f"(SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = {c}) c{c}"
        for c in range(1, _PQ_K + 1)
    )
    return f"""
    SELECT e.vec_id,
           {codes},
           ROUND({err}, 6) AS recon_err
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e, {froms}
    """


@demo_query("q_pq_encode", oracle=_pq_oracle())
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode every embedding: 4 subspaces × 16 dims, 4-entry fixed
    codebooks (seed subvectors), per-subspace argmin with CASE-on-
    minimum semantics (the smallest code id wins exact distance ties,
    matching the oracle's WHEN ordering). Output is (vec_id, 4 code
    ids, summed reconstruction error).

    Scale shape: codebooks are a 1-row broadcast (all m×k centroid
    slices); encoding is a single scan with pure expression work — the
    exact shape that PQ-compresses a 100 TB embedding store in one
    pass. Distances are dot-expanded sequential folds (engine-
    identical), so codes and errors hash-match the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    cb = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _PQ_K))
        .select(F.col("vec_id").alias("cid"), as_double("embedding").alias("cv"))
        .groupBy()
        .pivot("cid", list(range(1, _PQ_K + 1)))
        .agg(F.first("cv"))
    )  # 1 row: columns "1".."4" = codebook vectors
    joined = e.crossJoin(F.broadcast(cb))

    def sub(col: Column, s: int) -> Column:
        return F.slice(col, s * _PQ_DSUB + 1, _PQ_DSUB)

    out_cols = [F.col("vec_id")]
    err_terms = []
    for s in range(_PQ_M):
        x = sub(F.col("v"), s)
        dists = []
        for c in range(1, _PQ_K + 1):
            cv = sub(F.col(str(c)), s)
            dists.append(dot(x, x) - 2 * dot(x, cv) + dot(cv, cv))
        best = F.least(*dists)
        code = F.when(dists[0] == best, 1)
        for c in range(1, _PQ_K):
            code = code.when(dists[c] == best, c + 1)
        out_cols.append(code.cast("bigint").alias(f"code{s}"))
        err_terms.append(best)
    err = err_terms[0]
    for t in err_terms[1:]:
        err = err + t
    out_cols.append(F.round(err, 6).alias("recon_err"))
    return joined.select(*out_cols)


# ---------------------------------------------------------------------------
# retrieval evaluation: recall@k of the ANN paths against the exact
# brute-force ranking — the metric that decides nprobe/band trade-offs
# in production. Both rankings are already oracle-verified; the eval
# itself is set arithmetic over their id sets, so it is oracle-exact.
# ---------------------------------------------------------------------------

_RANK_EVAL_ORACLE = f"""
    WITH exact_ids AS (SELECT vec_id FROM ({_TOPK_ORACLE})),
    lsh_ids AS (SELECT vec_id FROM ({_LSH_ORACLE})),
    ivf_ids AS (SELECT vec_id FROM ({_IVF_ORACLE}))
    SELECT 'lsh' AS method, CAST({_TOPK} AS BIGINT) AS k,
           CAST((SELECT COUNT(*) FROM lsh_ids JOIN exact_ids USING (vec_id))
                AS BIGINT) AS n_overlap,
           ROUND((SELECT COUNT(*) FROM lsh_ids JOIN exact_ids USING (vec_id))
                 / CAST({_TOPK} AS DOUBLE), 6) AS recall_at_k
    UNION ALL
    SELECT 'ivf' AS method, CAST({_TOPK} AS BIGINT) AS k,
           CAST((SELECT COUNT(*) FROM ivf_ids JOIN exact_ids USING (vec_id))
                AS BIGINT) AS n_overlap,
           ROUND((SELECT COUNT(*) FROM ivf_ids JOIN exact_ids USING (vec_id))
                 / CAST({_TOPK} AS DOUBLE), 6) AS recall_at_k
"""


@demo_query("q_rank_eval", oracle=_RANK_EVAL_ORACLE)
def q_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k report for both ANN paths (LSH buckets, IVF nprobe)
    against the exact brute-force top-k — the production dial for
    bucket-count / nprobe tuning, as a query. Each method's id set
    semi-joins the exact set (k-row broadcasts); recall is a ratio of
    integer counts, so the report is oracle-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = brute_topk(emb, _QUERY_VEC_ID).select("vec_id")
    rows = []
    for method, topk_df in (
        ("lsh", lsh_topk(emb, _QUERY_VEC_ID)),
        ("ivf", ivf_topk(emb, _QUERY_VEC_ID)),
    ):
        overlap = topk_df.select("vec_id").join(
            F.broadcast(exact), "vec_id", "left_semi"
        )
        rows.append(
            overlap.agg(
                F.lit(method).alias("method"),
                F.lit(_TOPK).cast("bigint").alias("k"),
                F.count(F.lit(1)).alias("n_overlap"),
                F.round(
                    F.count(F.lit(1)) / F.lit(float(_TOPK)), 6
                ).alias("recall_at_k"),
            )
        )
    return rows[0].unionByName(rows[1])


# ---------------------------------------------------------------------------
# PQ-ADC search: asymmetric distance computation over PQ codes — the
# memory-bound 100 TB search path that completes the quantization story
# (q_embedding_centroids trains, q_pq_encode compresses, this SEARCHES
# the compressed store without ever touching raw vectors again).
# ---------------------------------------------------------------------------


def _pq_adc_oracle() -> str:
    # doc codes exactly as q_pq_encode assigns them; ADC folds the
    # QUERY-to-centroid subdistance selected by each doc's code
    sub_terms = []
    for s in range(_PQ_M):
        lo = s * _PQ_DSUB + 1
        hi = (s + 1) * _PQ_DSUB
        doc_dists = []
        lut = []
        for c in range(1, _PQ_K + 1):
            x = f"(e.v[{lo}:{hi}])"
            cv = f"(c{c}.v[{lo}:{hi}])"
            qs = f"(q.v[{lo}:{hi}])"
            doc_dists.append(
                f"(list_inner_product({x}, {x})"
                f" - 2 * list_inner_product({x}, {cv})"
                f" + list_inner_product({cv}, {cv}))"
            )
            lut.append(
                f"(list_inner_product({qs}, {qs})"
                f" - 2 * list_inner_product({qs}, {cv})"
                f" + list_inner_product({cv}, {cv}))"
            )
        best = f"LEAST({', '.join(doc_dists)})"
        term = "CASE " + " ".join(
            f"WHEN {d} = {best} THEN {t}" for d, t in zip(doc_dists, lut)
        ) + " END"
        sub_terms.append(term)
    adc = " + ".join(sub_terms)
    froms = ", ".join(
        f"(SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = {c}) c{c}"
        for c in range(1, _PQ_K + 1)
    )
    return f"""
    SELECT e.vec_id, ROUND({adc}, 6) AS adc_dist
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE vec_id != {_QUERY_VEC_ID}) e,
         (SELECT embedding::DOUBLE[] AS v FROM embeddings
          WHERE vec_id = {_QUERY_VEC_ID}) q,
         {froms}
    ORDER BY {adc}, e.vec_id
    LIMIT {_TOPK}
    """


@demo_query("q_pq_adc_topk", oracle=_pq_adc_oracle())
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k over the PQ-compressed store: the query stays raw, the
    corpus is represented ONLY by its per-subspace code ids, and each
    doc's distance is the sum of query→centroid subdistances selected
    by its codes — FAISS's IndexPQ search semantics.

    Scale shape: at 100 TB the m-byte codes are ~64× smaller than the
    raw vectors, so the scan is memory/IO-bound on codes; the per-query
    LUT (m × k subdistances) is a 1-row broadcast (query + codebook
    cross join), the fold is pure CASE-on-code expression work inside
    whole-stage codegen, and orderBy+limit compiles to
    TakeOrderedAndProject. Codes are assigned with the same
    smallest-id-wins tie rule as q_pq_encode, so the oracle reproduces
    distances bit-for-bit. Accuracy vs exact search is the PQ
    reconstruction trade-off — measured by test_ann_recall, not assumed."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).select(
        "vec_id", as_double("embedding").alias("v")
    )
    cb = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _PQ_K))
        .select(F.col("vec_id").alias("cid"), as_double("embedding").alias("cv"))
        .groupBy()
        .pivot("cid", list(range(1, _PQ_K + 1)))
        .agg(F.first("cv"))
    )
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        as_double("embedding").alias("qv")
    )
    joined = e.crossJoin(F.broadcast(cb)).crossJoin(F.broadcast(q))

    def sub(col: Column, s: int) -> Column:
        return F.slice(col, s * _PQ_DSUB + 1, _PQ_DSUB)

    adc_terms = []
    for s in range(_PQ_M):
        x = sub(F.col("v"), s)
        qs = sub(F.col("qv"), s)
        doc_dists = []
        lut = []
        for c in range(1, _PQ_K + 1):
            cv = sub(F.col(str(c)), s)
            doc_dists.append(dot(x, x) - 2 * dot(x, cv) + dot(cv, cv))
            lut.append(dot(qs, qs) - 2 * dot(qs, cv) + dot(cv, cv))
        best = F.least(*doc_dists)
        term = F.when(doc_dists[0] == best, lut[0])
        for c in range(1, _PQ_K):
            term = term.when(doc_dists[c] == best, lut[c])
        adc_terms.append(term)
    adc = adc_terms[0]
    for t in adc_terms[1:]:
        adc = adc + t
    return (
        joined.select("vec_id", adc.alias("adc_raw"))
        .orderBy(F.col("adc_raw"), F.col("vec_id"))
        .limit(_TOPK)
        .select("vec_id", F.round("adc_raw", 6).alias("adc_dist"))
    )
