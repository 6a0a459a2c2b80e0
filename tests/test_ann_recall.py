"""ANN quality tests: recall of the scale paths against the brute-force
baseline. Correctness of each operator's output is oracle-checked in
test_oracle_diff; these tests check the *approximation* is actually
useful — better than randomly sampling the same candidate fraction, and
able to find planted near-duplicates (the dedup use case)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

_QUERY_IDS = [0, 17, 123, 250, 400]
_K = 20


def _load(spark):
    from aws_lakehouse_project_spark.catalog import load_table

    return load_table(spark, SF_DIR, "embeddings")


def test_ivf_recall_beats_candidate_fraction(spark):
    """IVF with nprobe=2 of 8 lists scans ~25% of the corpus; random
    sampling of that fraction would get recall@20 ≈ 0.25. The coarse
    quantizer must do better on average (measured ~0.39 on this corpus)."""
    from aws_lakehouse_project_spark.operators.similarity import (
        brute_topk,
        ivf_topk,
    )

    emb = _load(spark).cache()
    recalls = []
    for qid in _QUERY_IDS:
        brute = {r["vec_id"] for r in brute_topk(emb, qid, _K).collect()}
        ivf = {r["vec_id"] for r in ivf_topk(emb, qid, _K).collect()}
        recalls.append(len(brute & ivf) / len(brute))
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.30, f"IVF mean recall {mean:.3f} (per-query {recalls})"


def test_lsh_finds_planted_near_duplicate(spark):
    """Sign-random-projection LSH exists for near-dup detection: a
    planted vector at cosine ≈ 1 to the query MUST land in the query's
    bucket and rank first. (On this corpus's random vectors the top-20
    neighbors sit near cosine ~0.3, where 4-plane SRP collision is ~2×
    random — too weak to assert; the high-similarity regime is the
    operator's contract.)"""
    from aws_lakehouse_project_spark.operators.similarity import lsh_topk

    emb = _load(spark).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    rng = random.Random(42)
    planted = [0.7 * x + rng.uniform(-1e-3, 1e-3) for x in qrow["embedding"]]
    extra = spark.createDataFrame(
        [(9_999, qrow["label"], planted)], schema=emb.schema
    )
    top = lsh_topk(emb.unionByName(extra), 0, _K).collect()
    assert top, "LSH returned no candidates"
    assert top[0]["vec_id"] == 9_999, [r["vec_id"] for r in top[:3]]
    assert top[0]["cosine"] > 0.999


def test_ivf_pruned_matches_inmemory_ivf(spark):
    """The list-partitioned on-disk IVF index must return exactly the
    in-memory ivf_topk result — layout changes where the bytes live,
    not the math — and its probe scan must prune by partition."""
    from aws_lakehouse_project_spark.operators.registry import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    a = [tuple(r) for r in QUERIES["q_similarity_ivf"](spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["q_similarity_ivf_pruned"](spark, sf_dir).collect()]
    assert a == b


def test_cid_partition_filter_prunes(spark, tmp_path):
    """A cid IN (...) filter over a cid-partitioned index reaches the
    scan as a PartitionFilter with no data filter — the physical
    guarantee behind q_similarity_ivf_pruned's nprobe/k scan cost."""
    from aws_lakehouse_project_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    p = str(tmp_path / "idx")
    emb.select(F.col("label").alias("cid"), "vec_id").write.partitionBy(
        "cid"
    ).parquet(p)
    df = spark.read.parquet(p).filter(F.col("cid").isin([1, 2, 3]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cid" in plan, plan
    assert "DataFilters: []" in plan, plan


def test_planes_for_scale_rule():
    """Bit count grows with log2(N/occupancy), floored at the oracle
    default and capped at the master list."""
    from aws_lakehouse_project_spark.operators.similarity import (
        _CAP_PLANES,
        _MAX_PLANES,
        _N_PLANES,
        _PLANES,
        planes_for,
    )

    assert planes_for(100) == _N_PLANES
    assert planes_for(2_000) == _N_PLANES      # sf0.1 regime: 16 buckets
    assert planes_for(20_000) == 8             # 10x corpus: 256 buckets
    assert planes_for(10**9) == 23             # log2(1e9/125) rounded up
    # capped at 31, NOT the 32-row master list: bit 31 would contribute
    # 2^31 and overflow the int bucket id under ANSI (ADVICE r6)
    assert planes_for(10**12) == _CAP_PLANES == 31
    assert len(_PLANES) == _MAX_PLANES == 32


def test_bucket_id_overflow_guards(spark):
    """32 planes can never reach a single int bucket id: _bucket_expr
    and the per-band bit width both refuse, BEFORE any Spark job, so the
    failure is a named ValueError instead of a runtime CAST_OVERFLOW on
    ~half the vectors (ADVICE r6 medium). The spark fixture is needed
    because F.col requires an active SparkContext even to build the
    unexecuted Column expression."""
    import pytest as _pytest
    from pyspark.sql import functions as _F

    from aws_lakehouse_project_spark.operators.similarity import (
        _bucket_expr,
        similarity_pairs_banded,
    )

    with _pytest.raises(ValueError, match="overflow"):
        _bucket_expr(_F.col("ev"), n_planes=32)
    _bucket_expr(_F.col("ev"), n_planes=31)  # boundary: fine

    with _pytest.raises(ValueError, match="overflow"):
        similarity_pairs_banded(None, bands=1, bits=32)


def test_scaled_planes_refine_default_buckets(spark):
    """An 8-plane bucket is a strict refinement of the 4-plane bucket
    (same seeded stream, prefix bits shared), so the scaled candidate
    pair set must be a subset of the default one — the scale knob can
    only prune candidates, never invent them."""
    from aws_lakehouse_project_spark.catalog import load_table
    from aws_lakehouse_project_spark.operators.similarity import (
        similarity_pairs,
    )
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    default = {
        (r["v1"], r["v2"]) for r in similarity_pairs(emb, threshold=0.2).collect()
    }
    scaled = {
        (r["v1"], r["v2"])
        for r in similarity_pairs(emb, threshold=0.2, n_planes=8).collect()
    }
    assert scaled <= default
    assert default  # non-trivial at the loosened threshold


def test_banded_pairs_beat_single_band_recall(spark):
    """Plant near-duplicate vector pairs (tiny perturbation, cosine
    ~0.99+) in a random corpus: 4 bands x 8 bits must recover MORE of
    the planted pairs than one 8-bit band alone (OR-of-ANDs recall
    1-(1-p^8)^4 > p^8), and every emitted pair must pass the exact
    cosine threshold (precision stays exact). Deterministic seed."""
    import random as _random

    from aws_lakehouse_project_spark.operators.similarity import (
        similarity_pairs,
        similarity_pairs_banded,
    )

    rng = _random.Random(7)
    rows = []
    n_planted = 40
    for i in range(n_planted):
        v = [rng.gauss(0, 1) for _ in range(64)]
        w = [x + rng.gauss(0, 0.02) for x in v]  # near-dup twin
        rows.append((2 * i, v, 0))
        rows.append((2 * i + 1, w, 0))
    for i in range(200):  # background noise, decorrelated
        rows.append((1000 + i, [rng.gauss(0, 1) for _ in range(64)], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    planted = {(2 * i, 2 * i + 1) for i in range(n_planted)}

    single = {
        (r["v1"], r["v2"])
        for r in similarity_pairs(emb, threshold=0.9, n_planes=8).collect()
    }
    banded_rows = similarity_pairs_banded(
        emb, threshold=0.9, bands=4, bits=8
    ).collect()
    banded = {(r["v1"], r["v2"]) for r in banded_rows}

    assert len(banded & planted) > len(single & planted)
    assert len(banded & planted) >= 0.9 * n_planted  # 1-(1-p^8)^4 is high at cos~0.999
    assert all(r["cosine"] >= 0.9 for r in banded_rows)  # exact precision
    # band 0 of the banded layout IS the single-band bucketing: banded
    # candidates must be a superset of the single-band pairs
    assert single <= banded


def test_pq_adc_recall_beats_random(spark):
    """ADC over 4x4 PQ codes is a coarse quantizer by construction, but
    its top-k must still beat random selection decisively (here >=2.5x
    the k/n random expectation) against the exact Euclidean ranking —
    the compressed-domain search is doing real work, not noise."""
    from pyspark.sql import functions as F

    from aws_lakehouse_project_spark.catalog import load_table
    from aws_lakehouse_project_spark.operators.similarity import (
        _QUERY_VEC_ID,
        _TOPK,
        as_double,
        dot,
        q_pq_adc_topk,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    adc = {r["vec_id"] for r in q_pq_adc_topk(spark, sf).collect()}
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        as_double("embedding").alias("qv")
    )
    e = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).select(
        "vec_id", as_double("embedding").alias("ev")
    )
    l2 = (
        dot(F.col("ev"), F.col("ev"))
        - 2 * dot(F.col("ev"), F.col("qv"))
        + dot(F.col("qv"), F.col("qv"))
    )
    exact = {
        r["vec_id"]
        for r in e.crossJoin(F.broadcast(q))
        .select("vec_id", l2.alias("l2"))
        .orderBy("l2", "vec_id")
        .limit(_TOPK)
        .collect()
    }
    recall = len(adc & exact) / _TOPK
    assert recall >= 2.5 * (_TOPK / n), (recall, _TOPK / n)
