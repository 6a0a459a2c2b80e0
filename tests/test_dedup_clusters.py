"""Connected-components correctness on crafted graphs."""

from __future__ import annotations

from aws_lakehouse_project_spark.operators.dedup import connected_components


def cc(spark, edges):
    df = spark.createDataFrame(edges, "d1 BIGINT, d2 BIGINT")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_propagation(spark):
    """A long chain exercises multi-round propagation (diameter > 1)."""
    chain = [(i, i + 1) for i in range(0, 12)]
    got = cc(spark, chain)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_cycle_and_singleton_edge(spark):
    got = cc(spark, [(5, 6), (6, 7), (7, 5), (42, 42)])
    assert got[5] == got[6] == got[7] == 5
    assert got[42] == 42


def test_cluster_query_runs(spark):
    """The registered query publishes doc_ids as a CSV string (the driver
    canonicalizer can't hash arrays); parse it back to check invariants."""
    from aws_lakehouse_project_spark.operators.dedup import q_dedup_clusters
    from tests.conftest import SF_DIR

    rows = q_dedup_clusters(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["doc_ids"].split(",")]
        assert r["n_docs"] == len(ids)
        assert r["component"] == min(ids)
        assert ids == sorted(ids)


def test_bucket_local_components_match_global_cc(spark):
    """When every edge lives inside one bucket (single-probe LSH), the
    bucket-local union-find must produce exactly the min-label
    components the iterative global loop computes — including a chain
    (worst case for propagation) and a bucket with two disjoint
    components."""
    from aws_lakehouse_project_spark.operators.dedup import (
        bucket_local_components,
    )

    edges = [
        # bucket 0: chain 1-2-3-4 (diameter 3) + disjoint pair 10-11
        (0, 2, 1), (0, 2, 3), (0, 4, 3), (0, 10, 11),
        # bucket 1: triangle 20-21-22 with redundant edges
        (1, 21, 20), (1, 22, 21), (1, 20, 22),
    ]
    pairs = spark.createDataFrame(edges, "bucket int, d1 long, d2 long")
    local = {
        (r["node"], r["component"])
        for r in bucket_local_components(pairs).collect()
    }
    global_cc = {
        (r["node"], r["component"])
        for r in connected_components(pairs.select("d1", "d2")).collect()
    }
    assert local == global_cc
    assert local == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
