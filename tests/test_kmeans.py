"""q_kmeans_assign: independent numpy replication of the pinned Lloyd's
algorithm (third implementation beside Spark and the DuckDB oracle) plus
the partition invariant. The numpy twin reproduces the exact pinned
semantics — fixed init, decimal-exact component means rounded to 6
decimals, dot-expanded distances, cid tie-break — so any drift in the
Spark pipeline's arithmetic shows up as an assignment diff."""

from __future__ import annotations

import decimal

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def _numpy_kmeans(vec_ids, vecs, k, iters):
    cent = {i: vecs[vec_ids.index(i)].copy() for i in range(1, k + 1)}

    def seqdot(a, b):
        # mirror the engines' sequential left-to-right fold exactly
        # (numpy @ uses pairwise summation — different rounding)
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def assign_all(cent):
        out = {}
        for vid, v in zip(vec_ids, vecs):
            best = None
            for cid in sorted(cent):
                c = cent[cid]
                d = seqdot(v, v) - 2.0 * seqdot(v, c) + seqdot(c, c)
                if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                    best = (d, cid)
            out[vid] = best[1]
        return out

    assign = None
    for it in range(1, iters + 1):
        assign = assign_all(cent)
        if it == iters:
            break
        new_cent = {}
        for cid in set(assign.values()):
            members = [v for vid, v in zip(vec_ids, vecs) if assign[vid] == cid]
            dims = []
            for d in range(len(members[0])):
                # exact-decimal mean, rounded half-up to 6 — the pinned update
                s = sum(
                    decimal.Decimal(float(m[d])).quantize(
                        decimal.Decimal("1e-9"), rounding=decimal.ROUND_HALF_UP
                    )
                    for m in members
                )
                mean = float(s) / len(members)
                dims.append(
                    float(
                        decimal.Decimal(mean).quantize(
                            decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
                        )
                    )
                )
            new_cent[cid] = np.array(dims, dtype=np.float64)
        cent = new_cent
    return assign


def test_kmeans_matches_numpy_replication(spark):
    from aws_lakehouse_project_spark.operators.similarity import (
        _KM_ITERS,
        _KM_K,
        q_kmeans_assign,
    )

    got = {
        r["vec_id"]: r["cid"]
        for r in q_kmeans_assign(spark, SF_DIR).collect()
    }

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    vec_ids = tbl["vec_id"].to_pylist()
    vecs = [np.array(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    want = _numpy_kmeans(vec_ids, vecs, _KM_K, _KM_ITERS)

    assert set(got) == set(want)  # every vector assigned exactly once
    diffs = {v: (got[v], want[v]) for v in want if got[v] != want[v]}
    assert not diffs, f"assignment drift on {len(diffs)} vectors: {diffs}"


def test_kmeans_assignment_is_partition(spark):
    from aws_lakehouse_project_spark.operators.similarity import (
        _KM_K,
        q_kmeans_assign,
    )

    rows = q_kmeans_assign(spark, SF_DIR).collect()
    n_vecs = pq.read_metadata(f"{SF_DIR}/embeddings.parquet").num_rows
    assert len(rows) == n_vecs
    assert len({r["vec_id"] for r in rows}) == n_vecs
    assert {r["cid"] for r in rows} <= set(range(1, _KM_K + 1))
