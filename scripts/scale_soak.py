"""Targeted sf1 scale soak for the bucket-LSH family (VERDICT r5 task 4
follow-up): times the four queries the full-bench soak flagged as
super-linear, in both the oracle-default 4-plane configuration and the
occupancy-corrected ``planes_for(N)`` configuration, plus the fixed
q_fuzzy_match. Prints one JSON line.

Usage: python scripts/scale_soak.py [SF_DIR] (default .scratch/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"

    from pyspark.sql import functions as F  # noqa: F401

    from aws_lakehouse_project_spark.catalog import load_table
    from aws_lakehouse_project_spark.operators.dedup import fuzzy_name_pairs
    from aws_lakehouse_project_spark.operators.similarity import (
        planes_for,
        semantic_clusters,
        semantic_decontam,
        similarity_pairs,
        similarity_pairs_banded,
    )
    from aws_lakehouse_project_spark.session import build_session

    spark = build_session(app_name="scale-soak")
    emb = load_table(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    k = planes_for(n_vec)
    out: dict[str, object] = {"sf_dir": sf_dir, "n_vectors": n_vec, "planes_for": k}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)
        print(f"# {name}: {out[name]}s", file=sys.stderr)

    timed("similarity_pairs_default", lambda: similarity_pairs(emb))
    timed("similarity_pairs_scaled", lambda: similarity_pairs(emb, n_planes=k))
    timed("semantic_decontam_default", lambda: semantic_decontam(emb))
    timed("semantic_decontam_scaled", lambda: semantic_decontam(emb, n_planes=k))
    timed("semantic_clusters_default", lambda: semantic_clusters(emb))
    timed("semantic_clusters_scaled", lambda: semantic_clusters(emb, n_planes=k))
    timed(
        "similarity_pairs_banded_2xk",
        lambda: similarity_pairs_banded(emb, bands=2, bits=k),
    )
    cust = load_table(spark, sf_dir, "customer")
    timed(
        "fuzzy_match",
        lambda: fuzzy_name_pairs(cust, key="c_custkey", name="c_name"),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
