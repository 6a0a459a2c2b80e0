"""Generate a scaled-up copy of the driver testdata for scale soaks
(VERDICT r5 task 4): replicate each sf0.1 table REPS times with
per-replica key offsets, preserving referential integrity and the
per-replica data distribution while keeping cross-replica interactions
out of the quadratic paths:

- documents: replica 0 is the original corpus; replicas >0 get a
  per-token suffix (``tok`` -> ``tok~rN``) so cross-replica shingle
  Jaccard is ZERO — each replica reproduces the original near-dup
  structure and total candidate pairs scale linearly, not
  quadratically (10x exact copies would inflate every dup group 10x
  and grow pair counts ~100x, which is not what a 10x-bigger corpus
  looks like).
- embeddings: each replica's vectors are dimension-rotated by
  (7*rep) % dim — cosine structure within a replica is exactly
  preserved (rotation is a common permutation), cross-replica cosine
  decorrelates, LSH buckets re-randomize.
- customer/supplier names: REGENERATED from the offset key
  (``Customer#%09d``) exactly as a genuinely bigger TPC-H would number
  them — an earlier draft suffixed replica tags, which kept the
  16-char name prefix identical across replicas and merged the
  fuzzy-match blocks 9x (sum of block-size² grew 82x; q_fuzzy_match
  measured 64x for 10x data, a pure generator artifact). Renumbering
  keeps prefix-block sizes constant so block counts, not block sizes,
  grow with scale.
- facts/dims: dense 0..N-1 keys shift by rep*N per table, foreign keys
  shift in lockstep; dates/values/status columns are untouched so
  date-horizon filters select a proportional slice.

Usage: python scripts/make_scaled_sf.py [OUT_DIR] [REPS]
(default OUT_DIR=.scratch/sf1, REPS=10, source sf0.1).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COUNTS = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events_id": 100_000,
    "events_user": 1_500,
    "documents": 5_000,
    "embeddings": 2_000,
}
DIM = 64


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE r AS SELECT unnest(range({reps})) AS rep")

    def emit(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{name}.parquet'"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    emit(
        "customer",
        f"""
        SELECT c_custkey + rep*{COUNTS['customer']} AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + rep*{COUNTS['customer']}
                                        AS VARCHAR), 9, '0') AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', r
        """,
    )
    emit(
        "supplier",
        f"""
        SELECT s_suppkey + rep*{COUNTS['supplier']} AS s_suppkey,
               'Supplier#' || lpad(CAST(s_suppkey + rep*{COUNTS['supplier']}
                                        AS VARCHAR), 9, '0') AS s_name,
               s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', r
        """,
    )
    emit(
        "part",
        f"""
        SELECT p_partkey + rep*{COUNTS['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet', r
        """,
    )
    emit(
        "orders",
        f"""
        SELECT o_orderkey + rep*{COUNTS['orders']} AS o_orderkey,
               o_custkey + rep*{COUNTS['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', r
        """,
    )
    emit(
        "lineitem",
        f"""
        SELECT l_orderkey + rep*{COUNTS['orders']} AS l_orderkey,
               l_partkey + rep*{COUNTS['part']} AS l_partkey,
               l_suppkey + rep*{COUNTS['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', r
        """,
    )
    emit(
        "events",
        f"""
        SELECT event_id + rep*{COUNTS['events_id']} AS event_id,
               ts,
               user_id + rep*{COUNTS['events_user']} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', r
        """,
    )
    emit(
        "documents",
        f"""
        WITH scaled AS (
          SELECT doc_id + rep*{COUNTS['documents']} AS doc_id,
                 CASE WHEN rep = 0 THEN text
                      ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       t -> t || '~r' || rep), ' ') END AS text,
                 lang, source
          FROM '{SRC}/documents.parquet', r
        )
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM scaled
        """,
    )
    emit(
        "embeddings",
        f"""
        SELECT vec_id + rep*{COUNTS['embeddings']} AS vec_id,
               CAST(list_transform(range({DIM}),
                    i -> embedding[1 + ((i + 7*rep) % {DIM})])
                    AS FLOAT[]) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', r
        """,
    )


if __name__ == "__main__":
    main()
