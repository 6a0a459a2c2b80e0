"""aws_lakehouse_project_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference lakehouse (tata-fs4/AWS_Lakehouse_Project): two-zone ingest →
validate → stage → fact-merge → publish, re-expressed Spark-first
(DataFrame/SQL/Catalyst/Structured Streaming), plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Design tenets (SURVEY.md §7.1):
- DataFrame + ``spark.sql`` over temp views; explicit ``StructType``; no RDDs.
- No UDFs where a built-in exists; Pandas UDFs only for genuinely
  non-expressible ops (multimodal decode).
- No custom Catalyst rules — custom code is driver-side orchestration and
  writer policy (incremental merge, Z-order-approx layout, expectation
  compiler).
- Every operator keyed by partitionable columns; no driver-side collects in
  the data path; AQE on.
"""

__version__ = "0.1.0"
