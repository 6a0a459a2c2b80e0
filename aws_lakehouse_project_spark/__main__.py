"""One-command local runner — the CLI twin of the reference's only
runnable entry point (``local_runner.py:187-192``, ``README.md:66-79``:
``python local_runner.py --output-dir ./local_output``).

::

    python -m aws_lakehouse_project_spark --output-dir ./local_output
        [--input-dir DIR] [--versioned] [--master local[N]]

Runs the full 4-domain pipeline (ingest → validate → transform →
publish per domain, then the fact build + post-build tests + manifest —
``pipeline.py::run_all``), prints the fact preview, and leaves the
curated CSV/parquet artifacts under ``<output-dir>/curated/`` exactly
where a reference user expects them. Without ``--input-dir`` the
built-in sample rows (``samples.py`` — the FIXTURES.md fixture) are
materialized under ``<output-dir>/samples/`` first, mirroring the
reference's simulated-data QA flow. ``--versioned`` publishes through
the transaction layer instead (write-audit-publish + incremental MERGE
fact — the lakehouse mode).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m aws_lakehouse_project_spark",
        description="Local QA runner for the lakehouse pipeline",
    )
    parser.add_argument(
        "--output-dir",
        default="./local_output",
        help="destination directory for generated artifacts "
        "(default: ./local_output)",
    )
    parser.add_argument(
        "--input-dir",
        default=None,
        help="directory holding erp_orders.csv crm_leads.csv "
        "web_events.json products.csv; the built-in sample data is "
        "generated when omitted",
    )
    parser.add_argument(
        "--versioned",
        action="store_true",
        help="publish through the versioned transaction layer "
        "(write-audit-publish + incremental MERGE fact)",
    )
    parser.add_argument(
        "--master",
        default=None,
        help="Spark master (default: local[$SPARK_GRAFT_CPUS])",
    )
    args = parser.parse_args(argv)

    from .pipeline import LakehousePipeline, PipelineConfig
    from .samples import resolve_input_dir, write_samples
    from .session import build_session

    out_dir = os.path.abspath(args.output_dir)
    curated = os.path.join(out_dir, "curated")
    if args.input_dir:
        raw_paths = resolve_input_dir(args.input_dir)
    else:
        raw_paths = write_samples(os.path.join(out_dir, "samples"))
    print(f"Running local pipeline into {out_dir} ...")
    spark = build_session(
        app_name="aws_lakehouse_project_spark.local_runner",
        master=args.master,
    )
    cfg = PipelineConfig(
        raw_paths=raw_paths,
        curated_dir=curated,
        versioned_publish=args.versioned,
    )
    fact = LakehousePipeline(spark, cfg).run_all()
    print("Fact table preview:")
    fact.show(20, truncate=False)
    print(f"Artifacts written to {curated}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
