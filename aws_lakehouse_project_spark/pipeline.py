"""Pipeline runner — the Airflow DAG's semantics as a driver-side flow.

The reference's per-domain DAG is ingest → validate → transform →
publish with ALL_SUCCESS gating, retries and SLA alerting (reference
``airflow/dags/lakehouse_pipelines.py:98-144``, ``:40-47``). Here each
stage is a method; failures raise (fail-fast like the local runner);
``retries`` wraps transient stage errors; cron/SLA stay host-level
concerns per SURVEY.md §3.2.

Also implements the dbt-level checks: post-build not-null schema tests
(D2 — ``dbt/models/schema.yml:36-41``), source freshness (D3 —
``schema.yml:10-13``), and a JSON manifest of published tables (D7 —
``Makefile:19-33``).
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import EngineError, ExpectationFailure
from .operators.domain_fact import build_fct_daily_store_metrics
from .operators.staging import STAGING_TRANSFORMS
from .quality.expectations import DOMAIN_SUITES, Expectation, validate
from .schemas import DOMAIN_RAW_SCHEMAS
from .sources.readers import read_csv, read_jsonl, split_corrupt
from .sources.writers import write_csv, write_partitioned_parquet

log = logging.getLogger("aws_lakehouse_project_spark.pipeline")

DOMAIN_FORMATS = {
    "erp_orders": "csv",
    "crm_leads": "csv",
    "web_events": "jsonl",
    "products": "csv",
}


@dataclass
class PipelineConfig:
    raw_paths: dict[str, str]  # domain -> raw file/dir
    curated_dir: str
    retries: int = 2
    retry_delay_sec: float = 0.1  # reference: 5 min; compressed for tests
    freshness_warn_hours: float = 12.0
    freshness_error_hours: float = 24.0
    publish_views: bool = True
    extra_suites: dict[str, list[Expectation]] = field(default_factory=dict)


class LakehousePipeline:
    """Driver-side twin of the 4-stage per-domain DAG (D4) + fact build."""

    def __init__(self, spark: SparkSession, config: PipelineConfig) -> None:
        self.spark = spark
        self.config = config
        self.staged: dict[str, DataFrame] = {}

    # -- stage 1: ingest ---------------------------------------------------

    def ingest(self, domain: str) -> DataFrame:
        """Schema-enforced raw read (replaces the Glue crawler trigger,
        reference :76-79); corrupt rows are quarantined, not fatal."""
        path = self.config.raw_paths[domain]
        schema = DOMAIN_RAW_SCHEMAS[domain]
        if DOMAIN_FORMATS[domain] == "jsonl":
            raw = read_jsonl(self.spark, path, schema)
        else:
            raw = read_csv(self.spark, path, schema)
        clean, bad = split_corrupt(raw)
        n_bad = bad.count()
        if n_bad:
            log.warning("%s: %d corrupt raw rows quarantined", domain, n_bad)
        return clean

    # -- stage 2: validate -------------------------------------------------

    def validate(self, domain: str, raw: DataFrame) -> DataFrame:
        """GE-checkpoint twin (reference :82-85): the domain suite runs as
        one aggregation; violations raise ExpectationFailure."""
        suite = self.config.extra_suites.get(domain, DOMAIN_SUITES[domain])
        validate(raw, suite, name=domain)
        return raw

    # -- stage 3: transform ------------------------------------------------

    def transform(self, domain: str, raw: DataFrame) -> DataFrame:
        """dbt staging view twin (reference :88-90): typed cast+project,
        registered as stg_<domain> (S9)."""
        staged = STAGING_TRANSFORMS[domain](raw)
        staged.createOrReplaceTempView(f"stg_{domain}")
        self.staged[domain] = staged
        return staged

    # -- stage 4: publish --------------------------------------------------

    def publish(self, domain: str, staged: DataFrame) -> str:
        """Curated publication (reference :93-95): partitioned parquet
        under curated/<domain>, partitioned by dt like README.md:12 (the
        testdata-scale twin keeps store_id as a data column to avoid tiny
        partitions; see write_zorder_approx for the clustered variant)."""
        out = os.path.join(self.config.curated_dir, domain)
        write_partitioned_parquet(staged, out, ["dt"])
        if self.config.publish_views:
            self.spark.read.parquet(out).createOrReplaceTempView(f"curated_{domain}")
        return out

    # -- orchestration -----------------------------------------------------

    def _with_retries(self, fn, *args):
        """D5 retry policy (reference :40-47, retries=2)."""
        last: Exception | None = None
        for attempt in range(self.config.retries + 1):
            try:
                return fn(*args)
            except (ExpectationFailure, EngineError):
                raise  # data failures are deterministic — never retry
            except Exception as exc:  # transient (I/O etc.)
                last = exc
                log.warning("attempt %d failed: %s", attempt + 1, exc)
                time.sleep(self.config.retry_delay_sec)
        raise last  # type: ignore[misc]

    def run_domain(self, domain: str) -> DataFrame:
        """ingest → validate → transform → publish (linear chain, gated
        like trigger_rule=ALL_SUCCESS — any raise stops the chain)."""
        raw = self._with_retries(self.ingest, domain)
        valid = self.validate(domain, raw)
        staged = self.transform(domain, valid)
        self._with_retries(self.publish, domain, staged)
        return staged

    def run_all(self) -> DataFrame:
        """All four domains, then the fact build + post-build tests +
        manifest; returns the fact DataFrame."""
        for domain in DOMAIN_FORMATS:
            if domain in self.config.raw_paths:
                self.run_domain(domain)
        fact = build_fct_daily_store_metrics(
            self.staged["erp_orders"],
            self.staged["crm_leads"],
            self.staged["web_events"],
        )
        self.post_build_tests(fact)
        fact_dir = os.path.join(self.config.curated_dir, "fct_daily_store_metrics")
        write_csv(fact, os.path.join(fact_dir, "csv"))
        write_partitioned_parquet(fact, os.path.join(fact_dir, "parquet"), ["dt"])
        self.emit_manifest()
        return fact

    # -- dbt-level checks --------------------------------------------------

    def post_build_tests(self, fact: DataFrame) -> None:
        """D2: not_null(store_id, dt) on the fact (schema.yml:36-41)."""
        validate(
            fact,
            [
                Expectation(
                    "expect_column_values_to_not_be_null", {"column": "store_id"}
                ),
                Expectation("expect_column_values_to_not_be_null", {"column": "dt"}),
            ],
            name="fct_daily_store_metrics",
        )

    def check_freshness(self, domain: str, now_dt: str) -> str:
        """D3 source freshness on loaded_at_field=dt (schema.yml:10-13):
        'ok' | 'warn' | 'error' against the 12h/24h thresholds."""
        staged = self.staged[domain]
        max_dt = staged.agg(F.max("dt").alias("m")).collect()[0]["m"]
        if max_dt is None:
            return "error"
        lag_hours = (
            F.lit(now_dt).cast("timestamp").cast("long")
            - F.lit(str(max_dt)).cast("timestamp").cast("long")
        )
        lag = self.spark.range(1).select((lag_hours / 3600.0).alias("h")).collect()[0][
            "h"
        ]
        if lag > self.config.freshness_error_hours:
            return "error"
        if lag > self.config.freshness_warn_hours:
            return "warn"
        return "ok"

    def emit_manifest(self) -> str:
        """D7 docs/manifest twin: JSON of published tables + schemas."""
        manifest = {
            "tables": {
                f"stg_{d}": [f.name for f in df.schema.fields]
                for d, df in self.staged.items()
            }
        }
        path = os.path.join(self.config.curated_dir, "manifest.json")
        os.makedirs(self.config.curated_dir, exist_ok=True)
        with open(path, "w") as fh:
            json.dump(manifest, fh, indent=2)
        return path
