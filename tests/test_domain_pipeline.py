"""Reference-twin golden test (SURVEY.md §5 strategy #2).

Fixture rows are authored here to satisfy the FIXTURES.md §1 constraints
and reproduce the §2 golden fact exactly: five (store_id, dt) groups,
including the CRM-only group that exists purely via the full outer join.
"""

from __future__ import annotations

from datetime import date
from decimal import Decimal

import pytest

ERP_ORDERS_CSV = """order_id,customer_id,store_id,dt,order_value,status
1001,C010,store_01,2024-06-01,199.99,shipped
1002,C011,store_01,2024-06-01,139.50,processing
1003,C012,store_02,2024-06-02,120.00,shipped
1004,C013,store_02,2024-06-03,45.90,cancelled
1005,C014,store_03,2024-06-03,560.10,shipped
"""

CRM_LEADS_CSV = """lead_id,name,email,source,status,store_id,dt
L100,Ana Ruiz,ana.ruiz@example.com,web,contacted,store_01,2024-06-01
L101,Bo Chen,bo.chen@example.org,event,qualified,store_02,2024-06-02
L102,Cy Patel,cy.patel@example.net,partner,converted,store_01,2024-06-03
L103,Di Novak,di.novak@example.com,web,new,store_03,2024-06-03
"""

WEB_EVENTS_JSONL = "\n".join(
    [
        '{"event_id": "E900", "visitor_id": "V500", "store_id": "store_01", "dt": "2024-06-01", "page": "/home", "event_type": "page_view", "metadata": {"utm_source": "news"}}',
        '{"event_id": "E901", "visitor_id": "V501", "store_id": "store_01", "dt": "2024-06-01", "page": "/product/P9", "event_type": "click", "metadata": {"cta": "buy"}}',
        '{"event_id": "E902", "visitor_id": "V502", "store_id": "store_02", "dt": "2024-06-02", "page": "/search", "event_type": "page_view", "metadata": {"query": "lamp"}}',
        '{"event_id": "E903", "visitor_id": "V503", "store_id": "store_03", "dt": "2024-06-03", "page": "/home", "event_type": "page_view", "metadata": {}}',
    ]
)

PRODUCTS_CSV = """product_id,name,category,price,active,store_id,dt
P900,Desk Lamp,home,39.99,true,store_01,2024-06-01
P901,Mug,kitchen,9.50,true,store_02,2024-06-01
P902,Notebook,office,4.25,false,store_02,2024-06-02
P903,Monitor,office,249.00,true,store_03,2024-06-03
"""

# FIXTURES.md §2 golden (store_id, dt, revenue, order_count,
# converted_leads, sessions)
GOLDEN = [
    ("store_01", date(2024, 6, 1), Decimal("339.49"), 2, 0, 2),
    ("store_01", date(2024, 6, 3), Decimal("0.00"), 0, 1, 0),
    ("store_02", date(2024, 6, 2), Decimal("120.00"), 1, 0, 1),
    ("store_02", date(2024, 6, 3), Decimal("45.90"), 1, 0, 0),
    ("store_03", date(2024, 6, 3), Decimal("560.10"), 1, 0, 1),
]


@pytest.fixture()
def raw_paths(tmp_path):
    files = {
        "erp_orders": ("erp_orders.csv", ERP_ORDERS_CSV),
        "crm_leads": ("crm_leads.csv", CRM_LEADS_CSV),
        "web_events": ("web_events.json", WEB_EVENTS_JSONL),
        "products": ("products.csv", PRODUCTS_CSV),
    }
    out = {}
    for domain, (name, content) in files.items():
        p = tmp_path / name
        p.write_text(content)
        out[domain] = str(p)
    return out


def test_pipeline_golden(spark, raw_paths, tmp_path):
    from aws_lakehouse_project_spark.pipeline import LakehousePipeline, PipelineConfig

    cfg = PipelineConfig(raw_paths=raw_paths, curated_dir=str(tmp_path / "curated"))
    pipe = LakehousePipeline(spark, cfg)
    fact = pipe.run_all()

    rows = [tuple(r) for r in fact.collect()]
    assert rows == GOLDEN

    # curated layer exists and re-reads identically (dt-partitioned)
    back = spark.read.parquet(str(tmp_path / "curated" / "erp_orders"))
    assert back.count() == 5
    # staged view registered (S9)
    assert spark.sql("SELECT COUNT(*) c FROM stg_crm_leads").collect()[0]["c"] == 4
    # manifest emitted (D7)
    assert (tmp_path / "curated" / "manifest.json").exists()


def test_pipeline_freshness(spark, raw_paths, tmp_path):
    from aws_lakehouse_project_spark.pipeline import LakehousePipeline, PipelineConfig

    cfg = PipelineConfig(raw_paths=raw_paths, curated_dir=str(tmp_path / "c"))
    pipe = LakehousePipeline(spark, cfg)
    pipe.run_domain("erp_orders")
    # max dt is 2024-06-03 → fresh at 06-03, warn <24h, error beyond
    assert pipe.check_freshness("erp_orders", "2024-06-03 06:00:00") == "ok"
    assert pipe.check_freshness("erp_orders", "2024-06-03 18:00:00") == "warn"
    assert pipe.check_freshness("erp_orders", "2024-06-05 00:00:00") == "error"


def test_pipeline_validation_aborts(spark, raw_paths, tmp_path):
    """A violated expectation aborts before transform/publish — the
    reference's fail-fast contract (local_runner.py:43-44)."""
    from aws_lakehouse_project_spark.errors import ExpectationFailure
    from aws_lakehouse_project_spark.pipeline import LakehousePipeline, PipelineConfig

    bad = tmp_path / "bad_orders.csv"
    bad.write_text(
        "order_id,customer_id,store_id,dt,order_value,status\n"
        "2001,C01,store_01,2024-06-01,-5.00,shipped\n"  # negative order_value
    )
    paths = dict(raw_paths, erp_orders=str(bad))
    cfg = PipelineConfig(raw_paths=paths, curated_dir=str(tmp_path / "c2"))
    pipe = LakehousePipeline(spark, cfg)
    with pytest.raises(ExpectationFailure, match="order_value"):
        pipe.run_domain("erp_orders")
    assert "erp_orders" not in pipe.staged


def test_run_all_siblings_publish_on_one_domain_failure(
    spark, raw_paths, tmp_path
):
    """run_all's documented thread-pool failure semantics: a failing
    domain re-raises AND alerts, sibling branches still run to
    completion (their curated output publishes), the fact build is
    skipped, and lineage is deterministically sorted even on failure."""
    from aws_lakehouse_project_spark.errors import ExpectationFailure
    from aws_lakehouse_project_spark.pipeline import (
        LakehousePipeline,
        PipelineConfig,
    )

    bad = tmp_path / "bad_orders.csv"
    bad.write_text(
        "order_id,customer_id,store_id,dt,order_value,status\n"
        "2001,C01,store_01,2024-06-01,-5.00,shipped\n"
    )
    alerts = []
    cfg = PipelineConfig(
        raw_paths=dict(raw_paths, erp_orders=str(bad)),
        curated_dir=str(tmp_path / "c_fail"),
        on_failure=lambda domain, stage, exc: alerts.append((domain, stage)),
    )
    pipe = LakehousePipeline(spark, cfg)
    with pytest.raises(ExpectationFailure):
        pipe.run_all()
    assert ("erp_orders", "validate") in alerts
    # sibling branches completed and published despite the failure
    assert "crm_leads" in pipe.staged and "web_events" in pipe.staged
    # the fact build never ran (needs all three staged inputs)
    assert not any(
        e["stage"] == "build_fct_daily_store_metrics" for e in pipe.lineage
    )
    # lineage is sorted by (domain, stage) — production's _key — even
    # on the failed run (the sort runs in a finally block)
    from aws_lakehouse_project_spark.pipeline import DOMAIN_FORMATS

    dom_rank = {d: i for i, d in enumerate(DOMAIN_FORMATS)}
    stage_rank = {"ingest": 0, "validate": 1, "transform": 2, "publish": 3}

    def _key(edge):
        verb, _, dom = edge["stage"].partition("_")
        return (dom_rank.get(dom, 9), stage_rank.get(verb, 9))

    assert [_key(e) for e in pipe.lineage] == sorted(
        _key(e) for e in pipe.lineage
    )


def test_failure_callback_fires_and_failure_propagates(spark, raw_paths, tmp_path):
    """D5 alerting seam (reference airflow DAG :50-59 Slack callback): a
    stage failure invokes on_failure(domain, stage, exc) and still
    raises."""
    from aws_lakehouse_project_spark.errors import ExpectationFailure
    from aws_lakehouse_project_spark.pipeline import LakehousePipeline, PipelineConfig

    bad = tmp_path / "bad_orders.csv"
    bad.write_text(
        "order_id,customer_id,store_id,dt,order_value,status\n"
        "2001,C01,store_01,2024-06-01,-5.00,shipped\n"
    )
    alerts = []
    cfg = PipelineConfig(
        raw_paths=dict(raw_paths, erp_orders=str(bad)),
        curated_dir=str(tmp_path / "c3"),
        on_failure=lambda domain, stage, exc: alerts.append((domain, stage, type(exc))),
    )
    pipe = LakehousePipeline(spark, cfg)
    with pytest.raises(ExpectationFailure):
        pipe.run_domain("erp_orders")
    assert alerts == [("erp_orders", "validate", ExpectationFailure)]


def test_failure_callback_errors_never_mask_the_failure(spark, raw_paths, tmp_path):
    from aws_lakehouse_project_spark.errors import ExpectationFailure
    from aws_lakehouse_project_spark.pipeline import LakehousePipeline, PipelineConfig

    bad = tmp_path / "bad_orders.csv"
    bad.write_text(
        "order_id,customer_id,store_id,dt,order_value,status\n"
        "2001,C01,store_01,2024-06-01,-5.00,shipped\n"
    )

    def broken_callback(domain, stage, exc):
        raise RuntimeError("alert transport down")

    cfg = PipelineConfig(
        raw_paths=dict(raw_paths, erp_orders=str(bad)),
        curated_dir=str(tmp_path / "c4"),
        on_failure=broken_callback,
    )
    with pytest.raises(ExpectationFailure):  # not the callback's RuntimeError
        LakehousePipeline(spark, cfg).run_domain("erp_orders")


def test_sla_miss_callback(spark, raw_paths, tmp_path):
    """D5 SLA seam (reference :62-73, sla=60min): sla_seconds=0 forces a
    miss; the callback receives (domain, elapsed) and the run succeeds."""
    from aws_lakehouse_project_spark.pipeline import LakehousePipeline, PipelineConfig

    misses = []
    cfg = PipelineConfig(
        raw_paths=raw_paths,
        curated_dir=str(tmp_path / "c5"),
        sla_seconds=0.0,
        on_sla_miss=lambda domain, sec: misses.append((domain, sec)),
    )
    LakehousePipeline(spark, cfg).run_domain("erp_orders")
    assert len(misses) == 1
    assert misses[0][0] == "erp_orders" and misses[0][1] > 0.0


def test_manifest_lineage_edges(spark, raw_paths, tmp_path):
    """D6: the manifest records per-stage input→output edges, ending at
    the fact build reading all three staged inputs."""
    import json

    from aws_lakehouse_project_spark.pipeline import LakehousePipeline, PipelineConfig

    cfg = PipelineConfig(raw_paths=raw_paths, curated_dir=str(tmp_path / "c6"))
    pipe = LakehousePipeline(spark, cfg)
    pipe.run_all()
    manifest = json.loads((tmp_path / "c6" / "manifest.json").read_text())
    edges = {e["stage"]: e for e in manifest["lineage"]}
    # 4 domains × 4 stages + fact build
    assert len(manifest["lineage"]) == 17
    assert edges["ingest_erp_orders"]["inputs"] == [raw_paths["erp_orders"]]
    assert edges["transform_web_events"]["outputs"] == ["stg_web_events"]
    fact = edges["build_fct_daily_store_metrics"]
    assert fact["inputs"] == ["stg_erp_orders", "stg_crm_leads", "stg_web_events"]
    assert "fct_daily_store_metrics" in fact["outputs"]


def test_openlineage_run_events(spark, raw_paths, tmp_path):
    """D6 wire format: emit_manifest also writes OpenLineage-shaped
    RunEvents — one COMPLETE event per stage edge, same 4-domain graph,
    dataset schema facets on the staged outputs (the format the
    reference's lineage backend consumes, terraform/main.tf:101-108)."""
    import json

    from aws_lakehouse_project_spark.pipeline import LakehousePipeline, PipelineConfig

    cfg = PipelineConfig(raw_paths=raw_paths, curated_dir=str(tmp_path / "ol"))
    pipe = LakehousePipeline(spark, cfg)
    pipe.run_all()
    events = json.loads((tmp_path / "ol" / "openlineage.json").read_text())
    assert len(events) == 17  # 4 domains x 4 stages + fact build
    by_job = {e["job"]["name"]: e for e in events}
    assert all(e["eventType"] == "COMPLETE" for e in events)
    # spec compliance: RunEvent schemaURL references the definition,
    # producer is a URI, every facet carries _producer/_schemaURL
    assert all(e["schemaURL"].endswith("#/definitions/RunEvent") for e in events)
    assert all(e["producer"].startswith("https://") for e in events)
    for e in events:
        for ds in e["inputs"] + e["outputs"]:
            for facet in ds.get("facets", {}).values():
                assert facet["_producer"].startswith("https://")
                assert facet["_schemaURL"].startswith("https://")
    assert len({e["run"]["runId"] for e in events}) == 1  # one run
    fact = by_job["build_fct_daily_store_metrics"]
    assert [d["name"] for d in fact["inputs"]] == [
        "stg_erp_orders", "stg_crm_leads", "stg_web_events",
    ]
    # staged datasets carry a schema facet with the published columns
    stg = fact["inputs"][0]
    cols = [f["name"] for f in stg["facets"]["schema"]["fields"]]
    assert "store_id" in cols and "dt" in cols


def test_quarantine_counted_in_validation_pass(spark, tmp_path):
    """Corrupt rows are counted inside validate's single aggregation
    (QUARANTINE_KEY), excluded from row expectations, and dropped from
    the returned clean frame."""
    from aws_lakehouse_project_spark.quality.expectations import (
        DOMAIN_SUITES,
        QUARANTINE_KEY,
        validate,
    )
    from aws_lakehouse_project_spark.schemas import WEB_EVENTS_RAW
    from aws_lakehouse_project_spark.sources.readers import read_jsonl

    p = tmp_path / "events.json"
    p.write_text(WEB_EVENTS_JSONL + "\nnot json at all{{{\n")
    raw = read_jsonl(spark, str(p), WEB_EVENTS_RAW).cache()
    counts = validate(raw, DOMAIN_SUITES["web_events"], count_quarantined=True)
    assert counts[QUARANTINE_KEY] == 1
    # the corrupt row has NULL event_id but must NOT trip the not-null
    # expectation — it is quarantined, not a violation
    assert counts["expect_column_values_to_not_be_null(event_id)"] == 0


def test_corrupt_rows_quarantined(spark, tmp_path):
    """Malformed JSON lines land in _corrupt_record, not in the clean
    frame (contract-first ingest, SURVEY.md §1.1)."""
    from aws_lakehouse_project_spark.schemas import WEB_EVENTS_RAW
    from aws_lakehouse_project_spark.sources.readers import read_jsonl, split_corrupt

    p = tmp_path / "events.json"
    p.write_text(WEB_EVENTS_JSONL + "\nnot json at all{{{\n")
    clean, bad = split_corrupt(read_jsonl(spark, str(p), WEB_EVENTS_RAW))
    assert clean.count() == 4
    assert bad.count() == 1


def test_verify_window_invariants():
    """The driver checks the FIRST 50 registered queries each round:
    the priority list must stay exactly 50 long, duplicate-free, and
    fully registered, and every name must carry an oracle or be one of
    the two rows-only-by-design hash demos."""
    import __spark_entry__ as entrymod

    head = entrymod._VERIFY_FIRST
    assert len(head) == 50
    assert len(set(head)) == 50
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert all(n in q for n in head)
    rows_only = {n for n in q if n not in o}
    assert rows_only == {"q_dedup_minhash", "q_dedup_simhash"}
    # emission order starts with the priority list verbatim
    assert list(q)[:50] == head


# -- versioned publication (round 8): WAP + CHECK + incremental MERGE -------


def _versioned_cfg(raw_paths, tmp_path, name="curated"):
    from aws_lakehouse_project_spark.pipeline import PipelineConfig

    return PipelineConfig(
        raw_paths=raw_paths,
        curated_dir=str(tmp_path / name),
        versioned_publish=True,
    )


def test_pipeline_versioned_golden(spark, raw_paths, tmp_path):
    """versioned_publish routes the whole DAG through the transaction
    layer: domains publish via write-audit-publish with the GE suite as
    CHECK constraints, and the fact is a VersionedTable whose head
    reproduces the golden rows."""
    from aws_lakehouse_project_spark.pipeline import LakehousePipeline
    from aws_lakehouse_project_spark.plans.versioned import VersionedTable

    pipe = LakehousePipeline(spark, _versioned_cfg(raw_paths, tmp_path))
    fact = pipe.run_all()
    assert [tuple(r) for r in fact.collect()] == GOLDEN

    curated = tmp_path / "curated"
    vt = VersionedTable(str(curated / "erp_orders"))
    assert [h["op"] for h in vt.history()][0] == "wap_overwrite"
    cons = vt.constraints()
    assert "nn_order_id" in cons and "bounds_order_value" in cons

    fvt = VersionedTable(str(curated / "fct_daily_store_metrics"))
    assert set(fvt.constraints()) == {"nn_store_id", "nn_dt"}
    got = [
        tuple(r) for r in fvt.read(spark).orderBy("store_id", "dt").collect()
    ]
    assert got == GOLDEN
    # published SQL surface (S9) points at the versioned head
    assert (
        spark.sql("SELECT COUNT(*) c FROM fct_daily_store_metrics").collect()[0]["c"]
        == len(GOLDEN)
    )


def test_pipeline_versioned_rerun_merges_incrementally(
    spark, raw_paths, tmp_path
):
    """A second run MERGEs on (store_id, dt) instead of rewriting: the
    fact head stays golden and its history records a merge commit — the
    dbt incremental contract on ACID snapshots."""
    from aws_lakehouse_project_spark.pipeline import LakehousePipeline
    from aws_lakehouse_project_spark.plans.versioned import VersionedTable

    LakehousePipeline(spark, _versioned_cfg(raw_paths, tmp_path)).run_all()
    LakehousePipeline(spark, _versioned_cfg(raw_paths, tmp_path)).run_all()
    fvt = VersionedTable(str(tmp_path / "curated" / "fct_daily_store_metrics"))
    assert fvt.history()[-1]["op"] == "merge"
    got = [
        tuple(r) for r in fvt.read(spark).orderBy("store_id", "dt").collect()
    ]
    assert got == GOLDEN


def test_pipeline_versioned_merge_heals_late_rows(spark, raw_paths, tmp_path):
    """The late-data contract end-to-end: v0 built from a stale ERP
    extract (one order missing), then a corrected full rebuild merges —
    only the merge commit, no overwrite — and the head equals GOLDEN."""
    from aws_lakehouse_project_spark.pipeline import LakehousePipeline
    from aws_lakehouse_project_spark.plans.versioned import VersionedTable

    stale = tmp_path / "erp_stale.csv"
    lines = ERP_ORDERS_CSV.strip().splitlines()
    stale.write_text("\n".join(l for l in lines if not l.startswith("1005")) + "\n")

    LakehousePipeline(
        spark,
        _versioned_cfg(dict(raw_paths, erp_orders=str(stale)), tmp_path),
    ).run_all()
    fvt = VersionedTable(str(tmp_path / "curated" / "fct_daily_store_metrics"))
    v0 = [tuple(r) for r in fvt.read(spark).orderBy("store_id", "dt").collect()]
    assert v0 != GOLDEN  # store_03 revenue missing in the stale build

    LakehousePipeline(spark, _versioned_cfg(raw_paths, tmp_path)).run_all()
    assert fvt.history()[-1]["op"] == "merge"
    got = [
        tuple(r) for r in fvt.read(spark).orderBy("store_id", "dt").collect()
    ]
    assert got == GOLDEN


def test_pipeline_versioned_constraints_gate_future_writes(
    spark, raw_paths, tmp_path
):
    """The GE-derived CHECK constraints keep gating AFTER publication:
    a direct append of violating rows to the curated table aborts and
    the head is unchanged."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from aws_lakehouse_project_spark.pipeline import LakehousePipeline
    from aws_lakehouse_project_spark.plans.versioned import (
        ConstraintViolationError,
        VersionedTable,
    )

    pipe = LakehousePipeline(spark, _versioned_cfg(raw_paths, tmp_path))
    pipe.run_all()
    vt = VersionedTable(str(tmp_path / "curated" / "erp_orders"))
    head = vt.latest_version()
    bad = pipe.staged["erp_orders"].withColumn(
        "order_value", F.lit(-5.0).cast("decimal(12,2)")
    )
    with _pytest.raises(ConstraintViolationError):
        vt.append(bad)
    assert vt.latest_version() == head


def test_cli_module_entry_point(spark, tmp_path):
    """The one-command CLI twin of the reference's local runner
    (``local_runner.py:187-192``): ``python -m aws_lakehouse_project_spark
    --output-dir DIR`` generates the built-in sample data, runs the full
    pipeline, and materializes the FIXTURES.md §2 golden fact under
    curated/. Invoked in-process (build_session getOrCreate rides the
    test session)."""
    from aws_lakehouse_project_spark.__main__ import main

    out = tmp_path / "local_output"
    assert main(["--output-dir", str(out)]) == 0
    csv_dir = out / "curated" / "fct_daily_store_metrics" / "csv"
    assert csv_dir.exists()
    back = (
        spark.read.option("header", True)
        .csv(str(csv_dir))
        .selectExpr(
            "store_id",
            "CAST(dt AS DATE) AS dt",
            "CAST(revenue AS DECIMAL(12,2)) AS revenue",
            "CAST(order_count AS INT) AS order_count",
            "CAST(converted_leads AS INT) AS converted_leads",
            "CAST(sessions AS INT) AS sessions",
        )
    )
    rows = sorted(tuple(r) for r in back.collect())
    assert rows == GOLDEN
    # --input-dir over the generated samples reproduces the same fact
    from aws_lakehouse_project_spark.__main__ import main as main2

    out2 = tmp_path / "local_output2"
    assert (
        main2(
            ["--output-dir", str(out2), "--input-dir", str(out / "samples")]
        )
        == 0
    )
    assert (out2 / "curated" / "manifest.json").exists()
    # a missing raw file is named loudly
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="erp_orders.csv"):
        main(["--output-dir", str(out), "--input-dir", str(tmp_path)])
