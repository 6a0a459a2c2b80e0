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
