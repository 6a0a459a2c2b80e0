"""Built-in sample raw data for the one-command local runner.

The reference ships simulated domain files under ``samples/`` and its
QA entry point runs end-to-end on them (``local_runner.py:16-44``,
``README.md:66-79``). These rows are the repo's FIXTURES.md §1 fixture
— five (store_id, dt) fact groups including the CRM-only group that
exists purely via the full outer join — so the CLI's out-of-the-box
run reproduces the §2 golden fact exactly.
"""

from __future__ import annotations

import os

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
        '{"event_id": "E900", "visitor_id": "V500", "store_id": "store_01",'
        ' "dt": "2024-06-01", "page": "/home", "event_type": "page_view",'
        ' "metadata": {"utm_source": "news"}}',
        '{"event_id": "E901", "visitor_id": "V501", "store_id": "store_01",'
        ' "dt": "2024-06-01", "page": "/product/P9", "event_type": "click",'
        ' "metadata": {"cta": "buy"}}',
        '{"event_id": "E902", "visitor_id": "V502", "store_id": "store_02",'
        ' "dt": "2024-06-02", "page": "/search", "event_type": "page_view",'
        ' "metadata": {"query": "lamp"}}',
        '{"event_id": "E903", "visitor_id": "V503", "store_id": "store_03",'
        ' "dt": "2024-06-03", "page": "/home", "event_type": "page_view",'
        ' "metadata": {}}',
    ]
)

PRODUCTS_CSV = """product_id,name,category,price,active,store_id,dt
P900,Desk Lamp,home,39.99,true,store_01,2024-06-01
P901,Mug,kitchen,9.50,true,store_02,2024-06-01
P902,Notebook,office,4.25,false,store_02,2024-06-02
P903,Monitor,office,249.00,true,store_03,2024-06-03
"""

#: domain -> (file name, content) — file names match the reference's
#: samples/ layout so --input-dir can point at either.
SAMPLE_FILES = {
    "erp_orders": ("erp_orders.csv", ERP_ORDERS_CSV),
    "crm_leads": ("crm_leads.csv", CRM_LEADS_CSV),
    "web_events": ("web_events.json", WEB_EVENTS_JSONL),
    "products": ("products.csv", PRODUCTS_CSV),
}


def write_samples(target_dir: str) -> dict[str, str]:
    """Write the four sample raw files into ``target_dir`` and return
    the ``domain -> path`` map ``PipelineConfig.raw_paths`` takes."""
    os.makedirs(target_dir, exist_ok=True)
    out = {}
    for domain, (name, content) in SAMPLE_FILES.items():
        p = os.path.join(target_dir, name)
        with open(p, "w") as fh:
            fh.write(content)
        out[domain] = p
    return out


def resolve_input_dir(input_dir: str) -> dict[str, str]:
    """Map an existing directory holding the four raw files to
    ``raw_paths``, failing loudly on missing files."""
    out = {}
    missing = []
    for domain, (name, _) in SAMPLE_FILES.items():
        p = os.path.join(input_dir, name)
        if os.path.exists(p):
            out[domain] = p
        else:
            missing.append(name)
    if missing:
        raise FileNotFoundError(
            f"--input-dir {input_dir!r} is missing raw files: {missing} "
            f"(expected the reference samples/ layout: "
            f"{[n for n, _ in SAMPLE_FILES.values()]})"
        )
    return out
