"""Materializing demo queries must be idempotent: the driver (and the
oracle sweep) may invoke any registered query repeatedly in one session,
so a second run over the same scratch/target state has to produce the
identical result — catching overwrite-mode, scratch-collision, and
checkpoint-reuse bugs that single-run suites miss."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

# every registered query that writes files / drives a stream / merges
MATERIALIZING = [
    "q_merge_delete",
    "q_sink_partitioned",
    "q_scan_orc",
    "q_scan_csv",
    "q_schema_evolution",
    "q_scan_binaryfile",
    "q_stream_daily",
    "q_stream_sliding",
    "q_stream_enrich",
    "q_table_diff",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("name", MATERIALIZING)
def test_second_run_identical(spark, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    first = _canon(q(spark, SF_DIR))
    second = _canon(q(spark, SF_DIR))
    assert first == second, f"{name}: second run diverged"
    assert len(first) > 0
