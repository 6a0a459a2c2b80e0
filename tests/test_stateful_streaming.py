"""Stateful streaming tests: session_window vs batch sessionization,
and cross-batch state continuity for applyInPandasWithState."""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _events_stream(spark, path):
    from aws_lakehouse_project_spark.streaming.events_stream import (
        read_events_stream,
    )

    return read_events_stream(spark, path)


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Sessions emitted by the streaming session_window (append mode)
    must match batch sessionization for all sessions the watermark has
    closed. A synthetic far-future event advances the watermark so every
    real session closes."""
    from aws_lakehouse_project_spark.streaming.stateful import sessionize_stream

    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    shutil.copy(
        os.path.join(SF_DIR, "events.parquet"), drop_dir / "b1.parquet"
    )
    # flush event: far enough that watermark (7d) passes all real data.
    # Written with the SAME ts physical type as the copied testdata file
    # (TIMESTAMP_NTZ) so the stream's inferred schema holds for both.
    spark.createDataFrame(
        [(999_999, dt.datetime(2024, 6, 1), 999_999, "view", 0.0, "{}")],
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE, props STRING",
    ).write.parquet(str(drop_dir / "b2.parquet"))

    out = (
        sessionize_stream(_events_stream(spark, str(drop_dir / "*")))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    out.processAllAvailable()
    out.stop()
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["purchases"])
        for r in spark.sql(
            "SELECT * FROM sessions_out WHERE user_id < 999999"
        ).collect()
    }

    # batch twin: same 30-min gap sessionization
    from aws_lakehouse_project_spark.operators.analytics import q_sessionize

    batch = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in q_sessionize(spark, SF_DIR).collect()
    }
    assert set(got) == set(batch)
    for k, (n, _p) in got.items():
        assert n == batch[k], k


def test_purchase_counter_state_survives_batches(spark, tmp_path):
    """applyInPandasWithState: totals accumulate across two file drops
    through the checkpoint — batch 2's totals include batch 1's."""
    from aws_lakehouse_project_spark.streaming.stateful import (
        purchase_counter_stream,
    )

    src = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    purchases = src.filter(F.col("event_type") == "purchase")
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    b1 = purchases.filter(F.col("event_id") % 2 == 0)
    b2 = purchases.filter(F.col("event_id") % 2 == 1)
    b1.write.parquet(str(drop_dir / "b1.parquet"))

    def run():
        # memory sink can't recover from a checkpoint — collect emitted
        # rows via foreachBatch, which can
        emitted: list = []

        def sink(df, _epoch):
            emitted.extend(df.collect())

        q = (
            purchase_counter_stream(_events_stream(spark, str(drop_dir / "*")))
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return {r["user_id"]: r["total_purchases"] for r in emitted}

    first = run()
    b2.write.parquet(str(drop_dir / "b2.parquet"))
    second = run()

    want = {
        r["user_id"]: r["n"]
        for r in purchases.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # users updated in batch 2 show full totals; users only in batch 1
    # keep their batch-1 totals (update mode re-emits only changed keys)
    for uid, total in second.items():
        assert total == want[uid], uid
    for uid, total in first.items():
        assert total <= want[uid]


def test_stream_dedup_drops_redelivered_events(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the same file delivered twice (an
    at-least-once redelivery) must emit each event_id exactly once, and
    the survivor set must equal the batch dropDuplicates twin."""
    from aws_lakehouse_project_spark.streaming.events_stream import (
        dedup_events_stream,
    )

    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    src = os.path.join(SF_DIR, "events.parquet")
    shutil.copy(src, drop_dir / "b1.parquet")
    shutil.copy(src, drop_dir / "b2.parquet")  # redelivery of the whole drop

    out = (
        dedup_events_stream(_events_stream(spark, str(drop_dir / "*")))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    out.processAllAvailable()
    out.stop()

    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    got_ids = [r["event_id"] for r in got]
    assert len(got_ids) == len(set(got_ids)), "a redelivered event was re-emitted"

    batch_ids = {
        r["event_id"]
        for r in spark.read.parquet(src).select("event_id").distinct().collect()
    }
    assert set(got_ids) == batch_ids


def test_transform_with_state_totals_survive_batches(spark, tmp_path):
    """transformWithStateInPandas: per-user running totals accumulate
    across two file drops through the checkpoint, and the final emission
    equals the batch aggregation over the union — with integer-cent
    state so batch boundaries cannot perturb the totals. Skips where the
    API's protobuf dependency is absent (this container)."""
    import pytest

    pytest.importorskip(
        "google.protobuf", reason="transformWithState needs protobuf"
    )
    from aws_lakehouse_project_spark.streaming.stateful import (
        running_totals_stream,
    )

    src = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    half1 = src.filter(F.col("event_id") % 2 == 0)
    half2 = src.filter(F.col("event_id") % 2 == 1)
    half1.write.parquet(str(drop_dir / "b1.parquet"))

    collected: dict[int, tuple] = {}

    def run():
        q = (
            running_totals_stream(_events_stream(spark, str(drop_dir / "*")))
            .writeStream.outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_twstate"))
            .foreachBatch(
                lambda df, _eid: collected.update(
                    {
                        r["user_id"]: (r["n_events"], r["total_cents"])
                        for r in df.collect()
                    }
                )
            )
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    half2.write.parquet(str(drop_dir / "b2.parquet"))
    run()  # same checkpoint: state resumes, batch 2 folds into batch 1

    want = {
        r["user_id"]: (r["n"], r["cents"])
        for r in src.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert collected == want


def test_running_totals_raises_clear_error_without_protobuf(spark):
    """In environments without protobuf the operator fails fast with an
    actionable message instead of a mid-query worker crash."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
        pytest.skip("protobuf present — gate inactive")
    except ImportError:
        pass
    from aws_lakehouse_project_spark.streaming.stateful import (
        running_totals_stream,
    )

    ev = spark.createDataFrame(
        [(1, 1.0)], "user_id long, value double"
    )
    with pytest.raises(ImportError, match="purchase_counter_stream"):
        running_totals_stream(ev)
