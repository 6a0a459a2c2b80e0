"""Stateful streaming operators (SURVEY.md §2.9 extension; pyspark guide
'Sessionization' / 'Stateful' patterns).

Two shapes:

- ``session_window`` aggregation: Spark's built-in gap-based session
  windows under a watermark (append mode — a session emits once the
  watermark passes its close). The streaming twin of
  ``operators/analytics.q_sessionize``.
- ``applyInPandasWithState``: arbitrary per-key state for operators the
  built-ins can't express — here a running per-user purchase counter
  that survives across micro-batches (checkpointed), the minimal shape
  of a custom stateful operator (e.g. online feature accumulation).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from ..functions.localrows import local_rows
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.registry import demo_query

SESSION_GAP = "30 minutes"


def sessionize_stream(events: DataFrame, watermark: str = "7 days") -> DataFrame:
    """Gap-based session aggregation over a stream: one row per closed
    (user, session) with its span and event count. State size is bounded
    by open sessions only — closed sessions are evicted at the
    watermark, which is what makes this run forever at scale."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", SESSION_GAP).alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(F.col("event_type") == "purchase").alias("purchases"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "purchases",
        )
    )


COUNTER_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("total_purchases", T.LongType()),
        T.StructField("batch_purchases", T.LongType()),
    ]
)

COUNTER_STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def purchase_counter_stream(events: DataFrame) -> DataFrame:
    """Arbitrary stateful op via applyInPandasWithState: per-user totals
    that persist across micro-batches through the checkpoint. The
    pattern generalizes to any online accumulator (feature stats,
    dedup-seen sets backed by sketches, CDC folding).

    The state function is a CLOSURE, deliberately: cloudpickle ships
    closures by value, so Python workers never need this package on
    their import path (a module-level function is pickled by reference
    and fails on workers whose cwd/py-files lack the package).
    """

    def purchase_counter(key, pdf_iter: Iterator, state: GroupState):
        import pandas as pd

        batch = 0
        for pdf in pdf_iter:
            batch += int((pdf["event_type"] == "purchase").sum())
        (total,) = state.get if state.exists else (0,)
        total += batch
        state.update((total,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_purchases": [total],
                "batch_purchases": [batch],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            purchase_counter,
            outputStructType=COUNTER_OUTPUT_SCHEMA,
            stateStructType=COUNTER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` —
    Spark 4's StatefulProcessor API (the successor to
    applyInPandasWithState): explicit named state handles, timers, and
    composite state types instead of one opaque tuple.

    State is (event count, value total in integer cents): exact integer
    accumulation, so emitted totals are independent of batch boundaries
    and arrival order — the same determinism discipline as the batch
    engine's decimal sums. The processor class is defined in a closure
    so cloudpickle ships it by value to workers (no package import
    needed worker-side, matching purchase_counter_stream).

    ENVIRONMENT GATE: transformWithState's state-server protocol needs
    ``protobuf``, which this container does not ship — the operator is
    the documented seam (validated via its test wherever protobuf
    exists); ``purchase_counter_stream`` is the environment-portable
    stateful path and carries the cross-batch parity coverage here.
    (Round 6: a ``pip download protobuf`` probe confirmed the sandbox
    has no package-index network access, so the gate stands.)
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires protobuf, which this "
            "environment does not provide; use purchase_counter_stream "
            "(applyInPandasWithState) instead"
        ) from exc
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, cents BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, cents = self._state.get()
            else:
                n, cents = 0, 0
            for pdf in rows:
                n += len(pdf)
                # per-ROW cents conversion, then integer sum: rounding a
                # per-batch float total instead would make the result
                # depend on batch boundaries
                cents += int((pdf["value"] * 100).round().astype("int64").sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


_SESSIONS_ORACLE = """
    WITH d AS (
      SELECT user_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM d
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS BIGINT)
             AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS purchases
    FROM s GROUP BY user_id, sid
"""


@demo_query("q_stream_sessions", oracle=_SESSIONS_ORACLE)
def q_stream_sessions(spark, sf_dir: str) -> DataFrame:
    """§2.9 stateful streaming sessions as a driver-checked query: the
    events table delivered as one drop plus a far-future flush event
    (which advances the watermark past every real session, closing them
    all), aggregated by gap-based ``session_window`` in append mode.

    With every session closed, the emitted set must equal batch
    sessionization — the DuckDB oracle computes the same 30-minute-gap
    sessions via lag/cumsum windows. Session bounds are emitted as
    epoch-micros BIGINTs so the comparison is integer-exact. Spark's
    session_window starts a NEW session when the gap is >= the timeout
    (window end is exclusive), matching the oracle's >= INTERVAL."""
    import datetime as dt
    import os
    import shutil

    from ..functions.scratch import scratch_dir
    from ..streaming.events_stream import read_events_stream

    work = scratch_dir("spark_graft_stream_sessions", unique=True)
    drops = os.path.join(work, "drops")
    os.makedirs(drops)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), os.path.join(drops, "b1.parquet")
    )
    # flush row written with the SAME ts physical type as the testdata
    # (TIMESTAMP_NTZ) so the stream's inferred schema holds for both
    flush_uid = 999_999_999
    local_rows(
        spark,
        [(flush_uid, dt.datetime(2024, 6, 1), flush_uid, "view", 0.0, "{}")],
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).write.parquet(os.path.join(drops, "b2.parquet"))

    out = os.path.join(work, "sessions")
    query = (
        # glob, not bare dir: the flush drop is a Spark-written parquet
        # DIRECTORY, and a directory source does not recurse into it —
        # the "*" expands both the flat testdata copy and the dir drop
        sessionize_stream(read_events_stream(spark, os.path.join(drops, "*")))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id") != flush_uid)
        .select(
            "user_id",
            F.unix_micros("session_start").alias("session_start_us"),
            F.unix_micros("session_end").alias("session_end_us"),
            "n_events",
            "purchases",
        )
    )
