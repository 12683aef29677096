"""Stateful streaming sessionizer vs the batch window sessionizer.

The stream emits every CLOSED session; each user's final session stays open
in state — so streamed sessions == batch sessions minus the per-user last.
Sessions spanning micro-batch boundaries exercise the state store.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Time-ordered multi-file events (files = micro-batches in ts order)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts")
        .orderBy("ts")
    )
    # 5 sequential time-range files so sessions span batch boundaries
    rows = ev.collect()
    import pandas as pd

    chunk = (len(rows) + 4) // 5
    for i in range(5):
        pdf = pd.DataFrame([r.asDict() for r in rows[i * chunk:(i + 1) * chunk]])
        if len(pdf):
            spark.createDataFrame(pdf, "user_id long, ts timestamp").coalesce(1) \
                .write.parquet(d, mode="append")
    return d


def _batch_sessions(spark, events_dir, gap_sec=1800):
    from pyspark.sql import Window

    ev = spark.read.parquet(events_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        ev.withColumn("new_s", F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0))
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
    )
    return sess


def test_streaming_sessionizer_matches_batch(spark, events_dir, tmp_path_factory):
    from logport_spark.streaming.sessionize import run_sessionize

    ckpt = str(tmp_path_factory.mktemp("ckpt_sess"))
    got = run_sessionize(spark, events_dir, ckpt, query_name="sess_t1")
    batch = _batch_sessions(spark, events_dir).cache()
    # drop each user's final (still-open) session from the batch reference
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("session_end"))
    closed = (
        batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("user_id", "session_start", "session_end", "n_events")
    )
    g = got.select("user_id", "session_start", "session_end", "n_events")
    assert g.exceptAll(closed).count() == 0
    assert closed.exceptAll(g).count() == 0
    assert g.count() > 0  # sessions actually closed across batches
