"""as-of join semantics: ties match, no-prior rows keep NULLs, latest wins."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    from logport_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "l1"),
         (1, _ts("2024-01-01 12:00:00"), "l2"),
         (2, _ts("2024-01-01 09:00:00"), "l3")],   # before any right row
        "user_id long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 100),
         (1, _ts("2024-01-01 10:00:00"), 200),     # tie with l1 -> must match
         (1, _ts("2024-01-01 11:00:00"), 300),
         (2, _ts("2024-01-01 09:30:00"), 400)],    # after l3 -> no match
        "user_id long, ts timestamp, rv int",
    )
    out = {r["name"]: r for r in
           asof_join(left, right, key="user_id", right_payload=("rv",)).collect()}
    assert out["l1"]["rv_asof"] == 200        # tie at equal ts matches
    assert out["l2"]["rv_asof"] == 300        # latest prior, not first
    assert out["l3"]["rv_asof"] is None       # left-outer: no prior right row
    assert out["l3"]["ts_asof"] is None
    assert out["l1"]["ts_asof"] == _ts("2024-01-01 10:00:00")


def test_asof_join_null_payload_keeps_whole_row(spark):
    """When the most recent prior right row has a NULL payload cell, the
    output must carry THAT row's values (NULL included) — not mix in an
    older row's non-NULL value (ADVICE r1: per-column carries diverged from
    DuckDB ASOF whole-row semantics)."""
    from logport_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), "l1")],
        "user_id long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100, "old"),
         (1, _ts("2024-01-01 11:00:00"), None, "new")],  # latest has NULL rv
        "user_id long, ts timestamp, rv int, tag string",
    )
    out = asof_join(left, right, key="user_id",
                    right_payload=("rv", "tag")).collect()[0]
    assert out["tag_asof"] == "new"
    assert out["rv_asof"] is None            # NOT 100 from the older row
    assert out["ts_asof"] == _ts("2024-01-01 11:00:00")


def test_asof_join_single_shuffle(spark):
    """The union+window formulation must shuffle once on the key — no range
    join / nested-loop blow-up in the plan."""
    from logport_spark.operators.asof import asof_join

    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "a")], "user_id long, ts timestamp, x string")
    plan = (asof_join(ev, ev, key="user_id", right_payload=("x",))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides co-shuffle
