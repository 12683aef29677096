"""Interval join: boundary inclusion, per-key isolation, no cross-product plan."""

from __future__ import annotations

import datetime as dt


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_interval_join_semantics(spark):
    from logport_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100)],
        "user_id long, ts timestamp, lid int")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:59:00"), 1),   # -60s  -> in (boundary)
         (1, _ts("2024-01-01 10:01:00"), 2),   # +60s  -> in (boundary)
         (1, _ts("2024-01-01 10:01:01"), 3),   # +61s  -> out
         (2, _ts("2024-01-01 10:00:00"), 4)],  # other key -> out
        "user_id long, ts timestamp, rid int")
    got = interval_join(left, right, key="user_id", window_sec=60,
                        left_cols=("lid",), right_cols=("rid",)).collect()
    assert sorted(r["rid_r"] for r in got) == [1, 2]
    deltas = {r["rid_r"]: r["delta_sec"] for r in got}
    assert deltas[1] == -60.0 and deltas[2] == 60.0


def test_interval_join_is_equi_shuffle(spark):
    """Must plan as an equi join on (key, bucket) — never a nested-loop or
    cartesian plan, which is what the naive range predicate degenerates to."""
    from logport_spark.operators.rangejoin import interval_join

    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1)], "user_id long, ts timestamp, x int")
    plan = (interval_join(ev, ev, key="user_id", window_sec=60,
                          left_cols=("x",), right_cols=("x",))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
