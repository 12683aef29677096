"""Bucketed-table layout (operators/bucketed.py): the zero-Exchange
co-located join and the bucket-partitioned aggregate, pinned at the plan
level — plus the non-bucketed contrast proving the assertion bites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logport_spark.operators.bucketed import bucketed_equijoin, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    """Two tables bucketed by the same key/count: 400 fact rows over 16
    keys, one dim row per key."""
    root = tmp_path_factory.mktemp("bq")
    facts = spark.range(400).select(
        F.col("id"),
        (F.col("id") % 16).cast("string").alias("k"),
        (F.col("id") * 3 % 97).alias("v"))
    dims = facts.groupBy("k").agg(F.sum("v").alias("kv"))
    write_bucketed(facts, "t_bq_facts", str(root / "facts"), "k", 4)
    write_bucketed(dims, "t_bq_dims", str(root / "dims"), "k", 4)
    return facts, dims


def test_bucketed_join_has_no_shuffle_exchange(spark, bucketed_pair):
    facts, dims = bucketed_pair
    # force the sort-merge path so the co-location claim is about the
    # bucketed layout, not about the dim side being broadcastable
    j = (spark.table("t_bq_facts").hint("merge")
         .join(spark.table("t_bq_dims"), "k"))
    plan = _plan(j)
    assert "Exchange hashpartitioning" not in plan
    assert "Bucketed: true" in plan
    # values equal the in-memory join, layout-independent
    expect = {(r["id"], r["kv"]) for r in facts.join(dims, "k").collect()}
    got = {(r["id"], r["kv"]) for r in j.collect()}
    assert got == expect and len(got) == 400


def test_bucketed_aggregate_has_no_shuffle_exchange(spark, bucketed_pair):
    """groupBy on the bucket key (or any superset of it) rides the stored
    partitioning: partial and final agg fuse with no Exchange between."""
    agg = spark.table("t_bq_facts").groupBy("k").agg(F.sum("v").alias("sv"))
    assert "Exchange" not in _plan(agg)
    got = {(r["k"], r["sv"]) for r in agg.collect()}
    facts, dims = bucketed_pair
    assert got == {(r["k"], r["kv"]) for r in dims.collect()}


def test_unbucketed_contrast_does_shuffle(spark, bucketed_pair, tmp_path):
    """The same join over plain parquet shuffles — proving the zero-
    Exchange asserts above are pinning the bucketed layout, not a
    local-mode artifact."""
    facts, dims = bucketed_pair
    facts.write.mode("overwrite").parquet(str(tmp_path / "pf"))
    dims.write.mode("overwrite").parquet(str(tmp_path / "pd"))
    j = (spark.read.parquet(str(tmp_path / "pf")).hint("merge")
         .join(spark.read.parquet(str(tmp_path / "pd")), "k"))
    assert "Exchange hashpartitioning" in _plan(j)


def test_bucket_count_must_be_bare_identifier(spark):
    with pytest.raises(ValueError):
        write_bucketed(spark.range(1), "bad-name; drop", "/tmp/x", "id")
