"""As-of (most-recent-prior) join — a custom operator Spark's join set lacks.

Semantics: for every left row, attach the single right row with the greatest
`right.ts <= left.ts` within the same key (DuckDB/kdb ASOF JOIN; ties at
equal ts match). The reference has no relational joins at all (SURVEY.md §2)
— this belongs to the engine's §2.6 relational surface for telemetry
correlation (e.g. attach the latest config change / click before each event).

Scale design — the union+window formulation, NOT a range self-join:
  tag left (1) and right (0) rows, union, then one window
  partitionBy(key) orderBy(ts, tag) carrying last(right payload,
  ignorenulls=true) forward; keep left rows.
One shuffle on the key, linear work, no candidate-pair blow-up: a range
join (l.ts >= r.ts) explodes to O(|L|·|R|) per key before picking the max,
which is quadratic for hot keys at 100 TB. Skewed keys can additionally be
range-bucketed by time before the window if a single key exceeds one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row at-or-before
    its timestamp (per key). Right payload columns arrive as <col><suffix>;
    rows with no prior right row keep NULLs (left-outer semantics)."""
    payload = list(right_payload)
    l_tag = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"), F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
        F.col(right_ts).cast("timestamp").alias("_r_ts"),
    )
    # right rows sort before left rows at equal ts (tag 0 < 1) => ties match
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in payload],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_c_ts"),
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        "_lrow.*",
        *[F.col(f"_c_{c}").alias(f"{c}{suffix}") for c in payload],
        F.col("_c_ts").alias(f"ts{suffix}"),
    )
    return out
