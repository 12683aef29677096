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
    # ONE struct carries the whole right row (ts + payload), so a single
    # last(ignorenulls) attaches values from ONE right row — per-column
    # carries could mix columns across right rows when a payload cell is
    # NULL in the most recent one (DuckDB ASOF attaches whole rows).
    r_struct = F.struct(
        F.col(right_ts).cast("timestamp").alias("_ts_asof"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
    )
    l_tag = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(right.select(r_struct.alias("_rrow")).schema["_rrow"].dataType)
         .alias("_rrow"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"), F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        r_struct.alias("_rrow"),
    )
    # right rows sort before left rows at equal ts (tag 0 < 1) => ties match
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_c"),
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        "_lrow.*",
        *[F.col(f"_c._p_{c}").alias(f"{c}{suffix}") for c in payload],
        F.col("_c._ts_asof").alias(f"ts{suffix}"),
    )
    return out
