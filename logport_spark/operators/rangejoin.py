"""Interval (range) join — the second custom temporal operator Spark lacks.

Semantics: all (left, right) pairs with the same key whose timestamps lie
within ±window seconds. A naive `l.key = r.key AND abs(l.ts - r.ts) <= w`
plans as an equi-join on key followed by a per-key filter, which degenerates
to O(|L|·|R|) work per hot key. The scale formulation buckets time:

  bucket(ts) = floor(epoch(ts) / window)
  left joins right on (key, bucket) for bucket ∈ {b-1, b, b+1}

Any pair within ±window differs by at most one bucket, so the 3-bucket
explode is lossless; the join is a plain equi-shuffle on (key, bucket) and
each task sees only a 3-window slice of any hot key's history. The exact
|Δts| ≤ window predicate filters the slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_sec: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Pairs within ±window_sec per key. Output: key, <left_cols>, <right_cols>
    (right columns suffixed _r), delta_sec (right minus left, signed)."""
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / F.lit(window_sec))
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_lts"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("_b"),
        *[F.col(c) for c in left_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_rts"),
        F.floor(F.unix_timestamp(F.col(right_ts)) / F.lit(window_sec)).alias("_b"),
        *[F.col(c).alias(f"{c}_r") for c in right_cols],
    )
    # cast handles TIMESTAMP_NTZ inputs (session tz is UTC → identity);
    # micros arithmetic keeps sub-second precision in delta_sec
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    delta = (micros("_rts") - micros("_lts")) / F.lit(1e6)
    return (
        l.join(r, ["_k", "_b"])
        .filter(F.abs(delta) <= window_sec)
        .select(
            F.col("_k").alias(key),
            *[F.col(c) for c in left_cols],
            *[F.col(f"{c}_r") for c in right_cols],
            F.round(delta, 6).alias("delta_sec"),
        )
    )
