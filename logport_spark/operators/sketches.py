"""Mergeable sketch summaries — HyperLogLog, Count-Min, KMV bottom-k.

At 10^12 rows, exact ``COUNT(DISTINCT)`` shuffles every distinct value,
exact heavy-hitters shuffles every key, and exact pairwise set overlap
explodes outright. Sketches replace all three with FIXED-SIZE mergeable
state that Spark's partial aggregation combines map-side: a partition of a
billion tokens leaves the map stage as at most ``m`` HLL registers /
``d*w`` CMS counters / ``k`` minima per group, so the shuffle is bounded
by sketch size x group count, never by data size. That is the whole 100 TB
story of this module.

Determinism contract (the same one ``operators/sampling.py`` pins): every
sketch here is a pure function of md5(row) — identical registers, counters
and minima on any engine, any partitioning, any cluster size — so the
DuckDB oracle reproduces each output BIT-FOR-BIT via the house digit-
arithmetic idiom, and the one floating division per estimate is a single
IEEE correctly-rounded op on integer-exact operands (engine-independent).
No sampled accuracy bounds, no seeds: the estimate itself is deterministic
data.

Algorithms are the public classics: Flajolet/Fusy/Gandouet/Meunier 2007
(HyperLogLog), Cormode & Muthukrishnan 2005 (Count-Min), Bar-Yossef et al.
2002 / Beyer et al. 2007 (KMV / bottom-k distinct + Jaccard).

Reference parity: logport keeps only exact per-watch counters
(/root/reference/src/LogPort.cc run-summary stats); it has no analytics
tier at all. This module is part of the engine's superset surface —
SURVEY §2.6 aggregation family, approximate tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------- HLL

HLL_P = 8
HLL_M = 1 << HLL_P          # 256 registers: ~6.5% rel. std error, 2 KB state
# rho is capped so S = sum(2^(CAP - rho)) over registers is int64-exact:
# 256 * 2^40 = 2^48 << 2^63. P(rho > 40) ~ 2^-40 per key — the cap is part
# of the deterministic contract, not an approximation that can drift.
HLL_RHO_CAP = 40
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# alpha * m^2 * 2^CAP as ONE python-computed literal so both engines do a
# single IEEE division CONST / S — bit-identical everywhere.
HLL_CONST = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_CAP)


def _hex_long(col: Column, start: int, n: int) -> Column:
    """Value of hex digits [start, start+n) of a hex string, 1-based."""
    return F.conv(F.substring(col, start, n), 16, 10).cast("long")


def hll_register(key: Column) -> Column:
    """Register index in [0, HLL_M) — the first HLL_P bits of md5(key)."""
    return _hex_long(F.md5(key), 1, HLL_P // 4)


def hll_rho(key: Column) -> Column:
    """Leading-zero rank of the 60 bits after the register, capped.

    Pure codegen: hex-digit leading zeros via regexp_extract, the
    intra-nibble remainder via a 4-way CASE on the first non-zero digit —
    the exact shape the DuckDB oracle replays.
    """
    h = F.substring(F.md5(key), HLL_P // 4 + 1, 15)   # 15 nibbles = 60 bits
    lz = F.length(F.regexp_extract(h, "^0*", 0))
    first = F.substring(h, lz + F.lit(1), F.lit(1))
    nib = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.least(lz * 4 + nib + 1, F.lit(HLL_RHO_CAP))


def hll_distinct(df: DataFrame, group_cols: list[str],
                 key_col: str = "tok") -> DataFrame:
    """Per-group HLL distinct-count estimate — no distinct, no key shuffle.

    Plan shape: project (group, register, rho) -> partial+final max per
    (group, register) [<= m rows per group leave every partition] ->
    partial+final sum per group. Duplicates never need collapsing (max
    absorbs them), so the input can stream straight off the scan.

    Output per group: hll_s (the int64-exact scaled harmonic sum),
    hll_zeros, branch ('raw' | 'linear'), hll_est. The linear-counting
    branch (raw <= 2.5m with empty registers; Flajolet et al. §4) uses
    m*ln(m/V) — ln is the one libm call, flagged by `branch` so an engine
    disagreement would be visible, not silent.
    """
    return hll_estimate(hll_registers(df, group_cols, key_col), group_cols)


def hll_registers(df: DataFrame, group_cols: list[str],
                  key_col: str = "tok") -> DataFrame:
    """The sketch ITSELF as a table: (group, register, m_j) — the form you
    persist per shard/day/snapshot. <= m rows per group, mergeable below."""
    regs = df.select(
        *group_cols,
        hll_register(F.col(key_col)).alias("register"),
        hll_rho(F.col(key_col)).alias("rho"),
    )
    return regs.groupBy(*group_cols, "register").agg(F.max("rho").alias("m_j"))


def hll_merge(*sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables: union + max per (group, register).

    This is the property that makes HLL the 100 TB tool: per-day (or
    per-shard, per-snapshot) sketches of <= m rows each combine into the
    month's sketch WITHOUT revisiting any data — max is associative,
    commutative and idempotent, so the merge is exact (the merged sketch
    equals the sketch of the concatenated inputs, bit for bit; pytest pins
    that equality). Estimate the merged table with hll_estimate."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy(*group_cols, "register").agg(F.max("m_j").alias("m_j"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """hll_distinct's estimation tail over a persisted/merged register
    table — same columns, same single-IEEE-division determinism."""
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_RHO_CAP} - m_j AS INT))"
        )).alias("s_present"),
        F.count("*").alias("regs_used"),
    )
    zeros = (F.lit(HLL_M) - F.col("regs_used")).cast("int")
    s_total = (F.col("s_present")
               + zeros.cast("long") * F.lit(1 << HLL_RHO_CAP)).cast("long")
    out = agg.withColumn("hll_zeros", zeros).withColumn("hll_s", s_total)
    raw = F.lit(HLL_CONST) / F.col("hll_s")
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M))
                                         / F.col("hll_zeros"))
    use_linear = (raw <= F.lit(2.5 * HLL_M)) & (F.col("hll_zeros") > 0)
    return out.select(
        *group_cols,
        "hll_s",
        "hll_zeros",
        F.when(use_linear, F.lit("linear")).otherwise(F.lit("raw"))
            .alias("branch"),
        F.round(F.when(use_linear, linear).otherwise(raw), 4)
            .alias("hll_est"),
    )


# --------------------------------------------------------------- Count-Min

CMS_D = 4
CMS_W = 1024   # 4 KB of int64 counters; eps ~ e/w of the stream length


def cms_bucket(key: Column, row: int) -> Column:
    """Counter column for hash row `row` — md5 with a per-row salt."""
    return F.pmod(
        _hex_long(F.md5(F.concat(F.lit(f"cms{row}:"), key)), 1, 5),
        F.lit(CMS_W),
    )


def cms_counters(df: DataFrame, key_col: str = "tok") -> DataFrame:
    """The d x w counter table: one pass, one bounded shuffle.

    Each occurrence explodes to d (row, bucket) cells; partial aggregation
    collapses every partition to <= d*w rows before the exchange, so the
    shuffle is O(d*w) per partition regardless of stream length — the CMS
    point. Output: (r, c, cnt), at most d*w rows total.
    """
    cells = df.select(F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 cms_bucket(F.col(key_col), r).alias("c"))
        for r in range(CMS_D)
    ])).alias("rc")).select("rc.r", "rc.c")
    return cells.groupBy("r", "c").agg(F.count("*").alias("cnt"))


def cms_point_estimates(counters: DataFrame, probes: DataFrame,
                        key_col: str = "tok") -> DataFrame:
    """min over rows of the probed counters — the CMS point query.

    probes is small (the tokens being asked about): broadcast it into the
    counter table (itself <= d*w rows) so the lookup never shuffles.
    Estimates only ever OVERcount (Cormode-Muthukrishnan Thm 1).
    """
    pcells = probes.select(key_col, F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 cms_bucket(F.col(key_col), r).alias("c"))
        for r in range(CMS_D)
    ])).alias("rc")).select(key_col, "rc.r", "rc.c")
    return (counters.join(F.broadcast(pcells), ["r", "c"])
            .groupBy(key_col)
            .agg(F.min("cnt").alias("cms_est")))


# --------------------------------------------------------------------- KMV

KMV_K = 128
# theta denominator: value of the first 15 hex digits as a fraction of
# 16^15. (k-1) * 16^15 is exactly representable (127 * 2^60 < 2^67 with a
# 7-bit mantissa need), so union_est = KMV_CONST / theta_int is again one
# IEEE division on an integer-exact operand.
KMV_CONST = float(KMV_K - 1) * float(16 ** 15)


def kmv_sketch(df: DataFrame, group_cols: list[str],
               key_col: str = "tok", k: int = KMV_K) -> DataFrame:
    """Bottom-k sketch per group: the k smallest md5(key) over DISTINCT
    keys. Fixed-width hex strings order lexicographically = numerically,
    so no numeric conversion is needed to rank; key breaks the
    (astronomically unlikely) md5 tie so the sketch is total-order
    deterministic. Groups must carry >= k distinct keys for the theta
    estimator (Beyer et al. 2007) — callers below assert the floor.
    """
    d = df.select(*group_cols, key_col).distinct()
    h = F.md5(F.col(key_col))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (d.withColumn("h", h)
             .withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= k)
             .select(*group_cols, "h", "rk"))


def kmv_pair_similarity(sk: DataFrame, group_col: str,
                        k: int = KMV_K) -> DataFrame:
    """All-pairs Jaccard + union-size estimates from bottom-k sketches.

    The union sketch of (a, b) is the k smallest of the merged hash sets;
    the Jaccard estimate is the fraction of those present in BOTH input
    sketches (Beyer et al. 2007 §5). Everything downstream of the k x
    |groups|-row sketch table is sketch-sized: pairwise work is
    O(pairs * 2k), independent of corpus size — exactly what makes
    all-pairs set overlap feasible over millions of documents' hosts when
    the exact self-join cannot run at all.

    Output: group_a < group_b, kmv_matches, kmv_jacc, kmv_union_est.
    """
    a = sk.select(F.col(group_col).alias("ga"), "h")
    b = sk.select(F.col(group_col).alias("gb"), "h")
    pairs = (a.select("ga").distinct()
              .join(b.select("gb").distinct(), F.col("ga") < F.col("gb")))
    # union of the two sketches per pair, tagged by side
    ua = pairs.join(a, "ga").select("ga", "gb", "h",
                                    F.lit(1).alias("in_a"),
                                    F.lit(0).alias("in_b"))
    ub = pairs.join(b, "gb").select("ga", "gb", "h",
                                    F.lit(0).alias("in_a"),
                                    F.lit(1).alias("in_b"))
    merged = (ua.unionByName(ub)
                .groupBy("ga", "gb", "h")
                .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    w = Window.partitionBy("ga", "gb").orderBy(F.col("h").asc())
    topk = merged.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    theta_int = F.max(F.when(F.col("rk") == k, _hex_long(F.col("h"), 1, 15)))
    return (topk.groupBy("ga", "gb")
            .agg(F.sum(F.col("in_a") * F.col("in_b")).alias("kmv_matches"),
                 theta_int.alias("theta_int"))
            .select(
                F.col("ga").alias("group_a"),
                F.col("gb").alias("group_b"),
                F.col("kmv_matches").cast("int").alias("kmv_matches"),
                F.round(F.col("kmv_matches") / F.lit(float(k)), 4)
                    .alias("kmv_jacc"),
                F.round(F.lit(KMV_CONST) / F.col("theta_int"), 2)
                    .alias("kmv_union_est"),
            ))


# ------------------------------------------------------ sampled quantiles

def sampled_quantiles(df: DataFrame, group_cols: list[str], val_col: str,
                      probs: list[float], rate: float = 0.25,
                      key_col: str = "event_id",
                      salt: str = "q42") -> DataFrame:
    """Per-group quantiles from a deterministic md5 hash sample — the
    quantile member of the approximate tier.

    Exact `percentile` buffers every group's full value list at the final
    aggregate: at 10^12 rows a hot group's buffer is the whole group.
    Sampling first caps that buffer at ~rate x n while the quantile
    estimate stays within O(1/sqrt(rate x n)) rank error (DKW bound) — the
    same exact-becomes-bounded move as vocab_topk -> cms_heavy_hitters.

    Unlike ``df.sample()`` (RNG, partitioning-dependent), membership is
    md5(salt || key) — ``operators/sampling.py``'s determinism contract —
    so the estimate is deterministic DATA: any engine, any cluster size,
    any partitioning picks the identical sample, and the DuckDB oracle
    replays sample and quantile bit-for-bit. Merge-friendly too: the
    sample of a union is the union of samples, so per-partition /
    per-day samples concatenate without re-scanning history.

    Output: group_cols + n_sample + one ``p<P>_s`` per prob (rounded 4dp,
    the house float-pinning idiom of event_value_quantiles).
    """
    from logport_spark.operators.sampling import hash_sample

    s = hash_sample(df, rate, key_col=key_col, salt=salt)
    aggs = [F.count(F.lit(1)).alias("n_sample")]
    for p in probs:
        aggs.append(
            F.round(F.percentile(val_col, F.lit(p)), 4)
             .alias(f"p{int(round(p * 100)):02d}_s"))
    return s.groupBy(*group_cols).agg(*aggs)
