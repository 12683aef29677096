"""Property tests for the sketch family (operators/sketches.py).

Engine-vs-oracle parity is gated by driver_sim / test_baseline_oracles;
these tests pin the sketch SEMANTICS against pure-Python references —
register/rho derivation, duplicate-insensitivity, the CMS never-undercount
theorem, KMV match/theta arithmetic — plus the accuracy the estimators
exist to deliver.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from logport_spark.operators.sketches import (CMS_D, CMS_W, HLL_CONST,
                                              HLL_M, HLL_RHO_CAP, KMV_K,
                                              cms_counters,
                                              cms_point_estimates,
                                              hll_distinct,
                                              kmv_pair_similarity,
                                              kmv_sketch)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _py_rho(h: str) -> int:
    s = h[2:17]
    lz = len(s) - len(s.lstrip("0"))
    if lz == 15:
        return HLL_RHO_CAP
    c = int(s[lz], 16)
    nib = 3 if c == 1 else 2 if c in (2, 3) else 1 if c < 8 else 0
    return min(4 * lz + nib + 1, HLL_RHO_CAP)


def _py_hll(keys) -> tuple[int, int, float]:
    regs: dict[int, int] = {}
    for k in keys:
        h = _md5(k)
        r = int(h[:2], 16)
        regs[r] = max(regs.get(r, 0), _py_rho(h))
    zeros = HLL_M - len(regs)
    s = sum(1 << (HLL_RHO_CAP - m) for m in regs.values()) \
        + zeros * (1 << HLL_RHO_CAP)
    raw = HLL_CONST / s
    if raw <= 2.5 * HLL_M and zeros > 0:
        est = float(HLL_M) * math.log(float(HLL_M) / zeros)
    else:
        est = raw
    return s, zeros, est


def test_hll_matches_python_reference_and_is_accurate(spark):
    keys = [f"key-{i}" for i in range(5000)]
    df = spark.createDataFrame([(k,) for k in keys], "tok string")
    row = hll_distinct(df, [], "tok").collect()[0]
    s, zeros, est = _py_hll(keys)
    assert row["hll_s"] == s
    assert row["hll_zeros"] == zeros
    assert abs(row["hll_est"] - est) < 1e-3
    # m=256 -> ~6.5% std error; 3 sigma
    assert abs(row["hll_est"] - 5000) / 5000 < 0.20


def test_hll_sketch_ignores_duplicates(spark):
    keys = [f"k{i}" for i in range(800)]
    once = spark.createDataFrame([(k,) for k in keys], "tok string")
    thrice = spark.createDataFrame([(k,) for k in keys * 3], "tok string")
    a = hll_distinct(once, [], "tok").collect()[0]
    b = hll_distinct(thrice, [], "tok").collect()[0]
    assert (a["hll_s"], a["hll_zeros"], a["hll_est"]) == \
        (b["hll_s"], b["hll_zeros"], b["hll_est"])


def test_hll_linear_counting_branch(spark):
    """Tiny cardinality must take the flagged linear-counting branch and
    land very close to truth (linear counting is near-exact there)."""
    df = spark.createDataFrame([(f"x{i % 40}",) for i in range(400)],
                               "tok string")
    row = hll_distinct(df, [], "tok").collect()[0]
    assert row["branch"] == "linear"
    assert abs(row["hll_est"] - 40) / 40 < 0.15


def test_cms_never_undercounts_and_matches_reference(spark):
    rows = [(f"t{i % 97}",) for i in range(3000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "tok string")
    counters = cms_counters(df, "tok")
    probes = df.distinct()
    est = {r["tok"]: r["cms_est"]
           for r in cms_point_estimates(counters, probes, "tok").collect()}

    exact: dict[str, int] = {}
    for (t,) in rows:
        exact[t] = exact.get(t, 0) + 1
    # python CMS reference
    table = [[0] * CMS_W for _ in range(CMS_D)]
    for (t,) in rows:
        for r in range(CMS_D):
            c = int(_md5(f"cms{r}:{t}")[:5], 16) % CMS_W
            table[r][c] += 1
    for t, cnt in exact.items():
        ref = min(table[r][int(_md5(f"cms{r}:{t}")[:5], 16) % CMS_W]
                  for r in range(CMS_D))
        assert est[t] == ref
        assert est[t] >= cnt  # Cormode-Muthukrishnan: only overcounts


def test_kmv_matches_reference_and_tracks_exact_jaccard(spark):
    # two sets sharing exactly half their elements, both >> k
    a = [f"shared-{i}" for i in range(600)] + [f"a-{i}" for i in range(600)]
    b = [f"shared-{i}" for i in range(600)] + [f"b-{i}" for i in range(600)]
    rows = [("ga", t) for t in a] + [("gb", t) for t in b]
    df = spark.createDataFrame(rows, "g string, tok string")
    sk = kmv_sketch(df, ["g"], "tok")
    out = kmv_pair_similarity(sk, "g").collect()[0]

    # python reference: bottom-k per set, union-k matches + theta
    def bottomk(keys):
        return sorted((_md5(t), t) for t in set(keys))[:KMV_K]

    ha = {h for h, _ in bottomk(a)}
    hb = {h for h, _ in bottomk(b)}
    union_k = sorted(ha | hb)[:KMV_K]
    matches = sum(1 for h in union_k if h in ha and h in hb)
    theta_int = int(union_k[-1][:15], 16)
    assert out["kmv_matches"] == matches
    assert out["kmv_jacc"] == round(matches / float(KMV_K), 4)
    # exact jaccard is 600/1800 = 1/3; the estimate should be in range
    assert abs(out["kmv_jacc"] - 1 / 3) < 0.12
    # union estimate within 25% of the true union (1800)
    est_union = (KMV_K - 1) * float(16 ** 15) / theta_int
    assert abs(out["kmv_union_est"] - est_union) < 0.5
    assert abs(est_union - 1800) / 1800 < 0.25


def test_hll_merge_equals_sketch_of_union(spark):
    """Mergeability — the 100 TB property: per-shard register tables
    combine by union+max into EXACTLY the sketch of the concatenated
    data (max is associative/commutative/idempotent), so monthly counts
    come from merging daily sketches without revisiting any data."""
    from logport_spark.operators.sketches import (hll_estimate, hll_merge,
                                                  hll_registers)

    shards = [
        [("d1", f"t{i}") for i in range(0, 700)],
        [("d1", f"t{i}") for i in range(500, 1200)],   # overlaps shard 0
        [("d2", f"t{i}") for i in range(0, 300)],
    ]
    dfs = [spark.createDataFrame(s, "domain string, tok string")
           for s in shards]
    merged = hll_merge(*[hll_registers(d, ["domain"], "tok") for d in dfs],
                       group_cols=["domain"])
    whole = hll_registers(dfs[0].union(dfs[1]).union(dfs[2]),
                          ["domain"], "tok")
    a = {(r["domain"], r["register"]): r["m_j"] for r in merged.collect()}
    b = {(r["domain"], r["register"]): r["m_j"] for r in whole.collect()}
    assert a == b
    est = {r["domain"]: r for r in
           hll_estimate(merged, ["domain"]).collect()}
    ref = {r["domain"]: r for r in
           hll_estimate(whole, ["domain"]).collect()}
    for d in ("d1", "d2"):
        assert (est[d]["hll_s"], est[d]["hll_est"]) == \
            (ref[d]["hll_s"], ref[d]["hll_est"])


def test_stream_hll_registers_equal_batch_and_state_is_bounded(
        spark, tmp_path_factory):
    """Streaming COUNT(DISTINCT) with registers as state: the streaming
    register table must equal the batch sketch of the same pages bit for
    bit (so a streaming day merges exactly with a batch backfill), and
    the state store must hold at most windows x domains x m rows — never
    the key set."""
    import pandas as pd

    from logport_spark import datagen
    from logport_spark.operators.enrich import with_domain
    from logport_spark.operators.sketches import (HLL_M, hll_estimate,
                                                  hll_registers)
    from logport_spark.streaming.stream import windowed_hll_distinct

    d = str(tmp_path_factory.mktemp("pages_hll"))
    pdf = pd.DataFrame(datagen.gen_docs(range(400)))
    spark.createDataFrame(pdf, schema=datagen.PAGES_DDL) \
        .repartition(5).write.mode("overwrite").parquet(d)
    ckpt = str(tmp_path_factory.mktemp("hll_ckpt"))

    got, state_rows = windowed_hll_distinct(
        spark, d, ckpt, query_name="whll_test", max_files=2)

    batch = (with_domain(spark.read.parquet(d))
             .select(F.window("warc_ts", "1 day").alias("w"),
                     "domain", "url")
             .select(F.col("w.start").alias("window_start"), "domain",
                     F.col("url").alias("tok")))
    want = hll_registers(batch, ["window_start", "domain"], "tok")
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in want.collect()}
    assert a == b and a

    n_groups = batch.select("window_start", "domain").distinct().count()
    assert 0 < state_rows <= n_groups * HLL_M

    # the emitted registers estimate within HLL tolerance of exact
    est = {(r["window_start"], r["domain"]): r["hll_est"]
           for r in hll_estimate(got, ["window_start", "domain"]).collect()}
    exact = {(r["window_start"], r["domain"]): r["n"]
             for r in batch.groupBy("window_start", "domain")
                 .agg(F.countDistinct("tok").alias("n")).collect()}
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.30


def test_hll_shuffle_is_register_bounded(spark):
    """The scale claim, asserted on the plan: the aggregate on
    (group, register) must be a partial (map-side) hash aggregate BEFORE
    the exchange, so at most m rows per group leave any partition."""
    df = spark.createDataFrame([(f"d{i % 4}", f"t{i}") for i in range(2000)],
                               "domain string, tok string")
    plan = hll_distinct(df, ["domain"], "tok")._jdf.queryExecution() \
        .executedPlan().toString()
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    # a partial HashAggregate appears below (after, in toString order) the
    # topmost exchange-feeding aggregate pair
    assert "HashAggregate" in plan[first_exchange:]


# ------------------------------------------------------ sampled quantiles

def _quant_df(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 4).cast("string").alias("g"),
        # deterministic skewed-ish values, pure function of id
        ((F.col("id") * 37 % 1000) / F.lit(10.0)).alias("value"))


def test_sampled_quantiles_partitioning_independent(spark):
    """The sample is md5 membership, not RNG: any repartitioning of the
    input yields the identical rows, counts and quantiles."""
    from logport_spark.operators.sketches import sampled_quantiles

    df = _quant_df(spark)
    a = sampled_quantiles(df, ["g"], "value", [0.5, 0.95],
                          rate=0.25, key_col="event_id")
    b = sampled_quantiles(df.repartition(13, "value"), ["g"], "value",
                          [0.5, 0.95], rate=0.25, key_col="event_id")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 4


def test_sampled_quantiles_python_reference(spark):
    """Sample membership and the interpolated quantile replayed in pure
    Python (the same linear interpolation percentile/quantile_cont use)."""
    import hashlib

    from logport_spark.operators.sketches import sampled_quantiles

    df = _quant_df(spark)
    got = {r["g"]: r.asDict() for r in
           sampled_quantiles(df, ["g"], "value", [0.5],
                             rate=0.25, key_col="event_id").collect()}

    def bucket(eid):
        h = hashlib.md5(f"q42{eid}".encode()).hexdigest()
        return int(h[:8], 16) % 10_000

    by_g = {}
    for eid in range(4000):
        if bucket(eid) < 2500:
            by_g.setdefault(str(eid % 4), []).append((eid * 37 % 1000) / 10.0)
    for g, vals in by_g.items():
        vals.sort()
        idx = 0.5 * (len(vals) - 1)
        lo, hi = vals[int(idx)], vals[min(int(idx) + 1, len(vals) - 1)]
        ref = lo + (idx - int(idx)) * (hi - lo)
        assert got[g]["n_sample"] == len(vals)
        assert got[g]["p50_s"] == round(ref, 4), g


def test_sampled_quantiles_merge_property(spark):
    """The sample of a union is the union of samples: sketching two halves
    separately and re-aggregating equals sketching the whole — the property
    that lets per-day samples concatenate without rescanning history."""
    from logport_spark.operators.sampling import hash_sample
    from logport_spark.operators.sketches import sampled_quantiles

    df = _quant_df(spark)
    whole = sampled_quantiles(df, ["g"], "value", [0.95],
                              rate=0.25, key_col="event_id")
    h1 = hash_sample(df.filter(F.col("event_id") < 2000), 0.25,
                     "event_id", salt="q42")
    h2 = hash_sample(df.filter(F.col("event_id") >= 2000), 0.25,
                     "event_id", salt="q42")
    merged = (h1.unionByName(h2).groupBy("g").agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95_s")))
    assert sorted(map(tuple, whole.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_sampled_quantiles_rank_error_bounded(spark):
    """Accuracy the estimator exists for: at rate=0.25 over 1000 values
    per group, the p50 estimate's TRUE rank stays within a few points of
    0.5 (DKW: eps ~ sqrt(ln(2/d)/2n) ~ 0.06 at n=250, d=0.05)."""
    from logport_spark.operators.sketches import sampled_quantiles

    df = _quant_df(spark)
    est = {r["g"]: r["p50_s"] for r in
           sampled_quantiles(df, ["g"], "value", [0.5],
                             rate=0.25, key_col="event_id").collect()}
    ranks = (df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n")).collect())
    n_by_g = {r["g"]: r["n"] for r in ranks}
    for g, q in est.items():
        below = df.filter((F.col("g") == g) & (F.col("value") <= q)).count()
        true_rank = below / n_by_g[g]
        assert abs(true_rank - 0.5) < 0.08, (g, true_rank)
