"""Deterministic sampling for training-data mixes.

`df.sample()` is seed-dependent on partitioning (each partition draws its
own stream), so the same corpus sampled on different cluster layouts yields
different rows — useless for reproducible training mixes or A/B data
ablations. Hash sampling fixes that: a row is kept iff
md5(salt || key) mod 10000 < rate*10000 — a pure function of the ROW, so
any partitioning, any cluster size, any engine selects the identical set
(the SQL oracle reproduces it bit-for-bit; md5 rather than xxhash64
because DuckDB has no xxhash). This is also how train/val/test splits stay
disjoint and stable: disjoint bucket ranges of the same hash.

Spark-first shape: one codegen'd expression per row — no shuffle, no
Python, sampling composes with any downstream plan as a cheap Filter that
Catalyst pushes around freely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 10_000


def sample_bucket(key_col: str = "doc_id", salt: str = "s42") -> Column:
    """Deterministic bucket in [0, 10000) from md5(salt || key)."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
        F.lit(SAMPLE_BUCKETS),
    )


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "s42") -> DataFrame:
    """Keep ~rate of rows, deterministically (partition-independent)."""
    return df.filter(sample_bucket(key_col, salt) < int(rate * SAMPLE_BUCKETS))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.0,
                      strata_col: str = "lang",
                      key_col: str = "doc_id",
                      salt: str = "s42") -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix primitive
    (e.g. keep 50% en, 25% de, 10% of everything else). The rate table is
    a literal CASE expression (O(strata) branches, still pure codegen —
    no join, no shuffle); swap for a broadcast join if strata are dynamic."""
    thr = F.lit(int(default_rate * SAMPLE_BUCKETS))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == s,
                     F.lit(int(r * SAMPLE_BUCKETS))).otherwise(thr)
    return df.filter(sample_bucket(key_col, salt) < thr)


def train_val_test(df: DataFrame, val_frac: float = 0.01,
                   test_frac: float = 0.01, key_col: str = "doc_id",
                   salt: str = "split42") -> DataFrame:
    """Disjoint, stable 3-way split: adds a `split` column from disjoint
    bucket ranges of ONE hash — membership never changes as the corpus
    grows (a doc's bucket is a pure function of its key), the property
    random splits lack."""
    b = sample_bucket(key_col, salt)
    n_val = int(val_frac * SAMPLE_BUCKETS)
    n_test = int(test_frac * SAMPLE_BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < n_val, F.lit("val"))
         .when(b < n_val + n_test, F.lit("test"))
         .otherwise(F.lit("train")),
    )


def sample_fixed_per_stratum(df: DataFrame, k: int,
                             strata_col: str = "lang",
                             key_col: str = "doc_id",
                             salt: str = "evalk42") -> DataFrame:
    """EXACTLY min(k, stratum size) rows per stratum, deterministically —
    the eval-set / human-audit carving primitive (rate sampling can't hit a
    fixed count: 500 docs/language for an eval suite, 100 pages/domain for
    an annotation batch). Rows are ranked inside each stratum by
    (md5(salt||key), key) — a total order that is a pure row function, so
    any partitioning, engine, or corpus SUPERSET picks the same rows for a
    stratum whose membership didn't change.

    Plan shape — the let-Catalyst-work case: this is written as the naive
    single `Window.partitionBy(stratum)` + `row_number() <= k` filter, and
    Spark 4's rank-limit pushdown turns it into `WindowGroupLimit Partial`
    BELOW the exchange — every map task forwards at most k rows per
    stratum, so the one (stratum-keyed) shuffle carries ≤ k·n_partitions
    rows per stratum and the final per-stratum sort input is bounded
    regardless of corpus size. A hand-salted two-phase top-k (the bm25_topk
    shape, which predates rank-pushdown on that DAG) plans with TWO
    exchanges here and wins nothing — measured both, kept the optimizer's
    plan (plan-guarded in tests/test_scale_properties.py).

    Output: key + stratum + rk (1..k in hash order — a stable prefix:
    rk ≤ m for m < k is itself the deterministic m-sample)."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(
        F.col("_h").asc(), F.col(key_col).asc())
    return (
        df.select(F.col(key_col), F.col(strata_col), h.alias("_h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(key_col, strata_col, "rk")
    )


def domain_mix(df: DataFrame, domain_col: str = "domain",
               key_col: str = "doc_id", salt: str = "mix42") -> DataFrame:
    """Temperature-rebalanced domain mix (alpha = 0.5) — the training-mix
    step that flattens a web corpus' domain skew without upsampling: a
    domain with count c keeps rate sqrt(min_c / c), so kept counts go as
    sqrt(c) (the multilingual "temperature sampling" rule with T = 2) and
    the rarest domain keeps everything. Membership stays the pure-row
    md5-bucket function of this module, so the kept set is identical on
    any partitioning, cluster size, or engine.

    alpha is pinned at 0.5 on purpose: the rate then needs only IEEE
    correctly-rounded operations (long->double cast, divide, sqrt,
    multiply, floor), so an external SQL engine recomputing the threshold
    gets the bit-identical integer — a pow()-based general temperature
    is libm-dependent in its last ulp and can flip a floor() at a bucket
    boundary.

    Plan shape: one partial-aggregating shuffle on the domain key to get
    counts, a 1-row min() broadcast onto the (tiny) domain table, and a
    broadcast join of the per-domain thresholds back onto the corpus —
    the doc stream itself never shuffles, the filter is a broadcast-fed
    Filter any 100 TB scan absorbs.

    Output: kept rows + (mix_bucket, mix_thr) for auditability."""
    cnts = df.groupBy(F.col(domain_col).alias("_d")).agg(
        F.count(F.lit(1)).alias("_c"))
    mn = cnts.agg(F.min("_c").alias("_mn"))
    thr = cnts.crossJoin(F.broadcast(mn)).select(
        "_d",
        F.floor(F.sqrt(F.col("_mn").cast("double") / F.col("_c"))
                * F.lit(SAMPLE_BUCKETS)).cast("int").alias("mix_thr"))
    b = sample_bucket(key_col, salt).cast("int")
    return (
        df.join(F.broadcast(thr), df[domain_col] == thr["_d"])
        .drop("_d")
        .withColumn("mix_bucket", b)
        .filter(F.col("mix_bucket") < F.col("mix_thr"))
    )


def corpus_shuffle(df: DataFrame, n_shards: int = 64,
                   key_col: str = "doc_id",
                   salt: str = "shuf42") -> DataFrame:
    """Deterministic global corpus shuffle + sharding — the training-export
    step that fixes the batch order a pretraining run sees. A plain
    `orderBy(rand())` is neither reproducible nor scalable (one global
    sort, seed tied to partitioning); here every doc gets a pure-row-function
    position: shard = md5-bucket of the key, in-shard position = rank of
    the full md5 hash — so any engine, any partitioning, any corpus subset
    produces the identical (shard, pos) assignment, and re-running with a
    new salt is a fresh epoch-level reshuffle.

    Plan shape: the hash and shard are codegen'd row functions; the only
    wide operation is the per-shard row_number — n_shards independent
    bounded sorts (exactly pack_sequences' shape), never a global order.
    At 10^12 docs set n_shards ~ 100k so a shard sort stays ~10M rows;
    writers then emit one file per (shard) partition in pos order.

    Output: key + (shard, pos)."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
        F.lit(n_shards)).cast("int")
    w = Window.partitionBy("shard").orderBy("sort_key", key_col)
    return (
        df.select(F.col(key_col), shard.alias("shard"), h.alias("sort_key"))
        .withColumn("pos", F.row_number().over(w))
        .select(key_col, "shard", "pos")
    )


def export_manifest(docs: DataFrame, n_shards: int = 64,
                    text_col: str = "text", key_col: str = "doc_id",
                    salt: str = "shuf42") -> DataFrame:
    """Per-shard export manifest — the artifact a training run checks
    BEFORE reading 100 TB: for every output shard, how many docs, how many
    tokens, how many chars, and an order-independent content checksum. The
    shard assignment is :func:`corpus_shuffle`'s md5-bucket (same default
    salt), so this manifest describes exactly the shards that export
    writes, without re-running the per-shard rank.

    Checksum design: per-doc digest = first 15 hex digits of
    md5(key || '|' || text) as a 60-bit int, shard checksum = SUM of doc
    digests as decimal(38,0). Summation commutes, so the checksum is
    independent of row order, partitioning, and engine — DuckDB reproduces
    it bit-for-bit (no xxhash there), and a reader re-verifying one
    downloaded shard recomputes it with one pass. (The ledger's xxhash64
    fingerprint lesson: additive 32-bit sums collide; 60-bit summands into
    a 38-digit accumulator do not overflow below 10^22 docs.)

    Plan shape: digest/shard/token-count are codegen row functions; the
    whole operator is ONE partial+final aggregation on shard — map-side
    combine reduces every partition to ≤ n_shards rows before the only
    (tiny) shuffle. Output: (shard, n_docs, n_tokens, n_chars, checksum),
    one row per non-empty shard."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
        F.lit(n_shards)).cast("int")
    digest = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|"),
                           F.col(text_col))), 1, 15),
        16, 10).cast("decimal(38,0)")
    n_toks = F.size(F.filter(F.split(F.col(text_col), " "),
                             lambda t: F.length(t) > 0)).cast("long")
    return (
        docs.select(shard.alias("shard"), digest.alias("_d"),
                    n_toks.alias("_t"),
                    F.length(text_col).cast("long").alias("_c"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("_t").alias("n_tokens"),
             F.sum("_c").alias("n_chars"),
             # digit string: a 38-digit decimal survives every downstream
             # representation (Arrow/pandas/JSON) without precision loss
             F.sum("_d").cast("string").alias("checksum"))
    )


def pack_sequences(docs: DataFrame, window_tokens: int = 2048,
                   n_shards: int = 1024, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic sequence packing — the pretraining-loader step that
    concatenates documents into fixed-token-budget packs (GPT-style "pack
    to 2048 and split on document boundaries"). Assigns every doc a
    (shard, pack_id) such that consecutive docs of a pack fit the token
    window (a doc longer than the window gets a pack of its own).

    Determinism + distribution come from sharding: docs land in
    `n_shards` hash shards (pure row function — stable under any
    partitioning, like everything in this module), and the greedy
    running-total packing runs INSIDE each shard as a cumulative-sum
    window partitioned BY shard — n_shards independent bounded sorts, no
    global order, no driver state. pack_id = floor(cum_tokens_before /
    window) is the textbook first-fit-in-order rule: a pack may overflow
    its budget by at most one doc's remainder, never silently drop or
    split a doc (loaders split on the boundary downstream).

    Output: (doc_id, shard, pack_id, n_tokens, cum_tokens). The oracle
    reproduces it with the same integer window arithmetic."""
    from pyspark.sql import Window

    shard = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("pack"),
                                          F.col(id_col).cast("string"))),
                           1, 8), 16, 10).cast("long"),
        F.lit(n_shards)).cast("int")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        shard.alias("shard"),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda t: F.length(t) > 0)).cast("long")
        .alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens"))
                    / F.lit(window_tokens)).cast("long"))
        .select("doc_id", "shard", "pack_id", "n_tokens", "cum_tokens")
    )


def domain_reweight(excess: DataFrame, eta: float = 1.0, eps: float = 0.2,
                    group_col: str = "domain",
                    excess_col: str = "kl_bits",
                    count_col: str = "n_tokens") -> DataFrame:
    """DoReMi-style domain mixture weights (Xie et al. 2023) from a
    per-domain excess-loss table: w ∝ exp(η·excess), ε-blended with
    uniform — hard/distinctive domains get upweighted instead of merely
    flattened (domain_mix's temperature rule ignores CONTENT; this rule
    reads it).

    Engine-shaped stand-in for the proxy-model loop, stated honestly:
    DoReMi's excess loss is proxy-model minus reference-model loss under
    Group DRO; the engine's exact analogue is KL(P_domain ‖ P_corpus)
    (textstats.domain_kl) — the domain's unigram cross-entropy under the
    corpus LM minus under its own, i.e. how much harder the corpus
    reference finds this domain. With a fixed excess table the
    exponentiated-gradient iteration collapses to its fixpoint, ONE
    softmax — so that is what this computes; swap the excess column for
    real proxy-loss deltas and the arithmetic is unchanged.

    Cross-engine float contract: excess comes in 4dp-rounded (domain_kl's
    output contract), η·excess and exp are single IEEE ops, the softmax
    denominator sums |domains| values, and weights round to 6dp —
    the caption_filter risk class. epoch_tokens = floor(weight·Σtokens)
    makes the mixture actionable as an integer token budget per domain.

    Output: (domain, n_tokens, excess_bits, weight, epoch_tokens)."""
    # the excess table is |domains|-sized but its LINEAGE is corpus-linear
    # (the domain_kl DAG) — cut it before count(), or the eps/k literal
    # re-runs the whole upstream once more than the result does
    excess = excess.localCheckpoint(eager=True)
    k = excess.count()
    if k == 0:
        return excess.sparkSession.createDataFrame(
            [], "domain string, n_tokens long, excess_bits double, "
                "weight double, epoch_tokens long")
    e = excess.select(
        F.col(group_col).alias("domain"),
        F.col(count_col).cast("long").alias("n_tokens"),
        F.col(excess_col).cast("double").alias("excess_bits"),
        F.exp(F.lit(float(eta)) * F.col(excess_col)).alias("_w"))
    tot = e.agg(F.sum("_w").alias("_s"),
                F.sum("n_tokens").alias("_n"))
    return (e.crossJoin(F.broadcast(tot))
            .select(
                "domain", "n_tokens", "excess_bits",
                F.round(F.lit(1.0 - eps) * F.col("_w") / F.col("_s")
                        + F.lit(eps / k), 6).alias("weight"),
                F.col("_n"))
            .withColumn("epoch_tokens",
                        F.floor(F.col("weight") * F.col("_n")).cast("long"))
            .drop("_n"))


def pack_sequences_nosplit(docs: DataFrame, window_tokens: int = 2048,
                           n_shards: int = 64, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """No-split sequence packing — the SFT/eval-style loader contract
    where a document must NEVER cross an example boundary: every pack's
    token total is ≤ window_tokens and the unused remainder is PADDING,
    so the packer's job is minimizing wasted tokens (pack_sequences, the
    GPT-style variant, splits on boundaries and wastes nothing — these
    are different contracts, not competing implementations).

    First-fit-decreasing inside hash shards: docs land in `n_shards`
    stable md5 shards (same membership contract as everything in this
    module), each shard solves FFD independently in one applyInPandas
    group — sort by (n_tokens desc, doc_id), place each doc in the first
    pack with room, open a new pack otherwise. FFD is the classic 11/9
    OPT + 6/9 bin-packing approximation; sequential first-fit-in-order
    (the naive loader) leaves every pack's tail empty whenever the next
    doc doesn't fit, and the measured padding gap on the bench corpus is
    the operator's reason to exist (BENCH/BASELINE.md). Docs longer than
    the window get singleton packs flagged `oversize` (loaders truncate
    or chunk them downstream — this operator never silently drops).

    Shard-local Python is the right tool here: FFD is inherently
    sequential-greedy (each placement depends on all prior fills), so it
    cannot be a window cumsum; bounding it to a hash shard keeps each
    group ~corpus/n_shards docs — Arrow-batched, no driver state, and at
    10^12 docs n_shards scales up so the per-group solve stays bounded.

    Output: (doc_id, shard, pack_id, n_tokens, pack_tokens, oversize) —
    pack_tokens is the final fill of the doc's pack (shared by its
    members), so padding = window_tokens - pack_tokens per distinct pack.
    Deterministic under any input partitioning (pytest pins equality
    across repartitions and against a pure-Python FFD reference)."""
    import pandas as pd

    shard = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("pack"),
                                          F.col(id_col).cast("string"))),
                           1, 8), 16, 10).cast("long"),
        F.lit(n_shards)).cast("int")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        shard.alias("shard"),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda t: F.length(t) > 0)).cast("long")
        .alias("n_tokens"),
    )
    w = int(window_tokens)

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True])
        fills: list[int] = []           # running fill per open pack
        assign: list[int] = []
        for t in pdf["n_tokens"].to_numpy():
            t = int(t)
            for i, f in enumerate(fills):
                if t <= w - f:
                    fills[i] = f + t
                    assign.append(i)
                    break
            else:
                fills.append(t)
                assign.append(len(fills) - 1)
        pdf = pdf.assign(pack_id=assign)
        pdf["pack_tokens"] = pdf["pack_id"].map(
            {i: f for i, f in enumerate(fills)})
        pdf["oversize"] = pdf["n_tokens"] > w
        return pdf

    return toks.groupBy("shard").applyInPandas(
        ffd, "doc_id long, shard int, n_tokens long, pack_id long, "
             "pack_tokens long, oversize boolean")


def chunk_documents(docs: DataFrame, window: int = 128, stride: int = 96,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Window-stride document chunking — the training/embedding prep step
    that splits long documents into fixed-size token windows with overlap
    (the HF ``return_overflowing_tokens`` contract): chunk i covers tokens
    [i*stride, i*stride + window), starts run while start < n_tokens, so
    every token lands in >= 1 chunk whenever stride <= window and the tail
    chunk may be short. Empty documents yield no chunks.

    Output: (doc_id, chunk_id, chunk_start, n_toks, chunk_text) — chunk_id
    is the 0-based window index, chunk_start the 0-based token offset.

    Plan shape: the token array materializes ONCE as a column (the
    HOF-lambda re-evaluation rule, BENCH/BASELINE.md — slice() inside the
    transform lambda references only that attribute, so nothing is
    recomputed per window), starts come from one sequence() expression, and
    posexplode is the only row-count change — no shuffle, no Python, output
    rows ~ n_tokens/stride per doc. Downstream writers inherit the scan
    partitioning; a 10^12-doc corpus chunks in a single map stage."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), " "),
                 lambda t: F.length(t) > 0).alias("toks"),
    )
    starts = F.when(
        F.size("toks") > 0,
        F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride)),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    chunks = toks.select(
        "doc_id", "toks",
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_start") + 1, window)
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(piece).cast("long").alias("n_toks"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def select_token_budget(scored: DataFrame, budget: int,
                        score_col: str = "score",
                        tokens_col: str = "n_tokens",
                        id_col: str = "doc_id") -> DataFrame:
    """Token-budget corpus selection — the assembly step after scoring
    (DSIR weights, LM quality, classifier margin): keep the best-scored
    documents whose cumulative token count fits a global budget.
    Semantically: sort all docs by (score desc, id asc), take the longest
    prefix whose running token total stays <= budget — but WITHOUT the
    global sort, which at 10^12 docs is a single-task cliff.

    Returns every input doc with its verdict: (id, score, n_tokens,
    selected) — the kept corpus and the cut audit in one result.

    Plan shape: ONE corpus shuffle (the groupBy(score) token-mass
    histogram; scores are rounded, so the table is distinct-score-sized,
    orders of magnitude below the corpus). The cumulative pass runs over
    that bounded table; its output broadcasts back, and every doc's
    verdict is then a pure broadcast-join predicate — except docs AT the
    single boundary score, which rank by id inside one bounded window
    partition. Degenerate corpora where most docs tie at the boundary
    score degrade that partition; rounded scores + a real scoring signal
    keep ties rare (docstring contract, as for cluster_retention)."""
    from pyspark.sql import Window

    d = scored.select(
        F.col(id_col),
        F.col(score_col).alias("score"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    by_score = d.groupBy("score").agg(F.sum("n_tokens").alias("st"))
    # bounded distinct-score table: the unpartitioned window is over the
    # histogram, never the corpus
    cw = (Window.orderBy(F.col("score").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    cum = by_score.select(
        "score", "st",
        F.coalesce(F.sum("st").over(cw), F.lit(0)).alias("cumb"))
    j = d.join(F.broadcast(cum), "score")
    full = F.col("cumb") + F.col("st") <= F.lit(budget)
    boundary = (F.col("cumb") < F.lit(budget)) & ~full

    plain = j.filter(~boundary).select(
        id_col, "score", "n_tokens", full.alias("selected"))
    bw = (Window.partitionBy("score").orderBy(F.col(id_col).asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    edge = (
        j.filter(boundary)
        .withColumn("cum_in", F.sum("n_tokens").over(bw))
        .select(id_col, "score", "n_tokens",
                (F.col("cumb") + F.col("cum_in") <= F.lit(budget))
                .alias("selected"))
    )
    return plain.unionByName(edge)


def epoch_upsample(df: DataFrame, weights: dict[str, float],
                   default_weight: float = 1.0,
                   strata_col: str = "lang", key_col: str = "doc_id",
                   salt: str = "epoch42") -> DataFrame:
    """Materialize a FRACTIONAL-epoch training mixture deterministically —
    the standard LLM data recipe step ("2.5 epochs of wiki, 0.8 of web";
    GPT-3 Table 2.2 and The Pile both weight sources this way): a doc in
    a stratum with weight w appears floor(w) times, plus once more for a
    deterministic hash-chosen frac(w) slice of the stratum. Expected copy
    count per stratum is exactly w, each epoch column value marks which
    repeat a row is, and the SAME docs get the extra epoch on every
    engine, partitioning, and rerun (the md5-bucket argument that runs
    through this module — `df.sample()` can promise none of that).

    Per-stratum (base, extra-threshold) pairs are precomputed as INTEGER
    literals (threshold in 1/10000ths, the stratified_sample convention)
    so membership is pure integer comparison — no float-rounding drift
    between engines. Output: input columns + epoch (1..n_copies); weight-0
    strata and unlisted strata under a 0 default vanish.

    Scale shape: pure codegen CASE + one sequence()/explode — a narrow
    map, zero shuffle, zero Python; output volume is the Σw·n_docs the
    recipe asked for. Upsampling by explode (not a loop of unions) keeps
    ONE scan of the input regardless of max epochs."""
    base = F.lit(int(default_weight))
    thr = F.lit(int(round((default_weight - int(default_weight))
                          * SAMPLE_BUCKETS)))
    for s, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"epoch_upsample: negative weight for {s!r}")
        base = F.when(F.col(strata_col) == s, F.lit(int(w))).otherwise(base)
        thr = F.when(F.col(strata_col) == s,
                     F.lit(int(round((w - int(w)) * SAMPLE_BUCKETS)))
                     ).otherwise(thr)
    n = base + (sample_bucket(key_col, salt) < thr).cast("int")
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") >= 1)
        .withColumn("epoch", F.explode(F.expr("sequence(1, _n)")))
        .drop("_n")
    )


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    key_col: str = "doc_id",
                    salt: str = "ws42") -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis & Spirakis 2006
    (algorithm A-ES): draw u ~ Uniform(0,1) per row, keep the k largest
    u^(1/w). The classic use in corpus curation is quality- or
    token-proportional subsampling ("sample 10M docs with probability ∝
    quality score") where with-replacement sampling or per-row Bernoulli
    (which can't hit an exact k) don't fit.

    Deterministic and partition-independent: u derives from
    md5(salt‖key) (the sampling.py argument — df.sample() depends on
    partition layout; this is a pure row function, so reruns, re-layouts,
    and other engines reproduce the exact sample). The selection key is
    computed in log space — ``es_key = ln(u)/w`` — because u^(1/w)
    underflows for small weights; log is monotone, so top-k by es_key is
    top-k by u^(1/w). Rows with weight <= 0 can never be sampled and are
    dropped. es_key is rounded to 8 decimals (the PageRank convention) and
    ties break on the key column, so the output is a total function of
    (input multiset, salt, k).

    Scale shape: ONE narrow map (md5 + ln, pure codegen) and a top-k that
    plans as TakeOrderedAndProject — every partition keeps its local k,
    the driver merges |partitions|·k rows; no global sort, no shuffle of
    the data. At 10^12 rows this is the only distributed-sampling shape
    that doesn't move the corpus.
    """
    v = F.conv(F.substring(F.md5(F.concat(
        F.lit(salt), F.col(key_col).cast("string"))), 1, 8), 16, 10)
    u = (v.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    w = F.col(weight_col).cast("double")
    return (df.where(w > 0)
            .withColumn("es_key", F.round(F.log(u) / w, 8))
            .orderBy(F.desc("es_key"), F.col(key_col))
            .limit(k))
