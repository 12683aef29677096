"""Corpus retrieval — BM25 scoring over the documents table.

A curation pipeline needs targeted lookup into its own corpus ("which
training docs look like this eval prompt / this seed set?") for audits,
decontamination triage, and DSIR-style seed expansion. BM25 (Robertson &
Zaragoza 2009, "The Probabilistic Relevance Framework") is the standard
lexical scorer; this is the batch, Spark-first formulation — no inverted
index service, just a pruned posting aggregation.

Extends the reference's scope (logport ships log lines, it never searches
them — SURVEY.md §2.6 gap analysis), same as the rest of the curation
layer.

Scale shape at 100 TB:

- The ONLY corpus-sized shuffle is the (doc_id, tok) partial count, and it
  runs AFTER a broadcast semi-join that prunes the exploded token stream to
  query terms — for a q-term query set, shuffle input is the posting lists
  of those q terms, not the corpus token stream.
- Document frequency, idf, and the per-(query, term) weight table are all
  tiny (bounded by |query vocabulary|) and broadcast; corpus statistics
  (N, avgdl) ride the same broadcast as one row.
- Doc length is carried THROUGH the posting aggregation (grouped on
  (doc_id, tok, dl)) so no corpus-sized doc-length join ever happens.
- Final per-query top-k is TWO-PHASE: partial top-k inside deterministic
  doc_id-hash salt buckets, then a final rank over the <= n_salts*k
  survivors — no single task ever sorts a query's full candidate set, even
  when every corpus doc is a candidate (the 5M ladder measured exactly
  that cliff on the tiny-vocab bench corpus and the fix bought +62%).

Ranking determinism: ranks are computed on the ROUNDED score (4 decimals,
the repo's float-oracle convention) with doc_id as tie-break, so any
engine whose per-term IEEE arithmetic agrees to 4 decimals produces the
identical top-k — float summation order can never flip a rank across
engines without also flipping the rounded score.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(docs: DataFrame, queries: list[tuple[int, str]], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              corpus_stats: tuple[int, float] | None = None,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k docs per query under BM25 with the Lucene idf variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive).

    ``queries`` is a small in-memory list of (query_id, query_text) — the
    probe set is driver-side by design (audits use a handful of probes);
    duplicate terms within one query are counted once (short-query BM25
    drops query tf). Tokenization matches the corpus LM operators:
    whitespace split, empty tokens dropped, no case folding (callers
    normalize upstream, e.g. via curation.normalize_text).

    Returns (query_id, rnk, doc_id, score) with rnk 1..k ordered by
    (rounded score desc, doc_id asc).

    ``corpus_stats=(n_docs, avgdl)``, when given, skips the stats
    aggregation — by default computing N and avgdl costs one extra
    aggregate-only pass over the corpus (cheap but a second scan); a
    deployment that serves many probe sets precomputes the pair once and
    every subsequent call scans the corpus exactly once.
    """
    spark = docs.sparkSession
    qterms = [(int(qid), tok)
              for qid, qtext in queries
              for tok in dict.fromkeys(t for t in qtext.split(" ") if t)]
    qdf = spark.createDataFrame(qterms, "query_id long, tok string")

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), " "),
                 lambda t: F.length(t) > 0).alias("toks"),
    ).select("doc_id", "toks", F.size("toks").cast("long").alias("dl"))

    if corpus_stats is not None:
        stats = spark.createDataFrame(
            [(int(corpus_stats[0]), float(corpus_stats[1]))],
            "n_docs long, avgdl double")
    else:
        stats = toks.agg(F.count(F.lit(1)).alias("n_docs"),
                         F.avg("dl").alias("avgdl"))

    # prune to query terms BEFORE the corpus-sized aggregation: the
    # broadcast semi-join keeps only query-term occurrences, so the
    # (doc_id, tok) shuffle carries posting lists, not the corpus
    post = (
        toks.select("doc_id", "dl", F.explode("toks").alias("tok"))
        .join(F.broadcast(qdf.select("tok").distinct()), "tok")
        .groupBy("doc_id", "tok", "dl")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    idf = (
        post.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "tok", "avgdl",
            F.log((F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0).alias("idf"),
        )
    )
    # (query_id, tok, idf, avgdl) — query-vocab-sized; broadcast keeps every
    # join in the operator a broadcast join (no sort-merge anywhere)
    qweights = qdf.join(F.broadcast(idf), "tok")

    contrib = post.join(F.broadcast(qweights), "tok").select(
        "query_id", "doc_id",
        (F.col("idf") * F.col("tf") * (k1 + 1.0)
         / (F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
        .alias("w"),
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("w"), 4).alias("score"))

    # two-phase top-k: a single window per query_id would sort EVERY
    # candidate of a query in one partition — on a query whose terms are
    # corpus-common that is a corpus-sized single-task sort (measured: a
    # 3.2x per-doc slowdown at the 5M ladder point). Phase 1 takes the
    # top-k inside deterministic doc_id-hash salt buckets (the global
    # top-k rows each live in some bucket and survive its local top-k, so
    # the union is a superset); phase 2 ranks the <= n_salts*k survivors.
    # Both phases order by (rounded score, doc_id) — a total order, so the
    # result is identical to the single-window form and engine-independent.
    order = (F.col("score").desc(), F.col("doc_id").asc())
    n_salts = 64
    w1 = Window.partitionBy("query_id", "salt").orderBy(*order)
    cand = (
        scored.withColumn(
            "salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)))
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "doc_id", "score")
    )


def inverted_index(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 1,
                   max_df: int | None = None) -> DataFrame:
    """Build the inverted-index SUMMARY for a corpus — the artifact a
    search/dedup service ingests and a pipeline verifies before shipping:
    one row per term with (tok, df, cf, checksum), where df counts docs,
    cf counts occurrences, and checksum commits to the full posting list
    (doc_id, term frequency, first position) without materializing it as
    an unbounded array column.

    Checksum design (the export_manifest convention): per-posting summand
    = first 15 hex digits of md5(tok|doc_id|tf|first_pos) as a 60-bit
    int, summed in DECIMAL(38,0) — commutative, so the value is
    independent of row order, partitioning, and engine, and a consumer
    re-verifying one term recomputes it with one scan of that term's
    postings. Emitted as a string (the decimal exceeds int64).

    ``min_df``/``max_df`` are the standard index-pruning dials: max_df
    drops stopword-class terms whose posting lists no consumer scans
    (Lucene's stopword story), min_df drops hapax noise.

    Scale shape: posexplode → ONE partial-aggregated shuffle on
    (doc_id, tok) (tf + first position combine map-side) → ONE
    partial-aggregated shuffle on tok. The Zipf head is safe in both:
    phase 1 keys include doc_id, and phase 2's map-side combine hands
    each reducer pre-counted partials, never raw occurrences.
    """
    toks = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.posexplode(F.split(F.col(text_col), " "))
                    .alias("pos", "tok"))
        .filter(F.length("tok") > 0)
    )
    postings = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"),
             F.min("pos").alias("first_pos"))
    )
    digest = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("tok"),
                              F.col("doc_id").cast("string"),
                              F.col("tf").cast("string"),
                              F.col("first_pos").cast("string"))),
            1, 15),
        16, 10).cast("decimal(38,0)")
    idx = (
        postings.select("tok", "tf", digest.alias("_d"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"),
             F.sum("tf").alias("cf"),
             F.sum("_d").cast("decimal(38,0)").cast("string")
             .alias("checksum"))
    )
    cond = F.col("df") >= min_df
    if max_df is not None:
        cond = cond & (F.col("df") <= max_df)
    return idx.filter(cond)


def mlt_query_terms(docs: DataFrame, probes: list[tuple[int, str]],
                    max_terms: int = 25, text_col: str = "text",
                    id_col: str = "doc_id") -> list[tuple[int, str]]:
    """Lucene MoreLikeThis-style query-term selection: a more-like-this
    lexical query is the probe's top `max_terms` terms by tf*idf, not its
    full text — stopwords carry no signal but fan the posting shuffle out
    to the corpus's hottest keys, and at 10^12 docs an unpruned ~200-term
    doc-query is 8x the network of a 25-term one. df comes from ONE
    corpus pass pruned to the probes' vocabulary (the bm25 broadcast
    semi-join shape); selection happens driver-side on the
    probe-vocab-bounded (term, tf, df) table with the repo's rounded-
    score + term tie-break so the choice is engine-reproducible (the
    oracle replays it in SQL)."""
    spark = docs.sparkSession
    qtf: dict[tuple[int, str], int] = {}
    for qid, qtext in probes:
        for tok in qtext.split(" "):
            if tok:
                qtf[(qid, tok)] = qtf.get((qid, tok), 0) + 1
    vocab = sorted({t for _, t in qtf})
    vdf = spark.createDataFrame([(t,) for t in vocab], "tok string")
    n_docs = docs.count()
    dfreq = {r["tok"]: r["df"] for r in (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"),
                    F.col(id_col).alias("doc_id"))
        .filter(F.length("tok") > 0)
        .join(F.broadcast(vdf), "tok")
        .groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
        .collect())}
    out = []
    for qid, _ in probes:
        scored = []
        for (q, tok), tf in qtf.items():
            if q != qid:
                continue
            df = dfreq.get(tok, 0)
            idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            scored.append((round(tf * idf, 4), tok))
        top = sorted(scored, key=lambda s: (-s[0], s[1]))[:max_terms]
        out.append((qid, " ".join(t for _, t in top)))
    return out


def hybrid_rrf_topk(docs: DataFrame, emb: DataFrame, probe_ids: list[int],
                    k: int = 10, k_leg: int = 20, kc: int = 60,
                    max_query_terms: int = 25,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hybrid more-like-this retrieval: reciprocal-rank fusion (Cormack,
    Clarke & Buettcher 2009) of a lexical BM25 leg and a dense cosine leg
    over the SAME probe documents — the fusion every decontamination /
    seed-expansion audit runs, because lexical misses paraphrases and
    dense misses rare-token exact matches.

    Per probe doc: the lexical leg queries the corpus with the probe's
    own text (bm25_topk, self dropped, re-ranked on the rounded score);
    the dense leg is cosine_topk over the probe's embedding (self
    excluded by construction). Fusion: rrf = 1/(kc+r_lex) + 1/(kc+r_dense),
    a missing leg contributing 0 (leg ranks emitted with 0 as the
    "not in this leg's top-k_leg" sentinel — no nullable ints across the
    engine boundary). Both leg ranks and the fused rank are total orders
    (score desc, doc_id asc), so the result is engine-exact.

    Scale shape: both legs are already corpus-scale operators (BM25's
    pruned posting aggregation; brute cosine here, swap ann_ivfpq_topk
    at 10^9 vectors — same (query_id, neighbor, rank) contract); the
    fusion itself joins two k_leg-bounded tables — driver-free,
    broadcast-sized."""
    from pyspark.sql import Window

    from logport_spark.operators.similarity import cosine_topk

    probes = (docs.filter(F.col(id_col).isin([int(i) for i in probe_ids]))
              .select(id_col, text_col).collect())  # bounded probe set
    raw = sorted((int(r[id_col]), r[text_col]) for r in probes)
    # MoreLikeThis pruning: query with the probe's top tf*idf terms, not
    # its full text (see mlt_query_terms — the posting shuffle then
    # carries max_query_terms*|probes| term postings, stopwords dropped)
    queries = mlt_query_terms(docs, raw, max_terms=max_query_terms,
                              text_col=text_col, id_col=id_col)

    lex = (bm25_topk(docs, queries, k=k_leg + 1,
                     text_col=text_col, id_col=id_col)
           .filter(F.col("doc_id") != F.col("query_id")))
    wl = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    lex = (lex.withColumn("r_lex", F.row_number().over(wl))
           .filter(F.col("r_lex") <= k_leg)
           .select("query_id", "doc_id", "r_lex"))

    dense = (cosine_topk(emb, [int(i) for i in probe_ids], k=k_leg)
             .select("query_id", F.col("neighbor_id").alias("doc_id"),
                     F.col("rank").alias("r_dense")))

    j = lex.join(dense, ["query_id", "doc_id"], "full_outer")
    rrf = F.round(
        F.coalesce(1.0 / (F.lit(kc) + F.col("r_lex")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(kc) + F.col("r_dense")), F.lit(0.0)), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        j.withColumn("rrf", rrf)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "doc_id", "rrf",
                F.coalesce("r_lex", F.lit(0)).cast("int").alias("r_lex"),
                F.coalesce("r_dense", F.lit(0)).cast("int").alias("r_dense"))
    )
