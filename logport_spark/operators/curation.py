"""Published web-corpus curation stages, re-expressed Spark-first.

- :func:`c4_filters` — the C4 cleaning pass (Raffel et al. 2020, "Exploring
  the Limits of Transfer Learning", §2.2): line-level surgery (terminal
  punctuation, minimum words per line, policy/keyword lines) plus
  document-level gates (badword list, "lorem ipsum", curly braces, minimum
  surviving lines). The whole pass is ONE narrow projection — line arrays
  are filtered with JVM higher-order functions and rejoined, so there is
  zero shuffle and zero Python at any corpus size.
- :func:`dsir_weights` — DSIR importance weights (Xie et al. 2023, "Data
  Selection for Language Models via Importance Resampling"): hashed
  unigram+bigram bag-of-ngrams features, log importance weight
  log w(x) = sum_f c_x[f] * (log p_target[f] - log p_raw[f]) with
  Laplace-smoothed bucket distributions. The per-corpus work is an
  explode + BROADCAST join against the B-bucket log-ratio table + one
  hash aggregation on doc_id — the only corpus-sized shuffle is the
  final per-doc sum.

Extends the reference's scope (logport ships log lines, it never curates
them — SURVEY.md §2.6 gap analysis); these are the stages a 100 TB
Common-Crawl training pipeline runs between parse and route. Both have
bit-exact DuckDB oracles (md5-bucket arithmetic, list lambdas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logport_spark.operators.textstats import shingles_expr


def c4_filters(
    pages: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    min_words_per_line: int = 5,
    min_lines: int = 3,
    badwords: tuple[str, ...] = (),
    drop_line_keywords: tuple[str, ...] = ("javascript",),
    require_terminal_punct: bool = True,
    drop_doc_markers: tuple[str, ...] = ("lorem ipsum",),
    drop_curly: bool = True,
) -> DataFrame:
    """C4 cleaning: keep lines passing every line gate, keep docs passing
    every doc gate with >= min_lines surviving lines; returns
    (id, n_lines, n_kept, text) with the text rebuilt from kept lines.

    Line gates (C4 §2.2): >= min_words_per_line whitespace words; no
    drop_line_keyword substring (case-insensitive; C4 drops any line with
    "javascript"); optionally must end in terminal punctuation . ! ? or ".
    Doc gates: no badword token (word match, lowercased), no doc marker
    substring ("lorem ipsum"), optionally no '{' anywhere (C4 drops
    code-bearing pages wholesale).

    Plan shape: _lines and _kept materialize as multi-referenced columns
    (CollapseProject keeps them; inlining the filter lambda twice would
    re-run it per reference — the shingles_expr lesson), every gate is a
    whole-stage-codegen predicate, and the operator has NO Exchange — it
    composes with any upstream scan partitioning untouched."""
    line_conds = [
        f"size(filter(split(l, ' '), w -> w != '')) >= {min_words_per_line}"
    ]
    for kw in drop_line_keywords:
        line_conds.append(f"instr(lower(l), '{kw.lower()}') = 0")
    if require_terminal_punct:
        line_conds.append("substring(l, -1, 1) IN ('.', '!', '?', '\"')")
    keep_line = " AND ".join(line_conds)

    out = (
        pages.withColumn("_lines", F.split(F.col(text_col), "\n"))
        .withColumn("_kept", F.expr(f"filter(_lines, l -> {keep_line})"))
    )

    low = F.lower(F.col(text_col))
    doc_ok = F.lit(True)
    for m in drop_doc_markers:
        doc_ok = doc_ok & (F.instr(low, m.lower()) == 0)
    if drop_curly:
        doc_ok = doc_ok & (F.instr(F.col(text_col), "{") == 0)
    if badwords:
        doc_ok = doc_ok & ~F.arrays_overlap(
            F.split(low, "\\s+"), F.lit([b.lower() for b in badwords])
        )

    return out.filter(doc_ok & (F.size("_kept") >= min_lines)).select(
        F.col(id_col),
        F.size("_lines").alias("n_lines"),
        F.size("_kept").alias("n_kept"),
        F.array_join("_kept", "\n").alias(text_col),
    )


def _hashed_grams(df: DataFrame, n_buckets: int, text_col: str,
                  id_col: str) -> DataFrame:
    """(doc_id, bucket) per unigram+bigram occurrence; bucket = first 8 hex
    digits of md5(gram) mod n_buckets — the oracle re-derives the identical
    integer with digit arithmetic. Tokens materialize before the bigram
    lambda (shingles_expr contract)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
        .withColumn("_toks", F.split(F.col(text_col), " "))
        .select(
            "doc_id",
            F.explode(
                F.concat(
                    F.col("_toks"),
                    F.expr(shingles_expr(text_col, 2, toks_col="_toks")),
                )
            ).alias("gram"),
        )
        .select(
            "doc_id",
            (F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
             .cast("long") % n_buckets).cast("int").alias("bucket"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights: log w per raw doc, higher = more
    target-like; feed the weights to (Gumbel top-k / stratified) sampling
    to select a target-matched training subset. Returns
    (doc_id, n_grams, logw), logw rounded to 4 decimals.

    Both distributions are Laplace-smoothed over the SAME hashed feature
    space: p[b] = (count[b] + alpha) / (total + alpha * B). Hashing to B
    buckets bounds distribution state at B rows regardless of corpus size
    (the paper's point) — so the log-ratio table BROADCASTS, the raw
    corpus never shuffles its grams, and the only corpus-sized exchange
    is the per-doc sum. Distribution totals are 1-row aggregates of the
    B-row bucket tables, broadcast back — never an unpartitioned window
    (which would single-partition the table and warn per task) and never
    a driver action."""
    raw = _hashed_grams(docs, n_buckets, text_col, id_col)
    tgt = _hashed_grams(target, n_buckets, text_col, id_col)

    rawb = (raw.groupBy("bucket").count()
            .select("bucket", F.col("count").alias("cr")))
    tr = rawb.agg(F.sum("cr").alias("tr"))
    tgtb = (tgt.groupBy("bucket").count()
            .select("bucket", F.col("count").alias("ct")))
    tt = tgtb.agg(F.sum("ct").alias("tt"))

    # every raw gram's bucket exists in rawb by construction; target-empty
    # buckets smooth to alpha mass (ct coalesces to 0 after the left
    # join); the totals ride 1-row broadcasts so tt is never NULL.
    # both distribution tables are <= B rows by construction — broadcast
    # the target side so no stage of the operator ever sort-merge-joins
    lr = (
        rawb.crossJoin(F.broadcast(tr))
        .join(F.broadcast(tgtb), "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                      / (F.col("tt") + F.lit(alpha * n_buckets)))
                - F.log((F.col("cr") + F.lit(alpha))
                        / (F.col("tr") + F.lit(alpha * n_buckets)))
            ).alias("logratio"),
        )
    )

    return (
        raw.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.sum("logratio"), 4).alias("logw"),
        )
    )


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "norm_text") -> DataFrame:
    """Unicode canonicalization — the pass every multilingual pipeline runs
    before hashing, deduping, or tokenizing text: NFC normalization (so
    composed/decomposed forms of the same glyph hash identically), Unicode
    lowercasing, whitespace collapse to single spaces, and trim. Without it
    the same page fetched from two mirrors (one emitting e + combining
    accent, one emitting the precomposed codepoint) defeats exact dedup and
    splits vocabulary counts.

    Adds ``out_col`` plus a ``changed`` flag (rows the pass altered — the
    audit count a curation run reports).

    Plan shape: NFC is the one step Spark has no JVM expression for, so it
    is a vectorized Arrow UDF behind the repo's NULL-mask pattern (the
    envelope lesson, parse.py:json_mid_udf): rows that are pure ASCII —
    where NFC is the identity — enter the UDF as NULL (one validity bit
    over Arrow, no string bytes cross into Python) and are restored by
    coalesce. Lowercase/whitespace/trim are whole-stage-codegen
    expressions. No shuffle; composes with any upstream partitioning.

    ASCII-heavy corpora (extracted English web text) therefore pay almost
    nothing; the Python cost scales with the non-ASCII fraction only."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no annotations: PEP-563 stringized hints (future-annotations above)
    # would defeat pandas_udf's signature inspection
    @pandas_udf("string")
    def _nfc(s):
        import unicodedata

        norm = unicodedata.normalize
        return s.map(lambda x: None if x is None else norm("NFC", x))

    is_ascii = F.col(text_col).rlike("^[\\x00-\\x7F]*$")
    nfc_out = _nfc(F.when(~is_ascii, F.col(text_col)))
    canon = F.trim(F.regexp_replace(
        F.lower(F.coalesce(nfc_out, F.col(text_col))), "\\s+", " "))
    return (
        df.withColumn(out_col, canon)
        .withColumn("changed", F.col(out_col) != F.col(text_col))
    )


def host_quality(pages: DataFrame, text_col: str = "text",
                 url_col: str = "url") -> DataFrame:
    """Spam-host induction: aggregate per-PAGE compliance and quality
    gates up to the HOST, where web-corpus ban decisions actually happen
    (UT1/Blacklists, RefinedWeb §3.1, and every production crawl ban by
    domain — one bad page is noise, a host that is 90% bad pages is a
    policy).

    Per-domain output:

      (domain, n_pages, keep_frac, mirror_frac, cc_frac, short_frac,
       mean_chars, banned)

    - keep_frac    — share of pages passing the html_policy verdict
                     (valid utf-8, no robots-noindex),
    - mirror_frac  — share of decodable pages whose rel=canonical points
                     ELSEWHERE (the publisher says this fetch is a
                     duplicate/variant),
    - cc_frac      — share carrying a Creative-Commons rel=license,
    - short_frac   — share with < 200 chars of extracted text (thin/stub
                     pages; the Gopher minimum-length gate at host grain),
    - banned       — keep_frac < 0.5 OR mirror_frac > 0.5 OR
                     short_frac > 0.9; downstream corpus assembly
                     anti-joins its pages against the banned hosts.

    Scale shape: ONE narrow codegen pass (html_policy's regex scan +
    length(text), html read once and immediately reduced to booleans) →
    ONE shuffle on domain with map-side partial aggregation, output
    bounded by |hosts|. Fractions are round(4) doubles over bigint
    counts — exact in both engines, no float-sum order sensitivity.
    """
    from logport_spark.operators.linkgraph import URL_DOMAIN_RE
    from logport_spark.operators.parse import html_policy

    p = html_policy(pages, url_col=url_col, keep_cols=(text_col,))
    sig = p.select(
        F.regexp_extract(F.col(url_col), URL_DOMAIN_RE, 1).alias("domain"),
        F.col("keep").cast("int").alias("k"),
        F.coalesce(~F.col("is_canonical_self"), F.lit(False))
         .cast("int").alias("m"),
        F.coalesce(F.col("cc_licensed"), F.lit(False)).cast("int")
         .alias("cc"),
        (F.length(F.col(text_col)) < 200).cast("int").alias("sh"),
        F.length(F.col(text_col)).alias("chars"),
    )
    agg = sig.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.sum("k").alias("nk"), F.sum("m").alias("nm"),
        F.sum("cc").alias("ncc"), F.sum("sh").alias("nsh"),
        F.sum("chars").alias("nch"),
    )
    n = F.col("n_pages").cast("double")
    keep_frac = F.col("nk") / n
    mirror_frac = F.col("nm") / n
    short_frac = F.col("nsh") / n
    return agg.select(
        "domain", "n_pages",
        F.round(keep_frac, 4).alias("keep_frac"),
        F.round(mirror_frac, 4).alias("mirror_frac"),
        F.round(F.col("ncc") / n, 4).alias("cc_frac"),
        F.round(short_frac, 4).alias("short_frac"),
        F.round(F.col("nch") / n, 2).alias("mean_chars"),
        ((keep_frac < 0.5) | (mirror_frac > 0.5) | (short_frac > 0.9))
        .alias("banned"),
    )
