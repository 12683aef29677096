"""Incremental crawl graph: streaming link extraction with merge-on-read.

A continuous crawl delivers pages in micro-batches; the host graph, the
crawled-host set, and the frontier must stay current without re-scanning
the corpus. The design is append-partials / merge-on-read — the standard
incremental-graph shape (and the one that holds at 100 TB, where
rewriting a global aggregate per micro-batch is a non-starter):

  state (parquet, batch_id-partitioned, never holds html):
    state/links — per-batch EXTERNAL-link partial at grain
                  (src_domain, dst_domain, src_url, anchor) with count n
                  (collapses identical repeated anchors on a page —
                  nav/footer links, the common case)
    state/hosts — per-batch distinct crawled host domains

  per micro-batch: extract_links on the batch only (the zero-shuffle
  codegen kernel), one batch-local partial aggregation, two writes. No
  cross-batch reads in the hot loop — per-batch cost is O(batch), never
  O(corpus-lifetime state).

  merge-on-read views (exact, not approximate):
    read_host_graph     == operators.linkgraph.host_graph over all pages
    read_crawled_hosts  == distinct host set of every page streamed
    read_crawl_frontier == operators.linkgraph.crawl_frontier
  Exactness holds because the partial grain keeps src_url and anchor:
  sum(n) merges link counts, and countDistinct(src_url / src_domain /
  anchor) over the union of partials equals the global distinct count
  (each (page, target, anchor) triple lands in whichever batches carried
  it; DISTINCT absorbs re-crawls of the same url in later batches).

EXACTLY-ONCE: every write lands under the micro-batch's own batch_id
partition with dynamic overwrite, so a crash-replayed batch overwrites
itself byte-for-byte — and because process() never reads prior state,
replay idempotence needs no batch-exclusion dance (contrast
dedup_stream's crash-replay contract, which exists only because that
operator must join its own past).

STATE GROWTH: state/links grows with distinct (page, target, anchor)
triples — the same order as the corpus's external-link mass, i.e. the
edge list any host-graph build materializes anyway. A long-lived stream
folds the per-batch partitions with `compact_linkgraph_state` (same
delete+rename generation swap as compact_dedup_state): partials
re-aggregate at the same grain into one batch_id=-1 generation, so file
count is bounded and the merge-on-read views get fewer, larger inputs.

Reference tie-in: logport tails files and ships lines continuously
(/root/reference/src/LogPort.cc watch loop); this is the same
continuous-ingest contract applied to crawl pages, with the graph views
replacing the per-sink metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linkgraph import URL_DOMAIN_RE, extract_links


def _links_partial(pages: DataFrame) -> DataFrame:
    """Batch-local external-link partial aggregate (module docstring)."""
    return (
        extract_links(pages)
        .where(~F.col("is_internal") & (F.col("dst_domain") != ""))
        .groupBy("src_domain", "dst_domain", "src_url", "anchor")
        .agg(F.count("*").alias("n"))
    )


def _hosts_partial(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Batch-local distinct crawled hosts."""
    return (
        pages.select(F.regexp_extract(F.col(url_col), URL_DOMAIN_RE, 1)
                     .alias("domain"))
        .where(F.col("domain") != "")
        .distinct()
    )


def run_stream_linkgraph(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files: int = 1,
) -> None:
    """Drain available page files (availableNow, `max_files` per
    micro-batch), appending link/host partials under each batch's own
    batch_id partition."""
    links_dir = out_dir.rstrip("/") + "/state/links"
    hosts_dir = out_dir.rstrip("/") + "/state/hosts"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        pages = batch_df.persist()

        def _write(df: DataFrame, path: str) -> None:
            (df.withColumn("batch_id", F.lit(batch_id).cast("long"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(path))

        _write(_links_partial(pages), links_dir)
        _write(_hosts_partial(pages), hosts_dir)
        pages.unpersist()

    schema = (spark.read.option("pathGlobFilter", "*.parquet")
              .parquet(pages_dir).schema)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", "*.parquet")
        .parquet(pages_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_LINKS_DDL = ("src_domain string, dst_domain string, src_url string, "
              "anchor string, n long")


def _read_links(spark: SparkSession, out_dir: str) -> DataFrame:
    return (spark.read.schema(_LINKS_DDL + ", batch_id long")
            .parquet(out_dir.rstrip("/") + "/state/links")
            .drop("batch_id"))


def read_host_graph(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-on-read host graph — same schema and values as
    operators.linkgraph.host_graph over every page streamed so far: one
    shuffle on the (src_domain, dst_domain) pair, input already collapsed
    to the partial grain."""
    return (
        _read_links(spark, out_dir)
        .groupBy("src_domain", "dst_domain")
        .agg(F.sum("n").alias("n_links"),
             F.countDistinct("src_url").alias("n_src_pages"))
    )


def read_crawled_hosts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Distinct host set of every page streamed so far (1 column: domain)."""
    return (spark.read.schema("domain string, batch_id long")
            .parquet(out_dir.rstrip("/") + "/state/hosts")
            .drop("batch_id").distinct())


def read_crawl_frontier(spark: SparkSession, out_dir: str,
                        k: int = 100) -> DataFrame:
    """Merge-on-read frontier — same contract as
    operators.linkgraph.crawl_frontier(links, crawled, k): top-k UNCRAWLED
    domains by (n_ref_domains DESC, n_links DESC, domain ASC). The crawled
    set is |hosts|-bounded (anti-join side broadcasts under AQE); the
    aggregate merges partials with sum(n) + countDistinct, then plans as
    TakeOrderedAndProject."""
    frontier = _read_links(spark, out_dir).join(
        read_crawled_hosts(spark, out_dir)
        .select(F.col("domain").alias("dst_domain")),
        "dst_domain", "left_anti")
    return (
        frontier.groupBy(F.col("dst_domain").alias("domain"))
        .agg(F.countDistinct("src_domain").alias("n_ref_domains"),
             F.sum("n").alias("n_links"),
             F.countDistinct("anchor").alias("n_anchor_terms"))
        .orderBy(F.desc("n_ref_domains"), F.desc("n_links"),
                 F.asc("domain"))
        .limit(k)
    )


def compact_linkgraph_state(spark: SparkSession, out_dir: str,
                            link_files: int = 8,
                            checkpoint_dir: str | None = None) -> None:
    """Offline state maintenance: fold batch_id partitions into one
    batch_id=-1 generation, re-aggregating links at the partial grain (the
    merge is associative, so compaction never changes any view's answer).
    Same crash-safe delete+rename generation swap as compact_dedup_state;
    run with the stream stopped.

    Retention safety (r4 verdict #7, same argument as compact_dedup_state):
    with ``checkpoint_dir`` given, only COMMITTED batches fold — a crashed
    batch's partitions stay under their own batch_id, so the restart's
    idempotent re-write of that partition cannot double-count its links
    against a folded copy in the -1 generation."""
    from .dedup_stream import _fs_swap, last_committed_batch

    fold_max = (None if checkpoint_dir is None
                else last_committed_batch(checkpoint_dir))
    links_dir = out_dir.rstrip("/") + "/state/links"
    hosts_dir = out_dir.rstrip("/") + "/state/hosts"

    raw = (spark.read.schema(_LINKS_DDL + ", batch_id long")
           .parquet(links_dir))
    fold = raw if fold_max is None else raw.filter(
        F.col("batch_id") <= fold_max)
    folded = (
        fold.groupBy("src_domain", "dst_domain", "src_url", "anchor")
        .agg(F.sum("n").alias("n"))
        .withColumn("batch_id", F.lit(-1).cast("long"))
    )
    if fold_max is not None:
        folded = folded.unionByName(
            raw.filter(F.col("batch_id") > fold_max))
    (folded.repartition(link_files)
     .write.mode("overwrite").partitionBy("batch_id")
     .parquet(links_dir + ".compact"))

    raw_h = (spark.read.schema("domain string, batch_id long")
             .parquet(hosts_dir))
    fold_h = raw_h if fold_max is None else raw_h.filter(
        F.col("batch_id") <= fold_max)
    hosts = (fold_h.select("domain").distinct()
             .withColumn("batch_id", F.lit(-1).cast("long")))
    if fold_max is not None:
        hosts = hosts.unionByName(raw_h.filter(F.col("batch_id") > fold_max))
    (hosts.coalesce(1)
     .write.mode("overwrite").partitionBy("batch_id")
     .parquet(hosts_dir + ".compact"))

    _fs_swap(spark, links_dir + ".compact", links_dir)
    _fs_swap(spark, hosts_dir + ".compact", hosts_dir)
