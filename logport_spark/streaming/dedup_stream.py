"""Cross-batch streaming near-dup removal: incremental MinHash+LSH.

`dedup_stream` (stream.py) removes exact key redeliveries inside a
watermark window — the transport-level cure. A continuous corpus ingestion
loop needs the CONTENT-level cure across unbounded time: a document
arriving today must be dropped if it near-duplicates one ingested last
month. Spark's built-in stateful operators can't hold that state (it is
per-corpus, not per-window), so this runs the standard incremental-LSH
design inside foreachBatch:

  state (parquet, grows O(docs), never holds text):
    state/sigs  — (doc_id, sig ARRAY<LONG>[64])            ~520 B/doc
    state/bands — (band, key, doc_id), 16 rows/doc          ~400 B/doc

  per micro-batch:
    1. in-batch near-dup pairs with the batch-local EXACT-verify miner
       (operators/dedup.minhash_lsh_pairs — text is at hand); drop the
       larger id of each pair.
    2. survivors' band keys join state/bands on (band, key) → cross-batch
       candidates; candidates join state/sigs and the batch sigs, and the
       SIGNATURE-ESTIMATED Jaccard (matching minhash fraction — the
       unbiased MinHash estimator) decides the drop. Estimated, because
       state deliberately never stores text or shingle sets: 64 longs/doc
       is what makes month-deep state affordable at 10^9 docs.
    3. kept docs append to clean/, kept (sig, band) rows append to state/
       — every write lands under the micro-batch's own batch_id partition
       with dynamic overwrite, so a crash-replayed batch overwrites itself
       (the same exactly-once discipline as run_stream_pipeline); the band
       join is duplicate-tolerant anyway (candidates are DISTINCT pairs).

The estimator's std at J=0.8 with k=64 is sqrt(J(1-J)/k) ≈ 0.05, so
`est_threshold` defaults slightly below the miner's exact threshold to
hold capture (the classic two-sided trade; pytest pins planted near-dups
dropped and uniques kept).

Reference tie-in: logport's undelivered_log replays WHOLE lines after a
crash (src/Watch.cc:180-200) — at-least-once delivery that *creates*
duplicates; this operator is the corpus-scale consumer-side repair.

SCALE NOTE — the per-batch state join: every micro-batch shuffle-joins its
band rows against the FULL state/bands table; there is no partition
pruning on (band, key) because parquet partitioning is by batch_id (the
idempotence key). That is the known cost of incremental LSH without an
index — per-batch work is linear in state size, fine while
batch_rate × state_scan_cost fits the trigger interval. Past that, the
documented upgrades (no code-shape change, same join): (a) state/bands in
an Iceberg table sorted on (band, key) → data-skipping prunes row groups
to the batch's key range; (b) bucketed state table on `key` → co-located
join, no state-side shuffle; (c) compact state periodically (drop band
rows of docs later superseded). The signature table is only touched for
candidate ids (semi-joined), so it never bounds the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    doc_shingles,
    minhash_lsh_pairs,
    minhash_signatures_h64,
)

NUM_HASHES = 64
BANDS = 16
ROWS_PER_BAND = NUM_HASHES // BANDS


def doc_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sig) MinHash signatures for a document batch."""
    sh = doc_shingles(docs, n).select(
        "doc_id", F.xxhash64(F.col("sh")).alias("h64"))
    return minhash_signatures_h64(sh, NUM_HASHES)


def band_rows(sig: DataFrame) -> DataFrame:
    """(band, key, doc_id) LSH band rows — the join-key state shape."""
    band_keys = F.array(*[
        F.xxhash64(F.lit(b), *[F.col("sig")[b * ROWS_PER_BAND + r]
                               for r in range(ROWS_PER_BAND)])
        for b in range(BANDS)
    ])
    return sig.select(
        "doc_id", F.posexplode(band_keys).alias("band", "key")
    ).select("band", "key", "doc_id")


def estimated_jaccard(s1: str, s2: str):
    """Matching-minhash fraction — the unbiased MinHash Jaccard estimator."""
    return F.expr(
        f"aggregate(zip_with({s1}, {s2}, (x, y) -> IF(x = y, 1, 0)), 0,"
        f" (a, v) -> a + v) / cast({NUM_HASHES} as double)"
    )


def _read_state(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    from ..plans.ledger import _dir_exists

    if not _dir_exists(spark, path):
        return spark.createDataFrame([], ddl)
    return spark.read.schema(
        ddl + ", batch_id long").parquet(path).drop("batch_id")


def run_stream_minhash_dedup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    est_threshold: float = 0.7,
    max_files: int = 1,
) -> None:
    """Continuous corpus ingestion with in-batch exact and cross-batch
    estimated near-dup removal (module docstring). Drains available files
    (availableNow) with `max_files` per micro-batch."""
    sigs_dir = out_dir.rstrip("/") + "/state/sigs"
    bands_dir = out_dir.rstrip("/") + "/state/bands"
    clean_dir = out_dir.rstrip("/") + "/clean"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        docs = batch_df.persist()
        # 1. in-batch near-dups, exact verify (text available)
        drops = minhash_lsh_pairs(docs, threshold=threshold).select(
            F.col("d2").alias("doc_id")).distinct()
        kept = docs.join(drops, "doc_id", "left_anti")
        sig = doc_signatures(kept).persist()
        # 2. cross-batch candidates vs persisted bands, estimated-J verify
        # band is posexplode's pos column — IntegerType on disk; declare it
        # so the read never depends on parquet type widening
        state_bands = _read_state(sp, bands_dir, "band int, key long, doc_id long")
        state_sigs = _read_state(sp, sigs_dir, "doc_id long, sig array<long>")
        cands = (
            band_rows(sig).alias("n")
            .join(state_bands.alias("o"), ["band", "key"])
            .select(F.col("n.doc_id").alias("new_id"),
                    F.col("o.doc_id").alias("old_id"))
            .distinct()
        )
        cross_drops = (
            cands
            .join(sig.select(F.col("doc_id").alias("new_id"),
                             F.col("sig").alias("s_new")), "new_id")
            .join(state_sigs.select(F.col("doc_id").alias("old_id"),
                                    F.col("sig").alias("s_old")), "old_id")
            .withColumn("est_j", estimated_jaccard("s_new", "s_old"))
            .filter(F.col("est_j") >= est_threshold)
            .select(F.col("new_id").alias("doc_id")).distinct()
        )
        final = kept.join(cross_drops, "doc_id", "left_anti")
        final_sig = sig.join(cross_drops, "doc_id", "left_anti")

        def _write(df: DataFrame, path: str) -> None:
            (df.withColumn("batch_id", F.lit(batch_id).cast("long"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(path))

        _write(final, clean_dir)
        _write(final_sig, sigs_dir)
        _write(band_rows(final_sig), bands_dir)
        sig.unpersist()
        docs.unpersist()

    schema = spark.read.option("pathGlobFilter", "*.parquet").parquet(docs_dir).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", "*.parquet")
        .parquet(docs_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
