"""A day in the life of the corpus: the session-13 legs composed.

Raw crawl batches stream through the curation gates into the cross-batch
dedup protocol (streaming/curation_stream.py), the clean corpus gets a
min/max manifest and answers a pruned slice (plans/manifest.py), and the
near-dup cluster state folds in the new batch incrementally
(dedup.update_clusters) — each piece is unit-tested elsewhere; this test
pins that they COMPOSE: the artifacts each stage writes are exactly what
the next stage consumes."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps near the quiet river bank every single day in summer")
FRESH = ("a small boat drifts along the old canal while two birds circle "
         "above the water and the town slowly wakes up again this morning")
LOWQ = " ".join(str(i * 37 % 97) for i in range(40))


def _write(d, name, rows):
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        f"{d}/{name}.parquet", index=False)


def test_crawl_day_stream_manifest_clusters(spark, tmp_path_factory):
    from logport_spark.operators.dedup import (connected_components,
                                               minhash_lsh_pairs,
                                               update_clusters)
    from logport_spark.plans.manifest import (pruned_files, pruned_read,
                                              write_manifest)
    from logport_spark.streaming.curation_stream import run_stream_curation

    d = str(tmp_path_factory.mktemp("day_docs"))
    out = str(tmp_path_factory.mktemp("day_out"))
    ckpt = str(tmp_path_factory.mktemp("day_ckpt"))

    # morning batch: a good doc, junk, and a near-dup of the good doc
    _write(d, "b1", [(0, GOOD), (1, LOWQ), (2, GOOD.replace("summer",
                                                            "winter"))])
    run_stream_curation(spark, d, out, ckpt)
    # afternoon batch: a fresh doc and a cross-batch near-dup of doc 0
    _write(d, "b2", [(10, FRESH), (11, GOOD + " almost")])
    run_stream_curation(spark, d, out, ckpt)

    clean = spark.read.parquet(out + "/clean")
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    assert kept == {0, 10}   # junk gated, both near-dups deduped

    # storage leg: manifest over the accrued clean corpus (partitioned by
    # batch_id), pruned read of one batch's id slice
    write_manifest(spark, out + "/clean", ["doc_id", "quality_score"])
    files = pruned_files(spark, out + "/clean", "doc_id", 10, 10)
    assert files and len(files) < len(clean.inputFiles())
    got = (pruned_read(spark, out + "/clean", "doc_id", 10, 10)
           .filter(F.col("doc_id") == 10))
    assert [r.doc_id for r in got.collect()] == [10]

    # clustering leg: commit clusters over the morning RAW batch, fold the
    # afternoon batch's pairs in incrementally, compare vs full recompute
    b1 = spark.createDataFrame([(0, GOOD), (1, LOWQ),
                                (2, GOOD.replace("summer", "winter"))],
                               "doc_id long, text string")
    b2 = spark.createDataFrame([(10, FRESH), (11, GOOD + " almost")],
                               "doc_id long, text string")
    all_docs = b1.union(b2)
    state = connected_components(minhash_lsh_pairs(b1, threshold=0.8),
                                 b1.select("doc_id"))
    new_pairs = (minhash_lsh_pairs(all_docs, threshold=0.8)
                 .filter((F.col("d1") >= 10) | (F.col("d2") >= 10)))
    inc = update_clusters(state, new_pairs, new_nodes=b2.select("doc_id"))
    full = connected_components(minhash_lsh_pairs(all_docs, threshold=0.8),
                                all_docs.select("doc_id"))
    assert ({(r.doc_id, r.cluster_id) for r in inc.collect()}
            == {(r.doc_id, r.cluster_id) for r in full.collect()})
    # the near-dup family {0, 2, 11} is ONE cluster labeled by doc 0
    labels = {r.doc_id: r.cluster_id for r in inc.collect()}
    assert labels[0] == labels[2] == labels[11] == 0
    assert labels[10] == 10 and labels[1] == 1
