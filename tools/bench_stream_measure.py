#!/usr/bin/env python
"""Streaming-curation throughput ladder (round 5, session 3).

The streaming stack's correctness is pytest-pinned (crash-replay lossless,
merge-on-read == batch operators), but until now its THROUGHPUT was
unmeasured — the one family in BENCH/BASELINE.md without a ladder. This
tool times `run_stream_curation` (gates → cross-batch MinHash dedup,
the shipped function — no bench-only variant) over the pages corpus:

  * micro-batch tax: the SAME input drained as 1 batch vs 10 batches
    (max_files=1 over 10 files) — the difference is pure protocol cost
    (per-batch scheduling + state read/write + dynamic-overwrite commit),
    the number a capacity plan multiplies by batches/day;
  * size ladder: 100k → 1M docs at fixed batch count — does per-doc cost
    hold as state deepens 10×?
  * line_dedup=True variant at 100k: the added cost of the cross-batch
    C4 line stage (line-hash state at line grain, ~18 lines/doc).

Inputs derive from the deterministic pages tables (datagen.ensure_pages);
doc_id = xxhash64(url) (unique in practice at these sizes — verified
per run), text = the page text column. Output: one JSON line per leg on
stdout (wall, docs/s, clean rows, state files/bytes) + a summary line;
per-leg detail to stderr. Fresh out/ckpt dirs per leg; the input dir is
written once per size with exactly n_batches parquet files so
maxFilesPerTrigger=1 yields n_batches micro-batches.

Usage: python tools/bench_stream_measure.py [--sizes 100000,1000000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logport_spark import datagen  # noqa: E402
from logport_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "stream_bench")

SF_FOR = {10_000: "0.01", 100_000: "0.1", 1_000_000: "1"}


def prep_docs(spark, n: int, n_batches: int) -> str:
    """Write (doc_id, text) as exactly n_batches files; cached per (n,k)."""
    d = os.path.join(WORK, f"docs_{n}_{n_batches}")
    if os.path.exists(os.path.join(d, "_SUCCESS")):
        return d
    pages = spark.read.parquet(datagen.ensure_pages(SF_FOR[n], spark=spark))
    docs = pages.select(F.xxhash64("url").alias("doc_id"), "text")
    n_ids = docs.select("doc_id").distinct().count()
    if n_ids != n:  # hash collision would conflate two docs in the dedup
        print(f"  WARN doc_id collisions: {n - n_ids}", file=sys.stderr)
    docs.repartition(n_batches).write.mode("overwrite").parquet(d)
    return d


def dir_stats(root: str) -> tuple[int, int]:
    files = nbytes = 0
    for base, _, names in os.walk(root):
        for f in names:
            if f.endswith(".parquet"):
                files += 1
                nbytes += os.path.getsize(os.path.join(base, f))
    return files, nbytes


def leg(spark, docs_dir: str, n: int, n_batches: int,
        line_dedup: bool = False) -> dict:
    from logport_spark.streaming.curation_stream import run_stream_curation

    tag = f"n={n} batches={n_batches}" + (" line_dedup" if line_dedup else "")
    out = os.path.join(WORK, "out")
    ckpt = os.path.join(WORK, "ckpt")
    for p in (out, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    t0 = time.time()
    run_stream_curation(spark, docs_dir, out, ckpt,
                        max_files=1 if n_batches > 1 else 1_000_000,
                        line_dedup=line_dedup)
    dt = time.time() - t0
    clean = spark.read.parquet(out + "/clean").count()
    sfiles, sbytes = dir_stats(os.path.join(out, "state"))
    row = {"n": n, "n_batches": n_batches, "line_dedup": line_dedup,
           "sec": round(dt, 2), "docs_per_sec": round(n / dt, 1),
           "clean_rows": clean, "state_files": sfiles,
           "state_mb": round(sbytes / 2**20, 1),
           "load_avg_1m": round(os.getloadavg()[0], 2)}
    print(f"  {tag}: {dt:.1f}s ({n/dt:,.0f} docs/s) clean={clean} "
          f"state={sfiles}f/{row['state_mb']}MB", file=sys.stderr)
    return row


def state_depth_run(spark, n: int = 10_000, gens=(1, 10, 100)) -> list:
    """Per-batch cost as a function of STREAM DEPTH (generations of state),
    isolating what compaction actually buys. One batch of `n` docs seeds
    the state; its partitions are replicated on disk to G generations
    (same rows under batch_id=1..G-1 — real generations differ in content
    but this holds row volume per generation constant by construction);
    then a second real batch is timed against that state, raw and (at
    max G) after compact_dedup_state folds it to one batch_id=-1
    generation. Raw-vs-compacted at equal G holds SCANNED ROWS equal
    (the fold concatenates, it does not dedup), so the delta is pure
    file-count cost — listing + open + footer reads — exactly the claim
    the compaction docstring makes for a month-deep stream."""
    from logport_spark.streaming.curation_stream import run_stream_curation
    from logport_spark.streaming.dedup_stream import compact_dedup_state

    src = prep_docs(spark, n, 2)  # two files: seed batch + timed batch
    parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    out = []
    for gen, compacted in [(g, False) for g in gens] + [(max(gens), True)]:
        d = os.path.join(WORK, "depth_in")
        o = os.path.join(WORK, "depth_out")
        ck = os.path.join(WORK, "depth_ck")
        for p in (d, o, ck):
            shutil.rmtree(p, ignore_errors=True)
        os.makedirs(d)
        shutil.copy(os.path.join(src, parts[0]), os.path.join(d, "a.parquet"))
        run_stream_curation(spark, d, o, ck)  # seed: batch 0 → state gen 0
        for table in ("bands", "sigs"):
            base = os.path.join(o, "state", table, "batch_id=0")
            for g in range(1, gen):
                shutil.copytree(base, os.path.join(
                    o, "state", table, f"batch_id={g}"))
        if compacted:
            compact_dedup_state(spark, o)  # clean shutdown: fold all to -1
        sfiles, _ = dir_stats(os.path.join(o, "state"))
        shutil.copy(os.path.join(src, parts[1]), os.path.join(d, "b.parquet"))
        t0 = time.time()
        run_stream_curation(spark, d, o, ck)  # drains ONLY batch b
        dt = time.time() - t0
        row = {"generations": gen, "compacted": compacted,
               "state_files_before": sfiles, "batch_sec": round(dt, 2),
               "load_avg_1m": round(os.getloadavg()[0], 2)}
        print(f"  depth G={gen}{' compacted' if compacted else ''}: "
              f"{dt:.1f}s batch, {sfiles} state files", file=sys.stderr)
        out.append(row)
    return out


def _scaling_leg(cpus: int, n: int = 100_000) -> None:
    """One fresh-JVM leg: single-batch n-doc drain at local[cpus].
    Input must already be generated (the --scaling driver does that with
    all cores before timing anything)."""
    spark = get_spark(f"stream_leg_{cpus}", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    from logport_spark.streaming.curation_stream import run_stream_curation

    d = os.path.join(WORK, f"docs_{n}_1")
    out = os.path.join(WORK, "leg_out")
    ck = os.path.join(WORK, "leg_ck")
    for p in (out, ck):
        shutil.rmtree(p, ignore_errors=True)
    t0 = time.time()
    run_stream_curation(spark, d, out, ck, max_files=1_000_000)
    print(json.dumps({"cpus": cpus, "sec": round(time.time() - t0, 2)}))
    spark.stop()


def scaling_run(pair=(2, 8), rounds: int = 2, n: int = 100_000) -> None:
    """North-rule evidence for the STREAMING path: the same single-batch
    100k-doc curation drain at N and 4N cores, fresh subprocess JVM per
    leg, levels interleaved, best kept per level (bench.py --scaling's
    methodology; the one-batch shape keeps the measured work the DAG,
    not per-batch engine fixed cost)."""
    import subprocess

    gen = get_spark("stream_scaling_gen", cpus=CPUS)
    datagen.ensure_lookups()
    os.makedirs(WORK, exist_ok=True)
    prep_docs(gen, n, 1)
    gen.stop()
    best: dict = {}
    for r in range(rounds):
        for cpus in pair:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--_leg", str(cpus), "--_n", str(n)],
                capture_output=True, text=True)
            row = json.loads(p.stdout.strip().splitlines()[-1])
            best[cpus] = min(best.get(cpus, 1e18), row["sec"])
            print(f"  round {r} local[{cpus}]: {row['sec']:.1f}s",
                  file=sys.stderr)
    lo, hi = pair
    eff = (best[lo] / best[hi]) / (hi / lo)
    print(json.dumps({
        "metric": "stream_scaling", "pair": list(pair), "rounds": rounds,
        "n": n,
        **{f"local[{c}]": {"sec": best[c],
                           "docs_per_sec": round(n / best[c], 1)}
           for c in pair},
        "scaling_efficiency": round(eff, 3),
        "load_avg_1m": round(os.getloadavg()[0], 2)}))


def main() -> None:
    if "--_leg" in sys.argv:
        n = (int(sys.argv[sys.argv.index("--_n") + 1])
             if "--_n" in sys.argv else 100_000)
        _scaling_leg(int(sys.argv[sys.argv.index("--_leg") + 1]), n)
        return
    if "--scaling" in sys.argv:
        pair = tuple(int(c) for c in (
            sys.argv[sys.argv.index("--pair") + 1].split(",")
            if "--pair" in sys.argv else ("2", "8")))
        n = (int(sys.argv[sys.argv.index("--n") + 1])
             if "--n" in sys.argv else 100_000)
        scaling_run(pair, n=n)
        return
    if "--state-depth" in sys.argv:
        spark = get_spark("bench_stream_depth", cpus=CPUS,
                          shuffle_partitions=max(CPUS, 8))
        datagen.ensure_lookups()
        os.makedirs(WORK, exist_ok=True)
        state_depth_run(spark, 10_000, (1, 10))  # warm-up (untimed legs)
        for row in state_depth_run(spark, 10_000, (1, 10, 100)):
            print(json.dumps(row))
        spark.stop()
        return
    sizes = [100_000, 1_000_000]
    if "--sizes" in sys.argv:
        sizes = [int(s) for s in
                 sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    spark = get_spark("bench_stream", cpus=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    datagen.ensure_lookups()
    os.makedirs(WORK, exist_ok=True)
    legs = []
    # warm-up (untimed): tiny drain pays JIT + Arrow + streaming engine init
    leg(spark, prep_docs(spark, 10_000, 2), 10_000, 2)
    for n in sizes:
        d10 = prep_docs(spark, n, 10)
        legs.append(leg(spark, d10, n, 10))
        if n == sizes[0]:
            d1 = prep_docs(spark, n, 1)
            legs.append(leg(spark, d1, n, 1))
            legs.append(leg(spark, d10, n, 10, line_dedup=True))
    for row in legs:
        print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
