"""Link-graph operators: extraction plan shape, graph invariants, PageRank.

Covers the SURVEY.md §5 pattern for web-graph work: the extraction kernel
must stay a zero-shuffle codegen map (html read once, never shuffled), the
host graph must satisfy the degree/edge accounting identities, and
PageRank must conserve probability mass and converge toward in-link-heavy
domains — the invariants a 100 TB host graph run depends on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logport_spark.operators.linkgraph import (
    anchor_terms,
    domain_pagerank,
    extract_links,
    host_graph,
    link_degrees,
)


def test_extract_links_plan_is_narrow(spark, pages_small):
    """Extraction is a pure map: no Exchange, no Python, html read once."""
    plan = extract_links(pages_small)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_extract_links_rows(spark, pages_small):
    """datagen emits doc_id % 4 links per page; extraction finds exactly
    those (minus invalid-utf8 pages, which contribute none)."""
    links = extract_links(pages_small).cache()
    n_invalid = pages_small.where(
        ~F.is_valid_utf8(F.col("html").cast("string"))).count()
    assert n_invalid > 0  # the 1-in-97 invalid pages are present
    expected = sum(
        i % 4 for i in range(200)
        if i % 97 != 0  # invalid-utf8 pages drop
    )
    assert links.count() == expected
    row = links.where(F.col("dst_url") != "").first()
    assert row["dst_domain"] in row["dst_url"]
    # anchors are two corpus words by construction
    assert links.where(F.size(F.split("anchor", " ")) != 2).count() == 0


def test_host_graph_accounting(spark, pages_small):
    """Degree identities: sum(out_degree) = sum(in_degree) = |graph edges|;
    sum(n_outlinks) = sum(n_inlinks) = external link count."""
    links = extract_links(pages_small)
    g = host_graph(links).cache()
    deg = link_degrees(g).cache()
    n_edges = g.count()
    ext = links.where(~F.col("is_internal")).count()
    tot = deg.agg(
        F.sum("out_degree").alias("o"), F.sum("in_degree").alias("i"),
        F.sum("n_outlinks").alias("ol"), F.sum("n_inlinks").alias("il"),
    ).first()
    assert tot["o"] == tot["i"] == n_edges
    assert tot["ol"] == tot["il"] == ext


def test_pagerank_mass_conservation(spark, pages_small):
    """Ranks are a probability distribution after every fixed-iteration
    run (teleport + dangling redistribution conserve mass exactly)."""
    g = host_graph(extract_links(pages_small))
    for iters in (1, 3):
        pr = domain_pagerank(g, iters=iters)
        total = pr.agg(F.sum("rank")).first()[0]
        assert abs(total - 1.0) < 1e-6, (iters, total)
        assert pr.where(F.col("rank") <= 0).count() == 0


def test_pagerank_favors_inlinks(spark, pages_small):
    """A domain in the top in-link decile must outrank the bottom decile's
    mean — the signal PageRank exists to compute."""
    g = host_graph(extract_links(pages_small))
    deg = link_degrees(g)
    pr = domain_pagerank(g, iters=3)
    j = deg.join(pr, "domain").orderBy(F.desc("n_inlinks")).collect()
    top = [r["rank"] for r in j[: max(1, len(j) // 10)]]
    bot = [r["rank"] for r in j[-max(1, len(j) // 10):]]
    assert sum(top) / len(top) > sum(bot) / len(bot)


def test_anchor_terms_topk_contract(spark, pages_small):
    """rnk is 1..k per domain, counts non-increasing within a domain, and
    ties break on term ascending (the deterministic-rank convention)."""
    at = anchor_terms(extract_links(pages_small), k=3).cache()
    assert at.where((F.col("rnk") < 1) | (F.col("rnk") > 3)).count() == 0
    bad = (
        at.alias("a").join(at.alias("b"),
                           (F.col("a.dst_domain") == F.col("b.dst_domain"))
                           & (F.col("a.rnk") + 1 == F.col("b.rnk")))
        .where((F.col("a.n") < F.col("b.n"))
               | ((F.col("a.n") == F.col("b.n"))
                  & (F.col("a.term") > F.col("b.term"))))
        .count()
    )
    assert bad == 0
