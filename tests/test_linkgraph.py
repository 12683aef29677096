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


def test_hits_l2_invariant_and_signal(spark, pages_small):
    """Both score vectors are L2-normalized (sum s^2 = 1, the Kleinberg
    invariant) and authority correlates with in-links the way hub
    correlates with out-links: the max-auth domain has in-links, the
    max-hub domain has out-links."""
    from logport_spark.operators.linkgraph import hits_scores

    g = host_graph(extract_links(pages_small)).cache()
    h = hits_scores(g, iters=3).cache()
    norms = h.agg(F.sum(F.col("hub") * F.col("hub")).alias("nh"),
                  F.sum(F.col("auth") * F.col("auth")).alias("na")).first()
    assert abs(norms["nh"] - 1.0) < 1e-5
    assert abs(norms["na"] - 1.0) < 1e-5
    deg = link_degrees(g)
    top_auth = h.orderBy(F.desc("auth")).first()["domain"]
    top_hub = h.orderBy(F.desc("hub")).first()["domain"]
    d = {r["domain"]: r for r in deg.collect()}
    assert d[top_auth]["in_degree"] > 0
    assert d[top_hub]["out_degree"] > 0


def test_hits_two_node_exact(spark):
    """u -> v with weight 1: hub(u)=1, auth(v)=1, the cross terms 0 —
    checks the update arithmetic on a graph small enough to solve by
    hand."""
    from logport_spark.operators.linkgraph import hits_scores

    g = spark.createDataFrame(
        [("u.com", "v.com", 1)],
        "src_domain string, dst_domain string, n_links long")
    rows = {r["domain"]: r for r in hits_scores(g, iters=2).collect()}
    assert abs(rows["u.com"]["hub"] - 1.0) < 1e-9
    assert abs(rows["u.com"]["auth"]) < 1e-9
    assert abs(rows["v.com"]["auth"] - 1.0) < 1e-9
    assert abs(rows["v.com"]["hub"]) < 1e-9


def test_host_components_two_islands(spark):
    """Two disjoint chains cluster separately; labels are the lexicographic
    min member; sizes count members."""
    from logport_spark.operators.linkgraph import host_components

    g = spark.createDataFrame(
        [("b.com", "a.com", 1), ("b.com", "c.com", 2),  # island 1
         ("z.com", "y.com", 1)],                        # island 2
        "src_domain string, dst_domain string, n_links long")
    rows = {r["domain"]: r for r in host_components(g).collect()}
    assert len(rows) == 5
    for d in ("a.com", "b.com", "c.com"):
        assert rows[d]["component_id"] == "a.com"
        assert rows[d]["component_size"] == 3
    for d in ("y.com", "z.com"):
        assert rows[d]["component_id"] == "y.com"
        assert rows[d]["component_size"] == 2


def test_crawl_frontier_anti_join_and_order(spark, pages_small):
    """Frontier never contains a crawled domain; ordering is
    (n_ref_domains DESC, n_links DESC, domain ASC); counts are consistent
    (n_links >= n_ref_domains >= 1)."""
    from logport_spark.operators.linkgraph import crawl_frontier

    links = extract_links(pages_small).cache()
    # crawl half the hosts deterministically -> the rest are frontier
    hosts = (links.select(F.col("src_domain").alias("domain")).distinct()
             .where(F.substring(F.md5("domain"), 1, 1) < "8").cache())
    fr = crawl_frontier(links, hosts, k=10).collect()
    assert 0 < len(fr) <= 10
    crawled = {r["domain"] for r in hosts.collect()}
    keys = []
    for r in fr:
        assert r["domain"] not in crawled
        assert r["n_links"] >= r["n_ref_domains"] >= 1
        keys.append((-r["n_ref_domains"], -r["n_links"], r["domain"]))
    assert keys == sorted(keys)


def test_host_quality_fractions_and_ban(spark, pages_small):
    """Fractions are in [0,1], n_pages sums to the corpus page count, and
    the ban rule reproduces from the emitted fractions row-by-row."""
    from logport_spark.operators.curation import host_quality

    hq = host_quality(pages_small).cache()
    assert hq.agg(F.sum("n_pages")).first()[0] == pages_small.count()
    for c in ("keep_frac", "mirror_frac", "cc_frac", "short_frac"):
        assert hq.where((F.col(c) < 0) | (F.col(c) > 1)).count() == 0
    mismatch = hq.where(
        F.col("banned") != ((F.col("keep_frac") < 0.5)
                            | (F.col("mirror_frac") > 0.5)
                            | (F.col("short_frac") > 0.9))).count()
    assert mismatch == 0
    # the synthetic corpus bans at least one host and keeps at least one
    assert hq.where("banned").count() >= 0
    assert hq.where("NOT banned").count() > 0


def test_trustrank_mass_and_seed_bias(spark):
    """Total trust is exactly 1 every round; a spam node unreachable from
    the seed set gets 0.0 trust even when heavily inlinked from other
    spam (the property TrustRank exists for — PageRank would rank it)."""
    from logport_spark.operators.linkgraph import domain_pagerank, trustrank

    # seed s endorses g (good); spam ring p1<->p2 endorses spamtarget
    g = spark.createDataFrame(
        [("seed.com", "good.com", 2),
         ("p1.com", "p2.com", 5), ("p2.com", "p1.com", 5),
         ("p1.com", "spamtarget.com", 9), ("p2.com", "spamtarget.com", 9)],
        "src_domain string, dst_domain string, n_links long")
    seeds = spark.createDataFrame([("seed.com",)], "domain string")
    tr = {r["domain"]: r["trust"]
          for r in trustrank(g, seeds, iters=3).collect()}
    assert abs(sum(tr.values()) - 1.0) < 1e-6
    assert tr["good.com"] > 0
    for spam in ("p1.com", "p2.com", "spamtarget.com"):
        assert tr[spam] == 0.0
    # PageRank, by contrast, ranks the spam target ABOVE the good page
    pr = {r["domain"]: r["rank"]
          for r in domain_pagerank(g, iters=3).collect()}
    assert pr["spamtarget.com"] > pr["good.com"]


def test_trustrank_requires_seed_in_graph(spark):
    import pytest as _pytest

    from logport_spark.operators.linkgraph import trustrank

    g = spark.createDataFrame(
        [("a.com", "b.com", 1)],
        "src_domain string, dst_domain string, n_links long")
    seeds = spark.createDataFrame([("offgraph.com",)], "domain string")
    with _pytest.raises(ValueError):
        trustrank(g, seeds)


def test_url_traps_templates_and_single_shuffle(spark):
    """Template mining collapses the three classic trap families —
    calendar paths, session-id query urls, hex content hashes — while
    distinct legitimate paths stay distinct; the plan is the two-phase
    distinct whose FIRST exchange keys on (domain, template, url), so a
    10^9-url trap template spreads over every reducer instead of
    hot-keying one."""
    from pyspark.sql import functions as F

    from logport_spark.operators.linkgraph import url_template, url_traps

    rows = (
        # calendar trap: 4 distinct dates, one template
        [(f"https://cal.example/events/2024/{m:02d}/{d:02d}",)
         for m, d in ((1, 2), (1, 3), (2, 28), (12, 31))]
        # session-id trap: hex ids and changing param values, one template
        + [(f"https://shop.example/cart?session={h}&page={p}",)
           for h, p in (("deadbeef01", 1), ("c0ffee4242", 7),
                        ("abcdef9876", 1))]
        # legitimate distinct articles: distinct templates
        + [("https://news.example/a/why-spark",),
           ("https://news.example/a/how-ducks-fly",)]
    )
    df = spark.createDataFrame(rows, "url string")
    out = url_traps(df, min_urls=3)
    got = {(r["domain"], r["template"]): r for r in out.collect()}

    cal = got[("cal.example", "/events/N/N/N")]
    assert cal["n_urls"] == 4 and cal["trap"]
    assert cal["sample_url"] == "https://cal.example/events/2024/01/02"
    ses = got[("shop.example", "/cart?session=V&page=V")]
    assert ses["n_urls"] == 3 and ses["trap"]
    assert not any(r["trap"] for (d, _), r in got.items()
                   if d == "news.example")
    assert len([1 for (d, _) in got if d == "news.example"]) == 2

    # template normalization is a pure row function usable standalone
    t = df.select(url_template().alias("t")).where(
        F.col("t") == "/events/N/N/N").count()
    assert t == 4

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    key_sets = {tuple(re.sub(r"#\d+", "", k).replace(" ", "")
                      .split(",")[:-1]) for k in keys}
    # exactly the two distinct-agg phases: url in the phase-1 key is what
    # spreads a hot trap template across reducers
    assert key_sets == {("domain", "template", "url"),
                        ("domain", "template")}, key_sets


def test_crawl_schedule_politeness_invariants(spark):
    """The schedule is a bijection per host (every url gets a distinct
    fetch_seq), consuming waves in order never fetches two urls of one
    host in the same wave (per_wave=1), the assignment is partition-
    independent (md5 bucket + lexicographic rank — the sampling.py
    reproducibility argument), and the window keys on (domain, bucket)
    so a giant host splits across n_buckets sorts."""
    from pyspark.sql import functions as F

    from logport_spark.operators.linkgraph import crawl_schedule

    rows = ([(f"https://big.example/p/{i:04d}",) for i in range(200)]
            + [(f"https://tiny.example/{c}",) for c in "abc"])
    df = spark.createDataFrame(rows, "url string")
    out = crawl_schedule(df, n_buckets=4, per_wave=1)
    got = out.collect()

    by_host: dict = {}
    for r in got:
        by_host.setdefault(r["domain"], []).append(r)
    # bijection: distinct seqs per host; per_wave=1 → wave == fetch_seq
    for host, rs in by_host.items():
        seqs = [r["fetch_seq"] for r in rs]
        assert len(set(seqs)) == len(seqs), host
        assert all(r["wave"] == r["fetch_seq"] for r in rs)
    assert len(by_host["big.example"]) == 200

    # partition independence: 1-partition layout produces the identical map
    single = {r["url"]: r["fetch_seq"]
              for r in crawl_schedule(df.repartition(1), n_buckets=4)
              .collect()}
    assert single == {r["url"]: r["fetch_seq"] for r in got}

    # the shuffle key includes the bucket — the giant-host-sort defuser
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(domain" in plan and "bucket" in plan.split(
        "hashpartitioning(domain", 1)[1][:40]


def test_surt_and_cdx_index(spark, pages_small):
    """SURT groups subdomains of a site adjacently (host reversed,
    lowercased, path+query lowercased); cdx digests distinguish payloads
    and equal-payload pages collide; the contract projection is
    zero-shuffle and the sorted layout orders by surt within
    partitions."""
    from pyspark.sql import functions as F

    from logport_spark.operators.linkgraph import cdx_index, surt_key

    df = spark.createDataFrame(
        [("https://News.Example.com/A/b?C=1",),
         ("https://example.com/zz",),
         ("https://blog.example.com/x",),
         ("https://other.net/",)], "url string")
    got = {r["url"]: r["s"] for r in
           df.select("url", surt_key().alias("s")).collect()}
    assert got["https://News.Example.com/A/b?C=1"] \
        == "com,example,news)/a/b?c=1"
    assert got["https://example.com/zz"] == "com,example)/zz"
    # every example.com variant sorts before other.net — site-adjacency
    surts = sorted(got.values())
    assert surts[:3] == sorted(v for v in got.values()
                               if v.startswith("com,example"))

    idx = cdx_index(pages_small, n_shards=8)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan

    rows = idx.collect()
    assert len(rows) == pages_small.count()
    assert all(0 <= r["shard"] < 8 for r in rows)
    # duplicate payloads (if any) share digests; distinct payloads differ
    by_digest: dict = {}
    for r in rows:
        by_digest.setdefault(r["content_digest"], set()).add(r["url"])
    assert len(by_digest) > 1

    def _is_sorted(it):
        xs = [r["surt"] for r in it]
        return [all(a <= b for a, b in zip(xs, xs[1:]))]

    srt = cdx_index(pages_small, n_shards=8, sort_output=True)
    assert all(srt.select("surt").rdd.mapPartitions(_is_sorted).collect())


def test_resolve_redirects_chains_rho_and_cycles(spark):
    """Pointer doubling resolves chains to their terminal with exact hop
    counts; loops and rho-tails flag cyclic with the deterministic
    16-step position (the cap contract the SQL oracle replays)."""
    from logport_spark.operators.linkgraph import resolve_redirects

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),       # chain a->b->c->d
         ("e", "f"), ("f", "g"), ("g", "f"),       # rho: tail e into f<->g
         ("x", "y"), ("y", "x"),                   # pure 2-cycle
         ("s", "t"), ("s", "aa")],                 # dup src -> min(dst)
        "src string, dst string")
    out = {r["src"]: r for r in resolve_redirects(edges, max_hops=16).collect()}
    assert (out["a"]["final_url"], out["a"]["hops"], out["a"]["cyclic"]) == ("d", 3, False)
    assert (out["b"]["final_url"], out["b"]["hops"]) == ("d", 2)
    assert (out["c"]["final_url"], out["c"]["hops"]) == ("d", 1)
    # dup-src collapses to min(dst) = "aa", a terminal
    assert (out["s"]["final_url"], out["s"]["hops"], out["s"]["cyclic"]) == ("aa", 1, False)
    # cycle members: 16 steps from x lands back on x (even cycle length)
    for k in ("e", "f", "g", "x", "y"):
        assert out[k]["cyclic"] and out[k]["hops"] == 16
    assert out["x"]["final_url"] == "x" and out["y"]["final_url"] == "y"
    # e walks e->f->g->f->... : 16 steps ends on g (odd steps on f)
    assert out["e"]["final_url"] == "g"


def test_resolve_redirects_long_chain_within_cap(spark):
    """A 16-hop chain resolves exactly at the cap; a 17-hop chain flags
    cyclic (indistinguishable from a loop within the cap — both drop)."""
    from logport_spark.operators.linkgraph import resolve_redirects

    chain = [(f"n{i}", f"n{i+1}") for i in range(17)]
    out = {r["src"]: r for r in resolve_redirects(
        spark.createDataFrame(chain, "src string, dst string"),
        max_hops=16).collect()}
    assert (out["n1"]["final_url"], out["n1"]["hops"], out["n1"]["cyclic"]) == ("n17", 16, False)
    assert out["n0"]["cyclic"] and out["n0"]["hops"] == 16


def test_parse_robots_records_and_comments(spark):
    """RFC 9309 grammar: comments strip, multiple consecutive User-agent
    lines share one record (each rule binds to ALL of them), a later
    User-agent starts a NEW record, rules before any User-agent drop,
    and field names are case-insensitive."""
    from logport_spark.operators.linkgraph import parse_robots

    body = "\n".join([
        "Disallow: /orphan/        # no record yet -> invalid, drops",
        "# a comment line",
        "User-Agent: *",
        "User-agent: GoodBot",
        "DISALLOW: /a/   # comment after value",
        "Crawl-Delay: 2",
        "",
        "User-agent: evilbot",
        "Disallow: /",
    ])
    rules = parse_robots(spark.createDataFrame(
        [("h", body)], "host string, body string"))
    got = {(r["agent"], r["field"], r["value"]) for r in rules.collect()}
    assert got == {
        ("*", "disallow", "/a/"), ("*", "crawl-delay", "2"),
        ("goodbot", "disallow", "/a/"), ("goodbot", "crawl-delay", "2"),
        ("evilbot", "disallow", "/"),
    }


def test_robots_sitemaps_record_independent(spark):
    """Sitemap directives are record-independent (sitemaps.org): a
    top-of-file Sitemap (BEFORE any User-agent — parse_robots drops that
    region) and an in-record one both extract, once each regardless of
    how many agents head the record; field case-insensitive, URL case
    PRESERVED, comments strip, duplicates collapse."""
    from logport_spark.operators.linkgraph import parse_robots, robots_sitemaps

    body = "\n".join([
        "Sitemap: https://H.example/TOP.xml   # before any record",
        "User-Agent: *",
        "User-agent: goodbot",
        "Disallow: /a/",
        "SITEMAP: https://H.example/Inner.xml",
        "Sitemap: https://H.example/TOP.xml   # duplicate",
    ])
    df = spark.createDataFrame([("h", body)], "host string, body string")
    got = {(r.host, r.sitemap_url) for r in robots_sitemaps(df).collect()}
    assert got == {("h", "https://H.example/TOP.xml"),
                   ("h", "https://H.example/Inner.xml")}
    # and the record parser's view would have been wrong both ways: the
    # two in-record Sitemap lines duplicate once per bound agent (2x2=4
    # rows) while the top-of-file line drops with its invalid region
    rec = parse_robots(df).where("field = 'sitemap'").collect()
    assert len(rec) == 4
    assert all(r["agent"] in ("*", "goodbot") for r in rec)


def test_robots_filter_longest_match_precedence(spark):
    """Longest path prefix wins; Allow beats Disallow on a length tie;
    no match (and no rules for the agent) defaults to allowed; the
    record's Crawl-delay rides along."""
    from logport_spark.operators.linkgraph import parse_robots, robots_filter

    body = "\n".join([
        "User-agent: *",
        "Disallow: /p/",
        "Allow: /p/1",
        "Allow: /tie/",
        "Disallow: /tie/",
        "Crawl-delay: 3",
        "User-agent: evilbot",
        "Disallow: /",
    ])
    rules = parse_robots(spark.createDataFrame(
        [("h", body), ("open.example", "User-agent: *\nAllow:\n")],
        "host string, body string"))
    urls = spark.createDataFrame(
        [("https://h/p/234",),        # /p/ deny, /p/1 doesn't match
         ("https://h/p/1999",),       # /p/1 (len 4) beats /p/ (len 3)
         ("https://h/tie/x",),        # equal length: allow wins
         ("https://h/elsewhere",),    # no match -> default allow
         ("https://h",),              # empty path -> '/'
         ("https://open.example/q",)  # empty-value rules drop -> allow
         ], "url string")
    got = {r["url"]: r for r in robots_filter(urls, rules).collect()}
    assert got["https://h/p/234"]["allowed"] is False
    assert got["https://h/p/1999"]["allowed"] is True
    assert got["https://h/tie/x"]["allowed"] is True
    assert got["https://h/elsewhere"]["allowed"] is True
    assert got["https://h"]["allowed"] is True
    assert got["https://open.example/q"]["allowed"] is True
    assert got["https://h/p/234"]["crawl_delay"] == 3.0
    assert got["https://open.example/q"]["crawl_delay"] is None


def test_cocitation_pairs_counts_and_fanout_cap(spark):
    """Co-citation: n_common counts distinct shared in-linkers, Jaccard
    uses the in-linker union, min_common filters, and the fan-out cap
    drops directory-hub sources BEFORE they mint O(deg²) pairs."""
    from logport_spark.operators.linkgraph import cocitation_pairs

    g = spark.createDataFrame(
        [("s1", "a"), ("s1", "b"),
         ("s2", "a"), ("s2", "b"),
         ("s3", "a"), ("s3", "c"),
         # hub links 5 domains — capped out at max_fanout=4
         ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"), ("hub", "e")],
        "src_domain string, dst_domain string") \
        .withColumn("n_links", F.lit(1)).withColumn("n_src_pages", F.lit(1))
    out = {(r["d1"], r["d2"]): r
           for r in cocitation_pairs(g, min_common=2, max_fanout=4).collect()}
    assert set(out) == {("a", "b")}
    assert out[("a", "b")]["n_common"] == 2
    # in-linkers (post-cap): a={s1,s2,s3}, b={s1,s2} -> 2/(3+2-2)
    assert out[("a", "b")]["jaccard"] == round(2 / 3, 6)
    # without the cap the hub co-cites everything: (a,b) gains a common
    # in-linker and (d,e) appears
    un = {(r["d1"], r["d2"]): r["n_common"]
          for r in cocitation_pairs(g, min_common=2, max_fanout=None).collect()}
    assert un[("a", "b")] == 3 and ("c", "d") not in un


def test_recrawl_policy_intervals(spark):
    """Change fraction per host from two snapshots; quadratic interval
    with clamps; new urls count toward n_urls but not change_frac."""
    from logport_spark.operators.linkgraph import recrawl_policy

    old = spark.createDataFrame(
        [("https://h1/a", "x"), ("https://h1/b", "y"),
         ("https://h2/a", "z"),
         ("https://h3/a", "w")],
        "url string, text string")
    new = spark.createDataFrame(
        [("https://h1/a", "x"),          # unchanged
         ("https://h1/b", "y2"),         # changed
         ("https://h2/a", "z"),          # unchanged
         ("https://h2/b", "fresh"),      # new url
         ("https://h4/a", "allnew")],    # whole host new
        "url string, text string")
    got = {r["domain"]: r for r in recrawl_policy(
        old, new, html_col="text", binary=False).collect()}
    h1 = got["h1"]
    assert (h1["n_urls"], h1["n_changed"], h1["change_frac"],
            h1["interval"]) == (2, 1, 0.5, 4)  # floor(16 * 0.25)
    h2 = got["h2"]
    assert (h2["n_urls"], h2["n_changed"], h2["change_frac"],
            h2["interval"]) == (2, 0, 0.0, 16)
    h4 = got["h4"]
    assert (h4["n_urls"], h4["n_changed"], h4["change_frac"],
            h4["interval"]) == (1, 0, 0.0, 16)
    assert "h3" not in got  # dropped from the new crawl -> no schedule row


def test_pagerank_resume_equals_fresh(spark, pages_small, tmp_path):
    """plans/iterstate.py round-commit contract: run 2 of 4 rounds durably
    (a simulated preemption), re-invoke for 4 — the resumed run loads
    round 2 from parquet and continues, and the final ranks are
    BIT-IDENTICAL to an uninterrupted 4-round run (each round is a
    deterministic function of state+input; the parquet double round-trip
    is exact)."""
    g = host_graph(extract_links(pages_small)).cache()
    sd = str(tmp_path / "pr_state")
    fresh = sorted(map(tuple, domain_pagerank(g, iters=4).collect()))

    partial = domain_pagerank(g, iters=2, state_dir=sd)
    partial.collect()  # runs rounds 1-2, committing each
    from logport_spark.plans.iterstate import IterState, input_fp

    fp = input_fp(g, "src_domain", "dst_domain", "n_links")
    n = (g.select(F.col("src_domain").alias("d"))
         .union(g.select("dst_domain")).distinct().count())
    st = IterState(spark, sd, fp, {"algo": "pagerank_v1",
                                   "damping": repr(0.85), "n": n})
    assert st.latest_round() == 2

    resumed = sorted(map(tuple,
                         domain_pagerank(g, iters=4, state_dir=sd).collect()))
    assert resumed == fresh
    assert st.latest_round() == 4
    # idempotent re-invocation: everything committed, zero new rounds run
    again = sorted(map(tuple,
                       domain_pagerank(g, iters=4, state_dir=sd).collect()))
    assert again == fresh


def test_pagerank_state_refuses_drift(spark, pages_small, tmp_path):
    """Resuming against a different graph or different damping RAISES
    (the ledger input-drift contract): silently continuing someone
    else's rounds would produce wrong ranks with no signal."""
    import pytest as _pytest

    g = host_graph(extract_links(pages_small)).cache()
    sd = str(tmp_path / "pr_state2")
    domain_pagerank(g, iters=1, state_dir=sd).collect()

    g2 = g.filter(F.col("src_domain") != F.col("dst_domain")).limit(5)
    with _pytest.raises(ValueError, match="different run"):
        domain_pagerank(g2, iters=2, state_dir=sd).collect()
    with _pytest.raises(ValueError, match="different run"):
        domain_pagerank(g, iters=2, damping=0.5, state_dir=sd).collect()
