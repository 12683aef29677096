"""Hypothesis property tests that drive the SPARK operators against
pure-Python reference implementations on randomized whole tables — the
complement to test_properties_hypothesis.py (pure kernels) and the fixed
DuckDB oracles (one dataset): each example is a small random table, so
the properties sweep input shapes the fixtures never contain (deep
chains, rule shadowing, tie pile-ups). Few examples, whole-table
compares — Spark jobs are per-example, so max_examples stays small."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SPARK_SETTINGS = dict(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)

NODES = [f"n{i}" for i in range(12)]


@given(edges=st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)),
    min_size=1, max_size=30))
@settings(**SPARK_SETTINGS)
def test_resolve_redirects_matches_python_walk(spark, edges):
    """On ANY random functional-ized graph (dup srcs collapse to
    min(dst)), the engine equals a step-at-a-time Python walk capped at
    16 hops — chains, rho tails, self-loops, and cycles included."""
    from logport_spark.operators.linkgraph import resolve_redirects

    fn = {}
    for s, d in edges:
        fn[s] = min(fn[s], d) if s in fn else d
    expect = {}
    for s in fn:
        ptr, hops = fn[s], 1
        while hops < 16 and ptr in fn:
            ptr, hops = fn[ptr], hops + 1
        expect[s] = (ptr, hops, ptr in fn)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["src"]: (r["final_url"], r["hops"], r["cyclic"])
           for r in resolve_redirects(df, max_hops=16).collect()}
    assert got == expect


_RULE_LINES = st.sampled_from([
    "User-agent: *",
    "User-agent: evilbot",
    "Allow: /a",
    "Allow: /a/b",
    "Disallow: /a",
    "Disallow: /a/b/c",
    "Disallow: /b",
    "Allow:",            # empty value — never matches
    "Crawl-delay: 2",
    "# comment",
    "",
    "garbage line without a field",
])
_PATHS = st.sampled_from(["/a", "/a/b", "/a/b/c", "/a/bx", "/b", "/c", "/"])


def _py_robots_verdict(lines: list[str], path: str):
    """Reference RFC 9309 subset: record grouping, '*'-agent rules,
    longest prefix wins, allow beats disallow on ties, default allow."""
    recs, cur_agents, cur_rules, in_ua = [], [], [], False
    for raw in lines:
        line = raw.split("#")[0]
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip().split()[0] if value.strip() else ""
        if not field or not field.replace("-", "").isalpha():
            continue
        if field == "user-agent":
            if not in_ua:
                if cur_agents:
                    recs.append((cur_agents, cur_rules))
                cur_agents, cur_rules, in_ua = [], [], True
            cur_agents.append(value.lower())
        else:
            in_ua = False
            if cur_agents:
                cur_rules.append((field, value))
    if cur_agents:
        recs.append((cur_agents, cur_rules))
    rules = [r for agents, rs in recs if "*" in agents for r in rs]
    best, delay = None, None
    for field, value in rules:
        if field == "crawl-delay" and value:
            try:
                d = float(value)
                delay = d if delay is None else max(delay, d)
            except ValueError:
                pass
        if field in ("allow", "disallow") and value and path.startswith(value):
            pri = len(value) * 2 + (1 if field == "allow" else 0)
            if best is None or pri > best[0]:
                best = (pri, field == "allow")
    return (best[1] if best else True), delay


@given(lines=st.lists(_RULE_LINES, min_size=1, max_size=14),
       paths=st.lists(_PATHS, min_size=1, max_size=6, unique=True))
@settings(**SPARK_SETTINGS)
def test_robots_pipeline_matches_python_reference(spark, lines, paths):
    """parse_robots + robots_filter on ANY random rule file equals the
    reference implementation of the documented grammar + precedence."""
    from logport_spark.operators.linkgraph import parse_robots, robots_filter

    body = "\n".join(lines)
    robots = spark.createDataFrame([("h", body)], "host string, body string")
    urls = spark.createDataFrame([(f"https://h{p}",) for p in paths],
                                 "url string")
    got = {r["url"]: (r["allowed"], r["crawl_delay"])
           for r in robots_filter(urls, parse_robots(robots)).collect()}
    for p in paths:
        assert got[f"https://h{p}"] == _py_robots_verdict(lines, p), (
            body, p)


@given(rows=st.lists(
    st.tuples(st.integers(0, 10_000),
              st.floats(min_value=0.1, max_value=50.0,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=40, unique_by=lambda t: t[0]),
    k=st.integers(1, 10))
@settings(**SPARK_SETTINGS)
def test_weighted_sample_matches_python_reference(spark, rows, k):
    """A-ES on ANY random (id, weight) table equals the Python
    re-derivation: same keys, same top-k, same order under the
    (es_key DESC, id) tiebreak."""
    from logport_spark.operators.sampling import weighted_sample

    def es_key(i, w):
        v = int(hashlib.md5(f"ws42{i}".encode()).hexdigest()[:8], 16)
        return round(math.log((v + 0.5) / 4294967296.0) / w, 8)

    expect = sorted(rows, key=lambda r: (-es_key(r[0], r[1]), r[0]))[:k]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [(r["doc_id"], r["w"]) for r in
           weighted_sample(df, k=k, weight_col="w")
           .orderBy("es_key", ascending=False).collect()]
    got.sort(key=lambda r: (-es_key(r[0], r[1]), r[0]))
    assert got == expect


_MARKER_TOKENS = ["the", "and", "der", "und", "los", "que",
                  "les", "une", "nao", "com", "xyz", "qqq"]


@given(docs=st.lists(
    st.lists(st.lists(st.sampled_from(_MARKER_TOKENS), min_size=0,
                      max_size=6),
             min_size=1, max_size=6),
    min_size=1, max_size=6))
@settings(**SPARK_SETTINGS)
def test_lang_segments_matches_python_reference(spark, docs):
    """On ANY random doc set (lines of random marker/non-marker tokens),
    the rollup equals a reference: per-line marker argmax (tie -> lang
    ASC, none -> und), dominant by (count DESC, lang ASC)."""
    from logport_spark.operators.textstats import LANG_MARKERS, lang_segments

    def line_lang(toks):
        hits = {lang: sum(t in LANG_MARKERS[lang] for t in toks)
                for lang in LANG_MARKERS}
        best = max(hits.values())
        if best == 0:
            return "und"
        return min(l for l, h in hits.items() if h == best)

    rows, expect = [], {}
    for i, lines in enumerate(docs):
        text = "\n".join(" ".join(toks) if toks else "" for toks in lines)
        rows.append((i, text))
        langs = [line_lang(toks) for toks in lines if toks]
        if not langs:
            continue  # all-empty lines: no row, like the engine
        counts = {}
        for lg in langs:
            counts[lg] = counts.get(lg, 0) + 1
        dom = min(counts, key=lambda lg: (-counts[lg], lg))
        frac = round(counts[dom] / len(langs), 6)
        expect[i] = (len(langs), len(counts), dom, frac,
                     counts[dom] / len(langs) < 0.8)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_langs"], r["dominant_lang"],
                         r["dominant_frac"], r["mixed"])
           for r in lang_segments(df).collect()}
    assert got == expect


@given(edges=st.lists(
    st.tuples(st.sampled_from([f"s{i}" for i in range(6)]),
              st.sampled_from([f"d{i}" for i in range(6)])),
    min_size=1, max_size=25),
    cap=st.sampled_from([2, 4, None]))
@settings(**SPARK_SETTINGS)
def test_cocitation_matches_python_reference(spark, edges, cap):
    """On ANY random bipartite-ish edge list, co-citation pairs equal
    the reference: distinct edges, fan-out cap, common in-linker counts,
    Jaccard over post-cap in-degrees, min_common=2."""
    from pyspark.sql import functions as F

    from logport_spark.operators.linkgraph import cocitation_pairs

    ed = set(edges)
    if cap is not None:
        fan = {}
        for s, d in ed:
            fan[s] = fan.get(s, 0) + 1
        ed = {(s, d) for s, d in ed if fan[s] <= cap}
    inl = {}
    for s, d in ed:
        inl.setdefault(d, set()).add(s)
    expect = {}
    ds = sorted(inl)
    for i, d1 in enumerate(ds):
        for d2 in ds[i + 1:]:
            common = len(inl[d1] & inl[d2])
            if common >= 2:
                j = round(common / (len(inl[d1]) + len(inl[d2]) - common), 6)
                expect[(d1, d2)] = (common, j)
    g = spark.createDataFrame(list(edges),
                              "src_domain string, dst_domain string") \
        .withColumn("n_links", F.lit(1)).withColumn("n_src_pages", F.lit(1))
    got = {(r["d1"], r["d2"]): (r["n_common"], r["jaccard"])
           for r in cocitation_pairs(g, min_common=2, max_fanout=cap)
           .collect()}
    assert got == expect


@given(snap=st.lists(
    st.tuples(st.sampled_from([f"https://h{i}/p/{j}"
                               for i in range(3) for j in range(4)]),
              st.sampled_from(["x", "y", "z"]),       # old content
              st.sampled_from(["x", "y", "z", None])  # new content (None=dropped)
              ),
    min_size=1, max_size=12, unique_by=lambda t: t[0]),
    fresh=st.lists(
        st.sampled_from([f"https://h{i}/q/{j}"
                         for i in range(3) for j in range(2)]),
        max_size=4, unique=True))
@settings(**SPARK_SETTINGS)
def test_recrawl_policy_matches_python_reference(spark, snap, fresh):
    """On ANY random pair of snapshots (changed / unchanged / dropped /
    brand-new urls), per-host change fractions and clamped quadratic
    intervals equal the reference."""
    from logport_spark.operators.linkgraph import recrawl_policy

    old_rows = [(u, o) for u, o, _ in snap]
    new_rows = [(u, n) for u, _, n in snap if n is not None] + \
        [(u, "fresh") for u in fresh]
    host = lambda u: u.split("/")[2]
    agg = {}
    olds = dict(old_rows)
    for u, n in new_rows:
        h = agg.setdefault(host(u), [0, 0, 0])  # n_urls, n_changed, n_old
        h[0] += 1
        if u in olds:
            h[2] += 1
            if olds[u] != n:
                h[1] += 1
    expect = {}
    for h, (nu, nc, no) in agg.items():
        frac = nc / max(no, 1)
        expect[h] = (nu, nc, round(frac, 6),
                     max(math.floor(16 * (1.0 - frac) * (1.0 - frac)), 1))
    old = spark.createDataFrame(old_rows, "url string, text string")
    new = spark.createDataFrame(new_rows, "url string, text string")
    got = {r["domain"]: (r["n_urls"], r["n_changed"], r["change_frac"],
                         r["interval"])
           for r in recrawl_policy(old, new, html_col="text",
                                   binary=False).collect()}
    assert got == expect


# ------------------------------------------------------------------ PQ --

_COMP = st.sampled_from([-2.0, -1.0, -0.5, 0.5, 1.0, 2.0])
_VEC4 = st.lists(_COMP, min_size=4, max_size=4)


def _seq_l2(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc += d * d
    return acc


def _seq_dot_py(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _norm_py(v):
    acc = 0.0
    for x in v:
        acc += float(x) * float(x)
    return acc ** 0.5


def _ref_encode(vecs, cbs, m, ksub, dsub):
    codes = []
    for v in vecs:
        cs = []
        for s in range(m):
            d = [_seq_l2(v[s * dsub:(s + 1) * dsub], cbs[s][j])
                 for j in range(ksub)]
            cs.append(d.index(min(d)) + 1)  # first min, 1-based
        codes.append(cs)
    return codes


def _ref_rerank(vecs, q, cand_ids, k):
    qn = _norm_py(vecs[q])
    scored = sorted(
        (-(_seq_dot_py(vecs[q], vecs[i]) / (qn * _norm_py(vecs[i]))), i)
        for i in cand_ids)
    return [(q, i, -negcos, r + 1)
            for r, (negcos, i) in enumerate(scored[:k])]


@given(vals=st.lists(_VEC4, min_size=10, max_size=18),
       qa=st.integers(0, 997), qb=st.integers(0, 997))
@settings(**SPARK_SETTINGS)
def test_pq_topk_matches_python_reference(spark, vals, qa, qb):
    """On ANY random small corpus (tie-heavy component pool), PQ codes
    AND the final reranked top-k equal a pure-Python replay of the whole
    pipeline: stand-in codebooks -> first-min encode -> per-query LUT ->
    (adc ASC, id ASC) top-rerank -> sequential-fold cosine rerank. The
    engine side crosses numpy Arrow batches, constant-folded LUT
    literals, and the salted two-phase window; the reference is plain
    Python floats — bit-parity of every fold is the property."""
    from logport_spark.operators.similarity import pq_encode, pq_topk

    m, ksub, k, rerank = 2, 4, 3, 5
    n, dsub = len(vals), 2
    qids = sorted({qa % n, qb % n})
    cbs = [[vals[i][s * dsub:(s + 1) * dsub] for i in range(ksub)]
           for s in range(m)]
    ref_codes = _ref_encode(vals, cbs, m, ksub, dsub)
    expect = []
    for q in qids:
        lut = [_seq_l2(vals[q][s * dsub:(s + 1) * dsub], cbs[s][j])
               for s in range(m) for j in range(ksub)]
        adc = []
        for i in range(n):
            if i == q:
                continue
            a = 0.0
            for s in range(m):
                a += lut[s * ksub + ref_codes[i][s] - 1]
            adc.append((a, i))
        cands = [i for _, i in sorted(adc)[:rerank]]
        expect.extend(_ref_rerank(vals, q, cands, k))

    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "vec_id long, embedding array<double>")
    got_codes = {int(r["_id"]): list(r["codes"])
                 for r in pq_encode(emb, cbs).collect()}
    assert got_codes == {i: c for i, c in enumerate(ref_codes)}
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in pq_topk(emb, qids, k=k, m=m, ksub=ksub,
                         rerank=rerank, n_salts=3).collect())
    expect = sorted(expect)
    assert [(g[0], g[1], g[3]) for g in got] == \
        [(e[0], e[1], e[3]) for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[2] - e[2]) <= 1e-4  # engine rounds cos to 4 places


def _ref_cell(v, cents):
    scores = []
    for c in cents:
        scores.append(_seq_dot_py(v, c) / _norm_py(c))
    return scores.index(max(scores)) + 1  # first max, 1-based


@given(vals=st.lists(_VEC4, min_size=12, max_size=18),
       qa=st.integers(0, 997), qb=st.integers(0, 997))
@settings(**SPARK_SETTINGS)
def test_ivfpq_topk_matches_python_reference(spark, vals, qa, qb):
    """IVF∘PQ end-to-end vs a pure-Python replay: coarse cells (first-max
    normalized dot), residual codebooks from the ksub lowest non-centroid
    ids, residual encode, nprobe cell probing with per-(query,cell) LUTs,
    (adc ASC, id ASC) top-rerank, cosine rerank — candidates only from
    probed cells, exactly as the broadcast join prunes them."""
    from logport_spark.operators.similarity import ivfpq_topk

    m, ksub, nlist, nprobe, k, rerank = 2, 4, 4, 2, 3, 5
    n, dsub = len(vals), 2
    qids = sorted({qa % n, qb % n})
    cents = [vals[i] for i in range(nlist)]
    cbs = [[] for _ in range(m)]
    for i in range(nlist, nlist + ksub):
        cell = _ref_cell(vals[i], cents)
        res = [x - c for x, c in zip(vals[i], cents[cell - 1])]
        for s in range(m):
            cbs[s].append(res[s * dsub:(s + 1) * dsub])
    cells, codes = [], []
    for v in vals:
        cell = _ref_cell(v, cents)
        res = [x - c for x, c in zip(v, cents[cell - 1])]
        cells.append(cell)
        codes.append(_ref_encode([res], cbs, m, ksub, dsub)[0])
    expect = []
    for q in qids:
        scores = [(_seq_dot_py(vals[q], c) / _norm_py(c), i + 1)
                  for i, c in enumerate(cents)]
        probed = [cell for _, cell in
                  sorted(scores, key=lambda t: (-t[0], t[1]))[:nprobe]]
        adc = []
        for cell in probed:
            resq = [x - c for x, c in zip(vals[q], cents[cell - 1])]
            lut = [_seq_l2(resq[s * dsub:(s + 1) * dsub], cbs[s][j])
                   for s in range(m) for j in range(ksub)]
            for i in range(n):
                if i == q or cells[i] != cell:
                    continue
                a = 0.0
                for s in range(m):
                    a += lut[s * ksub + codes[i][s] - 1]
                adc.append((a, i))
        cands = [i for _, i in sorted(adc)[:rerank]]
        expect.extend(_ref_rerank(vals, q, cands, k))

    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "vec_id long, embedding array<double>")
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in ivfpq_topk(emb, qids, k=k, nlist=nlist, nprobe=nprobe,
                            m=m, ksub=ksub, rerank=rerank,
                            n_salts=3).collect())
    expect = sorted(expect)
    assert [(g[0], g[1], g[3]) for g in got] == \
        [(e[0], e[1], e[3]) for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[2] - e[2]) <= 1e-4


@given(docs=st.lists(
    st.lists(st.text(alphabet="ab", min_size=1, max_size=6),
             min_size=0, max_size=8),
    min_size=1, max_size=6),
    k=st.sampled_from([1, 4]))
@settings(**SPARK_SETTINGS)
def test_bpe_encode_matches_python_reference(spark, docs, k):
    """bpe_encode (train k merges, then the padded-replace encode) equals
    a pure-Python reference on ANY random 2-char corpus: the reference
    trains Sennrich-style, then re-tokenizes every doc word with the
    greedy non-overlapping merge scan in learned order. Also pins the
    round-trip invariant: concatenating a doc's pieces restores its text
    with spaces removed (no byte is ever lost or invented)."""
    from collections import Counter

    from logport_spark.operators.textstats import bpe_encode, bpe_train

    texts = [" ".join(ws) for ws in docs]
    words = [w for ws in docs for w in ws if w]

    def fold(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    wc = Counter(words)
    vocab = {w: [ch for ch in w] for w in wc}
    merges = []
    for _ in range(k):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), _cnt = min(pc.items(),
                           key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merges.append((a, b))
        vocab = {w: fold(syms, a, b) for w, syms in vocab.items()}

    expect = {}
    for i, ws in enumerate(docs):
        toks = [w for w in ws if w]
        if not toks:
            continue
        pieces = [p for w in toks for p in vocab[w]]
        expect[i] = (len(toks), len(pieces), " ".join(pieces[:12]))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    table = bpe_train(df, n_merges=k).collect()
    learned = [tuple(r["pair"].split(" "))
               for r in sorted(table, key=lambda r: r["step"])]
    assert learned == merges
    got = {r.doc_id: (r.n_words, r.n_pieces, r.head_pieces)
           for r in bpe_encode(df, learned).collect()}
    assert got == expect
    for i, (_nw, _np, _hd) in got.items():
        full = [p for w in texts[i].split(" ") if w for p in vocab[w]]
        assert "".join(full) == texts[i].replace(" ", "")


@given(words=st.lists(
    st.text(alphabet="ab", min_size=1, max_size=6),
    min_size=1, max_size=20),
    k=st.sampled_from([1, 3]))
@settings(**SPARK_SETTINGS)
def test_bpe_train_matches_python_reference(spark, words, k):
    """On ANY random word bag over a 2-char alphabet (run pile-ups like
    'aaaa' stress the greedy non-overlapping scan; tiny alphabet forces
    count ties at the argmax), the distributed merge loop equals a pure
    Sennrich-style reference trainer: same (cnt desc, pair asc) argmax,
    same greedy left-to-right within-word merges, same early stop when no
    adjacent pair remains."""
    from collections import Counter

    from logport_spark.operators.textstats import bpe_train

    wc = Counter(words)
    vocab = [([ch for ch in w], c) for w, c in wc.items()]
    expect = []
    for step in range(1, k + 1):
        pc = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(),
                          key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        expect.append((step, f"{a} {b}", cnt, a + b))
        nxt = []
        for syms, c in vocab:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, c))
        vocab = nxt

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = [(r["step"], r["pair"], r["cnt"], r["token"])
           for r in bpe_train(df, n_merges=k).collect()]
    assert got == expect


@given(rows=st.lists(
    st.tuples(
        st.lists(st.sampled_from(["the", "and", "xyz", "Qq9", "of", "zzz"]),
                 min_size=1, max_size=8),
        st.sampled_from(["en", "de", "fr"])),
    min_size=1, max_size=16),
    steps=st.sampled_from([1, 3]))
@settings(**SPARK_SETTINGS)
def test_quality_lr_train_matches_python_reference(spark, rows, steps):
    """On ANY random doc table, the distributed GD trace equals a pure
    Python trainer replicating the exact pipeline: 4dp-rounded features,
    sigmoid/log-loss gradients, 8dp state quantization per step.
    Comparison tolerances sit at the quantization quantum — engine
    summation-order ULPs are the only allowed divergence; any semantic
    bug lands orders of magnitude outside them."""
    import math
    import re

    from logport_spark.operators.textstats import STOPWORDS, quality_lr_train

    feats = []
    for toks, lang in rows:
        text = " ".join(toks)
        n_tok = len(text.split(" "))
        n_chars = len(text)
        n_stop = sum(t in STOPWORDS for t in text.split(" "))
        n_alpha = len(re.findall(r"[a-zA-Z]", text))
        feats.append((
            round(min(n_stop / max(n_tok, 1) * 5, 1.0), 4),
            round(n_alpha / max(n_chars, 1), 4),
            round(min(n_tok / 100.0, 1.0), 4),
            1.0 if lang == "en" else 0.0))
    w, expect = [0.0] * 4, []
    for step in range(1, steps + 1):
        g, loss = [0.0] * 4, 0.0
        for x1, x2, x3, y in feats:
            p = 1.0 / (1.0 + math.exp(-(w[0] + w[1] * x1 + w[2] * x2
                                        + w[3] * x3)))
            for j, xj in enumerate((1.0, x1, x2, x3)):
                g[j] += (p - y) * xj
            loss += -(y * math.log(p) + (1.0 - y) * math.log(1.0 - p))
        n = len(feats)
        w = [round(w[j] - 1.0 * g[j] / n, 8) for j in range(4)]
        expect.append((step, *w, round(loss / n, 4)))

    df = spark.createDataFrame(
        [(" ".join(toks), lang) for toks, lang in rows],
        "text string, lang string")
    got = [(r.step, r.w_bias, r.w_stop, r.w_alpha, r.w_len, r.loss_pre)
           for r in quality_lr_train(df, steps=steps).collect()]
    assert len(got) == len(expect)
    for g_row, e_row in zip(got, expect):
        assert g_row[0] == e_row[0]
        for gv, ev in zip(g_row[1:5], e_row[1:5]):
            assert abs(gv - ev) <= 2e-8, (g_row, e_row)
        assert abs(g_row[5] - e_row[5]) <= 1.1e-4, (g_row, e_row)


@given(payloads=st.lists(st.binary(min_size=0, max_size=300),
                         min_size=1, max_size=12))
@settings(**SPARK_SETTINGS)
def test_phash60_matches_python_reference(spark, payloads):
    """phash60's 60 codegen byte probes equal a pure-Python re-derivation
    on ANY random binary payloads (empty blobs hash to 0; every hash is a
    non-negative 60-bit value)."""
    from logport_spark.operators.multimodal import phash60

    def ref(payload: bytes) -> int:
        n = len(payload)
        h = 0
        for i in range(60):
            if n and payload[(i * n) // 60] >= 128:
                h |= 1 << i
        return h

    pages = spark.createDataFrame(
        [(f"u{i}", p) for i, p in enumerate(payloads)],
        "url string, html binary")
    got = {r.url: r.phash for r in phash60(pages, fake_decode=True).collect()}
    for i, p in enumerate(payloads):
        assert got[f"u{i}"] == ref(p), (i, p)
        assert 0 <= got[f"u{i}"] < (1 << 60)


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 19), st.integers(0, 19)),
        min_size=0, max_size=24),
    split=st.integers(0, 24),
)
@settings(**SPARK_SETTINGS)
def test_update_clusters_equals_full_recompute(spark, pairs, split):
    """Incremental clustering (dedup.update_clusters) is bit-identical to
    connected_components over the full pair history, for every random
    two-batch split: the committed state is contracted to super-nodes,
    the propagation runs on the batch-sized graph only, and min-doc_id
    labels stay canonical (cross-batch merges of two committed clusters
    included). Nodes 0..19; batch 2 may touch old docs, new docs, both."""
    from logport_spark.operators.dedup import (connected_components,
                                               update_clusters)

    pairs = [(min(a, b), max(a, b)) for a, b in pairs if a != b]
    b1, b2 = pairs[:split], pairs[split:]
    n1 = sorted({d for p in b1 for d in p} | set(range(10)))
    all_nodes = sorted(set(n1) | {d for p in b2 for d in p} | {25})

    def df_pairs(ps):
        return spark.createDataFrame(ps or [(None, None)],
                                     "d1 long, d2 long").dropna()

    def df_nodes(ids):
        return spark.createDataFrame([(i,) for i in ids], "doc_id long")

    state = connected_components(df_pairs(b1), df_nodes(n1))
    inc = update_clusters(
        state, df_pairs(b2),
        new_nodes=df_nodes(sorted(set(all_nodes) - set(n1))))
    full = connected_components(df_pairs(pairs), df_nodes(all_nodes))
    got = {(r.doc_id, r.cluster_id) for r in inc.collect()}
    want = {(r.doc_id, r.cluster_id) for r in full.collect()}
    assert got == want


@given(lens=st.lists(st.integers(1, 130), min_size=1, max_size=40))
@settings(**SPARK_SETTINGS)
def test_pack_nosplit_matches_python_ffd_and_beats_first_fit(spark, lens):
    """No-split packing (sampling.pack_sequences_nosplit): matches an
    independent pure-Python FFD per shard (same sort, same first-fit
    placement), every non-oversize pack fits the window, oversize docs sit
    alone and flagged, the assignment is repartition-invariant, and total
    padding never exceeds the naive in-order first-fit loader's."""
    from logport_spark.operators.sampling import pack_sequences_nosplit

    W = 100
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string")
    out = pack_sequences_nosplit(docs, window_tokens=W, n_shards=4)
    rows = out.collect()

    # python reference, per shard
    import hashlib
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, n in enumerate(lens):
        sh = int(hashlib.md5(f"pack{i}".encode()).hexdigest()[:8], 16) % 4
        by_shard.setdefault(sh, []).append((n, i))
    want = {}
    for sh, items in by_shard.items():
        fills: list[int] = []
        for n, i in sorted(items, key=lambda x: (-x[0], x[1])):
            for b, f in enumerate(fills):
                if n <= W - f:
                    fills[b] = f + n
                    want[i] = (sh, b)
                    break
            else:
                fills.append(n)
                want[i] = (sh, len(fills) - 1)
    got = {r.doc_id: (r.shard, r.pack_id) for r in rows}
    assert got == want

    fill = {}
    for r in rows:
        fill[(r.shard, r.pack_id)] = fill.get((r.shard, r.pack_id), 0) + r.n_tokens
    for r in rows:
        assert r.pack_tokens == fill[(r.shard, r.pack_id)]
        assert r.oversize == (r.n_tokens > W)
        if r.oversize:
            assert fill[(r.shard, r.pack_id)] == r.n_tokens  # alone
        else:
            assert fill[(r.shard, r.pack_id)] <= W

    # repartition invariance
    out2 = {r.doc_id: (r.shard, r.pack_id) for r in
            pack_sequences_nosplit(docs.repartition(7), window_tokens=W,
                                   n_shards=4).collect()}
    assert out2 == got

    # padding vs the naive in-order first-fit loader (per shard, doc_id
    # order, new pack when the next doc doesn't fit)
    def padding(pack_fill):
        return sum(W - f for f in pack_fill if f <= W)

    ffd_pads = naive_pads = 0
    for sh, items in by_shard.items():
        packs = {}
        for i, (s, b) in want.items():
            if s == sh:
                packs[b] = packs.get(b, 0) + lens[i]
        ffd_pads += padding(packs.values())
        cur, naive_packs = 0, []
        for n, i in sorted(items, key=lambda x: x[1]):
            if n > W:
                if cur:
                    naive_packs.append(cur)
                    cur = 0
                naive_packs.append(n)
            elif cur + n <= W:
                cur += n
            else:
                naive_packs.append(cur)
                cur = n
        if cur:
            naive_packs.append(cur)
        naive_pads += padding(naive_packs)
    # NOT ffd <= naive strictly: first-fit anomalies are real — e.g.
    # [26,43,28,64,27,9] at W=100 packs to 2 bins in arrival order but 3
    # under FFD (search script finding, session 13). The sound per-shard
    # bound is one window of slack; the aggregate win on real corpora is
    # measured in BENCH/BASELINE.md, not asserted per-instance.
    assert ffd_pads <= naive_pads + 100 * len(by_shard)


@given(
    vals=st.lists(st.integers(0, 1000), min_size=1, max_size=60),
    lo=st.integers(-50, 1050),
    span=st.integers(0, 300),
    nf=st.integers(1, 6),
)
@settings(**{**SPARK_SETTINGS, "max_examples": 5})
def test_manifest_pruning_conservative_on_random_layouts(
        spark, tmp_path_factory, vals, lo, span, nf):
    """Manifest pruning is conservative-correct for RANDOM data, random
    [lo, hi] predicates (empty, partial, out-of-range), and random file
    counts: pruned_read + the row filter returns exactly the full scan's
    rows, and every file holding a matching row survives the prune."""
    from pyspark.sql import functions as F

    from logport_spark.plans.manifest import (pruned_files, pruned_read,
                                              write_manifest)

    hi = lo + span
    p = str(tmp_path_factory.mktemp("manprop"))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long")
    df.repartition(nf).write.mode("overwrite").parquet(p)
    write_manifest(spark, p, ["v"])

    want = sorted(i for i, v in enumerate(vals) if lo <= v <= hi)
    got = sorted(r.id for r in
                 pruned_read(spark, p, "v", lo, hi)
                 .filter((F.col("v") >= lo) & (F.col("v") <= hi)).collect())
    assert got == want

    kept = set(pruned_files(spark, p, "v", lo, hi))
    full = spark.read.parquet(p)
    needed = {r.f for r in full
              .filter((F.col("v") >= lo) & (F.col("v") <= hi))
              .select(F.input_file_name().alias("f")).distinct().collect()}
    assert needed <= kept


@given(word=st.text(alphabet="abc", min_size=1, max_size=7),
       data=st.data())
@settings(max_examples=60, deadline=None)
def test_unigram_viterbi_kernel_matches_bruteforce(word, data):
    """The shared Viterbi kernel equals brute-force enumeration of ALL
    segmentations under the documented total order (score desc, fewer
    pieces, lexicographic path) — random words, random piece tables."""
    from logport_spark.operators.textstats import _unigram_viterbi

    pieces = set("abc")
    for i in range(len(word)):
        for j in range(i + 1, min(len(word), i + 4) + 1):
            if data.draw(st.booleans()):
                pieces.add(word[i:j])
    logp = {p: round(data.draw(st.floats(-8, -0.1)), 6) for p in pieces}

    def segs(w):
        if not w:
            yield ()
            return
        for k in range(1, min(len(w), 4) + 1):
            if w[:k] in logp:
                for rest in segs(w[k:]):
                    yield (w[:k],) + rest

    # tie order on path: lexicographically SMALLER wins -> compare directly
    best = None
    for s in segs(word):
        cand = (sum(logp[p] for p in s), -len(s), s)
        if best is None or (cand[0], cand[1]) > (best[0], best[1]) or (
                (cand[0], cand[1]) == (best[0], best[1]) and s < best[2]):
            best = cand
    want = list(best[2])
    got = _unigram_viterbi(word, logp, 4)
    assert got == want


@given(docs=st.lists(st.lists(st.sampled_from(
    ["abab", "abc", "cd", "ababcd", "a", "dcba"]),
    min_size=1, max_size=5), min_size=1, max_size=5))
@settings(**{**SPARK_SETTINGS, "max_examples": 5})
def test_unigram_train_matches_python_reference(spark, docs):
    """Full unigram-LM training pipeline (seed -> Viterbi-EM -> prune)
    equals an independent Python driver over the same word counts, piece
    for piece and logp for logp."""
    import math

    from logport_spark.operators.textstats import (_unigram_viterbi,
                                                   unigram_train)

    VS, SS, MPL, EM, KF = 12, 40, 3, 2, 0.75
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string")
    got = {(r.piece, r.logp) for r in
           unigram_train(df, vocab_size=VS, seed_size=SS, max_piece_len=MPL,
                         em_rounds=EM, keep_frac=KF).collect()}

    wc: dict[str, int] = {}
    for ws in docs:
        for w in ws:
            wc[w] = wc.get(w, 0) + 1
    sub: dict[str, int] = {}
    for w, c in wc.items():
        for L in range(1, MPL + 1):
            for i in range(len(w) - L + 1):
                sub[w[i:i + L]] = sub.get(w[i:i + L], 0) + c
    ranked = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))
    cnt = dict(ranked[:SS])
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    for ch, c in chars.items():
        cnt.setdefault(ch, c)

    def norm(d):
        tot = float(sum(d.values()))
        return {p: round(math.log2(c / tot), 6) for p, c in d.items()}

    logp = norm(cnt)
    rounds = EM
    v = len(logp)
    while v > VS:
        v = max(VS, int(v * KF))
        rounds += 1
    for _ in range(rounds):
        acc: dict[str, int] = {}
        for w, c in wc.items():
            for piece in _unigram_viterbi(w, logp, MPL) or []:
                acc[piece] = acc.get(piece, 0) + c
        cnt = acc
        for ch in chars:
            cnt.setdefault(ch, 1)
        if len(cnt) > VS:
            target = max(VS, int(len(cnt) * KF))
            keep = dict(sorted(cnt.items(),
                               key=lambda kv: (-kv[1], kv[0]))[:target])
            for ch in chars:
                keep.setdefault(ch, cnt.get(ch, 1))
            cnt = keep
        logp = norm(cnt)
    assert got == set(logp.items())
