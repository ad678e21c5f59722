"""Match-set operators (engine/matchops.py): exact counting, docvalue
stats over the match set, more-like-this — each differentially tested
against a pure-Python/pandas reference over the same frozen corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import matchops as M, query as Q
from engine.analyzer import tokenize_py
from engine.build import build_index
from engine.config import DEFAULT, IndexConfig


@pytest.fixture(scope="module")
def midx(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("matchidx") / "packed")
    return build_index(spark, corpus_df, d,
                       cfg=IndexConfig(doc_values=("role", "ts")))


@pytest.fixture(scope="module")
def tok_rows(corpus_pdf):
    """Per-doc token sets/lists in doc_id (stable) order — the reference
    the count/stats expectations derive from."""
    return [set(tokenize_py(t, DEFAULT.analyzer)) for t in corpus_pdf.text]


def _expect_ids(tok_rows, terms, mode, pdf=None, pred=None, neg=()):
    terms = set(terms)
    out = []
    for i, toks in enumerate(tok_rows):
        hit = terms <= toks if mode == "AND" else bool(terms & toks)
        if hit and neg and (set(neg) & toks):
            hit = False
        if hit and pred is not None and not pred(pdf.iloc[i]):
            hit = False
        if hit:
            out.append(i)
    return out


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_match_count_modes(midx, corpus_pdf, tok_rows):
    for terms, mode in [(["hot0", "hot1"], "OR"), (["hot0", "hot1"], "AND"),
                        (["rare0"], "OR"), (["nosuchterm"], "OR")]:
        want = len(_expect_ids(tok_rows, terms, mode))
        got = one(M.match_count(midx, " ".join(terms), mode=mode))["n_docs"]
        assert got == want, (terms, mode)


def test_match_count_excl_filters(midx, corpus_pdf, tok_rows):
    want = len(_expect_ids(tok_rows, ["hot0"], "OR", neg=["mid1"]))
    assert one(M.match_count(midx, "hot0", exclude="mid1"))["n_docs"] == want
    want = len(_expect_ids(tok_rows, ["hot0"], "OR", pdf=corpus_pdf,
                           pred=lambda r: r.role == "user"))
    assert one(M.match_count(midx, "hot0",
                             doc_filter="role = 'user'"))["n_docs"] == want
    assert one(M.match_count(midx, "hot0",
                             dv_filter="role = 'user'"))["n_docs"] == want


def test_match_count_agrees_with_search(midx):
    n = one(M.match_count(midx, "hot0 mid1", mode="AND"))["n_docs"]
    hits = Q.search(midx, "hot0 mid1", k=midx.n_docs, mode="AND").count()
    assert n == hits


def test_match_count_respects_tombstones(spark, midx, tmp_path):
    import shutil
    from engine.build import load_index
    from engine.deletes import delete_docs
    d = str(tmp_path / "cp")
    shutil.copytree(midx.index_dir, d)
    idx = load_index(spark, d)
    base = one(M.match_count(idx, "hot0"))["n_docs"]
    gone = delete_docs(idx, "role = 'tool' AND text LIKE '%hot0%'")
    assert gone > 0
    assert one(M.match_count(idx, "hot0"))["n_docs"] == base - gone


def test_match_stats_ts(midx, corpus_pdf, tok_rows):
    ids = _expect_ids(tok_rows, ["hot0", "hot1"], "AND")
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64)
    r = one(M.match_stats(midx, "hot0 hot1", "ts", mode="AND"))
    assert r["n_docs"] == len(ids) and r["n_with_value"] == len(ids)
    assert r["min_val"] == float(secs.min())
    assert r["max_val"] == float(secs.max())
    assert r["sum_val"] == float(secs.sum())
    assert r["avg_val"] == float(secs.sum()) / len(ids)


def test_match_stats_empty_and_validation(midx):
    r = one(M.match_stats(midx, "nosuchterm", "ts"))
    assert r["n_docs"] == 0
    with pytest.raises(ValueError, match="not a docvalue"):
        M.match_stats(midx, "hot0", "conv_id")
    with pytest.raises(ValueError, match="timestamp/integer"):
        M.match_stats(midx, "hot0", "role")


def test_match_cardinality_string_field(midx, corpus_pdf, tok_rows):
    for terms, mode in [(["hot0", "hot1"], "OR"), (["hot0", "mid1"], "AND"),
                        (["rare0"], "OR")]:
        ids = _expect_ids(tok_rows, terms, mode)
        want = corpus_pdf.iloc[ids].role.nunique()
        got = one(M.match_cardinality(midx, " ".join(terms), "role",
                                      mode=mode))["n_values"]
        assert got == want, (terms, mode)


def test_match_cardinality_ts_whole_seconds(midx, corpus_pdf, tok_rows):
    ids = _expect_ids(tok_rows, ["hot0"], "OR")
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64)
    got = one(M.match_cardinality(midx, "hot0", "ts"))["n_values"]
    assert got == len(np.unique(secs))


def test_match_cardinality_filters_and_empty(midx, corpus_pdf, tok_rows):
    ids = _expect_ids(tok_rows, ["hot0"], "OR", pdf=corpus_pdf,
                      pred=lambda r: r.role == "user")
    want = corpus_pdf.iloc[ids].role.nunique()  # == 1 by construction
    got = one(M.match_cardinality(midx, "hot0", "role",
                                  dv_filter="role = 'user'"))["n_values"]
    assert got == want
    assert one(M.match_cardinality(midx, "nosuchterm",
                                   "role"))["n_values"] == 0
    with pytest.raises(ValueError, match="not a docvalue"):
        M.match_cardinality(midx, "hot0", "conv_id")


def test_explain_score_sums_to_search_score(midx, corpus_pdf):
    top = Q.search(midx, "hot0 rare3 mid1", k=5).collect()
    for r in top:
        ex = Q.explain_score(midx, "hot0 rare3 mid1", r["doc_id"]).collect()
        # engine's frozen summation order is term asc
        tot = sum(e["contribution"]
                  for e in sorted(ex, key=lambda e: e["term"]))
        assert tot == r["score"], r["doc_id"]
        # tf/dl read from the INDEX must equal first-principles recompute
        toks = tokenize_py(corpus_pdf.iloc[r["doc_id"]].text,
                           DEFAULT.analyzer)
        for e in ex:
            assert e["tf"] == toks.count(e["term"])
            assert e["dl"] == len(toks)


def test_explain_score_absent_terms_and_validation(midx):
    ex = Q.explain_score(midx, "nosuchterm ghost0", 0)
    assert ex.count() == 0
    rows = Q.explain_score(midx, "hot0 nosuchterm", 0).collect()
    assert [e["term"] for e in rows] in ([], ["hot0"])  # absent term: no row
    with pytest.raises(ValueError, match="out of range"):
        Q.explain_score(midx, "hot0", midx.n_docs + 10).collect()


def test_match_histogram(midx, corpus_pdf, tok_rows):
    ids = _expect_ids(tok_rows, ["hot0", "hot1"], "AND")
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64)
    interval = 3600
    want = {}
    for s in (secs // interval) * interval:
        want[int(s)] = want.get(int(s), 0) + 1
    got = {r.bucket_start: r.n_docs for r in
           M.match_histogram(midx, "hot0 hot1", "ts", interval,
                             mode="AND").collect()}
    assert got == want and len(got) > 1
    # bucket_starts come back ordered
    bs = [r.bucket_start for r in
          M.match_histogram(midx, "hot0 hot1", "ts", interval,
                            mode="AND").collect()]
    assert bs == sorted(bs)


def test_match_histogram_filters_compose(midx, corpus_pdf, tok_rows):
    ids = _expect_ids(tok_rows, ["hot0"], "OR", pdf=corpus_pdf,
                      pred=lambda r: r.role == "user", neg=["mid1"])
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64)
    want = {}
    for s in (secs // 86400) * 86400:
        want[int(s)] = want.get(int(s), 0) + 1
    got = {r.bucket_start: r.n_docs for r in
           M.match_histogram(midx, "hot0", "ts", 86400, exclude="mid1",
                             dv_filter="role = 'user'").collect()}
    assert got == want


def test_match_histogram_pipeline(midx, corpus_pdf, tok_rows):
    """Densified buckets + cumulative sum + derivative vs a pandas
    reference built from the same raw timestamps."""
    ids = _expect_ids(tok_rows, ["rare0", "rare1"], "OR")
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64)
    interval = 3600
    counts = {}
    for s in (secs // interval) * interval:
        counts[int(s)] = counts.get(int(s), 0) + 1
    lo, hi = min(counts), max(counts)
    grid = list(range(lo, hi + 1, interval))
    n = [counts.get(b, 0) for b in grid]
    cum = np.cumsum(n).tolist()
    delta = [None] + [n[i] - n[i - 1] for i in range(1, len(n))]
    rows = M.match_histogram_pipeline(midx, "rare0 rare1", "ts", interval,
                                      mode="OR").collect()
    assert [r.bucket_start for r in rows] == grid
    assert [r.n_docs for r in rows] == n
    assert [r.cum_docs for r in rows] == cum
    assert [r.delta_docs for r in rows] == delta
    # gaps exist in this corpus (otherwise densification is untested)
    assert len(grid) > len(counts)


def test_match_histogram_pipeline_empty(midx):
    df = M.match_histogram_pipeline(midx, "nosuchterm", "ts", 3600)
    assert df.count() == 0
    assert df.columns == ["bucket_start", "n_docs", "cum_docs",
                          "delta_docs"]


@pytest.fixture(scope="module")
def sparse_idx(spark, corpus_df, tmp_path_factory):
    """Index whose 'opt' docvalue is NULL on every turn_idx==0 doc — the
    missing-agg tests need real NULLs (the fixture corpus has none)."""
    from pyspark.sql import functions as F
    d = str(tmp_path_factory.mktemp("sparseidx") / "packed")
    df = corpus_df.withColumn(
        "opt", F.when(F.col("turn_idx") == 0, F.lit(None))
        .otherwise(F.col("role")))
    return build_index(spark, df, d,
                       cfg=IndexConfig(doc_values=("role", "ts", "opt")))


def test_match_missing(sparse_idx, corpus_pdf, tok_rows):
    ids = _expect_ids(tok_rows, ["hot0", "mid1"], "OR")
    want_missing = int((corpus_pdf.iloc[ids].turn_idx == 0).sum())
    r = M.match_missing(sparse_idx, "hot0 mid1", "opt").collect()[0]
    assert (r.n_docs, r.n_missing) == (len(ids), want_missing)
    assert 0 < want_missing < len(ids)  # non-degenerate fixture
    # a column with no NULLs -> 0 missing
    r2 = M.match_missing(sparse_idx, "hot0 mid1", "role").collect()[0]
    assert (r2.n_docs, r2.n_missing) == (len(ids), 0)
    # composes with exclude + dv_filter
    ids3 = _expect_ids(tok_rows, ["hot0", "mid1"], "OR", pdf=corpus_pdf,
                       pred=lambda r: r.role == "user", neg=["rare0"])
    want3 = int((corpus_pdf.iloc[ids3].turn_idx == 0).sum())
    r3 = M.match_missing(sparse_idx, "hot0 mid1", "opt", exclude="rare0",
                         dv_filter="role = 'user'").collect()[0]
    assert (r3.n_docs, r3.n_missing) == (len(ids3), want3)
    # empty match set
    r4 = M.match_missing(sparse_idx, "nosuchterm", "opt").collect()[0]
    assert (r4.n_docs, r4.n_missing) == (0, 0)
    with pytest.raises(ValueError, match="not a docvalue column"):
        M.match_missing(sparse_idx, "hot0", "nope")


def test_match_string_stats(sparse_idx, corpus_pdf, tok_rows):
    import math
    from collections import Counter
    ids = _expect_ids(tok_rows, ["hot0", "mid1"], "OR")
    vals = corpus_pdf.iloc[ids].role.tolist()
    lens = [len(v) for v in vals]
    cc = Counter("".join(vals))
    total = sum(cc.values())
    ent = 0.0
    for ch in sorted(cc):
        p = cc[ch] / total
        ent -= p * math.log2(p)
    r = M.match_string_stats(sparse_idx, "hot0 mid1", "role").collect()[0]
    assert (r.n_docs, r.n_with_value) == (len(ids), len(ids))
    assert (r.min_len, r.max_len) == (min(lens), max(lens))
    assert abs(r.avg_len - sum(lens) / len(lens)) < 1e-12
    assert abs(r.entropy - ent) < 1e-12
    # NULLs excluded from value stats, counted in n_docs
    vals_o = [corpus_pdf.iloc[i].role for i in ids
              if corpus_pdf.iloc[i].turn_idx != 0]
    r2 = M.match_string_stats(sparse_idx, "hot0 mid1", "opt").collect()[0]
    assert (r2.n_docs, r2.n_with_value) == (len(ids), len(vals_o))
    # empty + validation
    r3 = M.match_string_stats(sparse_idx, "nosuchterm", "role").collect()[0]
    assert (r3.n_docs, r3.n_with_value) == (0, 0)
    assert r3.avg_len is None and r3.entropy == 0.0
    with pytest.raises(ValueError, match="string docvalue"):
        M.match_string_stats(sparse_idx, "hot0", "ts")
    with pytest.raises(ValueError, match="not a docvalue column"):
        M.match_string_stats(sparse_idx, "hot0", "nope")


def _disc(vals, p):
    """The frozen PERCENTILE_DISC rule over a value list."""
    import math
    vs = sorted(vals)
    need = math.ceil(p * len(vs))
    return vs[need - 1]


def test_match_mad(midx, corpus_pdf, tok_rows):
    """Exact MAD = median(|x - median|) under the frozen DISC rule,
    recomputed from the raw fixture timestamps."""
    ids = _expect_ids(tok_rows, ["hot0", "mid1"], "OR")
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64).tolist()
    med = _disc(secs, 0.5)
    mad = _disc([abs(s - med) for s in secs], 0.5)
    r = M.match_mad(midx, "hot0 mid1", "ts").collect()[0]
    assert (r.n_values, r.median, r.mad) == (len(secs), med, mad)
    assert mad > 0  # non-degenerate spread
    # filters compose
    ids2 = _expect_ids(tok_rows, ["hot0", "mid1"], "OR", pdf=corpus_pdf,
                       pred=lambda x: x.role == "user")
    secs2 = corpus_pdf.iloc[ids2].ts.values.astype(
        "datetime64[s]").astype(np.int64).tolist()
    med2 = _disc(secs2, 0.5)
    mad2 = _disc([abs(s - med2) for s in secs2], 0.5)
    r2 = M.match_mad(midx, "hot0 mid1", "ts",
                     dv_filter="role = 'user'").collect()[0]
    assert (r2.n_values, r2.median, r2.mad) == (len(secs2), med2, mad2)
    # empty + validation
    r3 = M.match_mad(midx, "nosuchterm", "ts").collect()[0]
    assert (r3.n_values, r3.median, r3.mad) == (0, None, None)
    with pytest.raises(ValueError, match="timestamp/integer"):
        M.match_mad(midx, "hot0", "role")
    with pytest.raises(ValueError, match="not a docvalue column"):
        M.match_mad(midx, "hot0", "nope")


def _pipeline_reference(corpus_pdf, tok_rows, terms, interval):
    """(grid, n, cum, delta) pandas reference for the densified pipeline
    axis — shared by the bucket_selector/bucket_sort tests."""
    ids = _expect_ids(tok_rows, terms, "OR")
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64)
    counts = {}
    for s in (secs // interval) * interval:
        counts[int(s)] = counts.get(int(s), 0) + 1
    lo, hi = min(counts), max(counts)
    grid = list(range(lo, hi + 1, interval))
    n = [counts.get(b, 0) for b in grid]
    cum = np.cumsum(n).tolist()
    delta = [None] + [n[i] - n[i - 1] for i in range(1, len(n))]
    return grid, n, cum, delta


def test_match_histogram_having(midx, corpus_pdf, tok_rows):
    """ES bucket_selector: SQL predicate over the densified bucket
    columns; NULL delta (first bucket) drops under three-valued logic."""
    interval = 3600
    grid, n, cum, delta = _pipeline_reference(
        corpus_pdf, tok_rows, ["rare0", "rare1"], interval)
    want = [(b, x) for b, x, d in zip(grid, n, delta)
            if x >= 1 and d is not None and d >= 0]
    rows = M.match_histogram_having(
        midx, "rare0 rare1", "ts", interval,
        "n_docs >= 1 AND delta_docs >= 0").collect()
    assert [(r.bucket_start, r.n_docs) for r in rows] == want
    # a predicate over cum_docs works (densified axis, running total)
    half = cum[-1] / 2
    want2 = [b for b, c in zip(grid, cum) if c > half]
    rows2 = M.match_histogram_having(
        midx, "rare0 rare1", "ts", interval,
        f"cum_docs > {half}").collect()
    assert [r.bucket_start for r in rows2] == want2
    # first bucket has NULL delta -> dropped by any delta predicate
    assert grid[0] not in [r.bucket_start for r in rows]


def test_match_histogram_top(midx, corpus_pdf, tok_rows):
    """ES bucket_sort: non-empty parent buckets by n_docs desc/asc with
    the bucket_start tiebreak, truncated to n."""
    interval = 3600
    grid, n, _, _ = _pipeline_reference(
        corpus_pdf, tok_rows, ["rare0", "rare1"], interval)
    nonempty = [(b, x) for b, x in zip(grid, n) if x > 0]
    for asc in (False, True):
        want = sorted(nonempty,
                      key=lambda t: (t[1] if asc else -t[1], t[0]))[:3]
        rows = M.match_histogram_top(midx, "rare0 rare1", "ts", interval,
                                     n=3, asc=asc).collect()
        assert [(r.bucket_start, r.n_docs) for r in rows] == want
    with pytest.raises(ValueError, match="n must be"):
        M.match_histogram_top(midx, "hot0", "ts", interval, n=0)
    assert M.match_histogram_top(midx, "nosuchterm", "ts",
                                 interval).count() == 0


def test_match_histogram_validation(midx):
    with pytest.raises(ValueError, match="positive"):
        M.match_histogram(midx, "hot0", "ts", 0)
    with pytest.raises(ValueError, match="timestamp/integer"):
        M.match_histogram(midx, "hot0", "role", 3600)
    assert M.match_histogram(midx, "nosuchterm", "ts", 3600).count() == 0


def test_mlt_terms_frozen_rule(midx, corpus_pdf):
    """The cap rule: tf*idf desc, term asc — recomputed independently
    from the packed lexicon."""
    doc = 37
    toks = tokenize_py(corpus_pdf.iloc[doc].text, DEFAULT.analyzer)
    from collections import Counter
    tf = Counter(toks)
    lex = midx.lookup_terms(sorted(tf))
    want = sorted(((-(tf[t] * float(lex[t]["idf"])), t) for t in tf
                   if t in lex))
    want = [t for _, t in want][:8]
    assert M.mlt_terms(midx, doc, max_terms=8) == want


def test_more_like_this(midx, oracle_idx):
    """MLT == an OR query over the frozen expansion with qtf=1, source
    doc removed — checked against the pure-Python oracle ranking."""
    doc = 37
    terms = M.mlt_terms(midx, doc, max_terms=8)
    got = [(r.doc_id, r.score) for r in
           M.more_like_this(midx, doc, k=10, max_terms=8).collect()]
    assert all(d != doc for d, _ in got) and got
    want = [(d, s) for d, s in
            oracle_idx.search(" ".join(terms), 11, "OR") if d != doc][:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in got],
                               [s for _, s in want], rtol=0, atol=1e-9)


def test_more_like_this_self_not_in_topk(midx):
    """k+1 over-fetch: even when the source doc would rank #1 (it always
    matches all its own terms), the caller still receives k rows if k+1
    candidates exist."""
    doc = 37
    out = M.more_like_this(midx, doc, k=5, max_terms=8).collect()
    assert len(out) == 5 and all(r.doc_id != doc for r in out)


# ---- significant_terms (ES significant-terms, JLH) -------------------


def _ref_sig(oracle_idx, tok_rows, query, n, sample, min_fg=1,
             exclude=None):
    """Pure-Python JLH reference: foreground = oracle top-`sample`
    (frozen (score desc, doc_id asc) ranking), fg counts from the same
    token sets, bg df from the oracle postings."""
    ranked = oracle_idx.search(query, k=len(tok_rows))  # full ranking
    if exclude:
        negs = set(tokenize_py(exclude, DEFAULT.analyzer))
        drop = {d for t in negs for d, _ in oracle_idx.postings.get(t, ())}
        ranked = [(d, s) for d, s in ranked if d not in drop]
    fg_docs = [d for d, _ in ranked[:sample]]
    s_n, n_docs = len(fg_docs), len(tok_rows)
    qterms = set(tokenize_py(query, DEFAULT.analyzer))
    fg = {}
    for d in fg_docs:
        for t in tok_rows[d]:
            fg[t] = fg.get(t, 0) + 1
    scored = []
    for t in sorted(fg):
        if t in qterms or fg[t] < min_fg:
            continue
        bgc = len(oracle_idx.postings.get(t, ()))
        fr, br = fg[t] / s_n, bgc / n_docs
        scored.append(((fr - br) * (fr / br), t, fg[t], bgc))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [(t, fgc, bgc, sc) for sc, t, fgc, bgc in scored[:n]]


@pytest.mark.parametrize("query,n,sample", [
    ("hot0 hot1", 10, 40),
    ("rare0", 5, 20),         # tiny foreground
    ("mid1 mid2", 8, 25),
])
def test_significant_terms_matches_reference(midx, oracle_idx, tok_rows,
                                             query, n, sample):
    got = [(r["term"], r["fg_count"], r["bg_count"], r["score"])
           for r in M.significant_terms(midx, query, n=n,
                                        sample=sample).collect()]
    want = _ref_sig(oracle_idx, tok_rows, query, n, sample)
    assert [(t, f, b) for t, f, b, _ in got] \
        == [(t, f, b) for t, f, b, _ in want]
    for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-12)


def test_significant_terms_excludes_query_terms(midx):
    rows = M.significant_terms(midx, "hot0 hot1", n=50,
                               sample=30).collect()
    terms = {r["term"] for r in rows}
    assert "hot0" not in terms and "hot1" not in terms


def test_significant_terms_exclude_composes(midx, oracle_idx, tok_rows):
    got = [(r["term"], r["fg_count"], r["bg_count"])
           for r in M.significant_terms(midx, "hot0", n=6, sample=20,
                                        exclude="mid1").collect()]
    want = [(t, f, b) for t, f, b, _ in
            _ref_sig(oracle_idx, tok_rows, "hot0", 6, 20, exclude="mid1")]
    assert got == want


def test_significant_terms_empty_match(midx):
    assert M.significant_terms(midx, "nosuchterm", n=5,
                               sample=20).collect() == []


def test_significant_terms_min_fg(midx, oracle_idx, tok_rows):
    rows = M.significant_terms(midx, "rare0", n=20, sample=10,
                               min_fg=3).collect()
    assert all(r["fg_count"] >= 3 for r in rows)
    want = _ref_sig(oracle_idx, tok_rows, "rare0", 20, 10, min_fg=3)
    assert [(r["term"], r["fg_count"]) for r in rows] \
        == [(t, f) for t, f, _, _ in want]


# ---- export_matches (match-set export sink) --------------------------


def test_export_matches_or_and(midx, corpus_pdf, tok_rows, tmp_path):
    for terms, mode in [(["hot0", "hot1"], "OR"), (["hot0", "hot1"], "AND")]:
        out = M.export_matches(midx, " ".join(terms),
                               str(tmp_path / f"x_{mode}"), mode=mode)
        got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
        assert got == _expect_ids(tok_rows, terms, mode), (terms, mode)
        assert got, (terms, mode)  # fixture guarantees a non-empty set
        # full stored row comes back (text equality spot check)
        row = out.orderBy("doc_id").first()
        assert row["text"] == corpus_pdf.iloc[row["doc_id"]]["text"]


def test_export_matches_exclude_and_dv_filter(midx, corpus_pdf, tok_rows,
                                              tmp_path):
    out = M.export_matches(midx, "hot0", str(tmp_path / "xne"),
                           exclude="mid1")
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == _expect_ids(tok_rows, ["hot0"], "OR", neg=["mid1"])
    out = M.export_matches(midx, "hot0", str(tmp_path / "xdv"),
                           dv_filter="role = 'user'")
    got = sorted(r["doc_id"] for r in out.collect())
    want = _expect_ids(tok_rows, ["hot0"], "OR", pdf=corpus_pdf,
                       pred=lambda r: r["role"] == "user")
    assert got == want


def test_export_matches_columns(midx, tmp_path):
    out = M.export_matches(midx, "hot0", str(tmp_path / "xc"),
                           columns=("conv_id", "role"))
    assert sorted(out.columns) == ["conv_id", "doc_id", "role"]
    with pytest.raises(ValueError):
        M.export_matches(midx, "hot0", str(tmp_path / "xbad"),
                         columns=("nope",))


def test_export_matches_empty_writes_schema(midx, tmp_path):
    out = M.export_matches(midx, "nosuchterm", str(tmp_path / "xe"))
    assert out.collect() == []
    assert "doc_id" in out.columns and "text" in out.columns


# ---- index_stats ------------------------------------------------------


def test_index_stats_first_principles(midx, corpus_pdf):
    from engine.build import index_stats
    r = one(index_stats(midx))
    toks = [tokenize_py(t, DEFAULT.analyzer) for t in corpus_pdf.text]
    assert r["n_docs"] == len(toks)
    assert r["n_terms"] == len({t for ts in toks for t in ts})
    assert r["n_postings"] == sum(len(set(ts)) for ts in toks)
    assert r["n_tokens"] == sum(len(ts) for ts in toks)
    assert r["n_deleted"] == 0


def test_index_stats_tracks_deletes(spark, midx, tmp_path):
    import shutil
    from engine.build import index_stats, load_index
    from engine.deletes import delete_docs
    d = str(tmp_path / "st")
    shutil.copytree(midx.index_dir, d)
    idx = load_index(spark, d)
    gone = delete_docs(idx, "role = 'tool'")
    r = one(index_stats(idx))
    assert r["n_deleted"] == gone
    # lexicon-derived stats stay the last build's until purge (the
    # same frozen rule BM25 stats follow)
    assert r["n_docs"] == midx.n_docs


# ---- match_percentiles (exact PERCENTILE_DISC) ------------------------


def _ref_pct(vals, ps):
    import math
    vals = sorted(vals)
    n = len(vals)
    out = []
    for p in ps:
        # min v with cum_count(v) >= ceil(p*n) == element at rank
        # ceil(p*n) (1-based) in the sorted multiset
        out.append((p, int(vals[math.ceil(p * n) - 1])))
    return out


@pytest.mark.parametrize("terms,mode,ps", [
    (["hot0", "hot1"], "OR", (0.5, 0.9, 0.99)),
    (["hot0", "hot1"], "AND", (0.25, 0.5, 0.75, 1.0)),
    (["rare0"], "OR", (0.5,)),
])
def test_match_percentiles_reference(midx, corpus_pdf, tok_rows,
                                     terms, mode, ps):
    ids = _expect_ids(tok_rows, terms, mode)
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64)
    got = [(r["p"], r["value"]) for r in
           M.match_percentiles(midx, " ".join(terms), "ts", ps=ps,
                               mode=mode).collect()]
    assert got == _ref_pct(secs, ps)


def test_match_percentiles_filters_empty_validation(midx, corpus_pdf,
                                                    tok_rows):
    ids = _expect_ids(tok_rows, ["hot0"], "OR", pdf=corpus_pdf,
                      pred=lambda r: r.role == "user", neg=["mid1"])
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64)
    got = [(r["p"], r["value"]) for r in
           M.match_percentiles(midx, "hot0", "ts", ps=(0.5, 1.0),
                               exclude="mid1",
                               dv_filter="role = 'user'").collect()]
    assert got == _ref_pct(secs, (0.5, 1.0))
    rows = M.match_percentiles(midx, "nosuchterm", "ts",
                               ps=(0.5,)).collect()
    assert [(r["p"], r["value"]) for r in rows] == [(0.5, None)]
    with pytest.raises(ValueError, match="lie in"):
        M.match_percentiles(midx, "hot0", "ts", ps=(0.0,))
    with pytest.raises(ValueError, match="timestamp/integer"):
        M.match_percentiles(midx, "hot0", "role")


def _ref_composite(corpus_pdf, ids, fields):
    """Expected full bucket list: (key tuple asc) -> exact count, ts at
    the frozen whole-second grain, rows with any NULL key excluded."""
    sub = corpus_pdf.iloc[ids]
    keys = []
    for f in fields:
        if f == "ts":
            keys.append(sub.ts.values.astype("datetime64[s]")
                        .astype(np.int64))
        else:
            keys.append(sub[f].to_numpy(object))
    import pandas as pd
    kdf = pd.DataFrame({f: k for f, k in zip(fields, keys)})
    kdf = kdf.dropna()
    g = kdf.groupby(fields, sort=False).size().reset_index(name="n")
    rows = [tuple(r[f] for f in fields) + (int(r["n"]),)
            for _, r in g.iterrows()]
    return sorted(rows, key=lambda t: t[:-1])


def test_match_composite_page_walk_complete(midx, corpus_pdf, tok_rows):
    """Walking pages until empty enumerates every (role, ts) bucket
    exactly once, in key order, with exact counts."""
    ids = _expect_ids(tok_rows, ["rare0", "rare1", "rare2"], "OR")
    expect = _ref_composite(corpus_pdf, ids, ["role", "ts"])
    got, after = [], None
    while True:
        page = M.match_composite(midx, "rare0 rare1 rare2",
                                 ["role", "ts"], size=2,
                                 after=after).collect()
        if not page:
            break
        got.extend((r["role"], r["ts"], r["n_docs"]) for r in page)
        after = [page[-1]["role"], page[-1]["ts"]]
    assert got == expect


def test_match_composite_single_field_counts(midx, corpus_pdf, tok_rows):
    ids = _expect_ids(tok_rows, ["hot0", "hot1"], "AND")
    expect = _ref_composite(corpus_pdf, ids, ["role"])
    got = [(r["role"], r["n_docs"]) for r in
           M.match_composite(midx, "hot0 hot1", ["role"], size=10,
                             mode="AND").collect()]
    assert got == expect


def test_match_composite_filters_compose(midx, corpus_pdf, tok_rows):
    ids = _expect_ids(tok_rows, ["hot0"], "OR", pdf=corpus_pdf,
                      pred=lambda r: r.role == "user", neg=["hot1"])
    expect = _ref_composite(corpus_pdf, ids, ["role"])
    got = [(r["role"], r["n_docs"]) for r in
           M.match_composite(midx, "hot0", ["role"], size=10,
                             exclude="hot1",
                             dv_filter="role = 'user'").collect()]
    assert got == expect
    assert M.match_composite(midx, "nosuchterm", ["role"],
                             size=5).collect() == []


def test_match_composite_validation(midx):
    with pytest.raises(ValueError, match="docvalue column"):
        M.match_composite(midx, "hot0", ["nosuchcol"])
    with pytest.raises(ValueError, match="at least one"):
        M.match_composite(midx, "hot0", [])
    with pytest.raises(ValueError, match="page size"):
        M.match_composite(midx, "hot0", ["role"], size=0)
    with pytest.raises(ValueError, match="after key has"):
        M.match_composite(midx, "hot0", ["role"], after=["a", "b"])


def test_match_composite_null_keys_excluded(spark, tmp_path):
    """Docs with a NULL value in any key column are excluded (the
    collapse / search_sorted NULL rule)."""
    from pyspark.sql import types as T
    rows = [("c-0", i, "user", "hot0 filler", None if i % 2 else f"s{i%3}",
             None) for i in range(8)]
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("src", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
    ])
    df = spark.createDataFrame(rows, schema)
    nidx = build_index(spark, df, str(tmp_path / "nullidx"),
                       cfg=IndexConfig(doc_values=("src",)))
    got = [(r["src"], r["n_docs"]) for r in
           M.match_composite(nidx, "hot0", ["src"], size=10).collect()]
    # even turn_idx rows keep src s0/s1/s2 (i%3); odd rows are NULL-key
    assert got == [("s0", 2), ("s1", 1), ("s2", 1)]


def test_match_filters_reference(midx, corpus_pdf, tok_rows):
    """ES filters agg: named overlapping predicate buckets over the
    match set, zero-count buckets included, name-ascending order."""
    ids = _expect_ids(tok_rows, ["hot0", "hot1"], "OR")
    sub = corpus_pdf.iloc[ids]
    early = int((sub.ts.values.astype("datetime64[s]").astype(np.int64)
                 < 1767312000).sum())  # < 2026-01-02
    want = [("early", early),
            ("none", 0),
            ("tool_or_user", int((sub.role != "assistant").sum())),
            ("users", int((sub.role == "user").sum()))]
    got = [(r.bucket, r.n_docs) for r in M.match_filters(
        midx, "hot0 hot1",
        {"users": "role = 'user'",
         "tool_or_user": "role <> 'assistant'",
         "early": "ts < TIMESTAMP '2026-01-02 00:00:00'",
         "none": "role = 'nosuchrole'"}).collect()]
    assert got == want


def test_match_filters_compose_and_validate(midx, corpus_pdf, tok_rows):
    ids = _expect_ids(tok_rows, ["hot0"], "OR", pdf=corpus_pdf,
                      pred=lambda r: r.role == "user", neg=["hot1"])
    got = [(r.bucket, r.n_docs) for r in M.match_filters(
        midx, "hot0", {"all": "1 = 1"}, exclude="hot1",
        dv_filter="role = 'user'").collect()]
    assert got == [("all", len(ids))]
    # empty match set: every bucket is zero
    got = [(r.bucket, r.n_docs) for r in M.match_filters(
        midx, "nosuchterm", {"a": "1 = 1", "b": "role = 'user'"})
        .collect()]
    assert got == [("a", 0), ("b", 0)]
    with pytest.raises(ValueError, match="at least one"):
        M.match_filters(midx, "hot0", {})


def _ref_auto_histogram(corpus_pdf, ids, target):
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64)
    if secs.size == 0:
        return [], None
    mn, mx = int(secs.min()), int(secs.max())
    interval = M.AUTO_HISTOGRAM_LADDER[-1]
    for i in M.AUTO_HISTOGRAM_LADDER:
        if (mx // i) - (mn // i) + 1 <= target:
            interval = i
            break
    b = (secs // interval) * interval
    import collections
    c = collections.Counter(b.tolist())
    return sorted(c.items()), interval


@pytest.mark.parametrize("terms,target", [
    (["hot0", "hot1"], 10),
    (["hot0", "hot1"], 3),
    (["rare0"], 5),          # tiny match set -> finest grain
])
def test_match_auto_histogram(midx, corpus_pdf, tok_rows, terms, target):
    ids = _expect_ids(tok_rows, terms, "OR")
    want, interval = _ref_auto_histogram(corpus_pdf, ids, target)
    rows = M.match_auto_histogram(midx, " ".join(terms), "ts",
                                  target_buckets=target).collect()
    assert len(rows) <= target
    assert all(r["interval_s"] == interval for r in rows)
    assert [(r["bucket_start"], r["n_docs"]) for r in rows] == want


def test_match_auto_histogram_empty_and_validation(midx):
    assert M.match_auto_histogram(midx, "nosuchterm", "ts").collect() == []
    with pytest.raises(ValueError, match=">= 1"):
        M.match_auto_histogram(midx, "hot0", "ts", target_buckets=0)


def test_match_adjacency_reference(midx, corpus_pdf, tok_rows):
    """ES adjacency_matrix: diagonal = each filter's count, off-diagonal
    = pairwise intersections, zero pairs omitted, (a, b) ascending."""
    ids = _expect_ids(tok_rows, ["hot0", "hot1"], "OR")
    sub = corpus_pdf.iloc[ids]
    secs = sub.ts.values.astype("datetime64[s]").astype(np.int64)
    masks = {
        "early": secs < 1767312000,       # < 2026-01-02
        "users": (sub.role == "user").to_numpy(),
    }
    want = []
    names = sorted(masks)
    for i, a in enumerate(names):
        for b in names[i:]:
            c = int((masks[a] & masks[b]).sum())
            if c:
                want.append((a, b, c))
    got = [(r.a, r.b, r.n_docs) for r in M.match_adjacency(
        midx, "hot0 hot1",
        {"users": "role = 'user'",
         "early": "ts < TIMESTAMP '2026-01-02 00:00:00'"}).collect()]
    assert got == sorted(want)
    # zero-intersection pairs are omitted; empty match set -> no rows
    got = [(r.a, r.b, r.n_docs) for r in M.match_adjacency(
        midx, "hot0", {"u": "role = 'user'", "z": "role = 'zz'"})
        .collect()]
    assert [x[:2] for x in got] == [("u", "u")]
    assert M.match_adjacency(midx, "nosuchterm",
                             {"u": "role = 'user'"}).collect() == []
    with pytest.raises(ValueError, match="at least one"):
        M.match_adjacency(midx, "hot0", {})


# ---- match_all ("*") over the aggregation surface ------------------


def test_match_all_count_and_stats(midx, corpus_pdf):
    n = len(corpus_pdf)
    assert M.match_count(midx, "*").collect()[0].n_docs == n
    # stats over every doc == pandas recompute over the whole corpus
    secs = corpus_pdf.ts.values.astype("datetime64[s]").astype(np.int64)
    r = M.match_stats(midx, "*", "ts").collect()[0]
    assert (r.n_docs, r.n_with_value) == (n, n)
    assert (int(r.min_val), int(r.max_val), int(r.sum_val)) == \
        (int(secs.min()), int(secs.max()), int(secs.sum()))
    # histogram over every doc
    want = {}
    for s in (secs // 86400) * 86400:
        want[int(s)] = want.get(int(s), 0) + 1
    got = {r.bucket_start: r.n_docs for r in
           M.match_histogram(midx, "*", "ts", 86400).collect()}
    assert got == want


def test_match_all_exclude_and_dv_filter(midx, corpus_pdf, tok_rows):
    n = len(corpus_pdf)
    # exclude rides a pruned postings scan of just the negative term
    n_hot0 = sum(1 for s in tok_rows if "hot0" in s)
    r = M.match_count(midx, "*", exclude="hot0").collect()[0]
    assert r.n_docs == n - n_hot0 and n_hot0 > 0
    # dv_filter composes (match-all restricted to role = 'user')
    n_user = int((corpus_pdf.role == "user").sum())
    r2 = M.match_count(midx, "*", dv_filter="role = 'user'").collect()[0]
    assert r2.n_docs == n_user
    # both together
    n_both = sum(1 for i, s in enumerate(tok_rows)
                 if "hot0" not in s and corpus_pdf.iloc[i].role == "user")
    r3 = M.match_count(midx, "*", exclude="hot0",
                       dv_filter="role = 'user'").collect()[0]
    assert r3.n_docs == n_both


def test_match_all_respects_tombstones_and_refuses_purge(
        spark, corpus_df, tmp_path):
    from engine.deletes import delete_docs, purge_deletes
    d = str(tmp_path / "ma_del")
    idx = build_index(spark, corpus_df, d,
                      cfg=IndexConfig(doc_values=("role", "ts")))
    n = int(idx.n_docs)
    gone = delete_docs(idx, "text LIKE '%hot0%'")
    assert gone > 0
    assert M.match_count(idx, "*").collect()[0].n_docs == n - gone
    idx = purge_deletes(idx)
    with pytest.raises(ValueError, match="purge"):
        M.match_count(idx, "*")


# ---- terms-agg ordering + rare_terms --------------------------------


def test_facet_stats_order_by_metric(midx, corpus_pdf, tok_rows):
    """ES terms-agg ordered by a stats sub-agg: avg asc/desc with the
    frozen facet_value tiebreak, vs a pandas recompute."""
    ids = _expect_ids(tok_rows, ["hot0", "mid1"], "OR")
    sub = corpus_pdf.iloc[ids]
    secs = sub.ts.values.astype("datetime64[s]").astype(np.int64)
    import pandas as pd
    g = pd.DataFrame({"v": sub.role.values, "s": secs}).groupby("v")
    stats = {v: (len(x), x.s.mean()) for v, x in g}
    for asc in (True, False):
        want = sorted(stats.items(),
                      key=lambda t: (t[1][1] if asc else -t[1][1], t[0]))
        rows = M.facet_stats(midx, "hot0 mid1", "role", "ts",
                             order_by="avg", ascending=asc).collect()
        assert [r.facet_value for r in rows] == [v for v, _ in want]
        for r in rows:
            assert abs(r.avg_val - stats[r.facet_value][1]) < 1e-9
    # top-n cap under the metric order
    rows = M.facet_stats(midx, "hot0 mid1", "role", "ts",
                         order_by="sum", n=2).collect()
    assert len(rows) == 2
    with pytest.raises(ValueError, match="order_by"):
        M.facet_stats(midx, "hot0", "role", "ts", order_by="median")
    with pytest.raises(ValueError, match="n must be"):
        M.facet_stats(midx, "hot0", "role", "ts", n=0)


def test_rare_terms(sparse_idx, corpus_pdf, tok_rows):
    """Exact rare_terms vs pandas: global counts filtered to <=
    max_doc_count, NULL never a bucket, (count, value) asc order."""
    ids = _expect_ids(tok_rows, ["hot0", "mid1"], "OR")
    sub = corpus_pdf.iloc[ids]
    # 'opt' is NULL on turn_idx==0 docs; counts per surviving role value
    vals = [r.role for _, r in sub.iterrows() if r.turn_idx != 0]
    import collections
    cnt = collections.Counter(vals)
    for mdc in (1, max(cnt.values())):
        want = sorted(((c, v) for v, c in cnt.items() if c <= mdc))
        rows = M.rare_terms(sparse_idx, "hot0 mid1", "opt",
                            max_doc_count=mdc, n=50).collect()
        assert [(r.n_docs, r.facet_value) for r in rows] == want
    # threshold at max -> every value appears; NULL absent
    rows = M.rare_terms(sparse_idx, "hot0 mid1", "opt",
                        max_doc_count=10**9, n=50).collect()
    assert len(rows) == len(cnt)
    assert all(r.facet_value is not None for r in rows)
    # empty + validation
    assert M.rare_terms(sparse_idx, "nosuchterm", "opt").collect() == []
    with pytest.raises(ValueError, match="max_doc_count"):
        M.rare_terms(sparse_idx, "hot0", "opt", max_doc_count=0)
    with pytest.raises(ValueError, match="not a docvalue"):
        M.rare_terms(sparse_idx, "hot0", "nope")


# ---- binned percentiles / MAD (bounded-state path, r5) -----------------


def _ref_binned(vals, n_bins):
    """The frozen integer binning rule: (vmin, width, {bin: count})."""
    vmin, vmax = min(vals), max(vals)
    span = vmax - vmin + 1
    wd = max(1, -(-span // n_bins))
    hist = {}
    for v in vals:
        b = (v - vmin) // wd
        hist[b] = hist.get(b, 0) + 1
    return vmin, wd, hist


def _disc_hist(hist, p, n):
    import math
    need = math.ceil(p * n)
    cum = 0
    for k in sorted(hist):
        cum += hist[k]
        if cum >= need:
            return k
    return max(hist)


def test_match_percentiles_binned_rules(midx, corpus_pdf, tok_rows):
    """Forced-binned percentiles follow the frozen lower-edge rule
    (recomputed from raw fixture timestamps); with n_bins >= span the
    width collapses to 1 and binned == exact bit-for-bit; the auto
    guard routes by the distinct-count threshold."""
    ids = _expect_ids(tok_rows, ["hot0", "hot1"], "OR")
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64).tolist()
    ps = (0.25, 0.5, 0.9, 1.0)
    # coarse forced-binned vs the reference rule
    vmin, wd, hist = _ref_binned(secs, 8)
    assert wd > 1  # binning must actually be lossy here
    want = [(p, vmin + wd * _disc_hist(hist, p, len(secs))) for p in ps]
    got = [(r["p"], r["value"]) for r in
           M.match_percentiles(midx, "hot0 hot1", "ts", ps=ps,
                               method="binned", n_bins=8).collect()]
    assert got == want
    # n_bins >= span -> width 1 -> binned == exact
    span = max(secs) - min(secs) + 1
    exact = [(r["p"], r["value"]) for r in
             M.match_percentiles(midx, "hot0 hot1", "ts", ps=ps,
                                 method="exact").collect()]
    fine = [(r["p"], r["value"]) for r in
            M.match_percentiles(midx, "hot0 hot1", "ts", ps=ps,
                                method="binned",
                                n_bins=int(span)).collect()]
    assert fine == exact
    # auto guard: threshold 0 -> binned; huge threshold -> exact
    auto_b = [(r["p"], r["value"]) for r in
              M.match_percentiles(midx, "hot0 hot1", "ts", ps=ps,
                                  n_bins=8,
                                  binned_threshold=0).collect()]
    assert auto_b == want
    auto_e = [(r["p"], r["value"]) for r in
              M.match_percentiles(midx, "hot0 hot1", "ts",
                                  ps=ps).collect()]
    assert auto_e == exact
    with pytest.raises(ValueError, match="auto|exact|binned"):
        M.match_percentiles(midx, "hot0", "ts", method="tdigest")
    with pytest.raises(ValueError, match="n_bins"):
        M.match_percentiles(midx, "hot0", "ts", n_bins=1)


def test_match_mad_binned(midx, corpus_pdf, tok_rows):
    """Forced-binned MAD: both medians DISC-walk the bin histogram with
    lower-edge representatives; fine binning reproduces exact."""
    ids = _expect_ids(tok_rows, ["hot0", "mid1"], "OR")
    secs = corpus_pdf.iloc[ids].ts.values.astype(
        "datetime64[s]").astype(np.int64).tolist()
    n = len(secs)
    vmin, wd, hist = _ref_binned(secs, 8)
    med = vmin + wd * _disc_hist(hist, 0.5, n)
    dev = {}
    for b, c in hist.items():
        d = abs(vmin + wd * b - med)
        dev[d] = dev.get(d, 0) + c
    import math
    need, cum, mad = math.ceil(0.5 * n), 0, None
    for d in sorted(dev):
        cum += dev[d]
        if cum >= need:
            mad = d
            break
    r = M.match_mad(midx, "hot0 mid1", "ts", method="binned",
                    n_bins=8).collect()[0]
    assert (r.n_values, r.median, r.mad) == (n, med, mad)
    # fine binning (width 1) == exact
    span = max(secs) - min(secs) + 1
    rf = M.match_mad(midx, "hot0 mid1", "ts", method="binned",
                     n_bins=int(span)).collect()[0]
    re_ = M.match_mad(midx, "hot0 mid1", "ts",
                      method="exact").collect()[0]
    assert (rf.n_values, rf.median, rf.mad) == \
        (re_.n_values, re_.median, re_.mad)
    # empty match set through the binned path
    r0 = M.match_mad(midx, "nosuchterm", "ts", method="binned").collect()[0]
    assert (r0.n_values, r0.median, r0.mad) == (0, None, None)
