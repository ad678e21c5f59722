"""Faceted search (engine/query.py facets): facet-value counts over the
FULL match set, every dimension from one GROUPING SETS pass.

Cross-checked against an independent pandas recomputation from the raw
fixture corpus (analyzer.tokenize_py — the same frozen tokenizer, but none
of the index/codec machinery), plus the edge cases the DuckDB gate rows
(search_facets / facets_filtered in __spark_entry__.py) don't reach."""

from collections import Counter

import pytest

from engine import query as Q
from engine.analyzer import tokenize_py


@pytest.fixture(scope="session")
def packed_index(spark, corpus_df, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("fidx") / "packed")
    return build_index(spark, corpus_df, d)


def _expected(corpus_pdf, terms, mode, fields, pred=None):
    """Independent match-set + facet counts straight off the pandas corpus
    (doc order == stable corpus order == engine doc_ids)."""
    tset = set(terms)
    out = []
    for f in fields:
        c = Counter()
        for i, (text, *meta) in enumerate(
                zip(corpus_pdf.text, *[corpus_pdf[f2] for f2 in fields])):
            toks = set(tokenize_py(text))
            hit = (tset <= toks) if mode == "AND" else bool(tset & toks)
            if hit and (pred is None or pred(corpus_pdf.iloc[i])):
                c[meta[fields.index(f)]] += 1
        out.extend((f, str(v), n) for v, n in c.items())
    return sorted(out)


def _got(df):
    return sorted((r.facet_field, r.facet_value, r.n_docs)
                  for r in df.collect())


@pytest.mark.parametrize("mode,query", [("OR", "hot1 rare5"),
                                        ("AND", "hot0 hot1")])
def test_facets_match_pandas_reference(packed_index, corpus_pdf, mode, query):
    got = _got(Q.facets(packed_index, query, ["role", "tool"], mode=mode))
    want = _expected(corpus_pdf, query.split(), mode, ["role", "tool"])
    assert got == want
    assert len(got) > 0  # non-vacuous: the fixture queries do match docs


def test_facets_doc_filter(packed_index, corpus_pdf):
    got = _got(Q.facets(packed_index, "hot0 hot1", ["tool"], mode="OR",
                        doc_filter="role = 'tool'"))
    want = _expected(corpus_pdf, ["hot0", "hot1"], "OR", ["tool"],
                     pred=lambda r: r.role == "tool")
    assert got == want and len(got) > 0


def test_facets_empty_and_unknown(packed_index, spark):
    assert Q.facets(packed_index, "", ["role"]).count() == 0
    assert Q.facets(packed_index, "!!!", ["role"]).count() == 0
    # AND with a corpus-absent term can never match
    assert Q.facets(packed_index, "hot1 zzznotaterm", ["role"],
                    mode="AND").count() == 0
    # OR ignores the unknown term but still matches the known one
    assert Q.facets(packed_index, "rare5 zzznotaterm", ["role"],
                    mode="OR").count() > 0


def test_facets_output_order_and_schema(packed_index):
    df = Q.facets(packed_index, "hot0", ["role"])
    assert df.schema.simpleString() == (
        "struct<facet_field:string,facet_value:string,n_docs:bigint>")
    rows = df.collect()
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_facets_top_values(packed_index):
    full = Q.facets(packed_index, "hot0 hot1", ["role", "tool"])
    capped = Q.facets(packed_index, "hot0 hot1", ["role", "tool"],
                      top_values=2)
    # expected cap: per dimension, the 2 most frequent values
    # (n_docs desc, facet_value asc) of the UNCAPPED result
    want = []
    rows = sorted(((r.facet_field, -r.n_docs, r.facet_value)
                   for r in full.collect()))
    seen = {}
    for f, neg_n, v in rows:
        if seen.setdefault(f, 0) < 2:
            seen[f] += 1
            want.append((f, v, -neg_n))
    assert sorted(_got(capped)) == sorted(want)
    assert all(n == 2 for n in seen.values())  # cap actually binds


def test_facets_plan_cached(packed_index):
    a = Q.facets(packed_index, "hot0 hot1", ["role", "tool"], mode="OR")
    b = Q.facets(packed_index, "hot0 hot1", ["role", "tool"], mode="OR")
    assert a is b  # prepared-plan cache: identical args -> same plan
    c = Q.facets(packed_index, "hot0 hot1", ["role"], mode="OR")
    assert c is not a


def test_facets_prefix_equals_expanded_or(packed_index):
    """mode=PREFIX == mode=OR over the explicit expansion (the frozen
    equivalence the DuckDB facets_prefix gate row checks externally)."""
    terms = [r["term"] for r in packed_index.expand_prefix("rare", 64)]
    assert len(terms) > 1
    a = Q.facets(packed_index, "rare*", ["role", "tool"], mode="PREFIX")
    b = Q.facets(packed_index, " ".join(terms), ["role", "tool"], mode="OR")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_facets_regexp_equals_expanded_or(packed_index):
    """mode=REGEXP == mode=OR over the explicit expansion (same frozen
    equivalence as PREFIX facets, through expand_regexp's cap)."""
    terms = [r["term"] for r in packed_index.expand_regexp("rare[0-9]", 64)]
    assert len(terms) > 1
    a = Q.facets(packed_index, "rare[0-9]", ["role", "tool"],
                 mode="REGEXP")
    b = Q.facets(packed_index, " ".join(terms), ["role", "tool"],
                 mode="OR")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
