"""Per-document term vectors (engine/query.py term_vectors — the ES
_termvectors endpoint): tf from the stored corpus text, df/cf/idf from
the current lexicon, cross-checked against first principles."""

from collections import Counter

import pytest

from engine import query as Q
from engine.analyzer import tokenize_py


@pytest.fixture(scope="module")
def packed_index(spark, corpus_df, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("idx_tv") / "packed")
    return build_index(spark, corpus_df, d)


def test_term_vectors_match_first_principles(packed_index, corpus_pdf):
    acfg = packed_index.cfg.analyzer
    for doc_id in (0, 3, 57):
        tv = Q.term_vectors(packed_index, doc_id).collect()
        want_tf = Counter(tokenize_py(corpus_pdf.text.iloc[doc_id], acfg))
        assert {r["term"]: r["tf"] for r in tv} == dict(want_tf)
        # rows come term-ascending
        assert [r["term"] for r in tv] == sorted(want_tf)
        # df/cf spot check against a raw recount for the first term
        t0 = tv[0]["term"]
        toks = [tokenize_py(x, acfg) for x in corpus_pdf.text]
        assert tv[0]["df"] == sum(1 for ts in toks if t0 in set(ts))
        assert tv[0]["cf"] == sum(ts.count(t0) for ts in toks)


def test_term_vectors_idf_matches_lexicon(packed_index):
    tv = Q.term_vectors(packed_index, 5).collect()
    lex = packed_index.lookup_terms([r["term"] for r in tv])
    for r in tv:
        assert abs(r["idf"] - lex[r["term"]]["idf"]) <= 1e-12


def test_term_vectors_out_of_range(packed_index):
    with pytest.raises(ValueError, match="out of range"):
        Q.term_vectors(packed_index, packed_index.n_docs + 5)
    with pytest.raises(ValueError, match="out of range"):
        Q.term_vectors(packed_index, -1)
