"""Per-term query boosting (the Lucene/ES ``term^w`` rule) —
engine/query.py _apply_term_boosts. Frozen semantics: each weight
multiplies its term's qtf factor, so a boosted term's per-doc score
contribution scales by exactly w; everything else (idf, tf factor,
summation order, tie-break) is the unchanged frozen contract.

Coverage: identity at weight 1, exact-scaling property vs the plain
query, oracle rank identity (pure-Python BM25 with weighted qtf), WAND
rank identity (boosts keep WAND routing — _ub scales with qtf), batch
parity, composition with exclude/min_match, validation errors.
"""

import numpy as np
import pytest

from engine.fixtures import make_transcripts, spark_transcripts


@pytest.fixture(scope="module")
def idx300(spark, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("idx_tb") / "i")
    return (build_index(spark, spark_transcripts(spark, 300), d),
            make_transcripts(300))


def _oracle_topk(texts, weights, k=10):
    """Pure-Python weighted BM25 (same frozen constants/idf/summation
    order as engine/oracle.py, with qtf scaled by the weight)."""
    from engine.analyzer import tokenize_py
    from engine.config import BM25Config
    _c = BM25Config()
    k1, b = _c.k1, _c.b
    toks = [tokenize_py(t) for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    out = []
    terms = sorted(weights)
    dfs = {t: sum(1 for d in toks if t in d) for t in terms}
    idfs = {t: np.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            for t in terms}
    for i, d in enumerate(toks):
        s = 0.0
        for t in terms:  # frozen per-term order: sorted terms
            tf = d.count(t)
            if tf == 0:
                continue
            s += (weights[t] * idfs[t] * (tf * (k1 + 1.0))
                  / (tf + k1 * (1.0 - b + b * len(d) / avgdl)))
        if s > 0:
            out.append((i, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_weight_one_is_identity(idx300):
    from engine import query as Q
    idx, _ = idx300
    plain = [(r.doc_id, r.score)
             for r in Q.search(idx, "hot0 rare3", k=20).collect()]
    boosted = [(r.doc_id, r.score)
               for r in Q.search(idx, "hot0 rare3", k=20,
                                 term_boosts={"hot0": 1.0}).collect()]
    assert plain == boosted


def test_matches_weighted_oracle(idx300):
    from engine import query as Q
    idx, pdf = idx300
    texts = list(pdf.text)
    for w in ({"rare3": 3.0}, {"hot0": 0.25, "rare3": 2.0}):
        weights = {"hot0": w.get("hot0", 1.0), "rare3": w.get("rare3", 1.0)}
        want = _oracle_topk(texts, weights, k=10)
        got = [(r.doc_id, r.score)
               for r in Q.search(idx, "hot0 rare3", k=10,
                                 term_boosts=w).collect()]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_boost_changes_ranking(idx300):
    """A big boost on the rare term must promote rare-term docs."""
    from engine import query as Q
    idx, pdf = idx300
    from engine.analyzer import tokenize_py
    texts = list(pdf.text)
    n_rare = sum(1 for t in texts if "rare3" in tokenize_py(t))
    assert n_rare > 0
    got = [r.doc_id for r in Q.search(idx, "hot0 rare3", k=5,
                                      term_boosts={"rare3": 50.0}).collect()]
    # every rare3 doc outranks every hot0-only doc under a 50x boost
    for d in got[:min(n_rare, 5)]:
        assert "rare3" in tokenize_py(texts[d])


def test_wand_rank_identity(idx300):
    """Boosts keep WAND routing legal: forced WAND == exhaustive."""
    from engine import query as Q
    idx, _ = idx300
    tb = {"rare3": 4.0, "hot0": 0.5}
    a = [(r.doc_id, r.score)
         for r in Q.search(idx, "hot0 rare3", k=10, use_wand=True,
                           term_boosts=tb).collect()]
    b = [(r.doc_id, r.score)
         for r in Q.search(idx, "hot0 rare3", k=10, use_wand=False,
                           term_boosts=tb).collect()]
    assert a == b


def test_batch_matches_single(idx300):
    from engine import query as Q
    idx, _ = idx300
    tb = {"rare3": 2.5, "hot0": 0.5}
    qs = [{"id": "b", "query": "hot0 rare3", "mode": "OR", "boosts": tb},
          {"id": "p", "query": "hot0 rare3", "mode": "OR"}]
    rows = Q.search_batch(idx, qs, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    single_b = [(r.doc_id, r.score)
                for r in Q.search(idx, "hot0 rare3", k=10,
                                  term_boosts=tb).collect()]
    single_p = [(r.doc_id, r.score)
                for r in Q.search(idx, "hot0 rare3", k=10).collect()]
    assert by_q["b"] == single_b
    assert by_q["p"] == single_p


def test_composes_exclude_and_min_match(idx300):
    """Boosts compose with NOT and minimum_should_match: expected set =
    weighted oracle restricted to docs with >= 2 distinct query terms
    and no excluded term."""
    from engine import query as Q
    from engine.analyzer import tokenize_py
    idx, pdf = idx300
    texts = list(pdf.text)
    tb = {"rare3": 3.0}
    weights = {"hot0": 1.0, "rare3": 3.0, "w001": 1.0}
    full = _oracle_topk(texts, weights, k=10 ** 9)
    qterms = set(weights)
    keep = []
    for d, s in full:
        toks = set(tokenize_py(texts[d]))
        if "w002" in toks:
            continue
        if len(qterms & toks) < 2:
            continue
        keep.append((d, s))
    want = keep[:10]
    got = [(r.doc_id, r.score)
           for r in Q.search(idx, "hot0 rare3 w001", k=10, term_boosts=tb,
                             exclude="w002", min_match=2).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_validation(idx300):
    from engine import query as Q
    idx, _ = idx300
    with pytest.raises(ValueError, match="not in the query"):
        Q.search(idx, "hot0", term_boosts={"zzz": 2.0}).collect()
    with pytest.raises(ValueError, match="finite and > 0"):
        Q.search(idx, "hot0", term_boosts={"hot0": 0.0}).collect()
    with pytest.raises(ValueError, match="finite and > 0"):
        Q.search(idx, "hot0", term_boosts={"hot0": -1.0}).collect()
    with pytest.raises(ValueError, match="single analyzer"):
        Q.search(idx, "hot0", term_boosts={"two words": 2.0}).collect()
    with pytest.raises(ValueError, match="PHRASE"):
        from engine.build import build_index  # noqa: F401
        Q.search_batch(idx, [{"id": "x", "query": "hot0 hot1",
                              "mode": "PHRASE",
                              "boosts": {"hot0": 2.0}}]).collect()
