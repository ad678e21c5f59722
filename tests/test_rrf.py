"""Reciprocal-rank fusion (engine/fusion.py search_rrf) — differential
against a pure-Python recompute over the engine's own (oracle-pinned)
retriever rankings. Coverage: fused-score identity, window cutoff,
retriever families (BM25 / phrase / sort-by-field), rank_const,
deterministic ties, validation."""

import pytest

from engine import fusion, query as Q
from engine.config import IndexConfig
from engine.fixtures import spark_transcripts


@pytest.fixture(scope="module")
def ridx(spark, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("rrfidx") / "i")
    return build_index(spark, spark_transcripts(spark, 300), d,
                       cfg=IndexConfig(doc_values=("role", "ts"),
                                       index_positions=True))


def _want(frames, k, window, rc=60.0):
    scores = {}
    for rows in frames:
        for rank, row in enumerate(rows[:window], start=1):
            d = int(row["doc_id"])
            scores[d] = scores.get(d, 0.0) + 1.0 / (rc + rank)
    return sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]


def test_fuses_two_bm25_retrievers(ridx):
    # both retrievers include hot0, and the window spans the corpus, so
    # every hot0 doc accumulates contributions from BOTH rankings
    a = Q.search(ridx, "hot0 rare3", k=5000).collect()
    b = Q.search(ridx, "hot0 w007", k=5000).collect()
    want = _want([a, b], 10, 5000)
    got = [(r.doc_id, r.score)
           for r in fusion.search_rrf(
               ridx, [{"query": "hot0 rare3"}, {"query": "hot0 w007"}],
               k=10, window=5000).collect()]
    assert got == want
    # overlap actually exercised (docs contributed by both retrievers)
    assert set(r["doc_id"] for r in a) & set(r["doc_id"] for r in b)


def test_window_cutoff_binds(ridx):
    a = Q.search(ridx, "hot0", k=5).collect()
    b = Q.search(ridx, "hot1", k=5).collect()
    want = _want([a, b], 10, 5)
    got = [(r.doc_id, r.score)
           for r in fusion.search_rrf(
               ridx, [{"query": "hot0"}, {"query": "hot1"}],
               k=10, window=5).collect()]
    assert got == want


def test_hybrid_phrase_and_recency(ridx):
    ph = Q.search_phrase(ridx, "hot0 hot1", k=30).collect()
    rec = Q.search_sorted(ridx, "hot0", "ts", k=30, mode="OR").collect()
    bm = Q.search(ridx, "hot0 w007", k=30).collect()
    want = _want([ph, rec, bm], 8, 30)
    got = [(r.doc_id, r.score)
           for r in fusion.search_rrf(
               ridx, [{"query": "hot0 hot1", "mode": "PHRASE"},
                      {"query": "hot0", "sort_field": "ts"},
                      {"query": "hot0 w007"}],
               k=8, window=30).collect()]
    assert got == want


def test_rank_const(ridx):
    a = Q.search(ridx, "hot0", k=10).collect()
    want = _want([a], 5, 10, rc=10.0)
    got = [(r.doc_id, r.score)
           for r in fusion.search_rrf(ridx, [{"query": "hot0"}], k=5,
                                      window=10, rank_const=10).collect()]
    assert got == want


def test_validation_and_empty(ridx):
    with pytest.raises(ValueError, match="at least one"):
        fusion.search_rrf(ridx, [])
    with pytest.raises(ValueError, match="window"):
        fusion.search_rrf(ridx, [{"query": "hot0"}], window=0)
    with pytest.raises(ValueError, match="mode"):
        fusion.search_rrf(ridx, [{"query": "hot0", "mode": "XOR"}])
    df = fusion.search_rrf(ridx, [{"query": "nosuchterm"}])
    assert df.count() == 0 and df.columns == ["doc_id", "score"]
