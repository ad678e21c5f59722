"""minimum_should_match (ES bool-query floor): engine vs pure-Python
oracle rank identity at every floor value, batch path parity, edge and
error cases. Semantics (frozen, engine/query.py): OR mode only; a doc
qualifies with >= min_match DISTINCT query terms present; survivor
scores are the unchanged OR scores (same frozen summation order)."""

import pytest

from engine import query as Q
from engine.fixtures import QUERY_SET


@pytest.fixture(scope="module")
def packed_index(spark, corpus_df, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("idx_msm") / "packed")
    return build_index(spark, corpus_df, d)

MULTI = [q for q in QUERY_SET if q["mode"] == "OR"
         and len(set(q["query"].split())) >= 2]


@pytest.mark.parametrize("q", MULTI, ids=[q["id"] for q in MULTI])
def test_min_match_rank_identity(packed_index, oracle_idx, q):
    n = len(set(q["query"].split()))
    for m in range(2, n + 1):
        got = Q.search(packed_index, q["query"], k=10, mode="OR",
                       min_match=m).collect()
        want = oracle_idx.search(q["query"], k=10, mode="OR", min_match=m)
        assert [r["doc_id"] for r in got] == [d for d, _ in want], \
            (q["id"], m)
        for r, (_, s) in zip(got, want):
            assert abs(r["score"] - s) <= 1e-9, (q["id"], m)


def test_min_match_full_arity_equals_and(packed_index, oracle_idx):
    """min_match == n_distinct selects exactly the AND doc set (scores
    are OR scores == AND scores: same terms, same summation)."""
    q = "spark join fast"
    got = Q.search(packed_index, q, k=10, mode="OR", min_match=3).collect()
    want = Q.search(packed_index, q, k=10, mode="AND").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]


def test_min_match_one_is_plain_or(packed_index):
    q = "spark join fast"
    a = Q.search(packed_index, q, k=10, mode="OR", min_match=1).collect()
    b = Q.search(packed_index, q, k=10, mode="OR").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_min_match_above_known_terms_is_empty(packed_index):
    # 2 known terms + a corpus-absent one: floor of 3 is unreachable
    got = Q.search(packed_index, "spark join zzzunknownzzz", k=10,
                   mode="OR", min_match=3).collect()
    assert got == []


def test_min_match_rejects_and_mode(packed_index):
    with pytest.raises(ValueError, match="OR"):
        Q.search(packed_index, "spark join", mode="AND", min_match=2)


def test_min_match_composes_exclude(packed_index, oracle_idx):
    """NOT drops docs after the floor — parity vs oracle complement."""
    got = Q.search(packed_index, "spark join fast", k=10, mode="OR",
                   min_match=2, exclude="hash").collect()
    want = oracle_idx.search("spark join fast", k=1 << 30, mode="OR",
                             min_match=2)
    banned = {d for d, _ in oracle_idx.search("hash", k=1 << 30)}
    want = [(d, s) for d, s in want if d not in banned][:10]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) <= 1e-9


def test_batch_min_match_matches_single(packed_index):
    """A min_match entry inside search_batch == the single-query path;
    sibling entries in the same set are unaffected."""
    qs = [
        {"id": "m2", "query": "spark join fast", "mode": "OR",
         "min_match": 2},
        {"id": "plain", "query": "spark join fast", "mode": "OR"},
        {"id": "m2x", "query": "spark join fast", "mode": "OR",
         "min_match": 2, "exclude": "hash"},
    ]
    rows = Q.search_batch(packed_index, qs, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for qid, kw in [("m2", {"min_match": 2}), ("plain", {}),
                    ("m2x", {"min_match": 2, "exclude": "hash"})]:
        single = Q.search(packed_index, "spark join fast", k=10,
                          mode="OR", **kw).collect()
        assert by_q.get(qid, []) == [(r["doc_id"], r["score"])
                                     for r in single], qid


def test_batch_min_match_rejects_non_or(packed_index):
    with pytest.raises(ValueError, match="OR-family"):
        Q.search_batch(packed_index, [
            {"id": "x", "query": "spark join", "mode": "AND",
             "min_match": 2}])
