"""ES bool query (engine/query.py search_bool): must + should +
min_should_match + must_not in ONE search job. Frozen semantics (mirrored
by OracleIndex.search_bool and the DuckDB gate twin ``bm25_bool``):

- a doc qualifies iff EVERY distinct must term is present, at least
  ``min_should_match`` distinct should terms are present (ES default: 0
  when must clauses exist, else 1), and no exclude term is present;
- the score is the plain BM25 OR sum over must UNION should terms (both
  clause kinds contribute; qtf merges by occurrence count across the two
  clause texts; a term in both clauses counts as must for arity);
- an unknown must term, or a floor above the number of known should
  terms, returns empty.
"""

import pytest

from engine import query as Q


@pytest.fixture(scope="module")
def packed_index(spark, corpus_df, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("idx_bool") / "packed")
    return build_index(spark, corpus_df, d)


CASES = [
    ("hot0", "w020 rare3", None, None),
    ("hot0", "w020 rare3 w010", 1, None),
    ("hot0", "w020 rare3 w010", 2, None),
    ("hot0 hot1", "", None, None),            # pure must == AND
    ("rare1", "hot0 hot0 w020", None, None),  # repeated should token (qtf)
    ("hot0", "w020 rare3", None, "hot1"),     # must_not composes
    ("hot0 w020", "w020 rare3", None, None),  # overlap term counts as must
]


@pytest.mark.parametrize("must,should,msm,exc", CASES)
def test_bool_rank_identity(packed_index, oracle_idx, must, should, msm, exc):
    got = Q.search_bool(packed_index, must, should, k=10,
                        min_should_match=msm, exclude=exc).collect()
    want = oracle_idx.search_bool(must, should, k=10,
                                  min_should_match=msm, exclude=exc)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) <= 1e-9


def test_bool_pure_must_equals_and(packed_index):
    """No should clauses: bool degenerates to AND over the must terms
    (same doc set, same scores — the OR sum over the same terms)."""
    a = Q.search_bool(packed_index, "hot0 hot1", k=10).collect()
    b = Q.search(packed_index, "hot0 hot1", k=10, mode="AND").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bool_pure_should_equals_or(packed_index):
    """No must clauses: ES default min_should_match=1 -> plain OR."""
    a = Q.search_bool(packed_index, "", "hot0 w020", k=10).collect()
    b = Q.search(packed_index, "hot0 w020", k=10, mode="OR").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bool_must_default_floor_is_zero(packed_index, oracle_idx):
    """With must clauses the ES default floor is 0: docs matching only
    the must terms still qualify (should terms just add score)."""
    got = Q.search_bool(packed_index, "rare1", "rare2 rare3",
                        k=1 << 20).collect()
    only_must = oracle_idx.search("rare1", k=1 << 20)
    assert len(got) == len(only_must)  # same doc SET as must alone


def test_bool_unknown_must_is_empty(packed_index):
    assert Q.search_bool(packed_index, "zzzunknownzzz", "hot0").collect() \
        == []


def test_bool_unreachable_floor_is_empty(packed_index):
    # 2 distinct should terms, floor of 3
    assert Q.search_bool(packed_index, "hot0", "w020 rare3",
                         min_should_match=3).collect() == []
    # floor above KNOWN should terms (one should term is corpus-absent)
    assert Q.search_bool(packed_index, "hot0", "w020 zzzunknownzzz",
                         min_should_match=2).collect() == []


def test_bool_negative_floor_rejected(packed_index):
    with pytest.raises(ValueError, match="min_should_match"):
        Q.search_bool(packed_index, "hot0", "w020", min_should_match=-1)


def test_bool_doc_filter_composes(packed_index, oracle_idx, corpus_pdf):
    got = Q.search_bool(packed_index, "hot0", "w020 rare3", k=10,
                        doc_filter="role = 'user'").collect()
    roles = dict(zip(range(len(corpus_pdf)), corpus_pdf.role))
    want = [(d, s) for d, s in
            oracle_idx.search_bool("hot0", "w020 rare3", k=1 << 30)
            if roles[d] == "user"][:10]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) <= 1e-9


def test_batch_bool_matches_single(packed_index):
    """BOOL entries inside search_batch == the single-query path; mixed
    sibling entries in the same set are unaffected."""
    qs = [
        {"id": "b1", "mode": "BOOL", "must": "hot0", "should": "w020 rare3"},
        {"id": "b2", "mode": "BOOL", "must": "hot0",
         "should": "w020 rare3 w010", "min_should_match": 2},
        {"id": "b3", "mode": "BOOL", "must": "zzz", "should": "hot0"},
        {"id": "b4", "mode": "BOOL", "must": "hot0", "should": "w020",
         "exclude": "hot1"},
        {"id": "b5", "mode": "BOOL", "must": "", "should": "hot0 w020 rare3",
         "min_should_match": 2},
        {"id": "o1", "mode": "OR", "query": "hot0 w020"},
        {"id": "a1", "mode": "AND", "query": "hot0 rare5"},
    ]
    res = Q.search_batch(packed_index, qs, k=10).collect()
    by: dict = {}
    for r in res:
        by.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    singles = {
        "b1": Q.search_bool(packed_index, "hot0", "w020 rare3", k=10),
        "b2": Q.search_bool(packed_index, "hot0", "w020 rare3 w010", k=10,
                            min_should_match=2),
        "b3": Q.search_bool(packed_index, "zzz", "hot0", k=10),
        "b4": Q.search_bool(packed_index, "hot0", "w020", k=10,
                            exclude="hot1"),
        "b5": Q.search_bool(packed_index, "", "hot0 w020 rare3", k=10,
                            min_should_match=2),
        "o1": Q.search(packed_index, "hot0 w020", k=10),
        "a1": Q.search(packed_index, "hot0 rare5", k=10, mode="AND"),
    }
    for qid, sdf in singles.items():
        want = [(r["doc_id"], r["score"]) for r in sdf.collect()]
        assert by.get(qid, []) == want, qid


def test_batch_bool_doc_filter(packed_index):
    qs = [{"id": "b1", "mode": "BOOL", "must": "hot0",
           "should": "w020 rare3"}]
    res = Q.search_batch(packed_index, qs, k=10,
                         doc_filter="role = 'user'").collect()
    want = Q.search_bool(packed_index, "hot0", "w020 rare3", k=10,
                         doc_filter="role = 'user'").collect()
    assert [(r["doc_id"], r["score"]) for r in res] == \
           [(r["doc_id"], r["score"]) for r in want]
