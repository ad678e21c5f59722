"""Federated multi-index search (engine/multi.py): one BM25 ranking over
several packed indexes with EXACT global statistics. The invariant under
test: scoring a union corpus through N member indexes is bit-identical to
scoring ONE index built over the union — global df/N/avgdl derived
driver-side from the members' lexicons + manifests, per-doc sums
unchanged (a doc lives in exactly one member)."""

import pytest

from engine import query as Q
from engine.multi import global_stats, search_multi


@pytest.fixture(scope="module")
def three(spark, corpus_df, tmp_path_factory):
    """(members, full): the fixture corpus split into two member indexes
    by conv_id (stable-order prefix split: member ids map to full ids by
    offset), plus one index over the whole corpus."""
    from engine.build import build_index
    convs = sorted(r["conv_id"]
                   for r in corpus_df.select("conv_id").distinct().collect())
    cut = convs[len(convs) // 2]
    root = tmp_path_factory.mktemp("idx_multi")
    a = build_index(spark, corpus_df.filter(corpus_df.conv_id < cut),
                    str(root / "a"))
    b = build_index(spark, corpus_df.filter(corpus_df.conv_id >= cut),
                    str(root / "b"))
    full = build_index(spark, corpus_df, str(root / "full"))
    return [a, b], full


def _mapped(rows, members):
    offs = [0]
    for ix in members[:-1]:
        offs.append(offs[-1] + ix.n_docs)
    return [(r["doc_id"] + offs[r["index_id"]], r["score"]) for r in rows]


CASES = [
    ("hot0 w020", "OR", None),
    ("hot0 rare5", "AND", None),
    ("hot0 w020", "OR", "hot1"),
    ("hot0", "OR", None),
    ("hot0 hot1 w020 rare3", "OR", None),
]


def test_global_stats_equal_union(three):
    members, full = three
    n_g, avgdl_g = global_stats(members)
    assert n_g == full.n_docs
    assert abs(avgdl_g - full.avgdl) <= 1e-12


@pytest.mark.parametrize("q,mode,exc", CASES)
def test_multi_equals_union_index(three, q, mode, exc):
    members, full = three
    got = _mapped(search_multi(members, q, k=10, mode=mode,
                               exclude=exc).collect(), members)
    want = [(r["doc_id"], r["score"])
            for r in Q.search(full, q, k=10, mode=mode,
                              exclude=exc).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) <= 1e-9


def test_multi_wand_parity(three):
    """Forced WAND on every member == forced exhaustive (block bounds are
    stats-independent, so pruning with GLOBAL idf/avgdl is rank-safe)."""
    members, _ = three
    a = search_multi(members, "hot0 w020", k=10, use_wand=True).collect()
    b = search_multi(members, "hot0 w020", k=10, use_wand=False).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_multi_unknown_term_and_empty(three):
    members, _ = three
    assert search_multi(members, "zzzunknownzzz", k=10).collect() == []
    # AND with a term absent from the UNION corpus is empty even though
    # the other term exists
    assert search_multi(members, "hot0 zzzunknownzzz", k=10,
                        mode="AND").collect() == []


def test_multi_single_member_equals_search(three):
    """Degenerate federation: one member == plain search on it."""
    members, _ = three
    a = search_multi([members[0]], "hot0 w020", k=10).collect()
    b = Q.search(members[0], "hot0 w020", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]


def test_multi_refuses_mixed_configs(three, spark, corpus_df,
                                     tmp_path_factory):
    from dataclasses import replace

    from engine.build import build_index
    from engine.config import DEFAULT
    members, _ = three
    other = build_index(
        spark, corpus_df.limit(50),
        str(tmp_path_factory.mktemp("idx_multi_bad") / "idx"),
        cfg=replace(DEFAULT, bm25=replace(DEFAULT.bm25, k1=0.5)))
    with pytest.raises(ValueError, match="BM25 constants"):
        search_multi([members[0], other], "hot0")


def test_index_boosts_recompute(three):
    """indices_boost: member scores multiply AFTER the frozen summation
    — recompute from the unboosted per-member rows."""
    from engine.multi import search_multi
    (a, b), _ = three
    plain = search_multi([a, b], "hot0 mid1", k=10 ** 6).collect()
    w = [1.0, 3.0]
    want = sorted(((r.index_id, r.doc_id, r.score * w[r.index_id])
                   for r in plain),
                  key=lambda t: (-t[2], t[0], t[1]))[:10]
    got = [(r.index_id, r.doc_id, r.score) for r in
           search_multi([a, b], "hot0 mid1", k=10,
                        index_boosts=w).collect()]
    assert [(i, d) for i, d, _ in got] == [(i, d) for i, d, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-12
    # the boost actually changes the interleave
    assert [(r.index_id, r.doc_id) for r in plain[:10]] != \
        [(i, d) for i, d, _ in got]
    # identity weights == plain (fast path: no multiply column)
    same = [(r.index_id, r.doc_id, r.score) for r in
            search_multi([a, b], "hot0 mid1", k=10,
                         index_boosts=[1.0, 1.0]).collect()]
    assert same == [(r.index_id, r.doc_id, r.score) for r in plain[:10]]


def test_index_boosts_validation(three):
    from engine.multi import search_multi
    (a, b), _ = three
    import pytest as _pt
    with _pt.raises(ValueError, match="one weight per index"):
        search_multi([a, b], "hot0", index_boosts=[1.0])
    with _pt.raises(ValueError, match="finite and > 0"):
        search_multi([a, b], "hot0", index_boosts=[1.0, 0.0])
