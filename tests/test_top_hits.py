"""Top-hits aggregation (the ES ``top_hits`` sub-agg) — engine/query.py
search_top_hits. Frozen semantics: top-k groups by their best doc
(search_collapsed's group order), each carrying its own top-N docs under
the frozen (score desc, doc_id asc) order; NULL keys excluded; scores
unchanged.

Oracle: the engine's own full ranking (rank-identity-pinned elsewhere)
reduced in pure Python. Coverage: oracle identity, n=1 degeneration to
search_collapsed, per-shard sufficiency for TRAILING hits (the case the
n=1 per-shard-top-k-groups cut would miss), composition with exclude/
dv_filter, row order, validation.
"""

import pytest

from engine import query as Q
from engine.config import IndexConfig
from engine.fixtures import make_transcripts, spark_transcripts


@pytest.fixture(scope="module")
def tidx(spark, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("thidx") / "i")
    idx = build_index(spark, spark_transcripts(spark, 300), d,
                      cfg=IndexConfig(doc_values=("role", "turn_idx")))
    return idx, make_transcripts(300)


def _top_hits_want(idx, query, field_vals, k, n, **kw):
    """Pure-Python reduction of the engine's full ranking: per group in
    first-appearance (== best-doc) order, its first n docs."""
    full = Q.search(idx, query, k=10 ** 9, **kw).collect()
    groups, order = {}, []
    for r in full:
        g = field_vals.get(r.doc_id)
        if g is None:
            continue
        if g not in groups:
            groups[g] = []
            order.append(g)
        if len(groups[g]) < n:
            groups[g].append((g, r.doc_id, r.score))
    out = []
    for g in order[:k]:
        out.extend(groups[g])
    return out


def test_matches_reduced_ranking(tidx):
    idx, pdf = tidx
    for field, k, n in (("role", 3, 4), ("turn_idx", 5, 2)):
        vals = {i: str(v) for i, v in enumerate(pdf[field])}
        want = _top_hits_want(idx, "hot0 rare3", vals, k, n)
        got = [(r.group_key, r.doc_id, r.score)
               for r in Q.search_top_hits(idx, "hot0 rare3", field, k=k,
                                          hits_per_group=n).collect()]
        assert got == want, field


def test_n1_degenerates_to_collapse(tidx):
    idx, _ = tidx
    got = [(r.group_key, r.doc_id, r.score)
           for r in Q.search_top_hits(idx, "hot0 mid2", "role", k=4,
                                      hits_per_group=1).collect()]
    want = [(r.group_key, r.doc_id, r.score)
            for r in Q.search_collapsed(idx, "hot0 mid2", "role",
                                        k=4).collect()]
    assert got == want


def test_trailing_hits_span_shards(spark, tmp_path):
    """The sufficiency case n=1 doesn't face: a global top-k group's
    2nd..Nth hits may live in shards where the group is NOT locally
    top-k — the all-groups per-shard emission must still find them."""
    from engine.build import build_index
    idx = build_index(spark, spark_transcripts(spark, 300),
                      str(tmp_path / "multi"),
                      cfg=IndexConfig(doc_values=("role", "turn_idx"),
                                      docs_per_score_shard=256))
    assert idx.n_docs > 256
    pdf = make_transcripts(300)
    for field in ("role", "turn_idx"):
        vals = {i: str(v) for i, v in enumerate(pdf[field])}
        want = _top_hits_want(idx, "hot0 rare3", vals, 6, 3)
        got = [(r.group_key, r.doc_id, r.score)
               for r in Q.search_top_hits(idx, "hot0 rare3", field, k=6,
                                          hits_per_group=3).collect()]
        assert got == want, field


def test_composes_with_filters(tidx):
    idx, pdf = tidx
    vals = {i: str(v) for i, v in enumerate(pdf["turn_idx"])}
    want = _top_hits_want(idx, "hot0 hot1", vals, 4, 2,
                          exclude="mid1", dv_filter="role = 'user'")
    got = [(r.group_key, r.doc_id, r.score)
           for r in Q.search_top_hits(idx, "hot0 hot1", "turn_idx", k=4,
                                      hits_per_group=2, exclude="mid1",
                                      dv_filter="role = 'user'").collect()]
    assert got == want


def test_validation(tidx):
    idx, _ = tidx
    with pytest.raises(ValueError, match="hits_per_group"):
        Q.search_top_hits(idx, "hot0", "role", hits_per_group=0)
    with pytest.raises(ValueError, match="docvalue"):
        Q.search_top_hits(idx, "hot0", "nosuchfield")
    assert Q.search_top_hits(idx, "nosuchterm", "role").count() == 0
