"""Query rescoring (engine/rescore.py search_rescore) — differential
against a pure-Python recompute over the engine's own window + the
oracle's full secondary scores. Coverage: weighted-total identity,
window binding, non-matching-secondary docs (0.0 contribution),
doc_filter/exclude on the primary, k<=window validation, empty
primary."""

import pytest

from engine import query as Q, rescore
from engine.config import IndexConfig
from engine.fixtures import spark_transcripts


@pytest.fixture(scope="module")
def rsidx(spark, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("rsidx") / "i")
    return build_index(spark, spark_transcripts(spark, 300), d,
                       cfg=IndexConfig(doc_values=("role", "ts")))


def _want(primary_rows, sec_rows, k, wq, wr):
    smap = {int(r["doc_id"]): float(r["score"]) for r in sec_rows}
    fused = [(int(r["doc_id"]),
              wq * float(r["score"]) + wr * smap.get(int(r["doc_id"]), 0.0))
             for r in primary_rows]
    return sorted(fused, key=lambda t: (-t[1], t[0]))[:k]


def _full_secondary(idx, q, ids):
    # ground truth: the secondary query scored over the WHOLE corpus
    # (global stats), then restricted to the window ids
    rows = Q.search(idx, q, k=10 ** 6).collect()
    keep = set(ids)
    return [r for r in rows if int(r["doc_id"]) in keep]


def test_weighted_total(rsidx):
    win = Q.search(rsidx, "hot0 rare3", k=40).collect()
    ids = [int(r["doc_id"]) for r in win]
    sec = _full_secondary(rsidx, "hot1 w007", ids)
    want = _want(win, sec, 10, 1.0, 2.0)
    got = [(r.doc_id, r.score)
           for r in rescore.search_rescore(
               rsidx, "hot0 rare3", "hot1 w007", k=10, window=40,
               query_weight=1.0, rescore_weight=2.0).collect()]
    assert got == want
    # the rescore actually changed the order vs the primary alone
    assert [d for d, _ in want][:10] != ids[:10] or len(ids) <= 10
    # and at least one window doc matched the secondary
    assert sec


def test_window_binds(rsidx):
    # a doc ranked below the window can never appear, even if its
    # secondary score would lift it above everything
    win5 = Q.search(rsidx, "hot0", k=5).collect()
    got = rescore.search_rescore(rsidx, "hot0", "hot0", k=5,
                                 window=5).collect()
    assert set(int(r["doc_id"]) for r in got) == set(
        int(r["doc_id"]) for r in win5)


def test_nonmatching_secondary_is_zero(rsidx):
    win = Q.search(rsidx, "hot0", k=15).collect()
    got = [(r.doc_id, r.score)
           for r in rescore.search_rescore(
               rsidx, "hot0", "nosuchterm", k=10, window=15,
               query_weight=3.0).collect()]
    want = _want(win, [], 10, 3.0, 1.0)
    assert got == want


def test_primary_options_compose(rsidx):
    win = Q.search(rsidx, "hot0 hot1", k=20, mode="AND",
                   doc_filter="role = 'user'").collect()
    ids = [int(r["doc_id"]) for r in win]
    sec = _full_secondary(rsidx, "rare3", ids)
    want = _want(win, sec, 8, 1.0, 1.0)
    got = [(r.doc_id, r.score)
           for r in rescore.search_rescore(
               rsidx, "hot0 hot1", "rare3", k=8, window=20, mode="AND",
               doc_filter="role = 'user'").collect()]
    assert got == want


def test_validation_and_empty(rsidx):
    with pytest.raises(ValueError, match="window"):
        rescore.search_rescore(rsidx, "hot0", "hot1", k=20, window=10)
    df = rescore.search_rescore(rsidx, "nosuchterm", "hot0")
    assert df.count() == 0 and df.columns == ["doc_id", "score"]
