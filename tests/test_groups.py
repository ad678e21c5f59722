"""Group-level ranked retrieval (engine/matchops.py search_groups — the
ES has_child/score_mode pattern) — differential against a pure
recompute of the frozen contract (per-doc scores from the engine's own
oracle-pinned search, two-level left-fold for sum/avg). The index is
built with a SMALL shard width so the cross-shard fold order is
actually exercised."""

import numpy as np
import pytest

from engine import matchops as M, query as Q
from engine.config import IndexConfig
from engine.fixtures import spark_transcripts


@pytest.fixture(scope="module")
def gidx(spark, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("gidx") / "i")
    return build_index(spark, spark_transcripts(spark, 200), d,
                       cfg=IndexConfig(doc_values=("conv_id", "role"),
                                       docs_per_score_shard=256))


@pytest.fixture(scope="module")
def conv_of(gidx):
    return {int(r["doc_id"]): r["conv_id"]
            for r in gidx.corpus().select("doc_id", "conv_id").collect()}


def _want(gidx, conv_of, query, k, score_mode, **kw):
    rows = Q.search(gidx, query, k=10 ** 6, **kw).collect()
    w = gidx.shard_width
    per = {}  # g -> {shard -> [scores in doc order]}
    for r in sorted(rows, key=lambda r: int(r["doc_id"])):
        g = conv_of[int(r["doc_id"])]
        per.setdefault(g, {}).setdefault(
            int(r["doc_id"]) // w, []).append(float(r["score"]))
    out = []
    for g, shards in per.items():
        n = sum(len(v) for v in shards.values())
        mx = max(max(v) for v in shards.values())
        sm = 0.0
        for sh in sorted(shards):  # fold shard partials in shard order
            p = float(np.add.accumulate(
                np.asarray(shards[sh], np.float64))[-1])
            sm += p
        score = {"max": mx, "sum": sm, "avg": sm / n,
                 "count": float(n)}[score_mode]
        out.append((g, score, n))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


@pytest.mark.parametrize("score_mode", ["max", "sum", "avg", "count"])
def test_score_modes(gidx, conv_of, score_mode):
    got = [(r.group_key, r.score, r.n_docs)
           for r in M.search_groups(gidx, "hot0 w007", "conv_id", k=8,
                                    score_mode=score_mode).collect()]
    assert got == _want(gidx, conv_of, "hot0 w007", 8, score_mode)
    assert got  # non-vacuous


def test_multi_shard_fold_exercised(gidx, conv_of):
    # at width=256 with ~1300 docs there are >= 2 shards, and at least
    # one conversation's matches must span a shard boundary for hot0
    rows = Q.search(gidx, "hot0", k=10 ** 6).collect()
    w = gidx.shard_width
    spans = {}
    for r in rows:
        spans.setdefault(conv_of[int(r["doc_id"])], set()).add(
            int(r["doc_id"]) // w)
    assert len({s for v in spans.values() for s in v}) >= 2
    got = [(r.group_key, r.score, r.n_docs)
           for r in M.search_groups(gidx, "hot0", "conv_id", k=10,
                                    score_mode="sum").collect()]
    assert got == _want(gidx, conv_of, "hot0", 10, "sum")


def test_composes_with_exclude_and_mode(gidx, conv_of):
    got = [(r.group_key, r.score, r.n_docs)
           for r in M.search_groups(gidx, "hot0 hot1", "conv_id", k=5,
                                    mode="AND", exclude="rare3",
                                    score_mode="avg").collect()]
    assert got == _want(gidx, conv_of, "hot0 hot1", 5, "avg",
                        mode="AND", exclude="rare3")


def test_group_by_role(gidx, conv_of):
    # categorical field with 3 values: every matching doc lands in one
    rows = Q.search(gidx, "hot0", k=10 ** 6).collect()
    got = M.search_groups(gidx, "hot0", "role", k=10,
                          score_mode="count").collect()
    assert sum(r.n_docs for r in got) == len(rows)
    assert {r.group_key for r in got} <= {"user", "assistant", "tool"}


def test_validation_and_empty(gidx):
    with pytest.raises(ValueError, match="score_mode"):
        M.search_groups(gidx, "hot0", "conv_id", score_mode="median")
    with pytest.raises(ValueError, match="docvalue"):
        M.search_groups(gidx, "hot0", "ts")
    df = M.search_groups(gidx, "nosuchterm", "conv_id")
    assert df.count() == 0
    assert df.columns == ["group_key", "score", "n_docs"]
