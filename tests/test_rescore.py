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


# ---- hybrid text+vector rescore ------------------------------------


@pytest.fixture(scope="module")
def emb_df(spark, rsidx):
    """Deterministic per-doc embeddings (dim 16, seeded by doc_id),
    with every 5th doc MISSING an embedding row (the unknown-never-
    penalizes contract needs absent rows)."""
    import numpy as np
    n = int(rsidx.n_docs)
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]])
            for i in range(n) if i % 5 != 0]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").cache(), vecs


def _cos(a, b):
    import math
    ad = [float(x) for x in a]
    bd = [float(x) for x in b]
    dot = 0.0
    for x, y in zip(ad, bd):
        dot += x * y
    na = math.sqrt(sum(x * x for x in ad))
    nb = math.sqrt(sum(x * x for x in bd))
    return dot / (na * nb)


def test_vector_rescore_matches_recompute(rsidx, emb_df):
    emb, vecs = emb_df
    qv = [float(x) for x in vecs[1]]
    win = Q.search(rsidx, "hot0 rare3", k=40).collect()
    want = []
    for r in win:
        d = int(r["doc_id"])
        c = _cos(vecs[d].tolist(), qv) if d % 5 != 0 else 0.0
        want.append((d, 1.0 * float(r["score"]) + 2.0 * c))
    want = sorted(want, key=lambda t: (-t[1], t[0]))[:10]
    got = [(r.doc_id, r.score) for r in
           rescore.search_rescore_vector(
               rsidx, "hot0 rare3", emb, qv, k=10, window=40,
               vector_weight=2.0).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9
    # vector weight actually changes the order vs plain BM25 top-10
    plain = [int(r["doc_id"]) for r in win[:10]]
    assert [d for d, _ in got] != plain


def test_vector_rescore_pushdown_and_validation(rsidx, emb_df, spark):
    emb, vecs = emb_df
    qv = [float(x) for x in vecs[0]]
    with pytest.raises(ValueError, match="must be <= window"):
        rescore.search_rescore_vector(rsidx, "hot0", emb, qv, k=20,
                                      window=10)
    with pytest.raises(ValueError, match="non-zero"):
        rescore.search_rescore_vector(rsidx, "hot0", emb,
                                      [0.0] * 16, k=5, window=10)
    # empty primary -> empty local relation
    out = rescore.search_rescore_vector(rsidx, "zzznoterm", emb, qv,
                                        k=5, window=10)
    assert out.collect() == []
    # the window-ids filter reaches the parquet scan when emb is a
    # parquet read (pushed In predicate -> row-group pruning)
    import tempfile
    d = tempfile.mkdtemp(prefix="embp_") + "/emb"
    emb.write.mode("overwrite").parquet(d)
    pemb = spark.read.parquet(d)
    ids = [int(r["doc_id"]) for r in
           Q.search(rsidx, "hot0 rare3", k=10).collect()]
    from pyspark.sql import functions as F
    plan = (pemb.filter(F.col("vec_id").isin(ids)).select("vec_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [In(vec_id" in plan
