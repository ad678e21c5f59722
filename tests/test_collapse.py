"""Field collapsing (the ES ``collapse`` pattern) — engine/query.py
search_collapsed. Frozen semantics: one row per distinct stored-docvalue
value, each group represented by its best doc under the frozen (score
desc, doc_id asc) order, groups ranked by that representative; docs with
a NULL/absent key are EXCLUDED (the search_sorted NULL rule); scores are
the unchanged frozen BM25 scores.

Oracle: full plain-search ranking (rank-identity-pinned elsewhere)
reduced in pure Python: first doc per group in ranking order == the
group's best under the same total order. Coverage: oracle identity over
both stored fields, per-shard sufficiency (groups spanning shards),
NULL exclusion, composition with exclude/dv_filter/term_boosts,
validation.
"""

import numpy as np
import pandas as pd
import pytest

from engine import query as Q
from engine.config import IndexConfig
from engine.fixtures import make_transcripts, spark_transcripts


@pytest.fixture(scope="module")
def cidx(spark, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("cidx") / "i")
    idx = build_index(spark, spark_transcripts(spark, 300), d,
                      cfg=IndexConfig(doc_values=("role", "turn_idx")))
    return idx, make_transcripts(300)


def _collapse_want(idx, query, field_vals, k=10, **kw):
    """Reduce the engine's own full ranking (oracle-pinned) to
    best-per-group in pure Python: first doc per group in (score desc,
    doc_id asc) order is the group's best."""
    full = Q.search(idx, query, k=10 ** 9, **kw).collect()
    seen, out = set(), []
    for r in full:
        g = field_vals.get(r.doc_id)
        if g is None or g in seen:
            continue
        seen.add(g)
        out.append((g, r.doc_id, r.score))
    return out[:k]


def test_matches_reduced_ranking(cidx):
    idx, pdf = cidx
    for field in ("role", "turn_idx"):
        vals = {i: str(v) for i, v in enumerate(pdf[field])}
        want = _collapse_want(idx, "hot0 rare3", vals, k=10)
        got = [(r.group_key, r.doc_id, r.score)
               for r in Q.search_collapsed(idx, "hot0 rare3", field,
                                           k=10).collect()]
        assert got == want, field


def test_one_row_per_group_and_order(cidx):
    idx, _ = cidx
    rows = Q.search_collapsed(idx, "hot0", "turn_idx", k=100).collect()
    keys = [r.group_key for r in rows]
    assert len(keys) == len(set(keys))
    scores = [(r.score, -r.doc_id) for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_groups_span_shards(spark, tmp_path):
    """Per-shard sufficiency: with multiple scoring shards, a group's
    best doc may sit in any shard — the reduced result must equal the
    pure-Python reduction of the global ranking."""
    from engine.build import build_index
    idx = build_index(spark, spark_transcripts(spark, 300),
                      str(tmp_path / "multi"),
                      cfg=IndexConfig(doc_values=("role", "turn_idx"),
                                      docs_per_score_shard=256))
    assert idx.n_docs > 256  # really multiple shards
    pdf = make_transcripts(300)
    vals = {i: str(v) for i, v in enumerate(pdf["role"])}
    want = _collapse_want(idx, "hot0 rare3", vals, k=10)
    got = [(r.group_key, r.doc_id, r.score)
           for r in Q.search_collapsed(idx, "hot0 rare3", "role",
                                       k=10).collect()]
    assert got == want


def test_null_keys_excluded(spark, tmp_path):
    from engine.build import build_index
    from engine.fixtures import spark_transcripts as st
    df = st(spark, 60)
    import pyspark.sql.functions as F
    # NULL the role of every even turn_idx row
    df = df.withColumn("role", F.when(F.col("turn_idx") % 2 == 0,
                                      F.lit(None)).otherwise(F.col("role")))
    idx = build_index(spark, df, str(tmp_path / "nulls"),
                      cfg=IndexConfig(doc_values=("role",)))
    rows = Q.search_collapsed(idx, "hot0", "role", k=100).collect()
    assert rows  # something matched
    # the engine's corpus keeps the NULLed column: verify no winner has it
    corpus = {r.doc_id: r.role for r in
              idx.corpus().select("doc_id", "role").collect()}
    for r in rows:
        assert corpus[r.doc_id] is not None
        assert r.group_key == corpus[r.doc_id]


def test_composes_exclude_dvfilter_boosts(cidx):
    idx, pdf = cidx
    kw = dict(exclude="w002", dv_filter="turn_idx > 1",
              term_boosts={"rare3": 3.0})
    full = Q.search(idx, "hot0 rare3", k=10 ** 9, **kw).collect()
    vals = {i: str(v) for i, v in enumerate(pdf["role"])}
    seen, want = set(), []
    for r in full:
        g = vals.get(r.doc_id)
        if g is None or g in seen:
            continue
        seen.add(g)
        want.append((g, r.doc_id, r.score))
    got = [(r.group_key, r.doc_id, r.score)
           for r in Q.search_collapsed(idx, "hot0 rare3", "role", k=10,
                                       **kw).collect()]
    assert got == want[:10]


def test_composes_doc_filter(cidx):
    """collapse through the doc_filter cogroup path (fn2): result ==
    pure-Python reduction of the filtered full ranking."""
    idx, pdf = cidx
    vals = {i: str(v) for i, v in enumerate(pdf["role"])}
    full = Q.search(idx, "hot0 rare3", k=10 ** 9,
                    doc_filter="turn_idx >= 2").collect()
    seen, want = set(), []
    for r in full:
        g = vals.get(r.doc_id)
        if g is None or g in seen:
            continue
        seen.add(g)
        want.append((g, r.doc_id, r.score))
    got = [(r.group_key, r.doc_id, r.score)
           for r in Q.search_collapsed(idx, "hot0 rare3", "role", k=10,
                                       doc_filter="turn_idx >= 2").collect()]
    assert got == want[:10] and got


def test_collapse_plan_pruned(cidx):
    """Plan guard: the collapse job is STILL the single pruned postings
    scan (bucket partition filter, term pushdown, no WAND columns) —
    group values come from the in-task docvalue slice, never a
    Spark-side corpus scan — ending in the tiny window + top-k."""
    import re
    idx, _ = cidx
    out = Q.search_collapsed(idx, "hot0 rare3", "role", k=10)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert re.search(r"PartitionFilters: \[.*bucket.*IN", plan), plan
    assert re.search(r"PushedFilters: \[.*[Ii]n\(term", plan), plan
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert len(schemas) == 1 and "doc_ids" in schemas[0], schemas
    assert "blocks" not in schemas[0]  # exhaustive: no WAND columns
    assert "text" not in plan  # zero corpus scan
    assert "TakeOrderedAndProject" in plan


def test_collapse_respects_tombstones(spark, tmp_path):
    """Deleted docs can never represent (or count for) a group: the
    collapsed result equals the reduction of the post-delete ranking."""
    from engine.build import build_index
    from engine.deletes import delete_docs
    idx = build_index(spark, spark_transcripts(spark, 120),
                      str(tmp_path / "del"),
                      cfg=IndexConfig(doc_values=("role", "turn_idx")))
    pdf = make_transcripts(120)
    n = delete_docs(idx, "turn_idx = 0")
    assert n > 0
    vals = {i: str(v) for i, v in enumerate(pdf["role"])}
    got = [(r.group_key, r.doc_id, r.score)
           for r in Q.search_collapsed(idx, "hot0 rare3", "role",
                                       k=10).collect()]
    want = _collapse_want(idx, "hot0 rare3", vals, k=10)  # search() sees
    assert got == want                       # the same tombstones
    deleted = {i for i, t in enumerate(pdf["turn_idx"]) if t == 0}
    for _, d, _ in got:
        assert d not in deleted


def test_validation(cidx):
    idx, _ = cidx
    with pytest.raises(ValueError, match="docvalue"):
        Q.search_collapsed(idx, "hot0", "no_such_field").collect()


def test_unknown_term_empty(cidx):
    idx, _ = cidx
    out = Q.search_collapsed(idx, "zzzznotaterm", "role", k=10)
    assert out.collect() == []
    assert out.columns == ["group_key", "doc_id", "score"]
