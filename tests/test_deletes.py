"""Document deletes (engine/deletes.py): tombstone visibility across
every query surface, the frozen two-phase stats contract, physical purge
equivalence, and id-space stability for post-purge appends.

Contract under test (deletes.py docstring):
* tombstoned docs disappear from search / batch / phrase / prefix /
  sorted / facets IMMEDIATELY, while N/avgdl/idf stay the last build's —
  i.e. delete-by-query == doc_filter with the negated predicate
  (identical frozen candidate-restriction semantics), which this suite
  uses as its oracle;
* purge_deletes rewrites the final segment minus deleted postings and
  rebuilds stats over the live docs — post-purge results must equal a
  fresh batch build over the surviving corpus (compared on the stable
  (conv_id, turn_idx) keys: doc_ids shift in the fresh build, scores
  must not);
* doc_ids are never renumbered; appends after a purge allocate above
  ``n_ids`` so ids never collide.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from engine import query as Q
from engine.build import build_index, load_index
from engine.config import IndexConfig
from engine.deletes import delete_docs, delete_ids, purge_deletes

pytestmark = pytest.mark.usefixtures("spark")

CFG = IndexConfig(doc_values=("role", "ts"), index_positions=True)
PRED = "role = 'assistant'"          # the deleted slice
KEEP = "NOT (role = 'assistant')"    # its doc_filter complement


@pytest.fixture(scope="module")
def base_idx(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("delbase") / "packed")
    return build_index(spark, corpus_df, d, cfg=CFG)


@pytest.fixture()
def idx_copy(spark, base_idx, tmp_path):
    """Mutable copy of the base index (deletes mutate on-disk state)."""
    d = str(tmp_path / "packed")
    shutil.copytree(base_idx.index_dir, d)
    return load_index(spark, d)


def rows(df, cols=("doc_id", "score")):
    return [tuple(r[c] for c in cols) for r in df.collect()]


def test_delete_by_query_equals_doc_filter(spark, base_idx, idx_copy):
    """Tombstone semantics ARE doc_filter semantics with global stats:
    delete(P) then search == search(doc_filter=NOT P) on the clean index
    — bit-identical scores (same summation order, same stats)."""
    n = delete_docs(idx_copy, PRED)
    assert n > 0 and idx_copy.n_deleted == n
    for q, mode in [("hot0 hot1", "OR"), ("hot0 mid1", "AND"),
                    ("hot0 rare0", "OR")]:
        got = rows(Q.search(idx_copy, q, k=10, mode=mode))
        want = rows(Q.search(base_idx, q, k=10, mode=mode,
                             doc_filter=KEEP))
        assert got == want, (q, mode)


def test_delete_ids_immediate_and_score_frozen(base_idx, idx_copy):
    """Deleting the top-2 hits promotes ranks 3.. with UNCHANGED scores
    (stats frozen until purge); deleted ids never reappear."""
    pre = rows(Q.search(base_idx, "hot0 hot1", k=12))
    dead = [pre[0][0], pre[1][0]]
    assert delete_ids(idx_copy, dead) == 2
    got = rows(Q.search(idx_copy, "hot0 hot1", k=10))
    assert got == [r for r in pre if r[0] not in dead][:10]


def test_delete_second_batch_visible(base_idx, idx_copy):
    """Epoch bump: a second tombstone batch invalidates worker caches."""
    pre = rows(Q.search(base_idx, "hot0 hot1", k=13))
    delete_ids(idx_copy, [pre[0][0]])
    rows(Q.search(idx_copy, "hot0 hot1", k=10))  # warms tombstone caches
    delete_ids(idx_copy, [pre[1][0], pre[2][0]])
    got = rows(Q.search(idx_copy, "hot0 hot1", k=10))
    dead = {pre[0][0], pre[1][0], pre[2][0]}
    assert got == [r for r in pre if r[0] not in dead][:10]


def test_deletes_all_query_surfaces(spark, base_idx, idx_copy):
    """WAND, batch (incl. PHRASE + NOT entries), prefix, sorted, facets,
    phrase: every surface masks tombstones, matching its doc_filter /
    dv_filter twin on the clean index."""
    delete_docs(idx_copy, PRED)
    # forced WAND == exhaustive on the tombstoned index (rank-safety)
    w = rows(Q.search(idx_copy, "hot0 hot1", k=10, use_wand=True))
    e = rows(Q.search(idx_copy, "hot0 hot1", k=10, use_wand=False))
    assert w == e and w
    # batch: one job, every mode
    qset = [{"id": "a", "query": "hot0 mid1", "mode": "OR"},
            {"id": "b", "query": "hot0 hot1", "mode": "AND"},
            {"id": "c", "query": "hot0", "mode": "OR", "exclude": "mid1"},
            {"id": "p", "query": "hot0 hot1", "mode": "PHRASE"},
            {"id": "x", "query": "hot*", "mode": "PREFIX"}]
    got = {}
    for r in Q.search_batch(idx_copy, qset, k=10).collect():
        got.setdefault(r.qid, []).append((r.doc_id, r.score))
    want = {}
    for r in Q.search_batch(base_idx, qset, k=10,
                            doc_filter=KEEP).collect():
        want.setdefault(r.qid, []).append((r.doc_id, r.score))
    assert got == want and set(got) == {q["id"] for q in qset}
    # prefix (single-query form)
    assert rows(Q.search_prefix(idx_copy, "hot*", k=10)) == \
        rows(Q.search_prefix(base_idx, "hot*", k=10, doc_filter=KEEP))
    # sort-by-field (dv_filter twin — same mask machinery)
    assert rows(Q.search_sorted(idx_copy, "hot0 hot1", "ts", k=10),
                ("doc_id", "sort_val")) == \
        rows(Q.search_sorted(base_idx, "hot0 hot1", "ts", k=10,
                             dv_filter=KEEP), ("doc_id", "sort_val"))
    # phrase (single-query form)
    assert rows(Q.search_phrase(idx_copy, "hot0 hot1", k=10),
                ("doc_id", "n_phrase")) == \
        rows(Q.search_phrase(base_idx, "hot0 hot1", k=10,
                             doc_filter=KEEP), ("doc_id", "n_phrase"))
    # facets: counts over the live match set only
    fc = ("facet_field", "facet_value", "n_docs")
    assert rows(Q.facets(idx_copy, "hot0", ["role"], mode="OR"), fc) == \
        rows(Q.facets(base_idx, "hot0", ["role"], mode="OR",
                      doc_filter=KEEP), fc)
    # filtered search composes: doc_filter AND tombstones intersect
    assert rows(Q.search(idx_copy, "hot0 hot1", k=10,
                         doc_filter="turn_idx >= 1")) == \
        rows(Q.search(base_idx, "hot0 hot1", k=10,
                      doc_filter=f"turn_idx >= 1 AND ({KEEP})"))


def test_purge_equals_fresh_build(spark, corpus_df, idx_copy, tmp_path):
    """After purge, ranking == a fresh batch build over the surviving
    corpus — compared on (conv_id, turn_idx, score): doc_ids shift in
    the fresh build (dense reassignment), scores and order must not."""
    delete_docs(idx_copy, PRED)
    purged = purge_deletes(idx_copy)
    assert purged.n_deleted == 0 and purged.n_docs < purged.n_ids
    fresh = build_index(spark, corpus_df.filter(KEEP),
                        str(tmp_path / "fresh"), cfg=CFG)
    assert purged.n_docs == fresh.n_docs
    assert abs(purged.avgdl - fresh.avgdl) < 1e-12
    cols = ("conv_id", "turn_idx", "score")
    for q, mode in [("hot0 hot1", "OR"), ("hot0 mid1", "AND")]:
        got = rows(Q.materialize_packed(
            purged, Q.search(purged, q, k=10, mode=mode)), cols)
        want = rows(Q.materialize_packed(
            fresh, Q.search(fresh, q, k=10, mode=mode)), cols)
        assert got == want, (q, mode)
    # phrase after purge: the positions stream was re-encoded minus the
    # purged postings — must match the fresh positions index exactly
    pc = ("conv_id", "turn_idx", "n_phrase")
    got = rows(Q.materialize_packed(
        purged, Q.search_phrase(purged, "hot0 hot1", k=10)), pc)
    want = rows(Q.materialize_packed(
        fresh, Q.search_phrase(fresh, "hot0 hot1", k=10)), pc)
    assert got == want


def test_append_after_purge_ids_stable(spark, corpus_df, idx_copy):
    """Purge freezes the id ceiling: a later append allocates ABOVE
    n_ids, never reusing a purged doc's id; post-compact search sees the
    appended docs."""
    from engine.streaming import append_batch, compact
    n_before = idx_copy.n_docs
    delete_docs(idx_copy, PRED)
    purged = purge_deletes(idx_copy)
    assert purged.n_ids == n_before
    extra = (corpus_df.filter("role = 'user'").limit(7)
             .withColumn("conv_id", F.concat(F.lit("zz-"), F.col("conv_id")))
             .withColumn("text", F.lit("zzuniq marker")))
    n_new = append_batch(spark, extra, purged.index_dir)
    assert n_new == 7
    idx2 = compact(spark, purged.index_dir)
    assert idx2.n_ids == n_before + 7 and idx2.n_docs == purged.n_docs + 7
    # appended ids sit above the frozen ceiling — no collision with any
    # live or purged id
    new_ids = sorted(r.doc_id for r in idx2.docmap()
                     .filter(F.col("conv_id").startswith("zz-")).collect())
    assert new_ids == list(range(n_before, n_before + 7))
    # appended docs are searchable post-compact
    got = sorted(r.doc_id for r in
                 Q.search(idx2, "zzuniq", k=20).collect())
    assert got == new_ids


def test_purge_refuses_pending_increments(spark, corpus_df, idx_copy):
    from engine.streaming import append_batch
    delete_docs(idx_copy, "role = 'tool'")
    extra = corpus_df.limit(3) \
        .withColumn("conv_id", F.concat(F.lit("zz-"), F.col("conv_id")))
    append_batch(spark, extra, idx_copy.index_dir)
    stale = load_index(spark, idx_copy.index_dir)
    with pytest.raises(ValueError, match="pending compaction"):
        purge_deletes(stale)


def test_delete_ids_validation(idx_copy):
    assert delete_ids(idx_copy, []) == 0
    with pytest.raises(ValueError, match="out of range"):
        delete_ids(idx_copy, [idx_copy.n_docs + 5])


def test_delete_clears_prepared_plans(base_idx, idx_copy):
    """The prepared-plan cache embeds the delete epoch's task closures —
    a delete must invalidate it, or a repeated identical query would
    serve the pre-delete result."""
    pre = rows(Q.search(idx_copy, "hot0 hot1", k=10))
    assert pre == rows(Q.search(idx_copy, "hot0 hot1", k=10))  # cached
    delete_ids(idx_copy, [pre[0][0]])
    got = rows(Q.search(idx_copy, "hot0 hot1", k=10))
    assert got and got[0][0] != pre[0][0]
