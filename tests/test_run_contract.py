"""Run-disjointness contract of the map-side pack (r3 review findings).

merge._merge_batches concatenates same-(term, shard) runs ordered by
first doc_id, which is only correct when each run covers a doc-id
INTERVAL disjoint from every other run's. A parquet re-read of the
sorted corpus can hand one scan task non-adjacent file ranges (Spark
bin-packs files by size), so pack.tokenize_pack_partial splits each
Arrow batch at doc-id discontinuities, and the merge validates strict
monotonicity (fails loudly instead of letting the delta codec wrap a
negative gap into garbage doc_ids).
"""

import numpy as np
import pyarrow as pa
import pytest


def _docs_df(spark, rows, n_slices):
    """DataFrame with EXPLICIT partition placement: ``rows`` is a list of
    per-partition lists of (doc_id, text) — sparkContext.parallelize
    preserves slice boundaries, so scan tasks see exactly these groups."""
    flat = [r for part in rows for r in part]
    sizes = [len(p) for p in rows]
    bounds = np.cumsum([0] + sizes)
    indexed = [(i, r) for i, r in enumerate(flat)]

    def to_part(i):
        return int(np.searchsorted(bounds, i, side="right") - 1)

    rdd = (spark.sparkContext.parallelize(indexed, max(1, len(flat)))
           .partitionBy(len(rows), to_part)
           .mapPartitions(lambda it: [kv[1] for kv in
                                      sorted(it, key=lambda kv: kv[0])]))
    return spark.createDataFrame(rdd, "doc_id long, text string")


def _decode_all(df):
    """(term, shard) -> decoded doc_id list, from packed rows."""
    from engine import codec
    out = {}
    for r in df.collect():
        docs, tfs = codec.decode_postings(
            bytes(r["doc_ids"]), bytes(r["tfs"]))
        out[(r["term"], r["shard"])] = list(docs)
    return out


def test_pack_interleaved_partitions_matches_contiguous(spark):
    """A task holding two NON-adjacent doc ranges (the parquet bin-pack
    shape) must produce the same merged postings as the contiguous
    arrangement — the batch is split at the discontinuity, so no run
    spans the foreign range."""
    from engine import merge as merge_mod
    from engine import pack as pack_mod
    texts = [f"alpha tok{i % 7}" for i in range(300)]
    rows = [(i, texts[i]) for i in range(300)]
    # partition 0: [0..99] + [200..299] (tail of one range, head of a
    # non-adjacent one in ONE scan task); partition 1: [100..199]
    inter = _docs_df(spark, [rows[:100] + rows[200:], rows[100:200]], 2)
    contig = _docs_df(spark, [rows[:150], rows[150:]], 2)
    width = 1 << 21  # one shard: worst case — every run shares the group

    def build(df):
        partial = pack_mod.tokenize_pack_partial(df, width)
        return _decode_all(merge_mod.merge_pass(partial, fanin=1,
                                                n_parts=4))
    got, want = build(inter), build(contig)
    assert got == want
    for docs in got.values():
        assert all(b > a for a, b in zip(docs, docs[1:]))
    assert got[("alpha", 0)] == list(range(300))


def test_merge_raises_on_overlapping_runs():
    """Overlapping same-(term, shard) runs must fail loudly, not corrupt."""
    from engine import codec
    from engine.merge import _merge_batches
    from engine.pack import PACKED_SCHEMA, _ARROW_BLOCKS

    def packed_row(docs):
        d = np.asarray(docs, np.int64)
        bounds = np.array([0, d.size], np.int64)
        tfs = np.ones(d.size, np.int64)
        dls = np.full(d.size, 5, np.int64)
        doc_pl, tf_pl, dl_pl, blocks = codec.pack_lists(
            bounds, d, tfs, dls, 128)
        return {
            "term": "t", "shard": 0, "df": d.size, "cf": int(d.size),
            "max_tf": 1, "doc_ids": doc_pl[0], "tfs": tf_pl[0],
            "dls": dl_pl[0], "blocks": blocks[0], "poss": b"",
        }

    rows = [packed_row([10, 11, 40, 41]), packed_row([20, 21])]
    rb = pa.RecordBatch.from_pylist(
        rows, schema=pa.schema([
            pa.field("term", pa.string()), pa.field("shard", pa.int32()),
            pa.field("df", pa.int64()), pa.field("cf", pa.int64()),
            pa.field("max_tf", pa.int32()),
            pa.field("doc_ids", pa.binary()), pa.field("tfs", pa.binary()),
            pa.field("dls", pa.binary()), pa.field("blocks", _ARROW_BLOCKS),
            pa.field("poss", pa.binary())]))
    with pytest.raises(ValueError, match="overlapping"):
        list(_merge_batches(iter([rb]), 128))


def test_append_into_batch_built_index(spark, tmp_path):
    """Streaming appends into a BATCH-built (offsets-layout) index: the
    corpus view must serve both layouts (appended files store doc_id;
    batch files derive it), avgdl must track the true token total, and
    a refreshed long-lived handle must score identically to a freshly
    loaded one."""
    from engine import query as Q
    from engine.build import build_index, load_index
    from engine.fixtures import spark_transcripts
    from engine.streaming import append_batch, compact
    full = spark_transcripts(spark, n_convs=60, n_parts=4)
    head = full.filter("conv_id < 'conv-000000000040'")
    tail = full.filter("conv_id >= 'conv-000000000040'")
    d = str(tmp_path / "hybrid")
    stale = build_index(spark, head, d)
    append_batch(spark, tail, d)
    idx = compact(spark, d)
    ref = build_index(spark, full, str(tmp_path / "full"))
    assert idx.n_docs == ref.n_docs
    assert idx.avgdl == pytest.approx(ref.avgdl, rel=1e-12)
    # corpus view: every doc exactly once, ids dense
    ids = sorted(r["doc_id"] for r in idx.corpus().select("doc_id").collect())
    assert ids == list(range(ref.n_docs))
    # filtered search must see appended docs (pre-fix the inner join on
    # part_id silently dropped every appended row)
    got = [(r["doc_id"], round(r["score"], 9)) for r in Q.search(
        idx, "hot0 hot1", k=10, doc_filter="role = 'user'").collect()]
    want = [(r["doc_id"], round(r["score"], 9)) for r in Q.search(
        ref, "hot0 hot1", k=10, doc_filter="role = 'user'").collect()]
    assert got == want and got
    # refresh(): the stale pre-append handle must score like a fresh load
    stale.refresh()
    fresh = load_index(spark, d)
    assert (stale.n_docs, stale.avgdl) == (fresh.n_docs, fresh.avgdl)
    s1 = [(r["doc_id"], round(r["score"], 9)) for r in
          Q.search(stale, "hot0 rare3", k=10).collect()]
    s2 = [(r["doc_id"], round(r["score"], 9)) for r in
          Q.search(fresh, "hot0 rare3", k=10).collect()]
    assert s1 == s2


def test_single_term_or_auto_matches_exhaustive(spark, tmp_path):
    """use_wand='auto' on a single-term OR query must resolve through the
    cost gate (never reach the scorer as a truthy string) and match the
    exhaustive scorer exactly."""
    from engine import query as Q
    from engine.build import build_index
    from engine.fixtures import spark_transcripts
    idx = build_index(spark, spark_transcripts(spark, n_convs=40, n_parts=2),
                      str(tmp_path / "one"))
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         Q.search(idx, "hot0", k=10, mode="OR", use_wand="auto").collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         Q.search(idx, "hot0", k=10, mode="OR", use_wand=False).collect()]
    assert a == b and a
