"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design:
* NOTHING pairwise-quadratic on the full corpus — candidate pairs always
  come from an inverted structure (LSH band buckets or shared shingles),
  i.e. a groupBy/join on a key, never a crossJoin.
* Hashes are md5-based where an op needs a DuckDB oracle twin (md5 is
  bit-identical across engines; Spark xxhash64 is not available in
  DuckDB), xxhash64 where engine-internal.
* All expression-tree (JVM codegen); zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .analyzer import tokenize_expr


def shingles_expr(text_col, n: int = 3):
    """Word n-gram shingles of the normalized token stream (array<string>).
    sequence() is empty-safe: docs with < n tokens yield no shingles."""
    toks = tokenize_expr(text_col)
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n))))


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup on the normalized token stream: one row per
    distinct content, with the representative (min doc_id) and group size.
    Map-side partial agg + single shuffle on the 128-bit fingerprint."""
    fp = F.md5(F.array_join(tokenize_expr(F.col(text_col)), " "))
    return (df.select("doc_id", fp.alias("fp"))
            .groupBy("fp")
            .agg(F.min("doc_id").alias("rep_doc_id"),
                 F.count("*").alias("n_dups")))


def exact_dedup_keep(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The kept rows after exact dedup (doc_id == group representative)."""
    reps = exact_dedup_groups(df, text_col).select(
        F.col("rep_doc_id").alias("doc_id"))
    return df.join(reps, "doc_id", "left_semi")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, text_col: str = "text",
                       n_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: h_j = min over shingles of
    md5(j || '#' || shingle) (lexicographic min of hex digests — identical
    semantics in any engine with md5). Docs with no shingles get NULL
    signatures and never join into any band bucket."""
    sh = shingles_expr(F.col(text_col), shingle_n)

    def _minhash(j):  # single-arg lambda (2-arg form would receive the index)
        return lambda s: F.md5(F.concat(F.lit(f"{j}#"), s))

    cols = [F.array_min(F.transform(sh, _minhash(j))).alias(f"h{j}")
            for j in range(n_hashes)]
    return df.select("doc_id", *cols)


def lsh_band_keys(sig: DataFrame, bands: int = 4,
                  rows_per_band: int = 2) -> DataFrame:
    """Signature -> (doc_id, band, key) rows; near-dup docs collide on at
    least one band key with high probability (banding of P:MinHash/LSH)."""
    out = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        out.append(F.struct(F.lit(b).alias("band"),
                            F.md5(F.concat_ws("|", *parts)).alias("key")))
    # drop shingle-less docs BEFORE keying: concat_ws skips NULLs, so a
    # doc with a NULL signature would otherwise key as md5("") and
    # spuriously bucket with every other empty doc
    return (sig.filter(F.col("h0").isNotNull())
            .select("doc_id", F.explode(F.array(*out)).alias("bk"))
            .select("doc_id", F.col("bk.band").alias("band"),
                    F.col("bk.key").alias("key")))


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        n_hashes: int = 8, bands: int = 4,
                        shingle_n: int = 3) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing >= 1 LSH band bucket.
    Self-join on (band, key) — an equi-join Catalyst executes as a
    shuffled hash join on the bucket key; no quadratic blowup as long as
    buckets stay small (hot buckets == true near-dup clusters)."""
    keys = lsh_band_keys(minhash_signatures(df, text_col, n_hashes, shingle_n),
                         bands, n_hashes // bands)
    a = keys.alias("a")
    b = keys.alias("b")
    return (a.join(b, ["band", "key"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


# --------------------------------------------------------------------------
# n-gram Jaccard
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        shingle_n: int = 3, threshold: float = 0.5,
                        candidates: DataFrame | None = None,
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact Jaccard over distinct word-n-gram shingle sets, computed via
    the inverted shingle->doc index (join on shingle), NOT pairwise:
    |A ∩ B| = count of co-occurring distinct shingles, |A ∪ B| by
    inclusion-exclusion.

    Scale controls (the production path at 100x — VERDICT r1):
    * ``candidates`` (LSH output) is pushed down BEFORE the shingle
      self-join: only shingle rows of docs appearing in some candidate
      pair enter the join, so the quadratic work is confined to the
      candidate neighborhood, not merely filtered out of its output. The
      pair-level semi-join still runs after (doc-level membership does
      not imply pair membership).
    * ``max_shingle_df`` caps hot shingles: a boilerplate shingle shared
      by m docs otherwise emits m^2 join rows. Shingles with df > cap
      are dropped from BOTH the intersection and the set sizes, i.e.
      Jaccard is computed exactly over the filtered shingle universe —
      the standard dedup-pipeline semantics. None (default) = exact
      Jaccard, DuckDB-oracle parity."""
    sh = (df.select("doc_id",
                    F.explode(shingles_expr(F.col(text_col), shingle_n))
                    .alias("shingle"))
          .distinct())
    if candidates is not None:
        cand_docs = (candidates.select(F.col("doc_a").alias("doc_id"))
                     .union(candidates.select(F.col("doc_b").alias("doc_id")))
                     .distinct())
        sh = sh.join(cand_docs, "doc_id", "left_semi")
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
               .filter(F.col("sdf") > max_shingle_df).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, "shingle")
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("n_common")))
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    j = (F.col("n_common").cast("double")
         / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _term_hash64(col):
    """Portable 60-bit term hash: first 15 hex chars of md5 -> BIGINT.
    (conv() in Spark == ('0x'||h)::BIGINT in DuckDB; 15 nibbles keep it
    positive in int64.)"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(df: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """tf-weighted SimHash over analyzer tokens: bit_i = 1 iff
    Σ_t tf(t)·(2·bit_i(h(t)) - 1) > 0. Expression-tree form (bits<=32
    keeps the plan reasonable); near-dup docs differ in few bits."""
    toks = df.select("doc_id",
                     F.explode(tokenize_expr(F.col(text_col))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    h = _term_hash64(F.col("term"))
    w = tf.select("doc_id", "tf", h.alias("h"))
    sums = w.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                     F.col("tf")).otherwise(-F.col("tf"))).alias(f"s{i}")
        for i in range(bits)])
    sig = sums.select("doc_id", sum(
        (F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
         for i in range(bits)), start=F.lit(0).cast("long")).alias("simhash"))
    return sig


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

def embedding_near_dups(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        n_planes: int | None = 8) -> DataFrame:
    """Pairs with cosine >= threshold. Blocked by LSH sign-buckets (see
    similarity.lsh_bucket_expr) so the pair join is per-bucket, not
    global; within-bucket compare is an equi-join on the bucket key.

    ``n_planes=None`` derives the plane count from the row count
    (similarity.adaptive_n_planes) so expected bucket size — and hence
    per-bucket pair work — stays constant as the corpus grows; the fixed
    default 8 keeps oracle-twin parity for the driver gate."""
    from .similarity import adaptive_n_planes, cosine_expr, lsh_bucket_expr
    if n_planes is None:
        n_planes = adaptive_n_planes(emb.count())
    with_b = emb.select(id_col, vec_col,
                        lsh_bucket_expr(F.col(vec_col),
                                        n_planes=n_planes).alias("bkt"))
    a, b = with_b.alias("a"), with_b.alias("b")
    cos = cosine_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (a.join(b, "bkt")
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.round(cos, 6).alias("cos"))
            .filter(F.col("cos") >= threshold))
