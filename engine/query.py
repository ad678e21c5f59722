"""Query engine (SURVEY.md §2.E, §3 entry point 2).

M1 layer: **expression-form BM25** over the flat postings IR — the whole
score is a Catalyst expression tree (JVM codegen, zero Python in the hot
path), ending in ``orderBy().limit(k)`` which compiles to
``TakeOrderedAndProject`` (per-partition top-k heap + driver merge).
This form doubles as the oracle-parallel path: the identical formula is
expressible in DuckDB SQL for the driver's correctness gate.

The packed-index WAND path (M2/M4) lives alongside and must produce
rank-identical results — that equivalence is itself a test.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F

from .analyzer import tokenize_py
from .build import FlatIndex
from .config import BM25Config


def query_terms(query: str, acfg=None) -> dict[str, int]:
    """query string -> {term: qtf}, via the SAME frozen analyzer incl.
    the index's config hooks (E1) — build/query analysis cannot drift."""
    from .config import DEFAULT_ANALYZER
    return dict(Counter(tokenize_py(query, acfg or DEFAULT_ANALYZER)))


def _warn_if_stale(index) -> None:
    """Warn when querying an index with increments pending compaction
    (VERDICT r3 #7): appended docs are invisible to search() until
    ``streaming.compact()`` runs — the documented consistency point —
    so a query against an uncompacted index silently serves the stale
    corpus. A warning makes the staleness explicit without refusing
    the (legitimate) stale read."""
    if getattr(index, "completed", True) is False:
        import warnings
        warnings.warn(
            f"index at {index.index_dir} has appended increments pending "
            f"compaction — search serves the last compacted state "
            f"(run streaming.compact() to make appends visible)",
            stacklevel=3)


def _empty_topk(spark, with_qid: bool = False,
                score_col: str = "score") -> DataFrame:
    """Empty (doc_id, score) result as a LocalRelation.

    ``createDataFrame([], schema)`` plans an RDD-backed relation whose
    ``collect()`` schedules a real (empty) Spark job — measured ~0.6 s of
    pure scheduling on the bench box, which was the entire cost of the
    unknown-term query q04 (VERDICT r2 'What's wrong #2'). ``range(0)``
    collapses to an empty LocalRelation: collect is driver-only."""
    cols = ([F.lit("").alias("qid")] if with_qid else []) + [
        F.col("id").alias("doc_id"),
        F.lit(0.0).cast("double").alias(score_col)]
    return spark.range(0).select(*cols)


def bm25_score_col(tf_col, dl_col, idf_col, qtf_col, avgdl: float,
                   cfg: BM25Config):
    """Per-(doc,term) BM25 contribution as a Spark Column (mirrors
    oracle.OracleIndex.search summand exactly)."""
    k1, b = F.lit(cfg.k1), F.lit(cfg.b)
    denom = tf_col + k1 * (F.lit(1.0) - b + b * dl_col / F.lit(float(avgdl)))
    return qtf_col * idf_col * (tf_col * (k1 + F.lit(1.0))) / denom


def search_flat(idx: FlatIndex, query: str, k: int = 10,
                mode: str = "OR", exclude: str | None = None,
                doc_filter: str | None = None) -> DataFrame:
    """BM25 top-k over the flat postings IR.

    Returns (doc_id, score) ordered by (score desc, doc_id asc), k rows.
    mode=AND keeps only docs containing ALL distinct query terms
    (posting-list intersection as a grouped count filter — the DataFrame
    form of a k-way semi-join). ``exclude``: boolean NOT — drop docs
    containing ANY of these terms (posting-list set difference as a
    ``left_anti`` join).

    Frozen NOT contract (shared by the flat path, the packed path, and
    the DuckDB oracle twin): an excluded term that is ALSO a positive
    query term is dropped from the exclusion set — the positive
    occurrence wins. Documented so a query like "spark NOT spark" ranks
    normally instead of returning nothing.
    """
    spark = idx.docs.sparkSession
    acfg = idx.cfg.analyzer
    qtf = query_terms(query, acfg)
    empty = _empty_topk(spark)
    if not qtf:
        return empty
    # E2: memoized driver-side lookup of the <= |query| lexicon rows —
    # one small job (first time per term), reused for the broadcast side,
    # the AND-arity check, and idf; no per-query count job.
    known = idx.lookup_terms(sorted(qtf))
    if mode.upper() == "AND" and len(known) < len(qtf):
        return empty  # a required term is absent from the corpus
    if not known:
        return empty
    n_known = len(known)
    lex = spark.createDataFrame(
        [(t, float(known[t]["idf"]), float(qtf[t])) for t in sorted(known)],
        "term string, idf double, qtf double")
    scored = (idx.postings
              .join(F.broadcast(lex), "term")
              .withColumn("_s", bm25_score_col(
                  F.col("tf").cast("double"), F.col("dl").cast("double"),
                  F.col("idf"), F.col("qtf"), idx.avgdl, idx.cfg.bm25))
              .groupBy("doc_id")
              .agg(F.sum("_s").alias("score"), F.count("*").alias("_nt")))
    if mode.upper() == "AND":
        scored = scored.filter(F.col("_nt") == n_known)
    neg = sorted(set(tokenize_py(exclude, acfg)) - set(qtf)) if exclude else []
    if neg:
        negdocs = (idx.postings.filter(F.col("term").isin(neg))
                   .select("doc_id").distinct())
        scored = scored.join(negdocs, "doc_id", "left_anti")
    if doc_filter is not None:
        # query-time candidate restriction with GLOBAL stats (same frozen
        # semantics as the packed path): a semi-join against the filtered
        # corpus — predicate and column pruning reach the corpus scan
        scored = scored.join(idx.docs.filter(doc_filter).select("doc_id"),
                             "doc_id", "left_semi")
    return (scored.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


# --------------------------------------------------------------------------
# Packed-index query path (E3/E5/E6/E7): partition-pruned scan -> per-shard
# DAAT scoring in Arrow UDFs -> global TakeOrderedAndProject
# --------------------------------------------------------------------------

def _score_shard_exhaustive(post_pdf, qtfs, idfs, cfg, k, mode, width,
                            n_required, neg_terms=frozenset(),
                            allowed_loc=None, cursor=None, boost_vec=None,
                            denied_loc=None, min_match=1,
                            collapse_vals=None, collapse_n=1,
                            must_terms=frozenset(), min_should=0,
                            demote_terms=frozenset(),
                            demote_factor=1.0):
    """Score one doc-range shard: dense-offset accumulators, numpy only.

    Per-posting document lengths come from the inlined ``dls`` stream and
    idf from the ``idfs`` dict captured in the task closure (<= |query|
    floats, collected once driver-side by ``lookup_terms`` and memoized)
    — the scorer's job is the (pruned) postings scan ALONE: no lexicon
    join, no broadcast exchange. Accumulation is per-term in ASCENDING
    term order — the identical float64 summation order as the pure-Python
    oracle (rank-identity). Emits at most k rows (per-shard top-k heap
    analog).

    ``n_required`` is the number of DISTINCT query terms; AND keeps docs
    hitting all of them (a globally-absent term makes the count
    unreachable, so AND with an unknown term is naturally empty).

    ``must_terms``/``min_should`` (ES bool query, see ``search_bool``):
    when ``must_terms`` is non-empty a doc qualifies iff it contains
    EVERY must term and at least ``min_should`` of the remaining
    (should) query terms; the score stays the plain OR sum over all
    present query terms (both clause kinds contribute) — the frozen
    per-term ascending summation order is unchanged.
    """
    import numpy as np
    from . import codec as C
    if len(post_pdf) == 0:
        return None
    shard = int(post_pdf["shard"].iloc[0])
    start = shard * width
    acc = np.zeros(width, dtype=np.float64)
    cnt = np.zeros(width, dtype=np.int32)
    cntm = np.zeros(width, dtype=np.int32) if must_terms else None
    negmask = np.zeros(width, dtype=bool) if neg_terms else None
    demmask = np.zeros(width, dtype=bool) if demote_terms else None
    k1, b, avgdl = cfg["k1"], cfg["b"], cfg["avgdl"]
    order = np.argsort(post_pdf["term"].to_numpy(object))  # ascending terms
    for i in order:
        term = post_pdf["term"].iloc[int(i)]
        if term in neg_terms:
            ids, _ = C.decode_postings(post_pdf["doc_ids"].iloc[int(i)],
                                       post_pdf["tfs"].iloc[int(i)])
            negmask[ids - start] = True
            continue
        if demmask is not None and term in demote_terms:
            # boosting query (search_boosting): docs containing any
            # demote term keep their score times demote_factor — the
            # mask is marked here; a demote term that is ALSO a
            # positive query term still scores (no positive-wins rule:
            # demotion and contribution are not contradictory)
            ids, _ = C.decode_postings(post_pdf["doc_ids"].iloc[int(i)],
                                       post_pdf["tfs"].iloc[int(i)])
            demmask[ids - start] = True
            if term not in qtfs:
                continue
        idf = idfs[term]
        qtf = qtfs[term]
        ids, tfs = C.decode_postings(post_pdf["doc_ids"].iloc[int(i)],
                                     post_pdf["tfs"].iloc[int(i)])
        dls = C.vbyte_decode(post_pdf["dls"].iloc[int(i)]).astype(np.float64)
        loc = ids - start
        tfs = tfs.astype(np.float64)
        contrib = (qtf * idf * (tfs * (k1 + 1.0))
                   / (tfs + k1 * (1.0 - b + b * dls / avgdl)))
        acc[loc] += contrib   # doc_ids unique within one (term, shard) row
        cnt[loc] += 1
        if cntm is not None and term in must_terms:
            cntm[loc] += 1
    if negmask is not None:
        cnt[negmask] = -1     # excluded docs can never hit
    if denied_loc is not None and denied_loc.size:
        # tombstoned docs (engine/deletes.py): same mechanism as NOT —
        # they can never hit, while N/avgdl/idf stay the last build's
        # (the frozen two-phase delete contract). O(|tombstones|).
        cnt[denied_loc] = -1
    if allowed_loc is not None:
        # doc_filter restriction: docs OUTSIDE the allowed set can never
        # hit (same mechanism as NOT). Applied after accumulation, so the
        # per-term float summation order — and therefore every surviving
        # score — is bit-identical to the unfiltered path.
        allow = np.zeros(width, dtype=bool)
        allow[allowed_loc] = True
        cnt[~allow] = -1
    if cntm is not None:
        # bool query: every must term present AND >= min_should of the
        # should terms. cnt counts ALL distinct present query terms, so
        # cnt - cntm is the should-count; an exclusion/filter/tombstone
        # sets cnt to -1, which fails (cnt - cntm >= min_should) for any
        # doc whose cntm == n_must (min_should >= 0) — the masks compose.
        hit = np.flatnonzero((cntm == len(must_terms))
                             & ((cnt - cntm) >= min_should))
    elif mode == "AND":
        hit = np.flatnonzero(cnt == n_required)
    elif min_match > 1:
        # minimum_should_match (OR only): a doc qualifies with at least
        # min_match DISTINCT query terms present; survivor scores are
        # the plain OR scores (cnt already counts distinct terms —
        # doc_ids are unique within one (term, shard) row)
        hit = np.flatnonzero(cnt >= min_match)
    else:
        hit = np.flatnonzero(cnt > 0)
    if hit.size == 0:
        return None
    if boost_vec is not None:
        # score = (BM25 sum) * v or + v — combined AFTER the frozen
        # per-term summation, mirroring the oracle twins exactly
        # (docvalues.recency_multiplier / decay_multiplier document the
        # function; v already carries the ES function weight). Applied
        # at hit positions only; cursor compare and top-k use the
        # boosted score (the ranking the caller pages through).
        bv, bcomb = boost_vec
        if bcomb == "sum":
            acc[hit] += bv[hit]
        else:
            acc[hit] *= bv[hit]
    if demmask is not None:
        # boosting-query demotion — frozen operation order: the plain
        # BM25 sum, then the recency multiplier (boost_vec), THEN the
        # demote factor ((s * b) * d — the twin writes the identical
        # grouping). Cursor compare and top-k see the demoted score.
        dm = demmask[hit]
        if dm.any():
            acc[hit[dm]] *= demote_factor
    if cursor is not None:
        # search_after pagination: keep only docs STRICTLY after the
        # cursor in the frozen (score desc, doc_id asc) total order.
        # Raw float compare is exact because scores are bit-reproducible
        # (frozen summation order): the caller passes back the previous
        # page's last (score, doc_id) verbatim. Applied per shard BEFORE
        # the top-k cut, so each shard re-emits its next k candidates —
        # per-shard top-k stays globally sufficient on every page.
        cs, cd = cursor
        s = acc[hit]
        ds = hit + start
        hit = hit[(s < cs) | ((s == cs) & (ds > cd))]
        if hit.size == 0:
            return None
    if collapse_vals is not None:
        # field collapsing (ES collapse): reduce the shard's hits to the
        # best doc per collapse key under the frozen (score desc, doc_id
        # asc) order, then emit the shard's top-k GROUPS. Per-shard top-k
        # groups is globally sufficient: if a global top-k group were
        # outside its best-doc shard's top-k, that shard would hold k
        # groups whose shard-best — hence global best — beats it,
        # contradicting its global rank. Docs with a NULL/absent key are
        # EXCLUDED (the search_sorted NULL rule).
        vals = collapse_vals(hit)  # object ndarray of str|None
        ok = np.asarray(vals != None, dtype=bool)  # noqa: E711 — elementwise
        hit, vals = hit[ok], vals[ok]
        if hit.size == 0:
            return None
        s = acc[hit]
        if collapse_n > 1:
            # top_hits aggregation (search_top_hits): emit the shard's
            # top-collapse_n docs of EVERY group present — the same
            # per-(group, shard) emission bound as facet_stats (collapse
            # keys are categorical by design), because a group outside
            # this shard's top-k can still be a global top-k group whose
            # 2nd..Nth hits live here. Global group selection happens in
            # the finishing window over these bounded partials.
            import pandas as pd
            uv, inv = np.unique(vals, return_inverse=True)
            ordr = np.lexsort((hit, -s, inv))  # group, score desc, doc asc
            g, h2, s2 = inv[ordr], hit[ordr], s[ordr]
            firsts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
            sizes = np.diff(np.r_[firsts, g.size])
            grp_of = np.repeat(np.arange(firsts.size), sizes)
            keep = (np.arange(g.size) - firsts[grp_of]) < collapse_n
            return pd.DataFrame({
                "group_key": uv[g[keep]].astype(object),
                "doc_id": (h2[keep] + start).astype(np.int64),
                "score": s2[keep]})
        ordr = np.lexsort((hit, -s))  # score desc, then doc asc
        h, s2, v2 = hit[ordr], s[ordr], vals[ordr]
        uv, first = np.unique(v2, return_index=True)
        # first = index of each group's FIRST row in the (score desc,
        # doc asc) ordering == its best doc; full sort is fine here
        # (one row per group survives the reduction)
        bh, bs = h[first], s2[first]
        cut = np.lexsort((bh, -bs))[:k]
        import pandas as pd
        return pd.DataFrame({
            "group_key": uv[cut].astype(object),
            "doc_id": (bh[cut] + start).astype(np.int64),
            "score": bs[cut]})
    # tie-SAFE per-shard top-k (r4): argpartition alone kept an arbitrary
    # subset of k-boundary score ties — codec.topk_tiebreak widens to the
    # tying ids and applies the frozen (score desc, doc_id asc) order
    hit, scores = C.topk_tiebreak(hit, acc[hit], k)
    import pandas as pd
    return pd.DataFrame({"doc_id": (hit + start).astype(np.int64),
                         "score": scores})


def _allowed_shards(index, doc_filter: str, width: int) -> DataFrame:
    """Allowed-doc side of a filtered search (shared by search and
    search_batch — ONE definition of the frozen filter semantics): the
    predicate is pushed into the corpus scan, then one int64 per matching
    doc is shuffled on the scorer's own shard key (no extra key appears
    anywhere in the job)."""
    return (index.corpus().filter(doc_filter)
            .select(F.col("doc_id"),
                    F.expr(f"CAST(doc_id DIV {width} AS INT)")
                    .alias("shard")))


def _plan_cache(index) -> dict:
    c = getattr(index, "_plan_cache", None)
    if c is None:
        c = index._plan_cache = {}
    return c


_PLAN_CACHE_CAP = 256


def _plan_cached(index, key, build):
    """Prepared-plan cache (r4): repeated identical queries return the
    SAME DataFrame object — the prepared-statement pattern. Spark then
    (a) reuses the analyzed/optimized plan (~0.1 s of per-call Catalyst
    analysis + py4j construction measured) and (b) SKIPS completed
    shuffle map stages on re-execution (same RDD lineage -> map outputs
    still registered), so a repeated identical query pays only the final
    stage. (b) is why honest benchmarks of FIRST-run latency must bypass
    this cache (env SPARK_GRAFT_PLAN_CACHE=0, as bench.py does for its
    per-query rows — the cached repeat is reported as its own row, never
    blended into search_q/batch timings). Bounded FIFO;
    ``PackedIndex.refresh()`` clears it (post-append stats would
    otherwise serve stale idf/avgdl closures)."""
    import os
    if os.environ.get("SPARK_GRAFT_PLAN_CACHE", "1") == "0":
        return build()
    c = _plan_cache(index)
    df = c.get(key)
    if df is None:
        df = build()
        if len(c) >= _PLAN_CACHE_CAP:
            c.pop(next(iter(c)))
        c[key] = df
    return df


def _epoch_s(v) -> float:
    """Epoch seconds from a number or an ISO-8601 string (UTC)."""
    if isinstance(v, str):
        from datetime import datetime, timezone
        return datetime.fromisoformat(v).replace(
            tzinfo=timezone.utc).timestamp()
    return float(v)


def _norm_boost(index, boost: "dict | None"):
    """Driver-side normalization of a score-multiplier boost spec into a
    tagged tuple, validated against the index's docvalue schema. Two
    frozen families (both applied AFTER the frozen BM25 summation,
    inside the scorer task; every multiplier is <= 1):

    * legacy one-sided recency — ``{"field", "half_life_days", "now"}``
      -> ``("recency", field, now_s, half_life_s)``; formula
      ``0.5 ** (max(0, now - ts) / half_life)``
      (docvalues.recency_multiplier).
    * ES decay family (``function_score`` gauss/exp/linear) —
      ``{"field", "decay": kind, "origin": epoch-s | ISO-8601,
      "scale_days": float, "decay_value": float (default 0.5, in
      (0, 1)), "offset_days": float (default 0)}``
      -> ``("decay", field, kind, origin_s, scale_s, decay, offset_s,
      combine, weight)`` (docvalues.decay_multiplier documents the
      formulas). Optional ``"boost_mode": "multiply" (default) |
      "sum"`` and ``"weight": w > 0`` follow the ES function_score
      rule: the function value is ``w * decay(x)``, combined as
      ``score * v`` or ``score + v`` — in either mode AFTER the frozen
      summation, exhaustive-only routing."""
    if boost is None:
        return None
    field = boost["field"]
    if field not in (index.doc_values or ()):
        raise ValueError(
            f"boost field {field!r} is not a docvalue column of this "
            f"index (stored: {list(index.doc_values or ())}; build with "
            f"IndexConfig(doc_values=...))")
    if "decay" in boost:
        kind = boost["decay"]
        if kind not in ("gauss", "exp", "linear"):
            raise ValueError(
                f"decay must be one of gauss/exp/linear (got {kind!r})")
        unknown = set(boost) - {"field", "decay", "origin", "scale_days",
                                "decay_value", "offset_days",
                                "boost_mode", "weight"}
        if unknown:
            raise ValueError(f"unknown decay-boost keys: {sorted(unknown)}")
        combine = boost.get("boost_mode", "multiply")
        if combine not in ("multiply", "sum"):
            raise ValueError(f"boost_mode must be multiply or sum "
                             f"(got {combine!r})")
        weight = float(boost.get("weight", 1.0))
        import math as _math
        if not _math.isfinite(weight) or weight <= 0:
            raise ValueError(f"weight must be finite and > 0 "
                             f"(got {weight})")
        scale = float(boost["scale_days"]) * 86400.0
        if scale <= 0:
            raise ValueError("scale_days must be > 0")
        d = float(boost.get("decay_value", 0.5))
        if not (0.0 < d < 1.0):
            raise ValueError(f"decay_value must be in (0, 1) (got {d})")
        off = float(boost.get("offset_days", 0.0)) * 86400.0
        if off < 0:
            raise ValueError("offset_days must be >= 0")
        return ("decay", field, kind, _epoch_s(boost["origin"]), scale,
                d, off, combine, weight)
    hl = float(boost["half_life_days"]) * 86400.0
    if hl <= 0:
        raise ValueError("half_life_days must be > 0")
    return ("recency", field, _epoch_s(boost["now"]), hl)


def _require_dv(index, dv_filter: "str | None") -> None:
    if dv_filter is not None and not (index.doc_values or ()):
        raise ValueError(
            "dv_filter requires an index built with a docvalue store "
            "(IndexConfig(doc_values=...)); for arbitrary corpus "
            "predicates use doc_filter instead")


def _boost_key(boost: "dict | None"):
    return tuple(sorted(boost.items())) if boost else None


def _apply_term_boosts(qtf: dict, term_boosts: "dict | None") -> dict:
    """Per-term query boosting (the Lucene/ES ``term^w`` query rule):
    each weight multiplies its term's query-term-frequency factor, so a
    boosted term's per-doc contribution scales by exactly ``w`` — qtf is
    already a pure multiplier in the frozen score (bm25_score_col /
    _score_shard_exhaustive), so no scorer change is needed and the
    frozen per-term summation order is untouched.

    Weights must be finite and > 0 (zero/negative would break ranking
    monotonicity and WAND's upper bounds); keys must be analyzed terms
    PRESENT in the query — a boost on an absent term is a caller bug,
    not a no-op. Rank-safe under WAND routing: the block upper bound
    (engine/wand.py _ub) scales by the same qtf factor, so block bounds
    stay exact upper bounds and boosted OR queries keep Block-Max
    pruning."""
    if not term_boosts:
        return qtf
    import math
    import re

    from .config import TOKEN_PATTERN
    for t, w in term_boosts.items():
        if not re.fullmatch(TOKEN_PATTERN, t or ""):
            raise ValueError("term_boosts keys must be single analyzer "
                             f"tokens (got {t!r})")
        w = float(w)
        if not math.isfinite(w) or w <= 0:
            raise ValueError(f"term_boosts[{t!r}] must be finite and > 0 "
                             f"(got {w})")
    unknown = sorted(set(term_boosts) - set(qtf))
    if unknown:
        raise ValueError(f"term_boosts for terms not in the query: "
                         f"{unknown}")
    return {t: float(n) * float(term_boosts.get(t, 1.0))
            for t, n in qtf.items()}


def _del_closure(index):
    """Per-shard tombstone lookup for the scorer tasks (engine/deletes.py)
    — ONE definition shared by every query surface. Returns None when the
    index has no tombstones (the common case: literally zero per-query
    overhead), else a ``shard -> sorted int64 locs | None`` callable whose
    closure pins (index_dir, del_epoch) so worker caches can never serve a
    stale set across delete batches."""
    if int(getattr(index, "n_deleted", 0) or 0) <= 0:
        return None
    d, e = index.index_dir, int(getattr(index, "del_epoch", 0) or 0)

    def locs(shard: int):
        from .deletes import deleted_locs
        return deleted_locs(d, int(shard), e)

    return locs


def search(index, query: str, k: int = 10, mode: str = "OR",
           use_wand: "bool | str" = "auto",
           exclude: str | None = None,
           doc_filter: str | None = None,
           dv_filter: str | None = None,
           boost: dict | None = None,
           min_match: int | None = None,
           term_boosts: dict | None = None,
           demote: "tuple[str, float] | None" = None) -> DataFrame:
    """BM25 top-k over the packed index (see _search_impl for the full
    plan notes). Plans are memoized per argument tuple (_plan_cached).

    ``min_match``: minimum_should_match (OR mode only) — a doc must
    contain at least this many DISTINCT query terms to qualify.

    ``term_boosts``: {term: weight} per-term query boosting (the ES
    ``term^w`` rule — see _apply_term_boosts for the frozen contract);
    composes with every other option and keeps WAND routing.

    ``demote``: (negative_query, negative_boost) — the ES ``boosting``
    query (see search_boosting for the frozen contract)."""
    _warn_if_stale(index)
    key = ("s", query, k, mode.upper(), repr(use_wand), exclude, doc_filter,
           dv_filter, _boost_key(boost), min_match, _boost_key(term_boosts),
           tuple(demote) if demote is not None else None)
    return _plan_cached(index, key, lambda: _search_impl(
        index, query, k, mode, use_wand, exclude, doc_filter,
        dv_filter=dv_filter, boost=boost, min_match=min_match,
        term_boosts=term_boosts, demote=demote))


def search_dis_max(index, queries: list, k: int = 10,
                   tie_breaker: float = 0.0,
                   exclude: str | None = None,
                   doc_filter: str | None = None,
                   dv_filter: str | None = None) -> DataFrame:
    """Disjunction-max query — the ES ``dis_max`` pattern: N OR
    subqueries, each doc ranked by its BEST-matching subquery plus
    ``tie_breaker`` times the rest ("best field wins, others break
    ties" — here "fields" are alternative phrasings of one query, e.g.
    synonym variants that must not double-count).

    Frozen contract (mirrored by the DuckDB twin in
    ``__spark_entry__``):

    * each subquery is a plain OR query (analyzer tokens, qtf counted
      per subquery); a doc matches the dis_max iff it matches >= 1
      subquery; subqueries with no corpus-known term match nothing;
    * per-doc: ``s_i`` = the frozen per-term-ascending BM25 sum of
      subquery i over this doc (0.0 when unmatched — BM25 lucene
      contributions are strictly positive, so 0 never collides);
      ``total`` = left-fold of ``s_i`` in SUBQUERY LIST ORDER;
      ``best`` = max over ``s_i``; score = ``best + tie_breaker *
      (total - best)`` — exactly the float64 expression the twin
      writes (``greatest(...) + tie * ((s1 + s2 + ...) -
      greatest(...))``), so scores compare bit-exact;
    * ``exclude`` (NOT, positive-wins vs the UNION of subquery terms),
      ``doc_filter``/``dv_filter``/tombstones compose with their
      unchanged contracts; tie_breaker must lie in [0, 1] (the ES
      rule). Routing is exhaustive-only: block-max bounds are per-term
      sums, not per-subquery maxima.

    Plan: ONE job — the union of all subqueries' terms rides one
    pruned postings scan; the shard kernel decodes each (term, shard)
    payload ONCE, scatter-adds the shared tf-factor into every
    subquery's accumulator scaled by that subquery's qtf, combines the
    <= N width-bounded accumulators, and emits <= k rows; global
    TakeOrderedAndProject."""
    _warn_if_stale(index)
    queries = [str(q) for q in queries]
    if not queries:
        raise ValueError("dis_max needs at least one subquery")
    tie = float(tie_breaker)
    if not (0.0 <= tie <= 1.0):
        raise ValueError("tie_breaker must lie in [0, 1]")
    key = ("dm", tuple(queries), k, tie, exclude, doc_filter, dv_filter)
    return _plan_cached(index, key, lambda: _search_dis_max_impl(
        index, queries, k, tie, exclude, doc_filter, dv_filter))


def _search_dis_max_impl(index, queries: list, k: int, tie: float,
                         exclude: str | None,
                         doc_filter: str | None,
                         dv_filter: str | None) -> DataFrame:
    spark = index.spark
    acfg = index.cfg.analyzer
    sub_qtfs = [query_terms(q, acfg) for q in queries]
    union_terms = sorted(set().union(*[set(s) for s in sub_qtfs]))
    empty = _empty_topk(spark)
    if not union_terms:
        return empty
    neg = (sorted(set(tokenize_py(exclude, acfg)) - set(union_terms))
           if exclude else [])
    lex = index.lookup_terms(sorted(set(union_terms) | set(neg)))
    known = [t for t in union_terms if t in lex]
    if not known:
        return empty
    neg = [t for t in neg if t in lex]
    known_set = set(known)
    # per-subquery known qtf maps; empty subqueries match nothing but
    # keep their LIST SLOT (the total fold order is list order)
    subs = [{t: float(n) for t, n in s.items() if t in known_set}
            for s in sub_qtfs]
    idfs = {t: float(lex[t]["idf"]) for t in known}
    scan_terms = sorted(set(known) | set(neg))
    buckets = sorted({lex[t]["bucket"] for t in scan_terms})
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(scan_terms))
            .select("term", "shard", "df", "doc_ids", "tfs", "dls"))
    width = index.shard_width
    cfgd = {"k1": index.cfg.bm25.k1, "b": index.cfg.bm25.b,
            "avgdl": index.avgdl}
    neg_set = frozenset(neg)
    del_locs = _del_closure(index)
    dv_dir, dv_gen = index.index_dir, int(index.n_docs)

    def _kernel(post_pdf, allowed_loc=None):
        import numpy as np
        import pandas as pd
        from . import codec as C
        out_empty = pd.DataFrame({"doc_id": [], "score": []})
        if len(post_pdf) == 0:
            return out_empty
        shard = int(post_pdf["shard"].iloc[0])
        start = shard * width
        n_sub = len(subs)
        accs = [np.zeros(width, dtype=np.float64) for _ in range(n_sub)]
        hitany = np.zeros(width, dtype=bool)
        negmask = np.zeros(width, dtype=bool) if neg_set else None
        k1, b, avgdl = cfgd["k1"], cfgd["b"], cfgd["avgdl"]
        order = np.argsort(post_pdf["term"].to_numpy(object))
        for i in order:
            term = post_pdf["term"].iloc[int(i)]
            if term in neg_set:
                ids, _ = C.decode_postings(post_pdf["doc_ids"].iloc[int(i)],
                                           post_pdf["tfs"].iloc[int(i)])
                negmask[ids - start] = True
                continue
            ids, tfs = C.decode_postings(post_pdf["doc_ids"].iloc[int(i)],
                                         post_pdf["tfs"].iloc[int(i)])
            dls = C.vbyte_decode(post_pdf["dls"].iloc[int(i)]).astype(
                np.float64)
            loc = ids - start
            tfs = tfs.astype(np.float64)
            # shared decode, per-subquery contribution with EXACTLY the
            # single-query kernel's float64 grouping — ((qtf*idf)*A)/B —
            # so each s_i is bit-identical to search(subquery_i)'s sum
            num = tfs * (k1 + 1.0)
            den = tfs + k1 * (1.0 - b + b * dls / avgdl)
            hit_marked = False
            for si, s in enumerate(subs):
                qtf = s.get(term)
                if qtf is None:
                    continue
                # terms arrive in global ascending order, so each
                # accumulator receives ITS terms ascending too — the
                # frozen per-subquery summation order
                accs[si][loc] += (qtf * idfs[term]) * num / den
                if not hit_marked:
                    hitany[loc] = True
                    hit_marked = True
        if negmask is not None:
            hitany[negmask] = False
        if del_locs is not None:
            dl_ = del_locs(shard)
            if dl_ is not None:
                hitany[dl_] = False
        if dv_filter is not None:
            from .docvalues import eval_filter
            allow = np.zeros(width, dtype=bool)
            allow[eval_filter(dv_dir, shard, dv_gen, dv_filter)] = True
            hitany &= allow
        if allowed_loc is not None:
            allow = np.zeros(width, dtype=bool)
            allow[np.asarray(allowed_loc, dtype=np.int64)] = True
            hitany &= allow
        hit = np.flatnonzero(hitany)
        if hit.size == 0:
            return out_empty
        # combine: total = left-fold in subquery list order; best = max;
        # score = best + tie * (total - best) — the twin's expression
        total = accs[0][hit].copy()
        best = accs[0][hit].copy()
        for si in range(1, len(accs)):
            v = accs[si][hit]
            total = total + v
            np.maximum(best, v, out=best)
        scores = best + tie * (total - best)
        hit, scores = C.topk_tiebreak(hit, scores, k)
        import pandas as _pd
        return _pd.DataFrame({"doc_id": (hit + start).astype(np.int64),
                              "score": scores})

    if doc_filter is not None:
        allowed = _allowed_shards(index, doc_filter, width)

        def fnf(key, post_pdf, allowed_pdf):
            import numpy as np
            import pandas as pd
            if len(post_pdf) == 0 or len(allowed_pdf) == 0:
                return pd.DataFrame({"doc_id": [], "score": []})
            shard = int(post_pdf["shard"].iloc[0])
            loc = (allowed_pdf["doc_id"].to_numpy(np.int64)
                   - shard * width)
            return _kernel(post_pdf, allowed_loc=loc)

        scored = (post.groupBy("shard")
                  .cogroup(allowed.groupBy("shard"))
                  .applyInPandas(fnf, "doc_id long, score double"))
    else:
        scored = (post.groupBy("shard")
                  .applyInPandas(lambda key, pdf: _kernel(pdf),
                                 "doc_id long, score double"))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_multi_match(index, query: str, fields=None, k: int = 10,
                       match_type: str = "best_fields",
                       tie_breaker: float = 0.0,
                       exclude: str | None = None,
                       doc_filter: str | None = None,
                       dv_filter: str | None = None) -> DataFrame:
    """Multi-field search — the ES ``multi_match`` query over an index
    built with ``IndexConfig.extra_fields``: every analyzer token of
    ``query`` is searched in every listed field, each field scored as
    its own BM25 term space (field-prefixed terms, per-field df/idf and
    per-field length normalization), and the per-field scores combine
    per ``match_type``.

    ``fields``: ``{field: boost}`` (dict order = the frozen fold
    order), a list (boost 1.0 each), or None = ``text`` plus every
    extra field, boost 1.0. ``"text"`` is the default unprefixed
    space; any other name must be in ``index.extra_fields``.

    Frozen contract (mirrored by the DuckDB twin in
    ``__spark_entry__._multi_match_sql``):

    * per field f: ``s_f = boost_f * (frozen per-term-ascending BM25
      sum over f's term space)`` — idf from the prefixed term's df
      with the corpus-global N, length norm from THIS field's dl (the
      posting's inlined dls stream carries the field's token count)
      and the frozen ``avgdl_f = sum(cf_f) / n_docs`` (corpus-global
      denominator — documented divergence from Lucene's
      docCount(field)); 0.0 when the doc misses every query token in
      f (BM25 lucene contributions are strictly positive);
    * ``best_fields`` (ES default): ``score = best + tie_breaker *
      (total - best)`` with ``total`` the left-fold of ``s_f`` in
      FIELDS ORDER and ``best`` their max — exactly dis_max's combine
      with fields as the subqueries; ``most_fields``: ``score =
      total`` (tie_breaker must be 0);
    * ``cross_fields`` (term-centric): per TOKEN ``v_t = max_f(c_{f,t})
      + tie_breaker * (sum_f(c_{f,t}) - max_f(c_{f,t}))`` where
      ``c_{f,t} = boost_f * contrib_{f,t}`` (the field boost lands on
      the per-term contribution, not the field sum), then ``score =
      sum over tokens ascending of v_t`` — a frozen simplification of
      ES's blended-df cross_fields (documented divergence: ES blends
      df across fields; this engine takes the per-term best field,
      which needs no cross-field statistics);
    * a doc matches iff >= 1 field matches >= 1 token; ``exclude``
      applies in the TEXT term space (exclude tokens are text tokens;
      positive-wins vs the query's text terms as usual);
      ``doc_filter``/``dv_filter``/tombstones compose unchanged.
      Routing is exhaustive-only (like dis_max: block-max bounds are
      per-term sums, not cross-field maxima).

    Plan: ONE job — all fields' prefixed terms ride one pruned
    postings scan (same segment layout, same bucket pruning); the
    shard kernel routes each (term, shard) payload to its field's
    width-bounded accumulator (a term key belongs to exactly one
    field), combines, and emits <= k rows; global
    TakeOrderedAndProject. At 100 TB this is the same single-scan
    cost shape as dis_max — fields multiply the query's term count,
    never the corpus reads."""
    _warn_if_stale(index)
    if fields is None:
        fields = {"text": 1.0}
        for f_ in (index.extra_fields or ()):
            fields[f_] = 1.0
    elif not isinstance(fields, dict):
        fields = {str(f_): 1.0 for f_ in fields}
    else:
        fields = {str(f_): float(b_) for f_, b_ in fields.items()}
    if not fields:
        raise ValueError("multi_match needs at least one field")
    known_fields = {"text", *(index.extra_fields or ())}
    bad = [f_ for f_ in fields if f_ not in known_fields]
    if bad:
        raise ValueError(
            f"multi_match fields {bad} not indexed (available: "
            f"{sorted(known_fields)}; build with "
            f"IndexConfig.extra_fields)")
    if any(b_ <= 0 for b_ in fields.values()):
        raise ValueError("field boosts must be > 0")
    mt = str(match_type)
    if mt not in ("best_fields", "most_fields", "cross_fields"):
        raise ValueError("match_type must be "
                         "best_fields|most_fields|cross_fields")
    tie = float(tie_breaker)
    if not (0.0 <= tie <= 1.0):
        raise ValueError("tie_breaker must lie in [0, 1]")
    if mt == "most_fields" and tie != 0.0:
        raise ValueError("tie_breaker only applies to "
                         "best_fields/cross_fields")
    key = ("mm", query, tuple(fields.items()), k, mt, tie, exclude,
           doc_filter, dv_filter)
    return _plan_cached(index, key, lambda: _search_multi_match_impl(
        index, query, fields, k, mt, tie, exclude, doc_filter,
        dv_filter))


def search_fielded(index, clauses: list, k: int = 10,
                   exclude: str | None = None,
                   doc_filter: str | None = None,
                   dv_filter: str | None = None) -> DataFrame:
    """Field-scoped disjunction — the Lucene ``field:term`` clause
    list: ``clauses = [(field, token, weight), ...]`` over a
    multi-field index, each clause scored in ITS field's term space
    (field df/idf/avgdl) at ``weight * qtf`` and the per-field sums
    left-folded in first-appearance field order (the most_fields
    combine, per-field boost 1.0 — weights live on the clauses).
    Duplicate (field, token) clauses merge by SUMMING weights (the
    Lucene repeated-clause qtf rule). ``exclude`` stays a text-space
    NOT. Backed by the multi_match kernel: one pruned scan, per-field
    width-bounded accumulators, TakeOrderedAndProject. The
    query-string mini-language's ``field:term`` syntax routes here
    (engine/querystring.py)."""
    _warn_if_stale(index)
    norm: dict = {}
    order: list = []
    known_fields = {"text", *(index.extra_fields or ())}
    for f_, t, w in clauses:
        f_, t, w = str(f_), str(t), float(w)
        if f_ not in known_fields:
            raise ValueError(
                f"field {f_!r} not indexed (available: "
                f"{sorted(known_fields)}; build with "
                f"IndexConfig.extra_fields)")
        if w <= 0:
            raise ValueError("clause weights must be > 0")
        toks = tokenize_py(t, index.cfg.analyzer)
        if len(toks) != 1:
            raise ValueError(f"clause token {t!r} must analyze to "
                             f"exactly one term (got {toks})")
        if f_ not in norm:
            norm[f_] = {}
            order.append(f_)
        norm[f_][toks[0]] = norm[f_].get(toks[0], 0.0) + w
    if not norm:
        raise ValueError("search_fielded needs at least one clause")
    fq = {f_: norm[f_] for f_ in order}
    key = ("fq", tuple((f_, tuple(sorted(m.items())))
                       for f_, m in fq.items()), k, exclude, doc_filter,
           dv_filter)
    return _plan_cached(index, key, lambda: _search_multi_match_impl(
        index, None, {f_: 1.0 for f_ in fq}, k, "most_fields", 0.0,
        exclude, doc_filter, dv_filter, fq=fq))


def _search_multi_match_impl(index, query: "str | None", fields: dict,
                             k: int, mt: str, tie: float, exclude,
                             doc_filter, dv_filter,
                             fq: dict | None = None) -> DataFrame:
    spark = index.spark
    acfg = index.cfg.analyzer
    empty = _empty_topk(spark)
    if fq is None:
        qt = query_terms(query, acfg)
        if not qt:
            return empty
    else:
        # search_fielded: per-field token->qtf maps prebuilt by the
        # caller; qt (the exclude positive-wins base) is the TEXT
        # clauses' tokens
        qt = dict(fq.get("text", {}))
        if not any(fq.values()):
            return empty
    field_list = list(fields)  # dict order == frozen fold order
    favg = {"text": float(index.avgdl)}
    for f_ in field_list:
        if f_ != "text":
            favg[f_] = float((index.field_avgdl or {}).get(f_, 0.0))

    def tkey(f_, t):
        return t if f_ == "text" else f"{f_}:{t}"

    # exclude applies in the text space (positive-wins vs text terms)
    neg = (sorted(set(tokenize_py(exclude, acfg)) - set(qt))
           if exclude else [])
    if fq is None:
        all_keys = sorted({tkey(f_, t) for f_ in field_list for t in qt
                           if favg[f_] > 0.0} | set(neg))
    else:
        all_keys = sorted({tkey(f_, t) for f_ in field_list
                           for t in fq.get(f_, {})
                           if favg[f_] > 0.0} | set(neg))
    if not all_keys:
        return empty
    lex = index.lookup_terms(all_keys)
    neg = [t for t in neg if t in lex]
    # per-field known (prefixed-term -> qtf) maps; empty fields keep
    # their LIST SLOT (the total fold order is fields order)
    subs = []
    for f_ in field_list:
        src = qt if fq is None else fq.get(f_, {})
        m = {tkey(f_, t): float(n) for t, n in src.items()
             if favg[f_] > 0.0 and tkey(f_, t) in lex}
        subs.append((f_, m))
    if not any(m for _, m in subs):
        return empty
    idfs = {t: float(lex[t]["idf"]) for t in lex}
    scan_terms = sorted({t for _, m in subs for t in m} | set(neg))
    buckets = sorted({lex[t]["bucket"] for t in scan_terms})
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(scan_terms))
            .select("term", "shard", "df", "doc_ids", "tfs", "dls"))
    width = index.shard_width
    k1_, b_ = index.cfg.bm25.k1, index.cfg.bm25.b
    boosts = [float(fields[f_]) for f_ in field_list]
    avgdls = [favg[f_] for f_ in field_list]
    # term key -> (field slot, qtf); a key belongs to exactly one slot
    term_slot = {}
    for si, (f_, m) in enumerate(subs):
        for t, n in m.items():
            term_slot[t] = (si, n)
    # cross_fields: token-major grouping — per TOKEN, the field
    # variants whose per-term contributions combine max+tie*(sum-max)
    token_groups = []
    if mt == "cross_fields":
        for t in sorted(qt):  # ascending tokens == the frozen fold
            variants = [(si, tkey(f_, t), float(qt[t]))
                        for si, (f_, m) in enumerate(subs)
                        if tkey(f_, t) in m]
            if variants:
                token_groups.append((t, variants))
    neg_set = frozenset(neg)
    del_locs = _del_closure(index)
    dv_dir, dv_gen = index.index_dir, int(index.n_docs)

    def _kernel(post_pdf, allowed_loc=None):
        import numpy as np
        import pandas as pd
        from . import codec as C
        out_empty = pd.DataFrame({"doc_id": [], "score": []})
        if len(post_pdf) == 0:
            return out_empty
        shard = int(post_pdf["shard"].iloc[0])
        start = shard * width
        n_sub = len(subs)
        accs = [np.zeros(width, dtype=np.float64) for _ in range(n_sub)]
        hitany = np.zeros(width, dtype=bool)
        negmask = np.zeros(width, dtype=bool) if neg_set else None
        cross_total = None
        if mt == "cross_fields":
            # decode once into a key map, then walk tokens ascending:
            # v_t = max_f(c) + tie * (sum_f(c) - max_f(c)), c =
            # boost_f * the frozen per-term contribution with the
            # FIELD's avgdl; total[doc] += v_t per token — the twin's
            # exact expression
            dec = {}
            for i in range(len(post_pdf)):
                term = post_pdf["term"].iloc[i]
                ids, tfs = C.decode_postings(
                    post_pdf["doc_ids"].iloc[i],
                    post_pdf["tfs"].iloc[i])
                if term in neg_set:
                    negmask[ids - start] = True
                    continue
                dls = C.vbyte_decode(
                    post_pdf["dls"].iloc[i]).astype(np.float64)
                dec[term] = (ids - start, tfs.astype(np.float64), dls)
            cross_total = np.zeros(width, dtype=np.float64)
            tmax = np.zeros(width, dtype=np.float64)
            tsum = np.zeros(width, dtype=np.float64)
            for _tok, variants in token_groups:
                locs_t = []
                for si, key, qtf in variants:
                    d = dec.get(key)
                    if d is None:
                        continue
                    loc, tfs, dls = d
                    num = tfs * (k1_ + 1.0)
                    den = tfs + k1_ * (1.0 - b_ + b_ * dls / avgdls[si])
                    c = boosts[si] * ((qtf * idfs[key]) * num / den)
                    tmax[loc] = np.maximum(tmax[loc], c)
                    tsum[loc] += c
                    hitany[loc] = True
                    locs_t.append(loc)
                if not locs_t:
                    continue
                tk = np.unique(np.concatenate(locs_t))
                cross_total[tk] += (tmax[tk]
                                    + tie * (tsum[tk] - tmax[tk]))
                tmax[tk] = 0.0
                tsum[tk] = 0.0
        else:
            order = np.argsort(post_pdf["term"].to_numpy(object))
            for i in order:
                term = post_pdf["term"].iloc[int(i)]
                if term in neg_set:
                    ids, _ = C.decode_postings(
                        post_pdf["doc_ids"].iloc[int(i)],
                        post_pdf["tfs"].iloc[int(i)])
                    negmask[ids - start] = True
                    continue
                slot = term_slot.get(term)
                if slot is None:
                    continue
                si, qtf = slot
                ids, tfs = C.decode_postings(
                    post_pdf["doc_ids"].iloc[int(i)],
                    post_pdf["tfs"].iloc[int(i)])
                dls = C.vbyte_decode(
                    post_pdf["dls"].iloc[int(i)]).astype(np.float64)
                loc = ids - start
                tfs = tfs.astype(np.float64)
                # EXACTLY the single-query kernel's float64 grouping —
                # ((qtf*idf)*A)/B — with THIS FIELD's avgdl in the
                # length norm (the dls stream already carries the
                # field's dl); terms arrive in global ascending order,
                # so each field's accumulator receives ITS terms
                # ascending too
                num = tfs * (k1_ + 1.0)
                den = tfs + k1_ * (1.0 - b_ + b_ * dls / avgdls[si])
                accs[si][loc] += (qtf * idfs[term]) * num / den
                hitany[loc] = True
        if negmask is not None:
            hitany[negmask] = False
        if del_locs is not None:
            dl_ = del_locs(shard)
            if dl_ is not None:
                hitany[dl_] = False
        if dv_filter is not None:
            from .docvalues import eval_filter
            allow = np.zeros(width, dtype=bool)
            allow[eval_filter(dv_dir, shard, dv_gen, dv_filter)] = True
            hitany &= allow
        if allowed_loc is not None:
            allow = np.zeros(width, dtype=bool)
            allow[np.asarray(allowed_loc, dtype=np.int64)] = True
            hitany &= allow
        hit = np.flatnonzero(hitany)
        if hit.size == 0:
            return out_empty
        if mt == "cross_fields":
            scores = cross_total[hit]
        else:
            # combine: s_f = boost_f * sum_f; total = left-fold in
            # fields order; best_fields = best + tie * (total - best);
            # most_fields = total — the twin's expression verbatim
            total = boosts[0] * accs[0][hit]
            best = total.copy()
            for si in range(1, n_sub):
                v = boosts[si] * accs[si][hit]
                total = total + v
                np.maximum(best, v, out=best)
            scores = total if mt == "most_fields" \
                else best + tie * (total - best)
        hit, scores = C.topk_tiebreak(hit, scores, k)
        return pd.DataFrame({"doc_id": (hit + start).astype(np.int64),
                             "score": scores})

    if doc_filter is not None:
        allowed = _allowed_shards(index, doc_filter, width)

        def fnf(key, post_pdf, allowed_pdf):
            import numpy as np
            import pandas as pd
            if len(post_pdf) == 0 or len(allowed_pdf) == 0:
                return pd.DataFrame({"doc_id": [], "score": []})
            shard = int(post_pdf["shard"].iloc[0])
            loc = (allowed_pdf["doc_id"].to_numpy(np.int64)
                   - shard * width)
            return _kernel(post_pdf, allowed_loc=loc)

        scored = (post.groupBy("shard")
                  .cogroup(allowed.groupBy("shard"))
                  .applyInPandas(fnf, "doc_id long, score double"))
    else:
        scored = (post.groupBy("shard")
                  .applyInPandas(lambda key, pdf: _kernel(pdf),
                                 "doc_id long, score double"))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_boosting(index, positive: str, negative: str,
                    negative_boost: float = 0.5, k: int = 10,
                    mode: str = "OR",
                    exclude: str | None = None,
                    doc_filter: str | None = None,
                    dv_filter: str | None = None) -> DataFrame:
    """Boosting query — the ES ``boosting`` pattern: rank by the
    ``positive`` query's BM25 score, DEMOTING (not excluding) docs that
    match the ``negative`` query: their score is multiplied by
    ``negative_boost`` (0 <= f; f < 1 demotes, 0 pushes matching docs
    to the bottom without dropping them — the soft alternative to
    ``exclude``).

    Frozen contract (mirrored by the DuckDB twin in
    ``__spark_entry__``):

    * a doc is demoted iff it contains ANY analyzer token of
      ``negative``; unknown negative terms demote nothing (the NOT
      rule); a negative term that is ALSO a positive term still scores
      AND demotes (demotion is not contradictory, so no positive-wins
      rule here);
    * operation order: the frozen per-term-ascending BM25 sum, then
      the recency multiplier if any, THEN the demote factor — the twin
      writes the identical float64 grouping;
    * the final ranking (and any ``search_after`` cursor compare) uses
      the demoted score; ``exclude``/``doc_filter``/``dv_filter``/
      tombstones compose with their unchanged contracts.

    Plan: the negative terms' doc_ids ride the SAME pruned postings
    scan as the query terms (one extra term per posting bucket — no
    corpus scan, no extra job); the shard kernel marks a width-bounded
    demote mask and multiplies after summation. Demotion invalidates
    block-max pruning (WAND's heap would hold undemoted scores), so
    boosting queries route exhaustive — the same frozen decision as
    min_match/bool."""
    _warn_if_stale(index)
    demote = (negative, float(negative_boost))
    key = ("sb", positive, negative, float(negative_boost), k,
           mode.upper(), exclude, doc_filter, dv_filter)
    return _plan_cached(index, key, lambda: _search_impl(
        index, positive, k, mode, "auto", exclude, doc_filter,
        dv_filter=dv_filter, demote=demote))


def search_synonyms(index, query: str, synonyms: dict, k: int = 10,
                    use_wand: "bool | str" = "auto",
                    exclude: str | None = None,
                    doc_filter: str | None = None,
                    dv_filter: str | None = None,
                    boost: dict | None = None) -> DataFrame:
    """BM25 top-k with query-time synonym expansion (the Lucene/ES
    synonym-filter pattern, query side).

    Frozen semantics: the query analyzes as usual (qtf per token); each
    analyzed token ``t`` then contributes its qtf to every member of its
    synonym group ``[t] + synonyms[t]`` — so the final query-term weight
    of a term is the SUM of the qtfs of all tokens it is a synonym of,
    identical to typing the expansion out with repeats (the bm25_qtf
    rule). Synonym strings must be single analyzer tokens and match the
    STORED vocabulary verbatim (the multi-term-query rule; they are NOT
    re-analyzed). OR semantics only — a synonym group makes per-term AND
    arity ill-defined (Lucene's SynonymQuery is likewise a disjunction).
    ``exclude``/``doc_filter``/``dv_filter``/``boost`` and WAND routing
    compose exactly as in ``search``; the scoring job is the unchanged
    single-job plan with the merged qtf override.
    """
    import re
    from .config import TOKEN_PATTERN
    _warn_if_stale(index)
    for t, syns in synonyms.items():
        for s in [t, *syns]:
            if not re.fullmatch(TOKEN_PATTERN, s or ""):
                raise ValueError(
                    f"synonym entries must be single [a-z0-9]+ tokens "
                    f"(got {s!r} in group {t!r})")
    syn_key = tuple(sorted((t, tuple(sorted(set(v))))
                           for t, v in synonyms.items()))
    key = ("syn", query, syn_key, k, repr(use_wand), exclude, doc_filter,
           dv_filter, _boost_key(boost))

    def build():
        qtf = query_terms(query, index.cfg.analyzer)
        merged: dict = {}
        for t, n in qtf.items():
            for u in {t, *synonyms.get(t, ())}:
                merged[u] = merged.get(u, 0) + n
        if not merged:
            return _empty_topk(index.spark)
        return _search_impl(index, "", k, "OR", use_wand, exclude,
                            doc_filter, qtf_override=merged,
                            dv_filter=dv_filter, boost=boost)

    return _plan_cached(index, key, build)


def search_bool(index, must: str, should: str = "", k: int = 10,
                min_should_match: int | None = None,
                exclude: str | None = None,
                doc_filter: str | None = None,
                dv_filter: str | None = None) -> DataFrame:
    """ES bool query in ONE search job: ``must`` (every distinct term
    required), ``should`` (optional terms that still contribute score),
    ``exclude`` (must_not), ``doc_filter``/``dv_filter`` (the non-scoring
    filter clause). Frozen semantics (mirrored by OracleIndex.search_bool
    and the DuckDB gate twin):

    - a doc qualifies iff ALL must terms are present, at least
      ``min_should_match`` distinct should terms are present (ES default
      rule: 0 when must clauses exist, else 1), and no exclude term is
      present;
    - the score is the plain BM25 OR sum over must UNION should terms —
      both clause kinds contribute, qtf merges by occurrence count across
      the two clause texts, and a term appearing in both clauses counts
      as must for the arity test;
    - an unknown must term, or a floor above the number of known should
      terms, returns empty.

    Plan: the single pruned-scan job of ``search`` with a second per-doc
    distinct-term counter in the shard kernel (`must` membership); the
    arity constraint invalidates WAND's theta pruning, so bool queries
    route exhaustive (the same rule as min_match). Pure-should input
    degenerates to ``search(mode=OR, min_match=...)`` and keeps that
    path's WAND routing."""
    from collections import Counter
    _warn_if_stale(index)
    acfg = index.cfg.analyzer
    m_qtf = Counter(tokenize_py(must, acfg))
    s_qtf = Counter(tokenize_py(should, acfg))
    if not m_qtf:
        # no must clauses: ES semantics degrade to plain OR with the
        # floor (default 1) — reuse search()'s plan cache + WAND routing
        mm = min_should_match if (min_should_match or 0) > 1 else None
        return search(index, should, k=k, mode="OR", exclude=exclude,
                      doc_filter=doc_filter, dv_filter=dv_filter,
                      min_match=mm)
    must_set = frozenset(m_qtf)
    msm = int(min_should_match) if min_should_match is not None \
        else 0
    if msm < 0:
        raise ValueError("min_should_match must be >= 0")
    n_should = len(set(s_qtf) - must_set)
    if msm > n_should:
        # floor above the number of DISTINCT should terms given: even a
        # doc containing every should term cannot reach it
        return _empty_topk(index.spark)
    merged = dict(m_qtf + s_qtf)
    key = ("bool", tuple(sorted(merged.items())), tuple(sorted(must_set)),
           k, msm, exclude, doc_filter, dv_filter)
    return _plan_cached(index, key, lambda: _search_impl(
        index, "", k, "OR", False, exclude, doc_filter,
        qtf_override=merged, dv_filter=dv_filter,
        must_terms=must_set, min_should=msm))


def search_after(index, query: str, k: int = 10, mode: str = "OR",
                 after: "tuple[float, int] | None" = None,
                 exclude: str | None = None,
                 doc_filter: str | None = None,
                 dv_filter: str | None = None,
                 boost: dict | None = None) -> DataFrame:
    """Deep pagination: the next ``k`` results STRICTLY after the cursor
    ``after = (score, doc_id)`` in the frozen (score desc, doc_id asc)
    total order — pass the previous page's LAST row back verbatim.

    Cursor pagination, not OFFSET: each page costs one ordinary query
    job (the cursor predicate is evaluated inside the shard scorer
    before its top-k cut, so every shard re-emits its next k candidates
    and per-shard top-k stays globally sufficient on every page — page N
    never rescans or rebuffers pages 1..N-1 the way LIMIT/OFFSET does).
    The raw-float cursor compare is exact because scores are
    bit-reproducible (frozen per-term summation order — the same
    invariant the rank-identity suite pins), so pages are disjoint and
    complete: walking pages until empty reproduces the full ranking.

    ``after=None`` is page 1 and delegates to ``search`` unchanged
    (including WAND routing); cursor pages route exhaustive — Block-Max
    pruning targets the current top-k only. ``exclude``/``doc_filter``
    compose; use identical arguments on every page of a walk.
    """
    if after is None:
        return search(index, query, k, mode, "auto", exclude, doc_filter,
                      dv_filter=dv_filter, boost=boost)
    _warn_if_stale(index)
    cur = (float(after[0]), int(after[1]))
    key = ("sa", query, k, mode.upper(), cur, exclude, doc_filter,
           dv_filter, _boost_key(boost))
    return _plan_cached(index, key, lambda: _search_impl(
        index, query, k, mode, False, exclude, doc_filter, cursor=cur,
        dv_filter=dv_filter, boost=boost))


def search_collapsed(index, query: str, field: str, k: int = 10,
                     mode: str = "OR",
                     exclude: str | None = None,
                     doc_filter: str | None = None,
                     dv_filter: str | None = None,
                     term_boosts: dict | None = None) -> DataFrame:
    """Field collapsing (the ES ``collapse`` pattern): the top-k GROUPS
    for ``query``, one row per distinct value of the stored docvalue
    column ``field`` — each group represented by its best-scoring doc
    under the frozen (score desc, doc_id asc) order, groups ranked by
    that representative. Returns (group_key string, doc_id, score);
    ``group_key`` is the field's Arrow string rendering (collapse keys
    are categorical by design — use string/int fields).

    Frozen contract: docs with a NULL/absent field value are EXCLUDED
    (grouping by unknown key is undefined — the search_sorted NULL
    rule); scores are the unchanged frozen BM25 scores.

    Plan: the per-shard scorer reduces its hits to best-doc-per-group
    (vectorized lexsort + first-occurrence cut over the shard's cached
    docvalue slice — zero corpus scan, zero extra shuffle) and emits its
    top-k GROUPS; per-shard top-k groups is globally sufficient (if a
    global top-k group were outside its best-doc shard's per-shard
    top-k, that shard would hold k groups whose global best beats it —
    contradiction), so <= k rows per shard feed a tiny window
    (row_number per group) + TakeOrderedAndProject. Routes exhaustive
    (the reduction needs every hit's score); ``exclude``/``doc_filter``/
    ``dv_filter``/``term_boosts`` compose exactly as in ``search``."""
    _warn_if_stale(index)
    key = ("col", query, field, k, mode.upper(), exclude, doc_filter,
           dv_filter, _boost_key(term_boosts))
    return _plan_cached(index, key, lambda: _search_impl(
        index, query, k, mode, False, exclude, doc_filter,
        dv_filter=dv_filter, term_boosts=term_boosts, collapse=field))


def search_top_hits(index, query: str, field: str, k: int = 10,
                    hits_per_group: int = 3, mode: str = "OR",
                    exclude: str | None = None,
                    doc_filter: str | None = None,
                    dv_filter: str | None = None,
                    term_boosts: dict | None = None) -> DataFrame:
    """Top-hits aggregation (the ES ``top_hits`` sub-agg under a
    ``terms`` bucket — "per X, the N best matching docs"): the top-k
    GROUPS by distinct value of the stored docvalue column ``field``
    (ranked by each group's best doc, exactly ``search_collapsed``'s
    group order), each carrying its own top-``hits_per_group`` docs
    under the frozen (score desc, doc_id asc) order. Returns
    (group_key, doc_id, score) rows ordered group-rank-major,
    hit-rank-minor; scores are the unchanged frozen BM25 scores and
    NULL-keyed docs are excluded (the collapse contract —
    ``hits_per_group=1`` degenerates to ``search_collapsed``).

    Plan: the per-shard scorer emits its top-N docs of EVERY group it
    holds — per-(group, shard) bounded partials, the same emission class
    as ``facet_stats`` (collapse keys are categorical by design; a group
    outside one shard's local top-k can still be a global top-k group
    whose trailing hits live there, so the n=1 per-shard-top-k-groups
    cut is NOT sufficient for n > 1). A tiny window over those partials
    takes each group's global top-N, ranks groups by their rank-1 row,
    and a broadcast semi-join keeps the top-k groups. Routes exhaustive
    (every hit's score is needed); ``exclude``/``doc_filter``/
    ``dv_filter``/``term_boosts`` compose exactly as in ``search``."""
    _warn_if_stale(index)
    n = int(hits_per_group)
    if n < 1:
        raise ValueError("hits_per_group must be >= 1")
    key = ("th", query, field, k, n, mode.upper(), exclude, doc_filter,
           dv_filter, _boost_key(term_boosts))
    return _plan_cached(index, key, lambda: _search_impl(
        index, query, k, mode, False, exclude, doc_filter,
        dv_filter=dv_filter, term_boosts=term_boosts, collapse=field,
        collapse_n=n))


def search_sorted(index, query: str, field: str, k: int = 10,
                  mode: str = "AND", ascending: bool = False,
                  exclude: str | None = None,
                  dv_filter: str | None = None,
                  after: "tuple | None" = None) -> DataFrame:
    """Match-set top-k ranked by a STORED docvalue field (the Lucene
    sort-by-field pattern — e.g. "most recent docs mentioning X"):
    docs matching ``query`` under ``mode`` semantics, ranked by
    ``(field asc/desc, doc_id asc)``. Returns (doc_id, sort_val) where
    ``sort_val`` is the field value as float64 (timestamps -> epoch
    seconds; sub-second precision preserved).

    Frozen contract: docs whose field value is NULL (or that predate the
    docvalue store) are EXCLUDED — "sort by X" over unknown X is
    undefined, and silently ranking them first/last would poison page 1.
    The oracle twin adds ``AND <field> IS NOT NULL``. ``exclude`` (NOT
    terms) and ``dv_filter`` compose exactly as in ``search``.

    ``after=(sort_val, doc_id)``: cursor pagination over the field sort
    (the ES search_after rule on a non-score sort) — strictly-after
    docs in the frozen ``(field asc/desc, doc_id asc)`` order; the
    cursor compare is pushed into the shard kernel, so deep pages cost
    the same one-scan plan as page 1. Pass page N's last row verbatim.

    Plan shape (the 100 TB argument): the ONLY scan is the pruned
    postings read — no corpus scan, no score computation. Each scorer
    task resolves its match set from the postings, gathers the <= |hits|
    sort keys from its own shard's cached docvalue slice
    (docvalues.sort_values — a sequential columnar read), and emits its
    local top-k; TakeOrderedAndProject finishes globally. BM25 never
    runs: tf streams decode only to resolve membership.
    """
    _warn_if_stale(index)
    if field not in (index.doc_values or ()):
        raise ValueError(
            f"sort field {field!r} is not a docvalue column of this "
            f"index (stored: {list(index.doc_values or ())}; build with "
            f"IndexConfig(doc_values=...))")
    _require_dv(index, dv_filter)
    if after is not None:
        after = (float(after[0]), int(after[1]))
    key = ("ss", query, field, k, mode.upper(), ascending, exclude,
           dv_filter, after)
    return _plan_cached(index, key, lambda: _search_sorted_impl(
        index, query, field, k, mode, ascending, exclude, dv_filter,
        after))


def _search_sorted_impl(index, query: str, field: str, k: int,
                        mode: str, ascending: bool,
                        exclude: str | None,
                        dv_filter: str | None,
                        after: "tuple | None" = None) -> DataFrame:
    import numpy as np
    spark = index.spark
    mode = mode.upper()
    acfg = index.cfg.analyzer
    qtf = query_terms(query, acfg)
    empty = _empty_topk(spark, score_col="sort_val")
    if not qtf:
        return empty
    neg = sorted(set(tokenize_py(exclude, acfg)) - set(qtf)) if exclude else []
    terms = sorted(qtf)
    lex = index.lookup_terms(sorted(set(terms) | set(neg)))
    known = [t for t in terms if t in lex]
    if (mode == "AND" and len(known) < len(terms)) or not known:
        return empty
    neg = [t for t in neg if t in lex]
    n_required = len(terms)
    scan_terms = sorted(set(known) | set(neg))
    buckets = sorted({lex[t]["bucket"] for t in scan_terms})
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(scan_terms))
            .select("term", "shard", "doc_ids", "tfs"))
    width = index.shard_width
    neg_set = frozenset(neg)
    dv_dir, dv_gen = index.index_dir, int(index.n_docs)
    del_locs = _del_closure(index)  # tombstones (engine/deletes.py)

    def fn(key_, post_pdf):
        import pandas as pd
        from . import codec as C
        from .docvalues import eval_filter, sort_values
        empty_r = pd.DataFrame({"doc_id": [], "sort_val": []})
        if len(post_pdf) == 0:
            return empty_r
        shard = int(post_pdf["shard"].iloc[0])
        start = shard * width
        cnt = np.zeros(width, dtype=np.int32)
        negmask = np.zeros(width, dtype=bool) if neg_set else None
        for i in range(len(post_pdf)):
            ids, _ = C.decode_postings(post_pdf["doc_ids"].iloc[i],
                                       post_pdf["tfs"].iloc[i])
            loc = ids - start
            if post_pdf["term"].iloc[i] in neg_set:
                negmask[loc] = True
            else:
                cnt[loc] += 1
        if negmask is not None:
            cnt[negmask] = -1
        if del_locs is not None:
            dl_ = del_locs(shard)
            if dl_ is not None:
                cnt[dl_] = -1  # tombstoned docs never hit
        if dv_filter is not None:
            allow = np.zeros(width, dtype=bool)
            allow[eval_filter(dv_dir, shard, dv_gen, dv_filter)] = True
            cnt[~allow] = -1
        hit = np.flatnonzero(cnt == n_required) if mode == "AND" \
            else np.flatnonzero(cnt > 0)
        if hit.size == 0:
            return empty_r
        vals = sort_values(dv_dir, shard, dv_gen, field, hit)
        ok = ~np.isnan(vals)   # frozen: NULL sort keys are excluded
        hit, vals = hit[ok], vals[ok]
        if after is not None:
            # cursor pushed into the shard kernel (the search_after
            # rule on the (field, doc_id) sort): strictly after
            # (a_val, a_doc) in the frozen order
            a_val, a_doc = after
            gid = hit + start
            if ascending:
                keep = (vals > a_val) | ((vals == a_val) & (gid > a_doc))
            else:
                keep = (vals < a_val) | ((vals == a_val) & (gid > a_doc))
            hit, vals = hit[keep], vals[keep]
        if hit.size == 0:
            return empty_r
        # per-shard top-k in the frozen (field asc/desc, doc_id asc)
        # order — lexsort's LAST key is primary
        order = np.lexsort((hit, vals if ascending else -vals))[:k]
        return pd.DataFrame(
            {"doc_id": (hit[order] + start).astype(np.int64),
             "sort_val": vals[order]})

    ranked = (post.groupBy("shard")
              .applyInPandas(fn, "doc_id long, sort_val double"))
    key_order = F.asc("sort_val") if ascending else F.desc("sort_val")
    return ranked.orderBy(key_order, F.asc("doc_id")).limit(k)


def normalize_prefix(prefix: str) -> str:
    """Frozen wildcard-prefix normalization: lowercase, strip the
    trailing ``*`` if given, and REQUIRE the remainder to be a single
    well-formed token ([a-z0-9]+). Analyzer hooks (stopwords, stemmer)
    deliberately do NOT rewrite it — a prefix is not a word, so stemming
    it would corrupt the match set (the standard multi-term-query rule:
    wildcard terms match the STORED vocabulary verbatim)."""
    import re
    from .config import TOKEN_PATTERN
    p = (prefix or "").strip().lower()
    if p.endswith("*"):
        p = p[:-1]
    if not p or not re.fullmatch(TOKEN_PATTERN, p):
        raise ValueError(
            f"invalid wildcard prefix {prefix!r}: need a single "
            f"[a-z0-9]+ token, optionally followed by '*'")
    return p


def search_prefix(index, prefix: str, k: int = 10,
                  max_expansions: int = 64,
                  use_wand: "bool | str" = "auto",
                  exclude: str | None = None,
                  doc_filter: str | None = None,
                  after: "tuple[float, int] | None" = None) -> DataFrame:
    """BM25 top-k for the wildcard query ``prefix*``.

    Frozen semantics: the prefix expands to the <= ``max_expansions``
    matching lexicon terms (highest df first, term ascending on ties —
    PackedIndex.expand_prefix, the deterministic cap the SQL oracle twin
    replicates) and the expanded set scores as a standard OR query with
    query-term weight 1 per matched term (document tf still counts; a
    repeated wildcard adds nothing). Each matched term keeps its OWN
    corpus-global idf — rare long variants are worth more than the
    head word, exactly as if the user had typed the expansion out.

    Plan: expansion is ONE pushed-down lexicon range scan (memoized per
    (prefix, cap) driver-side; the lexicon is term-sorted on disk so
    row-group stats confine the scan to the prefix's vocab slice), then
    the identical single-job scoring plan as ``search`` — pruned
    postings scan, per-shard Arrow scorer, TakeOrderedAndProject. WAND
    routing, ``exclude`` and ``doc_filter`` compose unchanged.

    ``after``: cursor pagination, same contract as ``search_after``
    (previous page's last (score, doc_id) verbatim; cursor pages route
    exhaustive). Use the SAME prefix/cap on every page of a walk.
    """
    _warn_if_stale(index)
    p = normalize_prefix(prefix)
    cur = (float(after[0]), int(after[1])) if after is not None else None
    key = ("px", p, k, int(max_expansions), repr(use_wand), exclude,
           doc_filter, cur)

    def build():
        rows = index.expand_prefix(p, max_expansions)
        if not rows:
            return _empty_topk(index.spark)
        qtf = {r["term"]: 1 for r in rows}
        return _search_impl(index, "", k, "OR",
                            False if cur is not None else use_wand,
                            exclude, doc_filter, qtf_override=qtf,
                            cursor=cur)

    return _plan_cached(index, key, build)


def search_regexp(index, pattern: str, k: int = 10,
                  max_expansions: int = 64,
                  use_wand: "bool | str" = "auto",
                  exclude: str | None = None,
                  doc_filter: str | None = None,
                  dv_filter: str | None = None,
                  after: "tuple[float, int] | None" = None) -> DataFrame:
    """BM25 top-k for a regexp term query (the Lucene/ES ``regexp``
    query, full-match semantics).

    Frozen semantics: the pattern expands to the <= ``max_expansions``
    vocabulary terms FULLY matching it (PackedIndex.expand_regexp;
    deterministic cap df DESC, term ASC — the rule every expansion
    surface shares and the SQL oracle twin replicates), and the
    expanded set scores as a standard OR query with query-term weight 1
    per matched term, each keeping its OWN corpus-global idf — exactly
    as if the user had typed the expansion out. Patterns are matched
    against the STORED vocabulary verbatim (no analyzer hooks), the
    multi-term-query rule.

    Plan: expansion is one lexicon scan with the pattern's literal
    prefix pushed into the term-sorted parquet (row-group pruning;
    see expand_regexp for the no-prefix caveat), memoized driver-side;
    scoring is ``search``'s unchanged single-job plan. WAND routing,
    ``exclude``, ``doc_filter``/``dv_filter`` and cursor pagination
    compose exactly as in ``search_prefix``.
    """
    _warn_if_stale(index)
    cur = (float(after[0]), int(after[1])) if after is not None else None
    key = ("rx", pattern, k, int(max_expansions), repr(use_wand), exclude,
           doc_filter, dv_filter, cur)

    def build():
        rows = index.expand_regexp(pattern, max_expansions)
        if not rows:
            return _empty_topk(index.spark)
        qtf = {r["term"]: 1 for r in rows}
        return _search_impl(index, "", k, "OR",
                            False if cur is not None else use_wand,
                            exclude, doc_filter, qtf_override=qtf,
                            cursor=cur, dv_filter=dv_filter)

    return _plan_cached(index, key, build)


def search_fuzzy(index, term: str, k: int = 10, max_edits: int = 1,
                 max_expansions: int = 50,
                 use_wand: "bool | str" = "auto",
                 exclude: str | None = None,
                 doc_filter: str | None = None,
                 dv_filter: str | None = None,
                 after: "tuple[float, int] | None" = None) -> DataFrame:
    """BM25 top-k for the fuzzy query ``term~max_edits`` (the Lucene/ES
    fuzzy query): documents matching any stored vocabulary term within
    ``max_edits`` Levenshtein of ``term``.

    Frozen semantics (engine/fuzzy.py has the full contract): candidates
    are vocabulary terms with plain Levenshtein distance <= max_edits
    (the exact metric DuckDB's ``levenshtein`` computes — the oracle
    twin checks the SEMANTICS over the whole vocab while the engine uses
    the indexed deletion-neighborhood lookup); the deterministic cap is
    (distance ASC, df DESC, term ASC) LIMIT max_expansions; the
    surviving terms score as a standard OR query with qtf=1 per term,
    each keeping its own corpus-global idf. The term is normalized like
    a wildcard prefix (lowercase single token; analyzer hooks do NOT
    rewrite it — fuzzy matches the STORED vocabulary verbatim).

    Plan: expansion = driver-side deletion variants of the term ->
    ONE partition-pruned, predicate-pushed scan of the vocab-scaled
    variant table -> metadata-sized verify + cap (memoized). Scoring is
    ``search``'s unchanged single-job plan; WAND routing, ``exclude``,
    ``doc_filter``/``dv_filter`` and cursor pagination (``after``)
    compose exactly as in ``search_prefix``.

    Requires an index built with ``IndexConfig(fuzzy_edits >= max_edits)``
    — the neighborhood is a build-time layout, like positions/doc_values.
    """
    from .fuzzy import expand_fuzzy
    _warn_if_stale(index)
    t = normalize_prefix(term)  # same frozen single-token normalization
    cur = (float(after[0]), int(after[1])) if after is not None else None
    key = ("fz", t, k, int(max_edits), int(max_expansions),
           repr(use_wand), exclude, doc_filter, dv_filter, cur)

    def build():
        rows = expand_fuzzy(index, t, max_edits, max_expansions)
        if not rows:
            return _empty_topk(index.spark)
        qtf = {r["term"]: 1 for r in rows}
        return _search_impl(index, "", k, "OR",
                            False if cur is not None else use_wand,
                            exclude, doc_filter, qtf_override=qtf,
                            cursor=cur, dv_filter=dv_filter)

    return _plan_cached(index, key, build)


def explain_score(index, query: str, doc_id: int) -> DataFrame:
    """Per-term BM25 score breakdown for ONE document (the ES/Lucene
    `_explain` endpoint): how each query term contributes to the doc's
    score — the debugging surface every relevance engineer reaches for.

    Returns one row per query term PRESENT in the document:
    ``(term, qtf, tf, dl, df, idf, contribution)`` ordered by
    (contribution desc, term asc), where ``contribution = qtf * idf *
    tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` — exactly the summand of
    the frozen scoring formula: summing the contributions in the
    engine's frozen order (term asc) reproduces the doc's ``search``
    score bit-for-bit (tested). Terms absent from
    the doc (or the vocabulary) produce no row. Tombstoned docs still
    explain (the postings are physically present until purge) — explain
    reports the INDEX state, which is the point of the endpoint.

    Plan (the 100 TB argument): tf/dl are read from the INDEX, not
    recomputed from text — the postings scan is pruned to the query
    terms' buckets (partition pruning), the term list (predicate
    pushdown) AND the one scoring shard containing the doc (shard =
    doc_id // width, a stored column predicate), so ONE task decodes
    only the target shard's sublists and emits <= |query| rows; idf
    rides the closure from the memoized lexicon lookup. The external
    oracle twin recomputes everything from the raw corpus text — so the
    gate cross-checks the index's stored tf/dl/df against first
    principles, which is what makes this row a strong integrity check.
    """
    _warn_if_stale(index)
    doc_id = int(doc_id)
    key = ("ex", query, doc_id)

    def build():
        spark = index.spark
        empty = spark.range(0).select(
            F.col("id").cast("string").alias("term"),
            *[F.lit(0).cast("long").alias(c) for c in ("qtf", "tf", "dl",
                                                       "df")],
            *[F.lit(0.0).alias(c) for c in ("idf", "contribution")])
        if not (0 <= doc_id < int(index.n_ids or index.n_docs)):
            raise ValueError(f"doc_id {doc_id} out of range "
                             f"[0, {int(index.n_ids or index.n_docs)})")
        qtf = query_terms(query, index.cfg.analyzer)
        if not qtf:
            return empty
        lex = index.lookup_terms(sorted(qtf))
        if not lex:
            return empty
        width = index.shard_width
        shard = doc_id // width
        terms = sorted(lex)
        buckets = sorted({lex[t]["bucket"] for t in terms})
        post = (index.postings()
                .filter(F.col("bucket").isin(buckets)
                        & F.col("term").isin(terms)
                        & (F.col("shard") == shard))
                .select("term", "shard", "doc_ids", "tfs", "dls"))

        def fn(key_, post_pdf):
            import numpy as np
            import pandas as pd
            from . import codec as C
            out_t, out_tf, out_dl = [], [], []
            start = shard * width
            for i in range(len(post_pdf)):
                ids, tfs = C.decode_postings(post_pdf["doc_ids"].iloc[i],
                                             post_pdf["tfs"].iloc[i])
                j = np.searchsorted(ids, doc_id)
                if j < ids.size and ids[j] == doc_id:
                    dls = C.vbyte_decode(post_pdf["dls"].iloc[i])
                    out_t.append(post_pdf["term"].iloc[i])
                    out_tf.append(int(tfs[j]))
                    out_dl.append(int(dls[j]))
            return pd.DataFrame({"term": out_t, "tf": out_tf, "dl": out_dl})

        found = (post.groupBy("shard")
                 .applyInPandas(fn, "term string, tf long, dl long"))
        # idf/df/qtf ride a literal CASE map (<= |query| entries) — the
        # contribution column is the exact bm25_score_col summand
        def _case(vals: dict, typ: str) -> "F.Column":
            expr = "CASE term " + " ".join(
                f"WHEN '{t}' THEN CAST({v} AS {typ})"
                for t, v in vals.items()) + " END"
            return F.expr(expr)
        qtfc = _case({t: int(qtf[t]) for t in terms}, "BIGINT")
        dfc = _case({t: int(lex[t]["df"]) for t in terms}, "BIGINT")
        idfc = _case({t: repr(float(lex[t]["idf"])) for t in terms},
                     "DOUBLE")
        contrib = bm25_score_col(
            F.col("tf").cast("double"), F.col("dl").cast("double"),
            idfc, qtfc.cast("double"), index.avgdl, index.cfg.bm25)
        return (found.select(
            "term", qtfc.alias("qtf"), "tf", "dl", dfc.alias("df"),
            idfc.alias("idf"), contrib.alias("contribution"))
            .orderBy(F.desc("contribution"), F.asc("term")))

    return _plan_cached(index, key, build)


def term_vectors(index, doc_id: int) -> DataFrame:
    """Per-document term vector (the ES ``_termvectors`` endpoint): one
    row per distinct analyzer term of the document —
    ``(term, tf, df, cf, idf)``, term ascending. ``tf`` is the term's
    in-document frequency; ``df``/``cf``/``idf`` are the CURRENT
    corpus-wide lexicon statistics (so the endpoint doubles as an
    integrity probe: the oracle twin recomputes all five values from the
    raw corpus text).

    Plan (the 100 TB argument): the doc's text comes from ONE pruned
    corpus read (<= 1 row — ``_corpus_pruned`` inverts the id to
    stored-column predicates, parquet row-group stats prune the scan),
    re-analyzed driver-side with the frozen tokenizer (metadata-sized:
    one document); per-term stats come from ONE term-pushed lexicon
    lookup (<= |doc vocab| rows). The result is a driver-built local
    relation — no corpus-scale job anywhere."""
    _warn_if_stale(index)
    doc_id = int(doc_id)
    spark = index.spark
    schema = "term string, tf long, df long, cf long, idf double"
    if not (0 <= doc_id < int(index.n_ids or index.n_docs)):
        raise ValueError(f"doc_id {doc_id} out of range "
                         f"[0, {int(index.n_ids or index.n_docs)})")
    rows = (_corpus_pruned(index, [doc_id])
            .select("doc_id", "text").collect())
    if not rows:
        return spark.createDataFrame([], schema)
    from collections import Counter
    tf = Counter(tokenize_py(rows[0]["text"], index.cfg.analyzer))
    if not tf:
        return spark.createDataFrame([], schema)
    lex = {r["term"]: r for r in
           index.lexicon().filter(F.col("term").isin(sorted(tf)))
           .select("term", "df", "cf", "idf").collect()}
    out = [(t, int(n), int(lex[t]["df"]), int(lex[t]["cf"]),
            float(lex[t]["idf"]))
           for t, n in sorted(tf.items()) if t in lex]
    return spark.createDataFrame(out, schema)


def _search_impl(index, query: str, k: int = 10, mode: str = "OR",
                 use_wand: "bool | str" = "auto",
                 exclude: str | None = None,
                 doc_filter: str | None = None,
                 qtf_override: dict | None = None,
                 cursor: "tuple[float, int] | None" = None,
                 dv_filter: str | None = None,
                 boost: dict | None = None,
                 min_match: int | None = None,
                 term_boosts: dict | None = None,
                 collapse: str | None = None, collapse_n: int = 1,
                 must_terms: "frozenset | None" = None,
                 min_should: int = 0,
                 allowed_ids: "list[int] | None" = None,
                 demote: "tuple[str, float] | None" = None) -> DataFrame:
    """BM25 top-k over the packed on-disk index — ONE Spark job.

    ``use_wand``: ``"auto"`` (default) routes OR queries through
    Block-Max WAND only when the driver-side cost gate says pruning can
    win (see WAND_MIN_SHARD_POSTINGS); ``True`` forces WAND (rank-safe
    always — the tests pin it to keep WAND coverage non-vacuous at small
    corpora); ``False`` forces the exhaustive scorer.

    ``doc_filter``: optional SQL predicate over the stored corpus's
    columns (the contract columns plus any extra metadata columns the
    input carried, e.g. ``"role = 'user'"`` or ``"lang = 'en'"``) —
    query-time candidate restriction with GLOBAL BM25 stats (N, avgdl,
    idf stay corpus-wide; the filter only decides which docs may appear
    in the top-k — frozen semantics, mirrored by the oracle twin). Plan:
    the predicate is pushed down into the corpus parquet scan (only the
    filter columns + the doc-id derivation columns are read), the
    surviving doc_ids are grouped by the SAME doc-range shard key as the
    postings and cogrouped into the scorer, which masks non-matching
    docs after accumulation. The extra shuffle moves one int64 per
    matching doc — the minimum information an arbitrary predicate can
    transfer. Filtered OR queries route through the SAME WAND cost gate:
    masked WAND is rank-safe with unchanged block bounds (maxima over
    block supersets stay valid upper bounds for the allowed subset; θ
    seeds from allowed-only seed scores), and the mask intersects the
    candidate set, so a selective filter SHRINKS pruning-phase work.

    Plan: memoized driver-side lexicon lookup of the <= |query| terms
    (one tiny term-pushed job the FIRST time a term is seen; zero jobs
    after) gives idf + exact bucket per term -> postings scan pruned to
    those buckets (partition pruning) and terms (predicate pushdown) ->
    per-shard Arrow scorer (idf inlined via the task closure — no lexicon
    join, no broadcast exchange in the query job) emits <= k rows ->
    orderBy(score desc, doc_id).limit(k) (TakeOrderedAndProject).
    """
    from .build import PackedIndex  # noqa: F401 (typing)
    spark = index.spark
    mode = mode.upper()
    # docvalue-served restriction/boost (engine/docvalues.py): dv_filter
    # is an ANSI-SQL predicate over the index's STORED docvalue columns,
    # evaluated inside each scorer task over its own shard's column
    # slice — zero corpus scan, zero extra shuffle (the scale-path
    # alternative to doc_filter for indexed attributes; both compose:
    # the masks intersect). ``boost`` multiplies each doc's BM25 score
    # by the frozen recency decay (docvalues.recency_multiplier) —
    # boosted queries route exhaustive (block-max bounds don't carry a
    # per-doc multiplier).
    bst = _norm_boost(index, boost)
    _require_dv(index, dv_filter)
    # field collapsing (ES collapse, see search_collapsed): the kernel
    # reduces each shard's hits to best-doc-per-group before its top-k
    # cut, so every hit's score must exist -> exhaustive only; cursor
    # pagination over groups is undefined (a group's best doc moves
    # between pages) -> rejected
    if collapse is not None:
        if collapse not in (index.doc_values or ()):
            raise ValueError(
                f"collapse field {collapse!r} is not a docvalue column of "
                f"this index (stored: {list(index.doc_values or ())}; "
                f"build with IndexConfig(doc_values=...))")
        if cursor is not None:
            raise ValueError("collapse does not compose with search_after "
                             "cursors")
        use_wand = False
    # minimum_should_match (ES bool-query rule, OR only): normalized to
    # an int >= 2 or None (1 is the plain OR contract). AND arity is
    # already exact, so combining the two is ill-defined -> rejected.
    mm = None
    if min_match is not None and int(min_match) > 1:
        if mode != "OR":
            raise ValueError("min_match applies to OR queries only "
                             "(AND already requires every term)")
        mm = int(min_match)
    acfg = index.cfg.analyzer
    # qtf_override: pre-resolved {term: weight} (search_prefix expansion)
    # — terms are stored-vocabulary entries, not analyzer input
    qtf = dict(qtf_override) if qtf_override is not None \
        else query_terms(query, acfg)
    empty = _empty_topk(spark)
    if collapse is not None:
        empty = spark.range(0).select(
            F.lit("").alias("group_key"),
            F.col("id").alias("doc_id"),
            F.lit(0.0).cast("double").alias("score"))
    if not qtf:
        return empty
    # per-term query boosting (term^w): a pure qtf multiplier — applied
    # before the lexicon lookup so WAND bounds, routing, and every
    # downstream path see the boosted weights transparently
    qtf = _apply_term_boosts(qtf, term_boosts)
    neg = sorted(set(tokenize_py(exclude, acfg)) - set(qtf)) if exclude else []
    # boosting query (ES `boosting`, see search_boosting): demote =
    # (negative_query, negative_boost). Docs containing ANY demote term
    # keep their rank score times the factor; unknown demote terms
    # demote nothing (the NOT rule); demotion invalidates block-max
    # pruning (WAND would heap undemoted scores) -> exhaustive only.
    dem = []
    dem_factor = 1.0
    if demote is not None:
        dem_q, dem_factor = demote
        dem_factor = float(dem_factor)
        if dem_factor < 0.0:
            raise ValueError("demote factor must be >= 0")
        dem = sorted(set(tokenize_py(dem_q, acfg)))
    terms = sorted(qtf)
    lex = index.lookup_terms(sorted(set(terms) | set(neg) | set(dem)))
    known = [t for t in terms if t in lex]
    if mode == "AND" and len(known) < len(terms):
        return empty  # a required term is absent from the corpus
    if not known:
        return empty
    mst = frozenset()
    if must_terms:
        # bool query (search_bool): every must term is required, so an
        # unknown must term empties the result; a should floor above the
        # number of KNOWN should terms is unreachable. The arity
        # constraints invalidate WAND's theta pruning (same argument as
        # min_match) -> exhaustive only.
        if must_terms - set(known):
            return empty
        if min_should > sum(1 for t in known if t not in must_terms):
            return empty
        mst = frozenset(must_terms)
        use_wand = False
    neg = [t for t in neg if t in lex]  # absent NOT-terms exclude nothing
    dem = [t for t in dem if t in lex]  # absent demote terms demote nothing
    if dem:
        use_wand = False  # per-doc demotion invalidates block bounds
    qtfs = {t: float(qtf[t]) for t in known}
    idfs = {t: float(lex[t]["idf"]) for t in known}
    n_required = len(terms)
    scan_terms = sorted(set(known) | set(neg) | set(dem))
    buckets = sorted({lex[t]["bucket"] for t in scan_terms})
    if mm is not None:
        if mm > len(known):
            return empty  # fewer known terms than the floor: no doc can hit
        use_wand = False  # a match-count floor invalidates WAND's theta
        #                   pruning (its heap would seed from docs the
        #                   floor later rejects) -> exhaustive only
    if neg:
        use_wand = False  # NOT queries score via the exhaustive path
    if bst is not None:
        use_wand = False  # per-doc multiplier invalidates block bounds
    if cursor is not None:
        # pagination needs docs BELOW page 1's threshold — Block-Max
        # pruning targets the current top-k only, so cursor pages route
        # exhaustive (they are as cheap as any other exhaustive query)
        use_wand = False
    # (doc_filter queries route through the same cost gate: masked WAND
    # is rank-safe — wand.score_shard_wand(allowed_loc=...) — and a
    # selective filter shrinks its candidate set further)
    if use_wand == "auto" and mode == "OR":
        # single-term queries resolve through the same formula: mass ==
        # seed_df, so the seed-selectivity test fails -> exhaustive (the
        # truthy string "auto" must never reach the scorer routing)
        # Driver-side WAND cost gate from GLOBAL df (already in hand from
        # the lexicon lookup — no extra job), on the PER-SHARD posting
        # mass: the scorer task's dense scatter pass costs O(shard mass),
        # while WAND's seed-scoring + block bounds + candidate re-decode
        # is per-task overhead that only amortizes over a LARGE shard.
        # Measured at 650 k docs (shard mass <= 45 k): exhaustive beats
        # forced WAND 2-3x on every multi-term head-word query (q19
        # 0.70 s vs 2.38 s, q20 0.78 s vs 1.82 s) — with many high-df
        # terms the rest-sum upper bound makes block pruning vacuous.
        # WAND is reserved for the big-shard regime it was built for
        # (2^21-doc shards at cluster scale) with a selective seed.
        mass = sum(int(lex[t]["df"]) for t in known)
        seed_df = min(int(lex[t]["df"]) for t in known)
        n_shards = max(1, -(-index.n_docs // index.shard_width))
        use_wand = (mass // n_shards >= WAND_MIN_SHARD_POSTINGS
                    and seed_df * WAND_SEED_FRAC < mass)
    cols = ["term", "shard", "df", "doc_ids", "tfs", "dls"] + (
        ["blocks", "max_tf"] if use_wand and mode == "OR" else [])
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(scan_terms))
            .select(*cols))
    width = index.shard_width
    cfgd = {"k1": index.cfg.bm25.k1, "b": index.cfg.bm25.b, "avgdl": index.avgdl}
    neg_set = frozenset(neg)
    dem_set = frozenset(dem)
    # docvalue closures: evaluated INSIDE the scorer task over its own
    # shard's cached column slice. dv_gen (index generation) keys the
    # worker cache so a refreshed handle never serves a stale slice.
    dv_dir, dv_gen = index.index_dir, int(index.n_docs)

    def _dv_allowed(shard: int):
        if dv_filter is None:
            return None
        from .docvalues import eval_filter
        return eval_filter(dv_dir, shard, dv_gen, dv_filter)

    def _boost_vec(shard: int):
        if bst is None:
            return None
        if bst[0] == "decay":
            from .docvalues import decay_multiplier
            _, fld, kind, origin_s, scale_s, d, off_s, combine, w = bst
            m = decay_multiplier(dv_dir, shard, dv_gen, width,
                                 fld, kind, origin_s, scale_s, d, off_s)
            if w != 1.0:
                m = m * w
            return (m, combine)
        from .docvalues import recency_multiplier
        return (recency_multiplier(dv_dir, shard, dv_gen, width,
                                   bst[1], bst[2], bst[3]), "multiply")

    def _grp_closure(shard: int):
        if collapse is None:
            return None

        def g(loc):
            from .docvalues import group_values
            return group_values(dv_dir, shard, dv_gen, collapse, loc)

        return g

    out_schema = ("group_key string, doc_id long, score double"
                  if collapse is not None else "doc_id long, score double")
    out_cols = (["group_key", "doc_id", "score"] if collapse is not None
                else ["doc_id", "score"])

    def _finish(scored: DataFrame) -> DataFrame:
        """Global tail: plain top-k, or — when collapsing — one winner
        per group (row_number over the frozen order; per-shard emissions
        are <= k rows each, so the window input is tiny) then top-k
        groups."""
        if collapse is None:
            return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from pyspark.sql import Window
        w = (Window.partitionBy("group_key")
             .orderBy(F.desc("score"), F.asc("doc_id")))
        if collapse_n > 1:
            # top_hits: global top-collapse_n per group (window over the
            # bounded per-(group, shard) partials), then top-k groups by
            # their rank-1 representative; group order then hit order
            ranked = (scored.withColumn("rn", F.row_number().over(w))
                      .filter(F.col("rn") <= collapse_n))
            reps = (ranked.filter(F.col("rn") == 1)
                    .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
                    .select("group_key", F.col("score").alias("_gs"),
                            F.col("doc_id").alias("_gd")))
            return (ranked.join(F.broadcast(reps), "group_key")
                    .orderBy(F.desc("_gs"), F.asc("_gd"), F.asc("rn"))
                    .select("group_key", "doc_id", "score"))
        return (scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1).drop("rn")
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))

    # tombstones (engine/deletes.py): None when the index has none
    del_locs = _del_closure(index)

    if doc_filter is not None or allowed_ids is not None:
        if doc_filter is not None:
            allowed = _allowed_shards(index, doc_filter, width)
        else:
            # explicit candidate ids (the rescore path, engine/rescore.py):
            # the allowed side is a metadata-sized literal local relation —
            # same cogrouped-mask plan as doc_filter, ZERO corpus scan
            allowed = index.spark.createDataFrame(
                [(int(d), int(d) // width) for d in allowed_ids],
                "doc_id long, shard int")
        wand_on = bool(use_wand) and mode == "OR"
        if wand_on:
            from .wand import score_shard_wand

        def fn2(key, post_pdf, allowed_pdf):
            import numpy as np
            import pandas as pd
            empty_r = pd.DataFrame({c: [] for c in out_cols})
            if len(post_pdf) == 0 or len(allowed_pdf) == 0:
                return empty_r  # no postings / no doc passes the filter
            shard = int(post_pdf["shard"].iloc[0])
            loc = (allowed_pdf["doc_id"].to_numpy(np.int64)
                   - shard * width)
            dvl = _dv_allowed(shard)
            if dvl is not None:  # doc_filter AND dv_filter: intersect
                loc = np.intersect1d(loc, dvl)
            if del_locs is not None:
                dl_ = del_locs(shard)
                if dl_ is not None:  # tombstoned docs leave the allowed set
                    loc = np.setdiff1d(loc, dl_)
            if wand_on:
                r = score_shard_wand(post_pdf, qtfs, idfs, cfgd, k, width,
                                     allowed_loc=loc)
            else:
                r = _score_shard_exhaustive(post_pdf, qtfs, idfs, cfgd, k,
                                            mode, width, n_required,
                                            neg_set, allowed_loc=loc,
                                            cursor=cursor,
                                            boost_vec=_boost_vec(shard),
                                            min_match=mm or 1,
                                            collapse_vals=_grp_closure(
                                                shard),
                                            collapse_n=collapse_n,
                                            must_terms=mst,
                                            min_should=min_should,
                                            demote_terms=dem_set,
                                            demote_factor=dem_factor)
            return r if r is not None else empty_r

        scored = (post.groupBy("shard")
                  .cogroup(allowed.groupBy("shard"))
                  .applyInPandas(fn2, out_schema))
        return _finish(scored)

    if use_wand and mode == "OR":
        from .wand import score_shard_wand as scorer_fn

        def fn(key, post_pdf):
            import numpy as np
            import pandas as pd
            if len(post_pdf) == 0:
                return pd.DataFrame({"doc_id": [], "score": []})
            shard = int(post_pdf["shard"].iloc[0])
            dvl = _dv_allowed(shard)
            dl_ = del_locs(shard) if del_locs is not None else None
            if dl_ is None:
                r = scorer_fn(post_pdf, qtfs, idfs, cfgd, k, width,
                              allowed_loc=dvl)
            else:
                # fold tombstones into an allow mask (masked WAND is
                # rank-safe; block bounds over supersets stay valid)
                if dvl is None:
                    allow = np.ones(width, dtype=bool)
                else:
                    allow = np.zeros(width, dtype=bool)
                    allow[dvl] = True
                allow[dl_] = False
                r = scorer_fn(post_pdf, qtfs, idfs, cfgd, k, width,
                              allow_mask=allow)
            return r if r is not None else pd.DataFrame(
                {"doc_id": [], "score": []})
    else:
        def fn(key, post_pdf):
            import pandas as pd
            if len(post_pdf) == 0:
                return pd.DataFrame({c: [] for c in out_cols})
            shard = int(post_pdf["shard"].iloc[0])
            r = _score_shard_exhaustive(
                post_pdf, qtfs, idfs, cfgd, k, mode,
                width, n_required, neg_set,
                allowed_loc=_dv_allowed(shard),
                cursor=cursor, boost_vec=_boost_vec(shard),
                denied_loc=(del_locs(shard) if del_locs is not None
                            else None),
                min_match=mm or 1,
                collapse_vals=_grp_closure(shard),
                collapse_n=collapse_n,
                must_terms=mst, min_should=min_should,
                demote_terms=dem_set, demote_factor=dem_factor)
            return r if r is not None else pd.DataFrame(
                {c: [] for c in out_cols})

    scored = (post.groupBy("shard")
              .applyInPandas(fn, out_schema))
    return _finish(scored)


# WAND routing cost gate (shared by the single-query and batch paths).
# Rank-identity is unconditional — WAND and the exhaustive scorer produce
# bit-identical scores (tested) — so routing is purely a cost decision:
# WAND pays only when ONE SCORER TASK faces a large posting mass AND the
# query's rarest list is selective enough to seed a pruning threshold.
# Otherwise it degenerates to the exhaustive pass plus a full
# seed-scoring and a candidate re-decode (measured at 650 k docs /
# <= 45 k-posting shards: forced WAND lost 2-3x on every multi-term
# head-word query, and per-query WAND inside the batch loop was 1.9x
# slower than r1 — VERDICT r2 'What's wrong #1/#2'). In the batch
# scorer the bar is effectively higher still: decode there is shared
# across the set, so the exhaustive marginal cost is a scatter-add of
# cached vectors. Thresholds are per-SHARD (the scorer's actual unit);
# at the 2^21-docs-per-shard cluster geometry a hot term alone clears
# the bar, which is exactly the regime block-max pruning was built for.
WAND_MIN_SHARD_POSTINGS = 1 << 18  # min posting mass per scorer task
WAND_SEED_FRAC = 8                 # rarest list must be < mass / this


def wand_routes(index, query: str) -> bool:
    """Replicates search()'s auto cost gate for a query WITHOUT running
    it (bench/diagnostics: proves a measured row actually took the WAND
    path rather than silently degrading to exhaustive)."""
    qtf = query_terms(query, index.cfg.analyzer)
    lex = index.lookup_terms(sorted(qtf))
    known = [t for t in qtf if t in lex]
    if len(known) < 2:
        return False
    mass = sum(int(lex[t]["df"]) for t in known)
    seed_df = min(int(lex[t]["df"]) for t in known)
    n_shards = max(1, -(-index.n_docs // index.shard_width))
    return (mass // n_shards >= WAND_MIN_SHARD_POSTINGS
            and seed_df * WAND_SEED_FRAC < mass)


def _score_shard_batch(post_pdf, per_q: dict, modes: dict, idfs: dict,
                       cfg: dict, k: int, width: int, use_wand: bool,
                       allowed_loc=None, negs: dict | None = None,
                       phrases: dict | None = None, denied_loc=None,
                       msm: dict | None = None, slops: dict | None = None,
                       musts: dict | None = None,
                       minsh: dict | None = None,
                       demotes: dict | None = None,
                       dismaxes: dict | None = None,
                       multis: dict | None = None,
                       dv_preds: dict | None = None,
                       dv_ctx: tuple | None = None,
                       boosts: dict | None = None,
                       ks: dict | None = None):
    """Score EVERY query of the batch against one doc-range shard with a
    shared decode cache (E9's scale design).

    Each (term, shard) payload is VByte-decoded exactly ONCE per shard
    task, and the per-term BM25 contribution vector is computed once per
    distinct (term, qtf) — queries then reduce to scatter-adds of cached
    float64 vectors. Float-op order is IDENTICAL to
    ``_score_shard_exhaustive`` (same expression per term, ascending-term
    accumulation), so batch scores are bit-identical to the single-query
    path and the pure-Python oracle. Dense accumulators are allocated once
    per shard and reset only at touched positions between queries
    (postings << width), so per-query cost is O(query's posting mass),
    not O(width).
    """
    import numpy as np
    import pandas as pd
    from . import codec as C
    if len(post_pdf) == 0:
        return None
    shard = int(post_pdf["shard"].iloc[0])
    start = shard * width
    k1, b, avgdl = cfg["k1"], cfg["b"], cfg["avgdl"]

    # ---- decode each (term, shard) row once ----
    decoded: dict = {}   # term -> (loc:int64[], tf:float64[], dl:float64[])
    rowidx: dict = {}    # term -> pdf row (lazy positions decode, phrase)
    for i in range(len(post_pdf)):
        term = post_pdf["term"].iloc[i]
        rowidx[term] = i
        ids, tfs = C.decode_postings(post_pdf["doc_ids"].iloc[i],
                                     post_pdf["tfs"].iloc[i])
        dls = C.vbyte_decode(post_pdf["dls"].iloc[i]).astype(np.float64)
        decoded[term] = (ids - start, tfs.astype(np.float64), dls)
    occ: dict = {}       # term -> (occ_loc, pos): shared across phrase qids

    def _occ(term: str):
        o = occ.get(term)
        if o is None:
            o = occ[term] = _decode_occurrences(post_pdf, rowidx[term], start)
        return o

    contrib: dict = {}   # (term, qtf) -> float64[] (same order as exhaustive)

    def _contrib(term: str, qtf: float, avg: float | None = None):
        # ``avg`` overrides the index-global avgdl for MULTI_MATCH
        # entries (per-field length normalization); the cache key
        # carries it so field/text spaces never share a vector
        a = avgdl if avg is None else avg
        key = (term, qtf, a)
        c = contrib.get(key)
        if c is None:
            loc, tfs, dls = decoded[term]
            idf = idfs[term]
            c = contrib[key] = (qtf * idf * (tfs * (k1 + 1.0))
                                / (tfs + k1 * (1.0 - b + b * dls / a)))
        return c

    allow = None
    if allowed_loc is not None:
        # one shared doc_filter mask for the whole batch (built once per
        # shard task; every query of the set is restricted by it)
        allow = np.zeros(width, dtype=bool)
        allow[allowed_loc] = True
    if denied_loc is not None and len(denied_loc):
        # tombstones (engine/deletes.py) fold into the same shared mask:
        # one O(width) build per shard task covers the whole set,
        # including its WAND-routed and PHRASE entries
        if allow is None:
            allow = np.ones(width, dtype=bool)
        allow[denied_loc] = False
    dv_masks: dict = {}
    boost_vecs: dict = {}

    def _boost_v(bst):
        """Per-entry score-boost vector — each DISTINCT normalized
        boost spec is computed ONCE per shard task from the cached
        docvalue slice and shared by every entry carrying it (the same
        multi-tenant pattern as _dv_mask). Returns (vec, combine)."""
        v = boost_vecs.get(bst)
        if v is None:
            if bst[0] == "decay":
                from .docvalues import decay_multiplier
                _, fld, kind, o_, sc_, d_, off_, comb, w_ = bst
                m = decay_multiplier(dv_ctx[0], shard, dv_ctx[1], width,
                                     fld, kind, o_, sc_, d_, off_)
                if w_ != 1.0:
                    m = m * w_
            else:
                from .docvalues import recency_multiplier
                comb = "multiply"
                m = recency_multiplier(dv_ctx[0], shard, dv_ctx[1],
                                       width, bst[1], bst[2], bst[3])
            v = boost_vecs[bst] = (m, comb)
        return v

    def _dv_mask(pred: str):
        """Per-entry dv_filter mask — each DISTINCT predicate is
        evaluated ONCE per shard task over the cached docvalue slice
        and shared by every entry that carries it (the multi-tenant
        batch pattern: N tenants' filters cost N evaluations, not
        N x |entries|)."""
        m = dv_masks.get(pred)
        if m is None:
            from .docvalues import eval_filter
            m = np.zeros(width, dtype=bool)
            m[eval_filter(dv_ctx[0], shard, dv_ctx[1], pred)] = True
            dv_masks[pred] = m
        return m

    acc = np.zeros(width, dtype=np.float64)
    cnt = np.zeros(width, dtype=np.int32)
    # BOOL entries (search_bool semantics) need a second distinct-term
    # counter for the must clause; allocated once per shard task and
    # reset at touched positions like acc/cnt
    cntm = np.zeros(width, dtype=np.int32) if musts else None
    outs = []
    if use_wand:  # "auto" or True
        from .wand import score_shard_wand
    for qid, qt in per_q.items():
        q_k = ks.get(qid, k) if ks else k
        terms_here = [t for t in sorted(qt) if t in decoded]
        if not terms_here:
            continue
        mode = modes[qid]
        q_must = musts.get(qid) if musts else None
        if q_must is not None and any(t not in decoded for t in q_must):
            continue  # a must term has no postings in this shard
        q_negs = [t for t in (negs.get(qid, ()) if negs else ())
                  if t in decoded]
        if mode == "PHRASE":
            seq = phrases[qid]
            if any(t not in rowidx for t in seq):
                continue  # a phrase term absent in this shard
            dec = {t: _occ(t) for t in dict.fromkeys(seq)}
            neg_loc = (np.unique(np.concatenate(
                [decoded[t][0] for t in q_negs])) if q_negs else None)
            p_allow = allow
            p_dvp = dv_preds.get(qid) if dv_preds else None
            if p_dvp is not None:
                # per-entry dv_filter on a PHRASE entry: intersect the
                # shared batch mask with this entry's own mask
                p_allow = (_dv_mask(p_dvp) if allow is None
                           else (allow & _dv_mask(p_dvp)))
            hit = _phrase_hits(seq, dec, q_k, width,
                               allow_mask=p_allow, neg_loc=neg_loc,
                               slop=(slops.get(qid, 0) if slops else 0))
            if hit is not None:
                udocs, counts = hit
                # score = n_phrase as double (exact for any real count) —
                # one (qid, doc_id, score) contract for the whole batch
                r = pd.DataFrame(
                    {"doc_id": (udocs + start).astype(np.int64),
                     "score": counts.astype(np.float64)})
                r.insert(0, "qid", qid)
                outs.append(r)
            continue
        q_mm = msm.get(qid, 1) if msm else 1
        q_dem = demotes.get(qid) if demotes else None
        q_dm = dismaxes.get(qid) if dismaxes else None
        q_mul = multis.get(qid) if multis else None
        q_dvp = dv_preds.get(qid) if dv_preds else None
        q_bst = boosts.get(qid) if boosts else None
        if q_mul is not None:
            # MULTI_MATCH entry (same frozen combine as
            # search_multi_match: per-field boost * frozen sum with the
            # FIELD's avgdl in the length norm, total folded in fields
            # order, best_fields = best + tie * (total - best),
            # most_fields = total); per-(term, qtf, avgdl) contribution
            # vectors come from the shared cache
            slots_, tie_, mt_ = q_mul
            per_sub, all_t = [], []
            for avg_f, bf_, tmap in slots_:
                terms_i = [t for t in sorted(tmap) if t in decoded]
                if not terms_i:
                    per_sub.append(None)
                    continue
                locs_i = []
                for t in terms_i:
                    loc = decoded[t][0]
                    acc[loc] += _contrib(t, float(tmap[t]), avg_f)
                    locs_i.append(loc)
                t_i = np.unique(np.concatenate(locs_i))
                per_sub.append((t_i, bf_ * acc[t_i]))
                acc[t_i] = 0.0
                all_t.append(t_i)
            if not all_t:
                continue
            union = np.unique(np.concatenate(all_t))
            total = np.zeros(union.size, dtype=np.float64)
            best = np.zeros(union.size, dtype=np.float64)
            for ps in per_sub:
                v = np.zeros(union.size, dtype=np.float64)
                if ps is not None:
                    t_i, vals = ps
                    v[np.searchsorted(union, t_i)] = vals
                total = total + v
                np.maximum(best, v, out=best)
            sc = total if mt_ == "most_fields" \
                else best + tie_ * (total - best)
            hit = union
            keep = np.ones(hit.size, dtype=bool)
            if allow is not None:
                keep &= allow[hit]
            if q_dvp is not None:
                keep &= _dv_mask(q_dvp)[hit]
            if q_negs:
                ex = np.unique(np.concatenate(
                    [decoded[t][0] for t in q_negs]))
                keep &= ~np.isin(hit, ex, assume_unique=True)
            hit, sc = hit[keep], sc[keep]
            if q_bst is not None and hit.size:
                bv, bcomb = _boost_v(q_bst)
                sc = sc + bv[hit] if bcomb == "sum" else sc * bv[hit]
            if hit.size:
                hit_k, scores = C.topk_tiebreak(hit, sc, q_k)
                r = pd.DataFrame(
                    {"doc_id": (hit_k + start).astype(np.int64),
                     "score": scores})
                r.insert(0, "qid", qid)
                outs.append(r)
            continue
        if q_dm is not None:
            # DIS_MAX entry (same frozen combine as search_dis_max:
            # total folded in subquery LIST order over 0.0-defaulted
            # vectors, score = best + tie * (total - best)); subquery
            # sums reuse the shared per-(term, qtf) contribution cache
            subs_, tie_ = q_dm
            per_sub, all_t = [], []
            for sq in subs_:
                terms_i = [t for t in sorted(sq) if t in decoded]
                if not terms_i:
                    per_sub.append(None)
                    continue
                locs_i = []
                for t in terms_i:
                    loc = decoded[t][0]
                    acc[loc] += _contrib(t, float(sq[t]))
                    locs_i.append(loc)
                t_i = np.unique(np.concatenate(locs_i))
                per_sub.append((t_i, acc[t_i].copy()))
                acc[t_i] = 0.0
                all_t.append(t_i)
            if not all_t:
                continue
            union = np.unique(np.concatenate(all_t))
            total = np.zeros(union.size, dtype=np.float64)
            best = np.zeros(union.size, dtype=np.float64)
            for ps in per_sub:
                v = np.zeros(union.size, dtype=np.float64)
                if ps is not None:
                    t_i, vals = ps
                    v[np.searchsorted(union, t_i)] = vals
                total = total + v
                np.maximum(best, v, out=best)
            sc = best + tie_ * (total - best)
            hit = union
            keep = np.ones(hit.size, dtype=bool)
            if allow is not None:
                keep &= allow[hit]
            if q_dvp is not None:
                keep &= _dv_mask(q_dvp)[hit]
            if q_negs:
                ex = np.unique(np.concatenate(
                    [decoded[t][0] for t in q_negs]))
                keep &= ~np.isin(hit, ex, assume_unique=True)
            hit, sc = hit[keep], sc[keep]
            if q_bst is not None and hit.size:
                # per-entry decay/recency boost on a DIS_MAX entry —
                # same frozen operation order as the plain-entry path
                # below (boost AFTER the dis_max combine, before top-k);
                # ADVICE r4: this branch used to drop the boost silently
                bv, bcomb = _boost_v(q_bst)
                sc = sc + bv[hit] if bcomb == "sum" else sc * bv[hit]
            if hit.size:
                hit_k, scores = C.topk_tiebreak(hit, sc, q_k)
                r = pd.DataFrame(
                    {"doc_id": (hit_k + start).astype(np.int64),
                     "score": scores})
                r.insert(0, "qid", qid)
                outs.append(r)
            continue
        if (use_wand and mode == "OR" and len(terms_here) > 1
                and not q_negs and q_mm <= 1 and q_must is None
                and q_dem is None and q_dvp is None and q_bst is None):
            mass = sum(decoded[t][0].size for t in terms_here)
            seed = min(decoded[t][0].size for t in terms_here)
            if use_wand is True or (mass >= WAND_MIN_SHARD_POSTINGS
                                    and seed * WAND_SEED_FRAC < mass):
                sub = post_pdf[post_pdf["term"].isin(terms_here)]
                r = score_shard_wand(sub, {t: float(n) for t, n in qt.items()},
                                     idfs, cfg, q_k, width,
                                     allow_mask=allow)
                if r is not None:
                    r.insert(0, "qid", qid)
                    outs.append(r)
                continue
        locs = []
        for t in terms_here:     # ascending term order == oracle fp order
            loc = decoded[t][0]
            acc[loc] += _contrib(t, float(qt[t]))
            cnt[loc] += 1
            if q_must is not None and t in q_must:
                cntm[loc] += 1
            locs.append(loc)
        touched = np.unique(np.concatenate(locs))
        if q_must is not None:
            # bool entry: every must term present AND >= min_should of
            # the remaining (should) terms — same frozen rule as the
            # single-query kernel (_score_shard_exhaustive)
            cm = cntm[touched]
            hit = touched[(cm == len(q_must))
                          & ((cnt[touched] - cm)
                             >= (minsh.get(qid, 0) if minsh else 0))]
        elif mode == "AND":
            hit = touched[cnt[touched] == len(qt)]
        elif q_mm > 1:
            # minimum_should_match entry: same distinct-term floor as
            # the single-query scorer (WAND is skipped for these — the
            # floor invalidates theta pruning)
            hit = touched[cnt[touched] >= q_mm]
        else:
            hit = touched        # every touched doc has cnt > 0
        if allow is not None:
            hit = hit[allow[hit]]
        if q_dvp is not None and hit.size:
            # per-entry dv_filter (frozen candidate-restriction
            # semantics: stats global, masks intersect)
            hit = hit[_dv_mask(q_dvp)[hit]]
        if q_negs and hit.size:
            # NOT semantics (same contract as the single-query scorer):
            # drop docs containing ANY excluded term, before top-k
            ex = np.unique(np.concatenate([decoded[t][0] for t in q_negs]))
            hit = hit[~np.isin(hit, ex, assume_unique=True)]
        if q_bst is not None and hit.size:
            # per-entry decay/recency boost — identical frozen combine
            # and operation order as the single-query kernel (boost,
            # THEN demote); boosted positions are a subset of touched,
            # so the shared accumulator reset below covers them
            bv, bcomb = _boost_v(q_bst)
            if bcomb == "sum":
                acc[hit] += bv[hit]
            else:
                acc[hit] *= bv[hit]
        if q_dem and hit.size:
            # boosting-query demotion (same frozen contract as
            # search_boosting: multiply AFTER the frozen summation;
            # demoted positions are a subset of touched, so the shared
            # accumulator reset below covers them)
            dts = [t for t in q_dem[0] if t in decoded]
            if dts:
                dm = np.unique(np.concatenate(
                    [decoded[t][0] for t in dts]))
                m_ = np.isin(hit, dm, assume_unique=True)
                acc[hit[m_]] *= q_dem[1]
        if hit.size:
            hit_k, scores = C.topk_tiebreak(hit, acc[hit], q_k)
            r = pd.DataFrame({"doc_id": (hit_k + start).astype(np.int64),
                              "score": scores})
            r.insert(0, "qid", qid)
            outs.append(r)
        acc[touched] = 0.0       # reset ONLY touched positions
        cnt[touched] = 0
        if q_must is not None:
            cntm[touched] = 0
    return pd.concat(outs) if outs else None


def search_batch(index, queries: list[dict], k: int = 10,
                 use_wand: "bool | str" = "auto",
                 doc_filter: str | None = None,
                 dv_filter: str | None = None) -> DataFrame:
    """E9 batch search (see _search_batch_impl for the full plan notes).
    Plans are memoized per (query set, k, flags) — _plan_cached."""
    import json as _json
    _warn_if_stale(index)
    key = ("b", _json.dumps(queries, sort_keys=True), k,
           repr(use_wand), doc_filter, dv_filter)
    return _plan_cached(index, key, lambda: _search_batch_impl(
        index, queries, k, use_wand, doc_filter, dv_filter))


def _search_batch_impl(index, queries: list[dict], k: int = 10,
                       use_wand: "bool | str" = "auto",
                       doc_filter: str | None = None,
                       dv_filter: str | None = None) -> DataFrame:
    """E9: execute a whole query set in ONE Spark job.

    ``queries``: [{"id", "query", "mode"}]. One pruned postings scan
    covering the union of all query terms; the per-shard batch scorer
    decodes each payload ONCE and reuses it across the whole set
    (``_score_shard_batch``), routing individual OR queries through
    Block-Max WAND only when the per-shard cost gate says pruning beats
    the shared scatter-add (``use_wand=True`` forces WAND for every
    multi-term OR query — test hook; ``False`` forces exhaustive);
    global per-query top-k via window rank (single shuffle).
    Returns (qid, doc_id, score).

    ``doc_filter``: one SQL predicate applied to EVERY query of the set
    (same frozen semantics as ``search``: global stats, candidate
    restriction) — the filtered-eval workload. One pushed-down corpus
    scan feeds a single shared per-shard mask; per-query WAND routing
    still applies (masked WAND is rank-safe — engine/wand.py).

    A query dict may carry an optional ``"exclude"`` string (NOT terms,
    same contract as ``search(exclude=...)``): docs containing ANY
    excluded term are dropped before top-k; excluded-term postings ride
    the same single pruned scan. NOT queries route exhaustive.

    ``{"mode": "PHRASE"}`` entries are full citizens of the set (VERDICT
    r3 'missing #2'): a positions-enabled index lets phrase and BM25
    queries share the ONE pruned scan + shard task (the poss column
    rides the same schema; each phrase term's occurrences are decoded
    once per shard and shared across phrase queries). A phrase entry's
    score column is its n_phrase count as a double (exact — integer
    counts below 2^53), ranked (score desc, doc_id asc) like the rest
    of the set; ``exclude`` composes with phrase entries too.

    ``{"mode": "PREFIX"}`` entries (wildcard ``prefix*``; optional
    ``"max_expansions"``, default 64) expand driver-side via the
    memoized lexicon range scan and score as OR queries with qtf=1 per
    matched term — same frozen semantics as ``search_prefix``.

    ``{"mode": "FUZZY"}`` entries (edit-distance ``term~d``; optional
    ``"max_edits"`` default 1, ``"max_expansions"`` default 50) expand
    driver-side via the memoized deletion-neighborhood lookup and ride
    the shared scan the same way — same frozen semantics as
    ``search_fuzzy`` (requires IndexConfig(fuzzy_edits>=max_edits)).

    ``{"mode": "REGEXP"}`` entries (anchored pattern; optional
    ``"max_expansions"`` default 64) expand driver-side via the
    memoized literal-prefix-pushed lexicon scan — same frozen
    semantics as ``search_regexp``.

    An entry may carry ``"boosts"`` ({term: weight} — the frozen term^w
    rule of ``search(term_boosts=)``); weights multiply that entry's
    qtf only, so boosted and unboosted queries share the scan and the
    decode cache unchanged.
    """
    import pandas as pd
    from pyspark.sql import Window
    spark = index.spark
    acfg = index.cfg.analyzer
    # {"mode": "PREFIX"} entries expand driver-side (memoized lexicon
    # range scan, same frozen cap rule as search_prefix) and then ride
    # the shared scan/scorer as ordinary OR queries with qtf=1 per
    # matched term — the expansion never touches the postings job
    per_q, modes = {}, {}
    musts, minsh, bool_floor, dismaxes, multis = {}, {}, {}, {}, {}
    for q in queries:
        m = q["mode"].upper()
        if m == "PREFIX":
            rows = index.expand_prefix(normalize_prefix(q["query"]),
                                       int(q.get("max_expansions", 64)))
            per_q[q["id"]] = {r["term"]: 1 for r in rows}
            m = "OR"
        elif m == "FUZZY":
            # same driver-side-expansion pattern as PREFIX: the frozen
            # (distance, df desc, term) cap resolves via the memoized
            # deletion-neighborhood lookup (engine/fuzzy.py), then the
            # entry rides the shared scan as an OR query with qtf=1
            from .fuzzy import expand_fuzzy
            rows = expand_fuzzy(index, normalize_prefix(q["query"]),
                                int(q.get("max_edits", 1)),
                                int(q.get("max_expansions", 50)))
            per_q[q["id"]] = {r["term"]: 1 for r in rows}
            m = "OR"
        elif m == "REGEXP":
            rows = index.expand_regexp(q["query"],
                                       int(q.get("max_expansions", 64)))
            per_q[q["id"]] = {r["term"]: 1 for r in rows}
            m = "OR"
        elif m == "DIS_MAX":
            # dis_max entry (same frozen combine as search_dis_max):
            # keys "queries" (list of OR subqueries) + optional
            # "tie_breaker" in [0, 1]; the entry's scan terms are the
            # union, the kernel reuses the shared contribution cache
            subs_q = [query_terms(x, acfg) for x in q["queries"]]
            tie_q = float(q.get("tie_breaker", 0.0))
            if not (0.0 <= tie_q <= 1.0):
                raise ValueError(f"tie_breaker on {q['id']!r} must lie "
                                 "in [0, 1]")
            if q.get("boosts") or q.get("min_match") or q.get("demote"):
                raise ValueError(f"DIS_MAX entry {q['id']!r} composes "
                                 "with exclude only")
            union_q = sorted(set().union(*[set(x) for x in subs_q])
                             if subs_q else set())
            per_q[q["id"]] = {t: 1 for t in union_q}
            dismaxes[q["id"]] = (subs_q, tie_q)
            m = "OR"
        elif m == "MULTI_MATCH":
            # multi-field entry (same frozen semantics as
            # search_multi_match): keys "query" + optional "fields"
            # ({field: boost} — dict order = fold order; default text +
            # every extra field at 1.0), "match_type", "tie_breaker".
            # The entry's scan terms are the union of the per-field
            # prefixed keys; routing is exhaustive (the dis_max rule)
            flds = q.get("fields")
            if flds is None:
                flds = {"text": 1.0}
                for f_ in (index.extra_fields or ()):
                    flds[f_] = 1.0
            elif not isinstance(flds, dict):
                flds = {str(f_): 1.0 for f_ in flds}
            else:
                flds = {str(f_): float(b_) for f_, b_ in flds.items()}
            known_f = {"text", *(index.extra_fields or ())}
            bad_f = [f_ for f_ in flds if f_ not in known_f]
            if bad_f:
                raise ValueError(
                    f"MULTI_MATCH entry {q['id']!r}: fields {bad_f} "
                    f"not indexed (available: {sorted(known_f)})")
            if not flds or any(b_ <= 0 for b_ in flds.values()):
                raise ValueError(f"MULTI_MATCH entry {q['id']!r}: "
                                 "field boosts must be > 0")
            mt_q = str(q.get("match_type", "best_fields"))
            if mt_q not in ("best_fields", "most_fields"):
                raise ValueError(f"MULTI_MATCH entry {q['id']!r}: "
                                 "match_type must be "
                                 "best_fields|most_fields "
                                 "(cross_fields is single-query only)")
            tie_q = float(q.get("tie_breaker", 0.0))
            if not (0.0 <= tie_q <= 1.0):
                raise ValueError(f"tie_breaker on {q['id']!r} must lie "
                                 "in [0, 1]")
            if mt_q == "most_fields" and tie_q != 0.0:
                raise ValueError(f"tie_breaker on {q['id']!r} only "
                                 "applies to best_fields")
            if q.get("boosts") or q.get("min_match") or q.get("demote"):
                raise ValueError(f"MULTI_MATCH entry {q['id']!r} "
                                 "composes with exclude/dv_filter/"
                                 "boost/k only")
            qt_mm = query_terms(q["query"], acfg)
            mm_favg = {"text": float(index.avgdl)}
            for f_ in (index.extra_fields or ()):
                mm_favg[f_] = float(
                    (index.field_avgdl or {}).get(f_, 0.0))
            slots_q, union_keys = [], set()
            for f_, b_ in flds.items():
                avg_f = mm_favg[f_]
                if avg_f <= 0.0 or not qt_mm:
                    slots_q.append((1.0, float(b_), {}))
                    continue
                mkeys = {(t if f_ == "text" else f"{f_}:{t}"): float(nn)
                         for t, nn in qt_mm.items()}
                slots_q.append((avg_f, float(b_), mkeys))
                union_keys |= set(mkeys)
            per_q[q["id"]] = {t: 1 for t in sorted(union_keys)}
            multis[q["id"]] = (slots_q, tie_q, mt_q)
            m = "OR"
        elif m == "BOOL":
            # ES bool entry (same frozen semantics as search_bool): keys
            # "must"/"should" + optional "min_should_match" (default 0
            # when must clauses exist, else 1 — the ES rule). qtf merges
            # by occurrence count across both clause texts; a term in
            # both clauses counts as must for the arity test. Bool
            # entries route exhaustive (the min_match argument).
            from collections import Counter
            mq = Counter(tokenize_py(q.get("must", ""), acfg))
            sq = Counter(tokenize_py(q.get("should", ""), acfg))
            per_q[q["id"]] = dict(mq + sq)
            if mq:
                musts[q["id"]] = frozenset(mq)
                minsh[q["id"]] = int(q.get("min_should_match", 0))
                if minsh[q["id"]] > len(set(sq) - set(mq)):
                    per_q[q["id"]] = {}  # unreachable floor: empty entry
            else:
                m_ = int(q.get("min_should_match", 1))
                if m_ > 1:
                    bool_floor[q["id"]] = m_  # pure-should: plain OR floor
            m = "OR"
        else:
            per_q[q["id"]] = query_terms(q["query"], acfg)
        modes[q["id"]] = m
        # optional per-entry "boosts" ({term: weight} — same frozen
        # term^w rule as search(term_boosts=)); weights multiply the
        # entry's qtf (for PREFIX/FUZZY/REGEXP: the expansion terms)
        b = q.get("boosts")
        if b:
            if q["mode"].upper() == "PHRASE":
                raise ValueError(f"boosts on {q['id']!r}: PHRASE entries "
                                 "rank by n_phrase, not BM25")
            if per_q[q["id"]]:
                per_q[q["id"]] = _apply_term_boosts(per_q[q["id"]], b)
    # optional per-entry "k" (the ES _msearch per-entry size): each
    # entry's result is cut at its own k, defaulting to the call-level k
    ks_by_qid = {q["id"]: int(q["k"]) for q in queries if "k" in q}
    for qid_, k_ in ks_by_qid.items():
        if k_ < 1:
            raise ValueError(f"k on {qid_!r} must be >= 1")
    # optional per-entry "boost" (decay/recency score multiplier —
    # search(boost=)'s frozen contract, normalized driver-side; entries
    # carrying one route exhaustive, like the single-query path)
    boosts_by_qid = {}
    for q in queries:
        if q.get("boost"):
            if q["mode"].upper() == "PHRASE":
                raise ValueError(f"boost on {q['id']!r}: PHRASE entries "
                                 "rank by n_phrase, not BM25")
            boosts_by_qid[q["id"]] = _norm_boost(index, q["boost"])
    phrases = {q["id"]: tokenize_py(q["query"], acfg) for q in queries
               if q["mode"].upper() == "PHRASE"}
    # optional per-entry "slop" (sloppy phrase — same frozen in-order
    # span rule as search_phrase(slop=)); only meaningful on PHRASE rows
    slops = {q["id"]: int(q.get("slop", 0)) for q in queries
             if q["mode"].upper() == "PHRASE" and int(q.get("slop", 0)) > 0}
    if phrases and not index.cfg.index_positions:
        raise ValueError("query set contains PHRASE entries but the index "
                         "was built without positions "
                         "(IndexConfig.index_positions=True required)")
    negs = {q["id"]: sorted(set(tokenize_py(q.get("exclude"), acfg))
                            - set(per_q.get(q["id"], ())))
            for q in queries if q.get("exclude")}
    # optional per-entry "dv_filter" (ANSI-SQL predicate over the
    # stored docvalue columns — search(dv_filter=)'s frozen candidate
    # restriction, per entry): each DISTINCT predicate is evaluated
    # once per shard task and shared across the entries carrying it;
    # composes with the batch-global dv_filter/doc_filter by mask
    # intersection; entries with one route exhaustive (like NOT)
    dv_preds = {}
    for q in queries:
        if q.get("dv_filter"):
            _require_dv(index, q["dv_filter"])
            dv_preds[q["id"]] = str(q["dv_filter"])
    # optional per-entry "demote" (+ "demote_factor", default 0.5) —
    # the ES boosting-query rule of search_boosting: matching docs keep
    # their score times the factor; demote terms may overlap the
    # entry's own positive terms (no positive-wins rule — demotion is
    # not contradictory); PHRASE entries rank by n_phrase -> rejected
    demotes = {}
    for q in queries:
        if not q.get("demote"):
            continue
        if q["mode"].upper() == "PHRASE":
            raise ValueError(f"demote on {q['id']!r}: PHRASE entries "
                             "rank by n_phrase, not BM25")
        f_ = float(q.get("demote_factor", 0.5))
        if f_ < 0.0:
            raise ValueError(f"demote_factor on {q['id']!r} must be >= 0")
        demotes[q["id"]] = (sorted(set(tokenize_py(q["demote"], acfg))),
                            f_)
    # optional per-entry "min_match" (minimum_should_match, OR-family
    # entries only — PREFIX/FUZZY/REGEXP expansions are OR queries too,
    # where the floor counts matched EXPANSION terms, the ES rule)
    msm = {}
    for q in queries:
        m_ = int(q.get("min_match", 1))
        if m_ > 1:
            if modes[q["id"]] != "OR":
                raise ValueError(
                    f"min_match on {q['id']!r}: OR-family entries only")
            msm[q["id"]] = m_
    msm.update(bool_floor)  # pure-should BOOL entries are OR + floor
    per_q = {qid: qt for qid, qt in per_q.items() if qt}
    negs = {qid: ts for qid, ts in negs.items() if qid in per_q and ts}
    demotes = {qid: v for qid, v in demotes.items()
               if qid in per_q and v[0]}
    dismaxes = {qid: v for qid, v in dismaxes.items() if qid in per_q}
    multis = {qid: v for qid, v in multis.items() if qid in per_q}
    dv_preds = {qid: v for qid, v in dv_preds.items() if qid in per_q}
    msm = {qid: m_ for qid, m_ in msm.items() if qid in per_q}
    phrases = {qid: seq for qid, seq in phrases.items() if qid in per_q}
    slops = {qid: s_ for qid, s_ in slops.items() if qid in phrases}
    if not per_q:
        return _empty_topk(spark, with_qid=True)
    # ONE memoized lexicon lookup for the union of all query + NOT terms;
    # idf rides the task closure — the batch job is the pruned scan alone
    lex = index.lookup_terms(sorted(
        {t for qt in per_q.values() for t in qt}
        | {t for ts in negs.values() for t in ts}
        | {t for v in demotes.values() for t in v[0]}))
    # bool entries: an unknown must term, or a should floor above the
    # KNOWN should-term count, empties that entry globally (the same
    # rule search_bool applies driver-side)
    for qid in [q_ for q_ in per_q if q_ in musts]:
        known_q = [t for t in per_q[qid] if t in lex]
        if (musts[qid] - set(known_q)
                or minsh[qid] > sum(1 for t in known_q
                                    if t not in musts[qid])):
            del per_q[qid]
    if musts:
        musts = {qid: v for qid, v in musts.items() if qid in per_q}
        minsh = {qid: v for qid, v in minsh.items() if qid in per_q}
        negs = {qid: ts for qid, ts in negs.items() if qid in per_q}
        if not per_q:
            return _empty_topk(spark, with_qid=True)
    scan_terms = sorted(
        t for t in lex
        if t in {u for qt in per_q.values() for u in qt}
        | {u for ts in negs.values() for u in ts}
        | {u for v in demotes.values() for u in v[0]})
    if not scan_terms:
        return _empty_topk(spark, with_qid=True)
    idfs = {t: float(lex[t]["idf"]) for t in scan_terms}
    buckets = sorted({lex[t]["bucket"] for t in scan_terms})
    # keep the "auto" / True distinction (plain `and` would collapse it)
    wand_mode = use_wand if any(m == "OR" for m in modes.values()) else False
    # (per-query NOT routing is handled inside the scorer: a query with
    # excludes skips the WAND branch; others in the set still route.
    # Filtered batches route too — the per-shard WAND call carries the
    # shared allowed mask, masked WAND being rank-safe.)
    cols = (["term", "shard", "df", "doc_ids", "tfs", "dls"]
            + (["blocks", "max_tf"] if wand_mode else [])
            + (["poss"] if phrases else []))
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(scan_terms))
            .select(*cols))
    width = index.shard_width
    cfgd = {"k1": index.cfg.bm25.k1, "b": index.cfg.bm25.b,
            "avgdl": index.avgdl}
    # dv_filter (engine/docvalues.py): ONE in-task predicate evaluation
    # per shard task, shared across the whole query set (same frozen
    # candidate-restriction semantics as doc_filter; the masks intersect
    # when both are given)
    _require_dv(index, dv_filter)
    dv_dir, dv_gen = index.index_dir, int(index.n_docs)

    def _dv_loc(shard: int):
        if dv_filter is None:
            return None
        from .docvalues import eval_filter
        return eval_filter(dv_dir, shard, dv_gen, dv_filter)

    # tombstones (engine/deletes.py): None when the index has none
    del_locs = _del_closure(index)

    if doc_filter is not None:
        import numpy as np
        allowed = _allowed_shards(index, doc_filter, width)

        def fnf(key, post_pdf, allowed_pdf):
            import numpy as np
            empty_r = pd.DataFrame({"qid": [], "doc_id": [], "score": []})
            if len(post_pdf) == 0 or len(allowed_pdf) == 0:
                return empty_r
            shard = int(post_pdf["shard"].iloc[0])
            loc = (allowed_pdf["doc_id"].to_numpy(np.int64)
                   - shard * width)
            dvl = _dv_loc(shard)
            if dvl is not None:
                loc = np.intersect1d(loc, dvl)
            if del_locs is not None:
                dl_ = del_locs(shard)
                if dl_ is not None:
                    loc = np.setdiff1d(loc, dl_)
            r = _score_shard_batch(post_pdf, per_q, modes, idfs, cfgd, k,
                                   width, wand_mode, allowed_loc=loc,
                                   negs=negs, phrases=phrases, msm=msm,
                                   slops=slops, musts=musts, minsh=minsh,
                                   demotes=demotes, dismaxes=dismaxes,
                                   multis=multis or None,
                                   dv_preds=dv_preds,
                                   dv_ctx=(dv_dir, dv_gen),
                                   boosts=boosts_by_qid or None,
                                   ks=ks_by_qid or None)
            return r if r is not None else empty_r

        scored = (post.groupBy("shard")
                  .cogroup(allowed.groupBy("shard"))
                  .applyInPandas(fnf,
                                 "qid string, doc_id long, score double"))
    else:
        def fn(key, post_pdf):
            if len(post_pdf) == 0:
                return pd.DataFrame({"qid": [], "doc_id": [], "score": []})
            shard = int(post_pdf["shard"].iloc[0])
            r = _score_shard_batch(post_pdf, per_q, modes, idfs, cfgd, k,
                                   width, wand_mode, negs=negs,
                                   phrases=phrases,
                                   allowed_loc=_dv_loc(shard),
                                   denied_loc=(del_locs(shard)
                                               if del_locs is not None
                                               else None),
                                   msm=msm, slops=slops,
                                   musts=musts, minsh=minsh,
                                   demotes=demotes, dismaxes=dismaxes,
                                   multis=multis or None,
                                   dv_preds=dv_preds,
                                   dv_ctx=(dv_dir, dv_gen),
                                   boosts=boosts_by_qid or None,
                                   ks=ks_by_qid or None)
            return r if r is not None else pd.DataFrame(
                {"qid": [], "doc_id": [], "score": []})

        scored = (post.groupBy("shard")
                  .applyInPandas(fn,
                                 "qid string, doc_id long, score double"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    if ks_by_qid:
        # per-entry size: qid -> its own k via a tiny literal map
        pairs = []
        for qid_, k_ in ks_by_qid.items():
            pairs += [F.lit(qid_), F.lit(k_)]
        k_col = F.coalesce(F.element_at(F.create_map(*pairs),
                                        F.col("qid")), F.lit(k))
    else:
        k_col = F.lit(k)
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k_col).drop("_rn")
            .orderBy("qid", F.desc("score"), F.asc("doc_id")))


def _decode_occurrences(pdf, i: int, start: int):
    """Row i of a positions-bearing postings pdf -> per-occurrence
    (doc-offset, token-position) arrays (occ_loc repeats each doc's
    shard-local offset tf times; pos is the flat positions stream)."""
    import numpy as np

    from . import codec as C
    ids, tfs = C.decode_postings(pdf["doc_ids"].iloc[i], pdf["tfs"].iloc[i])
    pos, bnd = C.decode_positions(pdf["poss"].iloc[i], tfs)
    loc = (ids - start).astype(np.int64)
    occ_loc = np.repeat(loc, np.diff(bnd))
    return occ_loc, pos


def _phrase_hits(seq: list, dec: dict, k: int, width: int,
                 allowed_loc=None, neg_loc=None, allow_mask=None,
                 slop: int = 0):
    """Shared phrase-match kernel (single-query and batch paths — ONE
    definition of the frozen consecutive-positions semantics): intersects
    per-offset (doc, pos - offset) key sets over per-term (occ_loc, pos)
    arrays from ``dec``; returns (udocs_loc, counts) top-k by
    (count desc, doc-offset asc), or None. ``allowed_loc``: doc_filter
    restriction (``allow_mask``: the same restriction as a prebuilt
    width-sized boolean mask — the batch scorer builds it ONCE per shard
    task and shares it across the whole query set); ``neg_loc``:
    shard-local offsets of docs containing any excluded term (NOT — same
    contract as search(exclude=...)).

    ``slop`` (sloppy phrase, frozen semantics): an occurrence of the
    FIRST term at position p1 matches iff the remaining terms appear IN
    ORDER at strictly increasing positions p2 < ... < pL with total span
    pL - p1 <= (L-1) + slop; n_phrase counts matching anchors. Greedy
    leftmost choice of each next position minimizes pL for a fixed
    anchor, so greedy existence == existence — the matcher is one
    np.searchsorted per non-anchor term over composite (doc, pos) keys,
    vectorized across every anchor of the shard at once. slop=0 is
    exactly the consecutive contract (greedy earliest-next either lands
    adjacent or overshoots the span), kept on the intersect fast path."""
    import numpy as np
    if any(t not in dec for t in seq):
        return None  # a phrase term absent in this shard
    if slop > 0 and len(seq) > 1:
        keys = {}
        for t in set(seq):
            occ_loc, pos = dec[t]
            kk = (occ_loc << np.int64(32)) | pos
            keys[t] = np.sort(kk)
        cur = keys[seq[0]]
        anchor_doc = (cur >> np.int64(32)).astype(np.int64)
        anchor_pos = (cur & np.int64(0xFFFFFFFF))
        for t in seq[1:]:
            kt = keys[t]
            idx = np.searchsorted(kt, cur, side="right")
            ok = idx < kt.size
            nxt = kt[np.minimum(idx, kt.size - 1)]
            ok &= (nxt >> np.int64(32)) == anchor_doc
            cur, anchor_doc = nxt[ok], anchor_doc[ok]
            anchor_pos = anchor_pos[ok]
            if cur.size == 0:
                return None
        span = (cur & np.int64(0xFFFFFFFF)) - anchor_pos
        m = span <= (len(seq) - 1 + slop)
        if not m.any():
            return None
        udocs, counts = np.unique(anchor_doc[m], return_counts=True)
        return _phrase_topk(udocs, counts, k, width,
                            allowed_loc, neg_loc, allow_mask)
    keys = None
    for off, t in enumerate(seq):
        occ_loc, pos = dec[t]
        m = pos >= off
        cand = (occ_loc[m] << np.int64(32)) | (pos[m] - off)
        cand = np.sort(cand)
        keys = cand if keys is None else np.intersect1d(
            keys, cand, assume_unique=True)
        if keys.size == 0:
            return None
    locs = (keys >> np.int64(32)).astype(np.int64)
    udocs, counts = np.unique(locs, return_counts=True)
    return _phrase_topk(udocs, counts, k, width,
                        allowed_loc, neg_loc, allow_mask)


def _phrase_topk(udocs, counts, k, width, allowed_loc, neg_loc, allow_mask):
    """Shared tail of the phrase kernels: NOT / doc_filter masks + the
    tie-safe (count desc, doc-offset asc) top-k cut."""
    import numpy as np
    if neg_loc is not None and neg_loc.size and udocs.size:
        negmask = np.zeros(width, dtype=bool)
        negmask[neg_loc] = True
        keep = ~negmask[udocs]
        udocs, counts = udocs[keep], counts[keep]
    if allow_mask is None and allowed_loc is not None:
        allow_mask = np.zeros(width, dtype=bool)
        allow_mask[np.asarray(allowed_loc, dtype=np.int64)] = True
    if allow_mask is not None:
        keep = allow_mask[udocs]
        udocs, counts = udocs[keep], counts[keep]
    if udocs.size == 0:
        return None
    # integer counts tie OFTEN at the k-boundary — the top-k selection
    # must apply the FULL (count desc, doc_id asc) order before cutting,
    # or boundary ties are kept arbitrarily
    srt = np.lexsort((udocs, -counts))[:k]
    return udocs[srt], counts[srt]


def search_phrase(index, phrase: str, k: int = 10,
                  doc_filter: str | None = None,
                  exclude: str | None = None,
                  slop: int = 0) -> DataFrame:
    """Phrase search (see _search_phrase_impl for the full contract and
    plan notes). Plans are memoized per argument tuple (_plan_cached).

    ``slop``: proximity tolerance — the phrase terms must appear in
    order with total span <= (len-1) + slop positions (0 = exact
    consecutive phrase, the default)."""
    _warn_if_stale(index)
    key = ("p", phrase, k, doc_filter, exclude, slop)
    return _plan_cached(index, key, lambda: _search_phrase_impl(
        index, phrase, k, doc_filter, exclude, slop))


def _search_phrase_impl(index, phrase: str, k: int = 10,
                        doc_filter: str | None = None,
                        exclude: str | None = None,
                        slop: int = 0) -> DataFrame:
    """Exact phrase query over a positions-enabled packed index
    (IndexConfig.index_positions=True) — beyond-spec extension (VERDICT r2
    'What's missing #4': the most common next ask of a search engine).

    Semantics (frozen): the phrase's analyzer tokens must occur at
    CONSECUTIVE positions of the indexed token stream (post-analyzer —
    the same stream ``dl`` counts). Returns ``(doc_id, n_phrase)`` for
    docs containing the phrase at least once, ordered by
    (n_phrase desc, doc_id asc), k rows — integer counts, so the DuckDB
    oracle twin compares exactly with no float tolerance.

    ``doc_filter``: optional SQL predicate over the stored corpus (same
    frozen semantics and cogrouped allowed-mask plan as ``search``):
    candidates are restricted, surviving (doc, n_phrase) rows identical
    to the unfiltered result.

    ``exclude``: boolean NOT — drop docs containing ANY of these terms
    (identical contract to ``search(exclude=...)``, including
    positive-wins: an excluded term that is also a phrase term excludes
    nothing). Excluded terms' postings ride the same pruned scan; only
    their doc_ids are decoded (no position work).

    Plan shape is identical to ``search``: memoized lexicon lookup ->
    bucket/term-pruned postings scan (now also reading the ``poss``
    column) -> per-shard Arrow matcher emitting <= k rows -> global
    TakeOrderedAndProject. The matcher intersects per-offset
    (doc, pos - offset) key sets — vectorized ``np.intersect1d``, never
    per-document Python (``_phrase_hits``, shared with the batch path).
    """
    spark = index.spark
    if not index.cfg.index_positions:
        raise ValueError("index was built without positions "
                         "(IndexConfig.index_positions=True required)")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    acfg = index.cfg.analyzer
    seq = tokenize_py(phrase, acfg)  # order matters; duplicates kept
    empty = spark.range(0).select(
        F.col("id").alias("doc_id"),
        F.lit(0).cast("long").alias("n_phrase"))
    if not seq:
        return empty
    neg = sorted(set(tokenize_py(exclude, acfg)) - set(seq)) if exclude else []
    lex = index.lookup_terms(sorted(set(seq) | set(neg)))
    if any(t not in lex for t in set(seq)):
        return empty  # a phrase term absent from the corpus
    neg = [t for t in neg if t in lex]  # absent NOT-terms exclude nothing
    scan_terms = sorted(set(seq) | set(neg))
    buckets = sorted({lex[t]["bucket"] for t in scan_terms})
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(scan_terms))
            .select("term", "shard", "df", "doc_ids", "tfs", "poss"))
    width = index.shard_width
    seq_set = frozenset(seq)
    neg_set = frozenset(neg)
    del_locs = _del_closure(index)  # tombstones (engine/deletes.py)

    def _match(pdf, allowed_loc=None):
        import numpy as np
        import pandas as pd

        from . import codec as C
        out_empty = pd.DataFrame({"doc_id": [], "n_phrase": []})
        if len(pdf) == 0:
            return out_empty
        shard = int(pdf["shard"].iloc[0])
        start = shard * width
        # decode each distinct phrase term once; NOT terms get only their
        # doc_ids decoded (their positions are never needed)
        dec: dict = {}
        neg_locs = []
        for i in range(len(pdf)):
            t = pdf["term"].iloc[i]
            if t in seq_set:
                dec[t] = _decode_occurrences(pdf, i, start)
            if t in neg_set:
                ids, _ = C.decode_postings(pdf["doc_ids"].iloc[i],
                                           pdf["tfs"].iloc[i])
                neg_locs.append(ids - start)
        if del_locs is not None:
            dl_ = del_locs(shard)
            if dl_ is not None:  # tombstones exclude like NOT terms
                neg_locs.append(dl_)
        neg_loc = (np.unique(np.concatenate(neg_locs)) if neg_locs
                   else np.empty(0, dtype=np.int64))
        hit = _phrase_hits(seq, dec, k, width,
                           allowed_loc=allowed_loc, neg_loc=neg_loc,
                           slop=slop)
        if hit is None:
            return out_empty
        udocs, counts = hit
        return pd.DataFrame(
            {"doc_id": (udocs + start).astype(np.int64),
             "n_phrase": counts.astype(np.int64)})

    if doc_filter is not None:
        allowed = _allowed_shards(index, doc_filter, width)

        def fnf(key, pdf, allowed_pdf):
            import numpy as np
            import pandas as pd
            if len(pdf) == 0 or len(allowed_pdf) == 0:
                return pd.DataFrame({"doc_id": [], "n_phrase": []})
            shard = int(pdf["shard"].iloc[0])
            loc = (allowed_pdf["doc_id"].to_numpy(np.int64)
                   - shard * width)
            return _match(pdf, allowed_loc=loc)

        scored = (post.groupBy("shard")
                  .cogroup(allowed.groupBy("shard"))
                  .applyInPandas(fnf, "doc_id long, n_phrase long"))
    else:
        scored = (post.groupBy("shard")
                  .applyInPandas(lambda key, pdf: _match(pdf),
                                 "doc_id long, n_phrase long"))
    return scored.orderBy(F.desc("n_phrase"), F.asc("doc_id")).limit(k)


def search_phrase_prefix(index, phrase: str, k: int = 10,
                         max_expansions: int = 64,
                         doc_filter: str | None = None,
                         exclude: str | None = None) -> DataFrame:
    """Match-phrase-prefix (see _search_phrase_prefix_impl). Plans are
    memoized per argument tuple (_plan_cached)."""
    _warn_if_stale(index)
    key = ("pp", phrase, k, int(max_expansions), doc_filter, exclude)
    return _plan_cached(index, key, lambda: _search_phrase_prefix_impl(
        index, phrase, k, int(max_expansions), doc_filter, exclude))


def _search_phrase_prefix_impl(index, phrase: str, k: int = 10,
                               max_expansions: int = 64,
                               doc_filter: str | None = None,
                               exclude: str | None = None) -> DataFrame:
    """Match-phrase-prefix — the ES ``match_phrase_prefix`` pattern (the
    search-as-you-type query): an exact consecutive phrase whose LAST
    term is a PREFIX of the final typed word. ``"hash jo"`` matches
    "hash join", "hash joins", ... at consecutive positions.

    Frozen contract (mirrored by the DuckDB twin in
    ``__spark_entry__``):

    * the phrase's analyzer tokens must occur consecutively; the final
      slot matches ANY vocabulary term starting with the last token,
      expanded under search_prefix's frozen cap rule (df desc, term
      asc, ``max_expansions``) over the LEXICON — the same memoized
      term-sorted range scan, so the expansion job is paid once;
    * ``n_phrase`` counts matching anchors (two expansion terms can
      never occupy the same position, so the union of their occurrence
      keys is disjoint — counts stay exact); order (n_phrase desc,
      doc_id asc), k rows, integer-exact compare;
    * ``exclude`` / ``doc_filter`` / tombstones compose with
      ``search_phrase``'s contracts; slop is not supported (exact
      adjacency only — the ES behavior for this query).

    Plan: identical to phrase — one pruned positions scan carrying the
    leading terms plus <= max_expansions expansion terms, per-shard
    vectorized intersect, <= k rows out, TakeOrderedAndProject."""
    spark = index.spark
    if not index.cfg.index_positions:
        raise ValueError("index was built without positions "
                         "(IndexConfig.index_positions=True required)")
    acfg = index.cfg.analyzer
    seq = tokenize_py(phrase, acfg)
    empty = spark.range(0).select(
        F.col("id").alias("doc_id"),
        F.lit(0).cast("long").alias("n_phrase"))
    if not seq:
        return empty
    lead, pref = seq[:-1], seq[-1]
    exp_rows = index.expand_prefix(normalize_prefix(pref + "*"),
                                   max_expansions)
    exp = sorted({r["term"] for r in exp_rows})
    if not exp:
        return empty  # no vocabulary term starts with the prefix
    neg = (sorted(set(tokenize_py(exclude, acfg)) - set(seq))
           if exclude else [])
    lex = index.lookup_terms(sorted(set(lead) | set(exp) | set(neg)))
    if any(t not in lex for t in set(lead)):
        return empty
    neg = [t for t in neg if t in lex]
    scan_terms = sorted(set(lead) | set(exp) | set(neg))
    buckets = sorted({lex[t]["bucket"] for t in scan_terms})
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(scan_terms))
            .select("term", "shard", "df", "doc_ids", "tfs", "poss"))
    width = index.shard_width
    lead_set, exp_set, neg_set = (frozenset(lead), frozenset(exp),
                                  frozenset(neg))
    last_off = len(lead)
    del_locs = _del_closure(index)

    def _match(pdf, allowed_loc=None):
        import numpy as np
        import pandas as pd

        from . import codec as C
        out_empty = pd.DataFrame({"doc_id": [], "n_phrase": []})
        if len(pdf) == 0:
            return out_empty
        shard = int(pdf["shard"].iloc[0])
        start = shard * width
        dec: dict = {}
        exp_keys = []
        neg_locs = []
        for i in range(len(pdf)):
            t = pdf["term"].iloc[i]
            if t in lead_set:
                dec[t] = _decode_occurrences(pdf, i, start)
            if t in exp_set:
                occ_loc, pos = _decode_occurrences(pdf, i, start)
                m = pos >= last_off
                exp_keys.append((occ_loc[m] << np.int64(32))
                                | (pos[m] - last_off))
            if t in neg_set:
                ids, _ = C.decode_postings(pdf["doc_ids"].iloc[i],
                                           pdf["tfs"].iloc[i])
                neg_locs.append(ids - start)
        if any(t not in dec for t in lead_set) or not exp_keys:
            return out_empty
        if del_locs is not None:
            dl_ = del_locs(shard)
            if dl_ is not None:
                neg_locs.append(dl_)
        neg_loc = (np.unique(np.concatenate(neg_locs)) if neg_locs
                   else np.empty(0, dtype=np.int64))
        # last slot: union of expansion occurrences — disjoint by
        # construction (one token per position), so a plain sorted
        # concat IS the deduped key set
        keys = np.sort(np.concatenate(exp_keys))
        for off, t in enumerate(lead):
            occ_loc, pos = dec[t]
            m = pos >= off
            cand = np.sort((occ_loc[m] << np.int64(32)) | (pos[m] - off))
            keys = np.intersect1d(keys, cand, assume_unique=True)
            if keys.size == 0:
                return out_empty
        locs = (keys >> np.int64(32)).astype(np.int64)
        udocs, counts = np.unique(locs, return_counts=True)
        hit = _phrase_topk(udocs, counts, k, width,
                           allowed_loc, neg_loc, None)
        if hit is None:
            return out_empty
        udocs, counts = hit
        return pd.DataFrame(
            {"doc_id": (udocs + start).astype(np.int64),
             "n_phrase": counts.astype(np.int64)})

    if doc_filter is not None:
        allowed = _allowed_shards(index, doc_filter, width)

        def fnf(key, pdf, allowed_pdf):
            import numpy as np
            import pandas as pd
            if len(pdf) == 0 or len(allowed_pdf) == 0:
                return pd.DataFrame({"doc_id": [], "n_phrase": []})
            shard = int(pdf["shard"].iloc[0])
            loc = (allowed_pdf["doc_id"].to_numpy(np.int64)
                   - shard * width)
            return _match(pdf, allowed_loc=loc)

        scored = (post.groupBy("shard")
                  .cogroup(allowed.groupBy("shard"))
                  .applyInPandas(fnf, "doc_id long, n_phrase long"))
    else:
        scored = (post.groupBy("shard")
                  .applyInPandas(lambda key, pdf: _match(pdf),
                                 "doc_id long, n_phrase long"))
    return scored.orderBy(F.desc("n_phrase"), F.asc("doc_id")).limit(k)


def search_span_first(index, term: str, n: int, k: int = 10,
                      doc_filter: str | None = None,
                      exclude: str | None = None) -> DataFrame:
    """Span-first query (see _search_span_first_impl). Plans are
    memoized per argument tuple (_plan_cached)."""
    _warn_if_stale(index)
    key = ("sf1", term, int(n), k, doc_filter, exclude)
    return _plan_cached(index, key, lambda: _search_span_first_impl(
        index, term, int(n), k, doc_filter, exclude))


def _search_span_first_impl(index, term: str, n: int, k: int = 10,
                            doc_filter: str | None = None,
                            exclude: str | None = None) -> DataFrame:
    """Positional span query — the Lucene/ES ``span_first`` pattern:
    match documents where ``term`` occurs within the FIRST ``n`` token
    positions of the indexed stream ("the query word appears in the
    opening of the turn"). Runs on the positions-enabled layout
    (IndexConfig.index_positions=True), like phrase search.

    Frozen contract (mirrored by the DuckDB twin in
    ``__spark_entry__``): positions are 0-based post-analyzer token
    offsets (the same stream ``dl`` counts); a doc matches when the
    term occurs at any position < ``n``; ``n_within`` counts those
    occurrences; results order (n_within desc, doc_id asc), k rows —
    integer counts, exact oracle compare. The twin is one list slice:
    ``len(list_filter(toks[1:n], t -> t = term))``.

    ``exclude`` / ``doc_filter`` / tombstones compose with the exact
    contracts of ``search_phrase`` (shared ``_phrase_topk`` tail).

    Plan: identical to phrase — memoized lexicon lookup, bucket/term-
    pruned postings scan reading the poss stream for ONE term (+ the
    doc_ids of any excluded terms), per-shard vectorized kernel
    emitting <= k rows, global TakeOrderedAndProject. The positions
    codec stores each posting's first position absolute, so the n-bound
    test touches only decoded int32s — no corpus scan anywhere."""
    spark = index.spark
    if not index.cfg.index_positions:
        raise ValueError("index was built without positions "
                         "(IndexConfig.index_positions=True required)")
    if n <= 0:
        raise ValueError("n must be a positive position bound")
    acfg = index.cfg.analyzer
    seq = tokenize_py(term, acfg)
    if len(seq) > 1:
        raise ValueError(f"span_first takes ONE term; {term!r} analyzed "
                         f"to {len(seq)} tokens — use search_phrase for "
                         f"multi-term sequences")
    empty = spark.range(0).select(
        F.col("id").alias("doc_id"),
        F.lit(0).cast("long").alias("n_within"))
    if not seq:
        return empty
    t0 = seq[0]
    neg = sorted(set(tokenize_py(exclude, acfg)) - {t0}) if exclude else []
    lex = index.lookup_terms(sorted({t0} | set(neg)))
    if t0 not in lex:
        return empty
    neg = [t for t in neg if t in lex]
    scan_terms = sorted({t0} | set(neg))
    buckets = sorted({lex[t]["bucket"] for t in scan_terms})
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(scan_terms))
            .select("term", "shard", "df", "doc_ids", "tfs", "poss"))
    width = index.shard_width
    neg_set = frozenset(neg)
    del_locs = _del_closure(index)

    def _match(pdf, allowed_loc=None):
        import numpy as np
        import pandas as pd

        from . import codec as C
        out_empty = pd.DataFrame({"doc_id": [], "n_within": []})
        if len(pdf) == 0:
            return out_empty
        shard = int(pdf["shard"].iloc[0])
        start = shard * width
        occ = None
        neg_locs = []
        for i in range(len(pdf)):
            t = pdf["term"].iloc[i]
            if t == t0:
                occ = _decode_occurrences(pdf, i, start)
            if t in neg_set:
                ids, _ = C.decode_postings(pdf["doc_ids"].iloc[i],
                                           pdf["tfs"].iloc[i])
                neg_locs.append(ids - start)
        if occ is None:
            return out_empty
        if del_locs is not None:
            dl_ = del_locs(shard)
            if dl_ is not None:
                neg_locs.append(dl_)
        neg_loc = (np.unique(np.concatenate(neg_locs)) if neg_locs
                   else np.empty(0, dtype=np.int64))
        occ_loc, pos = occ
        m = pos < n
        if not m.any():
            return out_empty
        udocs, counts = np.unique(occ_loc[m], return_counts=True)
        hit = _phrase_topk(udocs, counts, k, width,
                           allowed_loc, neg_loc, None)
        if hit is None:
            return out_empty
        udocs, counts = hit
        return pd.DataFrame(
            {"doc_id": (udocs + start).astype(np.int64),
             "n_within": counts.astype(np.int64)})

    if doc_filter is not None:
        allowed = _allowed_shards(index, doc_filter, width)

        def fnf(key, pdf, allowed_pdf):
            import numpy as np
            import pandas as pd
            if len(pdf) == 0 or len(allowed_pdf) == 0:
                return pd.DataFrame({"doc_id": [], "n_within": []})
            shard = int(pdf["shard"].iloc[0])
            loc = (allowed_pdf["doc_id"].to_numpy(np.int64)
                   - shard * width)
            return _match(pdf, allowed_loc=loc)

        scored = (post.groupBy("shard")
                  .cogroup(allowed.groupBy("shard"))
                  .applyInPandas(fnf, "doc_id long, n_within long"))
    else:
        scored = (post.groupBy("shard")
                  .applyInPandas(lambda key, pdf: _match(pdf),
                                 "doc_id long, n_within long"))
    return scored.orderBy(F.desc("n_within"), F.asc("doc_id")).limit(k)


def _corpus_pruned(index, doc_ids: list[int]) -> DataFrame:
    """Corpus rows for <= k KNOWN doc_ids, with the scan PRUNED (VERDICT
    r3 #2: the old corpus() join computed doc_id from stored columns, so
    no row-level predicate reached parquet and every query's
    materialization was a full text scan).

    The ids are inverted driver-side through the manifest's offsets into
    predicates on the STORED columns — ``(part_id = p AND local_idx IN
    (...)) OR ...`` for batch-built files, ``doc_id IN (...)`` for
    streaming-appended files (which store doc_id directly) — so parquet
    row-group min/max stats prune the read; the corpus is written sorted,
    so the surviving row groups are few and local. An appended id's
    derived (part_id, local_idx) pair points past the last batch
    partition's row count and matches nothing, and batch files have no
    doc_id column (NULL under mergeSchema), so the OR of both predicates
    selects exactly the requested rows in every layout. doc_id is then
    re-derived via a <= k-row broadcast of the involved partitions'
    offsets (coalesced with the stored doc_id in mixed layouts)."""
    import bisect
    spark = index.spark
    offsets, mixed = index._corpus_layout()
    ids = sorted({int(d) for d in doc_ids})
    id_list = ",".join(f"{d}L" for d in ids)
    if offsets is None:  # streaming-only layout: doc_id stored directly
        return index.corpus_raw().filter(F.expr(f"doc_id IN ({id_list})"))
    by_part: dict[int, list[int]] = {}
    for d in ids:
        p = bisect.bisect_right(offsets, d) - 1
        by_part.setdefault(p, []).append(d - offsets[p])
    # predicate / map / coalesce as SINGLE SQL strings parsed by one
    # F.expr each: column-op composition (|, &, isin, create_map of 2k
    # lits) costs one py4j round trip PER NODE, and plan construction —
    # not execution (0.04 s measured) — dominated this path (~0.5 s per
    # materialization at k=10); string building is driver-side Python,
    # one parse call total
    pred_sql = " OR ".join(
        f"(part_id = {p} AND local_idx IN "
        f"({','.join(f'{v}L' for v in locs)}))"
        for p, locs in sorted(by_part.items()))
    map_sql = "map(" + ",".join(
        f"{p},{int(offsets[p])}L" for p in sorted(by_part)) + ")"
    derived_sql = f"element_at({map_sql}, part_id) + local_idx"
    if mixed:
        df = index.corpus_raw(True).filter(
            F.expr(f"({pred_sql}) OR doc_id IN ({id_list})"))
        df = df.withColumn("doc_id",
                           F.expr(f"coalesce(doc_id, {derived_sql})"))
    else:
        df = index.corpus_raw().filter(F.expr(pred_sql))
        df = df.withColumn("doc_id", F.expr(derived_sql))
    return df.drop("part_id", "local_idx")


def _sql_scalar(v, dt) -> str:
    """A value as a Spark SQL literal of the given type (plan-construction
    fast path — see _collect_topk). Covers the scalar types a top-k can
    carry; returns None for anything else so callers can fall back."""
    s = dt.simpleString()
    if v is None:
        return f"CAST(NULL AS {s})" if s in (
            "bigint", "int", "double", "float", "string") else None
    if s == "bigint":
        return f"{int(v)}L"
    if s == "int":
        return str(int(v))
    if s in ("double", "float"):
        f = float(v)
        if f != f or f in (float("inf"), float("-inf")):
            return f"CAST('{f}' AS {s})"
        r = repr(f)  # shortest exact round-trip
        return f"{r}D" if s == "double" else f"CAST('{r}' AS FLOAT)"
    if s == "string":
        q = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{q}'"
    return None


def _collect_topk(index, topk: DataFrame):
    """Driver-side collect of a top-k result (metadata-sized by contract)
    + a broadcast-ready DataFrame carrying the top-k's OWN columns plus
    its row order as ``_rank`` — materialization preserves the search's
    ranking whatever its columns are (score, n_phrase, qid+score, ...;
    ADVICE r3: the old score-only select crashed on phrase results).

    The small side is built as a LITERAL expression rather than
    ``createDataFrame(rows)``: a Python-rows DataFrame plans as Scan
    ExistingRDD, whose broadcast build pays a Python-worker round trip
    on EVERY downstream execution (~0.4 s/query measured); the literal
    form is a jobless JVM-side LocalRelation-equivalent. The whole
    ``explode(array(named_struct(...)))`` is ONE SQL string parsed by
    one ``F.expr`` — per-node column composition (k rows x |cols|
    ``F.lit().cast()`` + struct/array calls) paid one py4j round trip
    per AST node, and plan CONSTRUCTION (not execution, 0.04 s) was
    ~0.5 s of every materialization. Non-scalar top-k columns (none
    exist today) fall back to the per-node form."""
    rows = topk.collect()
    if not rows:
        return rows, None
    fields = topk.schema.fields
    lits = [[_sql_scalar(r[f.name], f.dataType) for f in fields]
            for r in rows]
    if all(x is not None for row in lits for x in row):
        structs = ",".join(
            "named_struct(" + ",".join(
                x for f, v in zip(fields, row)
                for x in (f"'{f.name}'", v)) + f",'_rank',{i})"
            for i, row in enumerate(lits))
        small = (index.spark.range(1)
                 .select(F.expr(f"explode(array({structs}))").alias("_s"))
                 .select("_s.*"))
        return rows, small
    structs = [
        F.struct(*[F.lit(r[f.name]).cast(f.dataType).alias(f.name)
                   for f in fields],
                 F.lit(i).cast("int").alias("_rank"))
        for i, r in enumerate(rows)]
    small = (index.spark.range(1)
             .select(F.explode(F.array(*structs)).alias("_s"))
             .select("_s.*"))
    return rows, small


def pin_topk(index, topk: DataFrame) -> DataFrame:
    """Execute a top-k query ONCE and pin its (metadata-sized) result as
    a literal-form DataFrame with the same schema — downstream plans
    (repeated materialization, joins, diagnostics) embed the rows as a
    jobless JVM-side relation instead of re-running the search per
    execution. Falls back to ``createDataFrame`` for non-scalar columns
    (none exist in any top-k today)."""
    rows = topk.collect()
    fields = topk.schema.fields
    if rows:
        lits = [[_sql_scalar(r[f.name], f.dataType) for f in fields]
                for r in rows]
        if all(x is not None for row in lits for x in row):
            structs = ",".join(
                "named_struct(" + ",".join(
                    x for f, v in zip(fields, row)
                    for x in (f"'{f.name}'", v)) + ")"
                for row in lits)
            return (index.spark.range(1)
                    .select(F.expr(f"explode(array({structs}))").alias("_s"))
                    .select("_s.*"))
    return index.spark.createDataFrame(rows, topk.schema)


def materialize_packed(index, topk: DataFrame) -> DataFrame:
    """E8 for the packed index: top-k rows joined back to the stored
    corpus text. The <= k doc_ids are collected driver-side and the
    corpus read is pruned to exactly those rows via predicates on the
    stored layout columns (``_corpus_pruned``) — never a full corpus
    scan. Ranking columns are carried generically from the top-k and the
    result preserves the top-k's own row order."""
    from pyspark.sql import types as T
    rows, small = _collect_topk(index, topk)
    rank_cols = [c for c in topk.columns if c != "doc_id"]
    if not rows:
        schema = T.StructType(
            [T.StructField("doc_id", T.LongType()),
             T.StructField("conv_id", T.StringType()),
             T.StructField("turn_idx", T.IntegerType()),
             T.StructField("text", T.StringType())]
            + [f for f in topk.schema.fields if f.name != "doc_id"])
        return index.spark.createDataFrame([], schema)
    corpus = _corpus_pruned(index, [r["doc_id"] for r in rows])
    return (corpus.join(F.broadcast(small), "doc_id")
            .select("doc_id", "conv_id", "turn_idx", "text",
                    *rank_cols, "_rank")
            .orderBy("_rank").drop("_rank"))


def materialize_snippets(index, topk: DataFrame, query: str,
                         window: int = 3,
                         n_fragments: int = 1) -> DataFrame:
    """E8 extension: top-k rows with a contextual snippet — ``window``
    analyzer tokens either side of the FIRST occurrence of any query
    term (earliest position across terms; frozen contract, mirrored by
    the DuckDB oracle twin).

    Snippets are defined over the post-analyzer token stream (the same
    stream ``dl`` counts), so the whole computation is a Catalyst
    expression tree — ``array_position`` / ``least`` / ``slice`` /
    ``array_join`` on the tokenized text, zero Python. The corpus read
    is pruned to the <= k matched rows via stored-column predicates
    (``_corpus_pruned``) and the tokenize expression runs on <= k rows;
    ranking columns (score, n_phrase, ...) are carried generically and
    the top-k's own row order is preserved.

    ``n_fragments > 1`` (the ES highlight ``number_of_fragments``):
    fragments anchor on the first occurrence of EACH query term present
    in the doc — anchor positions distinct-sorted ascending, the first
    ``n_fragments`` kept, one +-``window`` token slice per anchor,
    joined by ``" ... "``. Adjacent fragments may overlap (no merge —
    the frozen rule stays a pure expression tree); the single-fragment
    default is the unchanged legacy expression.
    """
    from pyspark.sql import types as T

    from .analyzer import tokenize_expr
    acfg = index.cfg.analyzer
    terms = sorted(set(tokenize_py(query, acfg)))
    rows, small = _collect_topk(index, topk)
    rank_cols = [c for c in topk.columns if c != "doc_id"]
    if not rows:
        schema = T.StructType(
            [T.StructField("doc_id", T.LongType())]
            + [f for f in topk.schema.fields if f.name != "doc_id"]
            + [T.StructField("snippet", T.StringType())])
        return index.spark.createDataFrame([], schema)
    toks = tokenize_expr(F.col("text"), acfg)
    # first position (1-based) of any query term; array_position yields 0
    # for an absent term -> NULL via nullif so `least` skips it. A hit
    # doc always contains >= 1 term, but coalesce(1) keeps the expression
    # total for exotic top-k inputs (e.g. phrase results).
    pos_cols = [F.nullif(F.array_position(F.col("_toks"), F.lit(t)),
                         F.lit(0)) for t in terms]
    if int(n_fragments) < 1:
        raise ValueError("n_fragments must be >= 1")
    if int(n_fragments) > 1 and pos_cols:
        # multi-fragment: distinct-sorted anchors, first n, one slice
        # per anchor, " ... "-joined — still a pure expression tree
        anchors = F.slice(
            F.array_sort(F.array_distinct(F.filter(
                F.array(*pos_cols), lambda x: x.isNotNull()))),
            1, int(n_fragments))
        frag = F.transform(
            anchors,
            lambda a: F.array_join(
                F.slice(F.col("_toks"),
                        F.greatest(F.lit(1), a - F.lit(window)),
                        a + F.lit(window)
                        - F.greatest(F.lit(1), a - F.lit(window))
                        + F.lit(1)), " "))
        snippet = F.coalesce(F.array_join(frag, " ... "), F.lit(""))
    else:
        p = F.coalesce(
            F.least(*pos_cols) if len(pos_cols) > 1 else pos_cols[0],
            F.lit(1)) if pos_cols else F.lit(1)
        start = F.greatest(F.lit(1), p - F.lit(window))
        length = p + F.lit(window) - start + F.lit(1)  # slice clamps
        snippet = F.array_join(F.slice(F.col("_toks"), start, length),
                               " ")
    corpus = _corpus_pruned(index, [r["doc_id"] for r in rows])
    return (corpus.join(F.broadcast(small), "doc_id")
            .withColumn("_toks", toks)
            .select("doc_id", *rank_cols,
                    snippet.alias("snippet"), "_rank")
            .orderBy("_rank").drop("_rank"))


def materialize_snippets_batch(index, topk: DataFrame,
                               queries: list[dict],
                               window: int = 3) -> DataFrame:
    """E8 x E9: snippets for a WHOLE ``search_batch`` result in one
    pruned scan. ``topk`` is (qid, doc_id, score, ...) rows;
    ``queries`` is the same list of dicts given to ``search_batch``
    (qid -> query text — each row's snippet anchors on ITS OWN query's
    terms, same frozen earliest-position contract as
    ``materialize_snippets``).

    Plan: ids for ALL queries are collected once (metadata-sized:
    <= k x |set|), the corpus read is pruned to their union via
    stored-column predicates, and the per-qid anchor position is ONE
    CASE expression over the shared tokenized column — built as a
    single parsed SQL string (the per-node form would pay a py4j round
    trip per term per query). One job for the whole set, mirroring
    search_batch's one-job contract."""
    from pyspark.sql import types as T

    from .analyzer import tokenize_expr
    acfg = index.cfg.analyzer
    qterms = {q["id"]: sorted(set(tokenize_py(
                  q.get("query") or " ".join(
                      filter(None, (q.get("must"), q.get("should")))),
                  acfg)))
              for q in queries}
    rows, small = _collect_topk(index, topk)
    rank_cols = [c for c in topk.columns if c != "doc_id"]
    if not rows:
        schema = T.StructType(
            [T.StructField("doc_id", T.LongType())]
            + [f for f in topk.schema.fields if f.name != "doc_id"]
            + [T.StructField("snippet", T.StringType())])
        return index.spark.createDataFrame([], schema)
    str_t = T.StringType()
    branches = []
    for qid, terms in qterms.items():
        if not terms:
            continue
        pos = [f"nullif(array_position(_toks, {_sql_scalar(t, str_t)}), 0)"
               for t in terms]
        inner = f"least({','.join(pos)})" if len(pos) > 1 else pos[0]
        branches.append(f"WHEN qid = {_sql_scalar(qid, str_t)} "
                        f"THEN coalesce({inner}, 1)")
    p_sql = ("CASE " + " ".join(branches) + " ELSE 1 END") if branches \
        else "1"
    p = F.expr(p_sql)
    start = F.greatest(F.lit(1), p - F.lit(window))
    length = p + F.lit(window) - start + F.lit(1)  # slice clamps the end
    corpus = _corpus_pruned(index, sorted({r["doc_id"] for r in rows}))
    toks = tokenize_expr(F.col("text"), acfg)
    return (corpus.join(F.broadcast(small), "doc_id")
            .withColumn("_toks", toks)
            .select("doc_id", *rank_cols,
                    F.array_join(F.slice(F.col("_toks"), start, length), " ")
                    .alias("snippet"), "_rank")
            .orderBy("_rank").drop("_rank"))


def materialize(idx: FlatIndex, topk: DataFrame) -> DataFrame:
    """E8: top-k (doc_id, score) -> (doc_id, conv_id, turn_idx, text, score).

    topk is tiny (<= k rows) -> broadcast side of the join against the
    corpus; Catalyst/AQE picks broadcast-hash automatically, we pin it.
    """
    return (idx.docs.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "conv_id", "turn_idx", "text", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")))


FACET_SCHEMA = "facet_field string, facet_value string, n_docs long"


def facets(index, query: str, fields, mode: str = "OR",
           doc_filter: str | None = None,
           top_values: int | None = None,
           max_expansions: int = 64) -> DataFrame:
    """Faceted search over the packed index (see _facets_impl). Plans are
    memoized per argument tuple (_plan_cached). ``mode="PREFIX"`` facets
    a wildcard query and ``mode="REGEXP"`` an anchored regexp query: the
    expansion (same frozen cap rules as search_prefix / search_regexp;
    ``max_expansions``) matches as OR."""
    _warn_if_stale(index)
    fields = tuple(fields)
    key = ("fc", query, fields, mode.upper(), doc_filter, top_values,
           int(max_expansions))
    return _plan_cached(index, key, lambda: _facets_impl(
        index, query, list(fields), mode, doc_filter, top_values,
        max_expansions))


def _facets_impl(index, query: str, fields: list, mode: str = "OR",
                 doc_filter: str | None = None,
                 top_values: int | None = None,
                 max_expansions: int = 64) -> DataFrame:
    """Faceted search: per-facet-value doc counts over the FULL match set
    of a boolean query — the classic faceted-navigation sidebar next to a
    top-k result page. Returns (facet_field, facet_value, n_docs), one
    row per distinct value of each requested corpus metadata column among
    the documents matching the query (OR: any term; AND: all terms —
    identical match semantics to search()'s scorer, minus scoring).

    Plan (one job, two shuffles, corpus-size-bounded state nowhere):
      1. the SAME pruned posting scan as search() (partition-pruned to
         the query terms' buckets, term-pushed, only the doc_ids/tfs
         streams read — no WAND columns, no dls) -> a per-shard Arrow
         kernel decodes each term's VByte stream once and emits matched
         GLOBAL doc_ids as bare int64s (OR: union bitmap; AND: per-doc
         distinct-term counts == |terms|). Per-task memory is one
         width-sized array — the scorer's own invariant.
      2. the match set joins the corpus on doc_id reading ONLY the facet
         columns (+ the id-derivation columns) — column pruning keeps
         the text stream out of the scan entirely, unlike E8 which needs
         it. An optional doc_filter predicate is pushed into that same
         corpus scan (filtered facets, frozen filter semantics shared
         with search()).
      3. ONE GROUPING SETS aggregation computes EVERY requested facet
         dimension in a single map-side-partial + one-exchange pass
         (physical: Expand -> partial HashAggregate -> single hash
         exchange on (fields..., grouping_id) -> final HashAggregate) —
         N facet dimensions never cost N shuffles over the match set.
    Output order is (n_docs desc, facet_field, facet_value) — the
    conventional facet-sidebar presentation, deterministic under count
    ties. NULL facet values aggregate into a NULL-valued row of their
    dimension (SQL GROUP BY semantics, mirrored by the DuckDB twin).

    ``top_values``: keep only the N most frequent values PER dimension
    (ties broken by facet_value asc — deterministic). A sidebar never
    shows a high-cardinality dimension exhaustively; the cap is a
    rank-over-window on the already-aggregated rows (volume = distinct
    facet values, not docs), so the bound costs one narrow shuffle over
    facet-cardinality data and the driver never receives an unbounded
    result.
    """
    spark = index.spark
    mode = mode.upper()
    if mode == "PREFIX":
        # wildcard facets: the capped expansion (frozen search_prefix
        # rule, memoized lexicon range scan) matches as OR
        rows = index.expand_prefix(normalize_prefix(query), max_expansions)
        qtf = {r["term"]: 1 for r in rows}
        mode = "OR"
    elif mode == "REGEXP":
        # regexp facets: same driver-side-expansion pattern (frozen
        # search_regexp cap, literal-prefix-pushed lexicon scan)
        rows = index.expand_regexp(query, max_expansions)
        qtf = {r["term"]: 1 for r in rows}
        mode = "OR"
    elif mode == "FUZZY":
        # fuzzy facets: the frozen (distance, df desc, term) cap via the
        # memoized deletion-neighborhood lookup (engine/fuzzy.py), then
        # the expansion matches as OR — completing the facets() mode set
        from .fuzzy import expand_fuzzy
        rows = expand_fuzzy(index, normalize_prefix(query), 1,
                            max_expansions)
        qtf = {r["term"]: 1 for r in rows}
        mode = "OR"
    else:
        qtf = query_terms(query, index.cfg.analyzer)
    empty = spark.createDataFrame([], FACET_SCHEMA)
    if not qtf or not fields:
        return empty
    terms = sorted(qtf)
    lex = index.lookup_terms(terms)
    known = [t for t in terms if t in lex]
    if not known or (mode == "AND" and len(known) < len(terms)):
        return empty  # unanalyzable / AND with a corpus-absent term
    n_required = len(terms)
    buckets = sorted({lex[t]["bucket"] for t in known})
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(known))
            .select("term", "shard", "doc_ids", "tfs"))
    width = index.shard_width
    is_and = mode == "AND"
    del_locs = _del_closure(index)  # tombstones (engine/deletes.py)

    def fn(key_, pdf):
        import numpy as np
        import pandas as pd
        from . import codec as C
        if len(pdf) == 0:
            return pd.DataFrame({"doc_id": np.empty(0, np.int64)})
        shard = int(pdf["shard"].iloc[0])
        start = shard * width
        if is_and:
            cnt = np.zeros(width, dtype=np.int32)
            for i in range(len(pdf)):
                ids, _ = C.decode_postings(pdf["doc_ids"].iloc[i],
                                           pdf["tfs"].iloc[i])
                cnt[ids - start] += 1  # ids unique per (term, shard) row
            if del_locs is not None and del_locs(shard) is not None:
                cnt[del_locs(shard)] = -1  # tombstoned docs never count
            hit = np.flatnonzero(cnt == n_required)
        else:
            seen = np.zeros(width, dtype=bool)
            for i in range(len(pdf)):
                ids, _ = C.decode_postings(pdf["doc_ids"].iloc[i],
                                           pdf["tfs"].iloc[i])
                seen[ids - start] = True
            if del_locs is not None and del_locs(shard) is not None:
                seen[del_locs(shard)] = False
            hit = np.flatnonzero(seen)
        return pd.DataFrame({"doc_id": (hit + start).astype(np.int64)})

    matched = post.groupBy("shard").applyInPandas(fn, "doc_id long")
    corpus = index.corpus()
    if doc_filter is not None:
        corpus = corpus.filter(doc_filter)
    base = matched.join(corpus.select("doc_id", *fields), "doc_id")
    g = base.groupingSets([[f] for f in fields],
                          *[F.col(f) for f in fields])
    agg = g.agg(F.count(F.lit(1)).alias("n_docs"),
                F.grouping_id().alias("_gid"))
    # grouping_id -> dimension name: bit i (MSB-first over `fields`) is 1
    # when that column is EXCLUDED from the set; our sets each keep
    # exactly one column, so gid identifies the dimension
    n = len(fields)
    full = (1 << n) - 1
    ff = F.lit(None).cast("string")
    fv = F.lit(None).cast("string")
    for i, f in enumerate(fields):
        gid = full ^ (1 << (n - 1 - i))
        ff = F.when(F.col("_gid") == gid, F.lit(f)).otherwise(ff)
        fv = F.when(F.col("_gid") == gid,
                    F.col(f).cast("string")).otherwise(fv)
    out = agg.select(ff.alias("facet_field"), fv.alias("facet_value"),
                     "n_docs")
    if top_values is not None:
        from pyspark.sql import Window
        w = (Window.partitionBy("facet_field")
             .orderBy(F.desc("n_docs"), F.asc("facet_value")))
        out = (out.withColumn("_rk", F.row_number().over(w))
               .filter(F.col("_rk") <= top_values).drop("_rk"))
    return out.orderBy(F.desc("n_docs"), F.asc("facet_field"),
                       F.asc("facet_value"))
