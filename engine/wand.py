"""Block-Max WAND scorer (SURVEY.md E5, P:WAND/P:BMW) — rank-safe,
vectorized, per doc-range shard.

Classic pointer-walking DAAT is per-document Python — the slow path this
engine bans. This implementation keeps Block-Max pruning but stays
numpy-vectorized, in two phases:

1. **Threshold seeding**: exactly score the RAREST query term's full list
   (cheapest list). The k-th best single-term partial is a valid lower
   bound θ on the final k-th score (final scores only add non-negative
   contributions — idf is strictly positive under the frozen Lucene
   variant, config.py).
2. **Block pruning**: a block b of term t survives iff
   ``ub_block(b) + Σ_{t'≠t} ub_global(t') >= θ``. A document none of whose
   blocks survive has total score < θ (proof: take t* = argmax block bound;
   score(d) <= ub_block(b_{t*}(d)) + Σ_{t'≠t*} ub_global(t') < θ) — so the
   union of surviving blocks' documents is a superset of the true top-k:
   **rank-safe**.
3. **Exact scoring**: candidates = docs of surviving blocks; every block
   whose doc-range contains a candidate is decoded (block byte offsets
   ``dbyte/tbyte`` allow random access; the first gap of block j is
   rebased on block j-1's ``last_doc_id``) and contributions are
   accumulated at candidate positions only, in ascending-term order (the
   frozen float64 summation order shared with the oracle).

Upper bounds use dl -> 0 (denominator >= tf + k1*(1-b)), monotone in tf,
hence >= any real contribution in the block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import codec as C


def _ub(tf_max, idf: float, qtf: float, k1: float, b: float):
    t = np.asarray(tf_max, dtype=np.float64)
    return qtf * idf * (t * (k1 + 1.0)) / (t + k1 * (1.0 - b))


def _blk(row_blocks, field):
    # blocks arrive as list[dict] (arrow struct-list -> pandas)
    return np.array([bl[field] for bl in row_blocks], dtype=np.int64)


def _decode_block(doc_payload, tf_payload, dl_payload, blocks, j):
    bl = blocks[j]
    last = j + 1 >= len(blocks)
    d_end = len(doc_payload) if last else blocks[j + 1]["dbyte"]
    t_end = len(tf_payload) if last else blocks[j + 1]["tbyte"]
    l_end = len(dl_payload) if last else blocks[j + 1]["lbyte"]
    gaps = C.vbyte_decode(doc_payload[bl["dbyte"]:d_end]).astype(np.int64)
    tfs = C.vbyte_decode(tf_payload[bl["tbyte"]:t_end]).astype(np.int64)
    dls = C.vbyte_decode(dl_payload[bl["lbyte"]:l_end]).astype(np.int64)
    base = blocks[j - 1]["last_doc_id"] if j > 0 else 0
    ids = np.cumsum(gaps) + base
    return ids, tfs, dls


def score_shard_wand(post_pdf: pd.DataFrame,
                     qtfs: dict, idfs: dict, cfg: dict, k: int, width: int,
                     allowed_loc=None, allow_mask=None):
    """``qtfs``: term -> query-term frequency; ``idfs``: term -> idf
    (collected once driver-side, inlined via the task closure — the
    scoring job is the pruned postings scan alone).

    ``allowed_loc``: optional shard-local positions of docs passing a
    doc_filter (masked WAND). ``allow_mask``: the same restriction as a
    PREBUILT width-sized boolean mask (ADVICE r3: the batch scorer
    builds it once per shard task and shares it across every
    WAND-routed query of the set instead of re-allocating per query).
    Rank-safe with UNCHANGED block bounds: bounds are maxima over block
    supersets, so they stay valid upper bounds for the allowed subset;
    θ is seeded from allowed-only seed contributions (a lower bound on
    the k-th ALLOWED score), and the candidate set is intersected with
    the mask before exact scoring — a selective filter therefore
    SHRINKS phase-3 work instead of forcing the exhaustive scorer."""
    if len(post_pdf) == 0:
        return None
    k1, b, avgdl = cfg["k1"], cfg["b"], cfg["avgdl"]
    shard = int(post_pdf["shard"].iloc[0])
    start = shard * width
    allow = allow_mask
    if allow is None and allowed_loc is not None:
        allow = np.zeros(width, dtype=bool)
        allow[np.asarray(allowed_loc, dtype=np.int64)] = True

    nrows = len(post_pdf)
    terms = post_pdf["term"].to_numpy(object)
    dfs = post_pdf["df"].to_numpy()
    qmeta = {terms[i]: (float(idfs[terms[i]]), float(qtfs[terms[i]]))
             for i in range(nrows)}
    # global per-term upper bounds
    ubg = {}
    for i in range(nrows):
        idf, qtf = qmeta[terms[i]]
        ubg[terms[i]] = float(_ub(int(post_pdf["max_tf"].iloc[i]), idf, qtf, k1, b))
    ub_total = sum(ubg.values())

    # ---- phase 1: seed θ from the rarest term's full list ----
    seed_i = int(np.lexsort((terms, dfs))[0])
    s_idf, s_qtf = qmeta[terms[seed_i]]
    s_ids, s_tfs = C.decode_postings(post_pdf["doc_ids"].iloc[seed_i],
                                     post_pdf["tfs"].iloc[seed_i])
    s_dls = C.vbyte_decode(post_pdf["dls"].iloc[seed_i]).astype(np.float64)
    s_tf = s_tfs.astype(np.float64)
    s_contrib = (s_qtf * s_idf * (s_tf * (k1 + 1.0))
                 / (s_tf + k1 * (1.0 - b + b * s_dls / avgdl)))
    if nrows == 1:
        # single-term query (in this shard): the seed scoring IS the final
        # scoring — skip block pruning + candidate re-decode entirely.
        # The !=0 filter is only valid when idf != 0 (always true under the
        # frozen 'lucene' variant); under 'okapi', df == N/2 gives idf == 0
        # and the exhaustive/flat paths return those docs with score 0.0 —
        # keep every posting then so rank-identity holds for that config.
        keep = (s_contrib != 0.0 if s_idf != 0.0
                else np.ones(s_contrib.size, dtype=bool))
        if allow is not None:
            keep &= allow[s_ids - start]
        hit = np.flatnonzero(keep)
        if hit.size == 0:
            return None
        scores = s_contrib[hit]
        docs = s_ids[hit]
        if hit.size > k:
            part = np.argpartition(-scores, k - 1)[:k]
            docs, scores = docs[part], scores[part]
        srt = np.lexsort((docs, -scores))
        return pd.DataFrame({"doc_id": docs[srt].astype(np.int64),
                             "score": scores[srt]})
    sc = s_contrib if allow is None else s_contrib[allow[s_ids - start]]
    if sc.size >= k:
        theta = float(np.partition(sc, sc.size - k)[sc.size - k])
    else:
        theta = -np.inf

    # ---- phase 2: surviving blocks -> candidate set ----
    cand = np.zeros(width, dtype=bool)
    all_blocks = [post_pdf["blocks"].iloc[i] for i in range(nrows)]
    survive: list[np.ndarray] = []
    for i in range(nrows):
        idf, qtf = qmeta[terms[i]]
        rest = ub_total - ubg[terms[i]]
        bub = _ub(_blk(all_blocks[i], "max_tf"), idf, qtf, k1, b)
        survive.append(np.flatnonzero(bub + rest >= theta))
    for i in range(nrows):
        dp = post_pdf["doc_ids"].iloc[i]
        tp = post_pdf["tfs"].iloc[i]
        lp = post_pdf["dls"].iloc[i]
        for j in survive[i]:
            ids, _, _ = _decode_block(dp, tp, lp, all_blocks[i], int(j))
            cand[ids - start] = True
    if allow is not None:
        cand &= allow  # only allowed docs are ever exact-scored
    n_cand = int(cand.sum())
    if n_cand == 0:
        return None

    # ---- phase 3: exact scoring of candidates (ascending term order) ----
    cum_cand = np.zeros(width + 1, dtype=np.int64)
    np.cumsum(cand, out=cum_cand[1:])
    acc = np.zeros(width, dtype=np.float64)
    for i in sorted(range(nrows), key=lambda i: terms[i]):
        idf, qtf = qmeta[terms[i]]
        blocks = all_blocks[i]
        dp = post_pdf["doc_ids"].iloc[i]
        tp = post_pdf["tfs"].iloc[i]
        lp = post_pdf["dls"].iloc[i]
        lasts = _blk(blocks, "last_doc_id")
        prevs = np.empty_like(lasts)
        prevs[0] = start - 1
        prevs[1:] = lasts[:-1]
        lo = np.maximum(prevs + 1 - start, 0)
        hi = np.minimum(lasts - start, width - 1)
        # block contains a candidate iff any candidate in (prev, last]
        has_cand = cum_cand[hi + 1] > cum_cand[lo]
        for j in np.flatnonzero(has_cand):
            ids, tfs, dls = _decode_block(dp, tp, lp, blocks, int(j))
            loc = ids - start
            m = cand[loc]
            if not m.any():
                continue
            loc = loc[m]
            tf = tfs[m].astype(np.float64)
            dl = dls[m].astype(np.float64)
            acc[loc] += (qtf * idf * (tf * (k1 + 1.0))
                         / (tf + k1 * (1.0 - b + b * dl / avgdl)))

    hit = np.flatnonzero(cand & (acc > -np.inf))
    hit = hit[acc[hit] != 0.0] if hit.size else hit
    if hit.size == 0:
        return None
    scores = acc[hit]
    if hit.size > k:
        part = np.argpartition(-scores, k - 1)[:k]
        hit, scores = hit[part], scores[part]
    srt = np.lexsort((hit, -scores))
    return pd.DataFrame({"doc_id": (hit[srt] + start).astype(np.int64),
                         "score": scores[srt]})
