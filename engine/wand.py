"""Block-Max WAND scorer (SURVEY.md E5, P:WAND/P:BMW) — rank-safe,
vectorized, per doc-range shard.

Classic pointer-walking DAAT is per-document Python — the slow path this
engine bans. This implementation keeps Block-Max pruning but stays
numpy-vectorized, in four phases:

1. **Threshold seeding**: exactly score the RAREST query term's full list
   (cheapest list). The k-th best single-term partial is a valid lower
   bound θ on the final k-th score (final scores only add non-negative
   contributions — idf is strictly positive under the frozen Lucene
   variant, config.py).
2. **θ refinement** (r4): the k-th best SEED-ONLY score can never exceed
   the seed's own global bound, which makes the classic rest-sum block
   test vacuous for every non-seed term (rest >= ubg(seed) >= θ always).
   So the top-m seed docs by seed contribution are EXACT-scored across
   all query terms — decoding only the few blocks containing them via
   the block byte offsets — and θ rises to the k-th best of those m
   exact totals. Exact scores of real documents are always <= the true
   k-th best is >= ... i.e. the k-th largest among any m real docs is a
   valid lower bound on the true k-th score: rank-safe by construction,
   and now θ can exceed every single term's bound.
3. **Block pruning**: a block b of term t survives iff
   ``ub_block(b) + Σ_{t'≠t} ub_global(t') >= θ``. A document none of whose
   blocks survive has total score < θ (proof: take t* = argmax block bound;
   score(d) <= ub_block(b_{t*}(d)) + Σ_{t'≠t*} ub_global(t') < θ) — so the
   union of surviving blocks' documents is a superset of the true top-k:
   **rank-safe**. Block bounds use (max_tf, min_dl) — r4: BM25 is
   monotone increasing in tf and decreasing in dl, so the pair bounds
   every posting in the block FAR tighter than the legacy dl -> 0 bound
   (min_dl == 0 in old segments degrades to exactly that legacy bound);
   per-term global bounds are the max over the term's block bounds.
4. **Exact scoring**: candidates = docs of surviving blocks; every block
   whose doc-range contains a candidate is decoded (block byte offsets
   ``dbyte/tbyte`` allow random access; the first gap of block j is
   rebased on block j-1's ``last_doc_id``) and contributions are
   accumulated at candidate positions only, in ascending-term order (the
   frozen float64 summation order shared with the oracle).

θ only ever gates which blocks are PRUNED — every survivor is scored
exactly in the frozen order — so results are bit-identical to the
exhaustive scorer for ANY valid θ (tested, masked variant included).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import codec as C

# θ-refinement width: exact-score this-many-times-k of the seed's best
# docs across all terms. Small multiple: enough that the true top-k is
# likely inside (raising θ to its final value), tiny vs any real list.
REFINE_FACTOR = 4


def _ub(tf_max, idf: float, qtf: float, k1: float, b: float,
        dl_min=None, avgdl: float | None = None):
    """Score upper bound at (tf <= tf_max, dl >= dl_min): monotone in tf
    (up) and dl (down). dl_min None/0 -> the legacy dl->0 bound."""
    t = np.asarray(tf_max, dtype=np.float64)
    if dl_min is None:
        kk = k1 * (1.0 - b)
    else:
        d = np.asarray(dl_min, dtype=np.float64)
        kk = k1 * (1.0 - b + b * d / avgdl)
    return qtf * idf * (t * (k1 + 1.0)) / (t + kk)


def _blk(blocks: np.ndarray, field: str) -> np.ndarray:
    # blocks is a codec.BLOCK_DTYPE structured array (codec.decode_blocks)
    return blocks[field].astype(np.int64)


def _decode_block(doc_payload, tf_payload, dl_payload, blocks, j):
    """Single-block random-access decode (unit/debug form; the scorer
    uses _TermBlocks.decode — one vectorized pass over many blocks)."""
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


class _TermBlocks:
    """One term's block metadata as numpy arrays + BATCH random-access
    decode (r4). The r3 scorer decoded selected blocks one
    ``_decode_block`` call at a time — ~90 µs of per-call Python/numpy
    overhead each, which DOMINATED the pruned path the moment pruning
    got sharp enough to select thousands of small blocks. Here the
    selected blocks' byte ranges are concatenated and each stream is
    VByte-decoded in ONE vectorized call; per-block doc_id chains are
    rebased on the PRECEDING block's last_doc_id from the metadata
    (segmented cumsum — same trick as codec.decode_postings_many)."""

    def __init__(self, post_pdf, i: int):
        blocks = C.decode_blocks(post_pdf["blocks"].iloc[i])
        self.blocks = blocks
        self.dp = post_pdf["doc_ids"].iloc[i]
        self.tp = post_pdf["tfs"].iloc[i]
        self.lp = post_pdf["dls"].iloc[i]
        self.lasts = _blk(blocks, "last_doc_id")
        self.ns = _blk(blocks, "n")
        self.dby = np.append(_blk(blocks, "dbyte"), len(self.dp))
        self.tby = np.append(_blk(blocks, "tbyte"), len(self.tp))
        self.lby = np.append(_blk(blocks, "lbyte"), len(self.lp))

    def decode(self, js: np.ndarray):
        """Decode blocks ``js`` (ascending) -> (ids, tfs, dls); ids are
        globally sorted because blocks are doc-range ordered."""
        js = np.asarray(js, dtype=np.int64)
        if js.size == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e, e
        blob_d = b"".join(
            [self.dp[self.dby[j]:self.dby[j + 1]] for j in js])
        blob_t = b"".join(
            [self.tp[self.tby[j]:self.tby[j + 1]] for j in js])
        blob_l = b"".join(
            [self.lp[self.lby[j]:self.lby[j + 1]] for j in js])
        gaps = C.vbyte_decode(blob_d).astype(np.int64)
        counts = self.ns[js]
        bounds = np.zeros(js.size + 1, dtype=np.int64)
        np.cumsum(counts, out=bounds[1:])
        total = np.cumsum(gaps)
        seg_base = np.zeros(js.size, dtype=np.int64)
        nz = bounds[:-1] > 0
        seg_base[nz] = total[bounds[:-1][nz] - 1]
        prev_last = np.where(js > 0, self.lasts[np.maximum(js - 1, 0)], 0)
        ids = total - np.repeat(seg_base - prev_last, counts)
        tfs = C.vbyte_decode(blob_t).astype(np.int64)
        dls = C.vbyte_decode(blob_l).astype(np.int64)
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
    Rank-safe with valid block bounds: (max_tf, min_dl) bounds are
    maxima over block supersets, so they stay valid upper bounds for
    the allowed subset; θ is seeded and refined from allowed-only docs
    (a lower bound on the k-th ALLOWED score), and the candidate set is
    intersected with the mask before exact scoring — a selective filter
    therefore SHRINKS phase-4 work instead of forcing the exhaustive
    scorer."""
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
    # per-block upper bounds (max_tf, min_dl) and per-term global bounds
    # (max over the term's blocks — tighter than a row-level
    # (max_tf, dl->0) bound, and exact when one block holds both extremes)
    tb = [_TermBlocks(post_pdf, i) for i in range(nrows)]
    block_ubs: list[np.ndarray] = []
    ubg = {}
    for i in range(nrows):
        idf, qtf = qmeta[terms[i]]
        bub = _ub(_blk(tb[i].blocks, "max_tf"), idf, qtf, k1, b,
                  _blk(tb[i].blocks, "min_dl"), avgdl)
        block_ubs.append(bub)
        ubg[terms[i]] = float(bub.max())
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
        docs, scores = C.topk_tiebreak(s_ids[hit], s_contrib[hit], k)
        return pd.DataFrame({"doc_id": docs.astype(np.int64),
                             "score": scores})
    if allow is None:
        a_ids, a_sc = s_ids, s_contrib
    else:
        keepm = allow[s_ids - start]
        a_ids, a_sc = s_ids[keepm], s_contrib[keepm]
    if a_sc.size >= k:
        theta = float(np.partition(a_sc, a_sc.size - k)[a_sc.size - k])
    else:
        theta = -np.inf

    # ---- phase 2: refine θ — exact-score the top-m seed docs across all
    # terms (random block access via byte offsets; <= m block decodes per
    # term). k-th best of m REAL exact totals <= true k-th best: valid. ----
    if a_sc.size >= k:
        m = min(a_sc.size, REFINE_FACTOR * k)
        top = (np.argpartition(-a_sc, m - 1)[:m] if a_sc.size > m
               else np.arange(a_sc.size))
        docs_sel = a_ids[top]
        totals = a_sc[top].astype(np.float64).copy()
        o = np.argsort(docs_sel)
        docs_sel, totals = docs_sel[o], totals[o]
        for i in range(nrows):
            if i == seed_i:
                continue
            idf, qtf = qmeta[terms[i]]
            bidx = np.searchsorted(tb[i].lasts, docs_sel)
            js = np.unique(bidx[bidx < tb[i].lasts.size])
            ids, tfs_b, dls_b = tb[i].decode(js)
            if ids.size == 0:
                continue
            pos = np.searchsorted(ids, docs_sel)
            pos_c = np.minimum(pos, ids.size - 1)
            hit = ids[pos_c] == docs_sel
            if hit.any():
                tf = tfs_b[pos_c[hit]].astype(np.float64)
                dl = dls_b[pos_c[hit]].astype(np.float64)
                totals[hit] += (qtf * idf * (tf * (k1 + 1.0))
                                / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        theta = max(theta, float(
            np.partition(totals, totals.size - k)[totals.size - k]))

    # ---- phase 3: surviving blocks -> candidate set ----
    # ε-relaxed θ for the survive test ONLY: with min_dl the block bound
    # can be EXACTLY a real doc's contribution (e.g. uniform-length
    # corpora), and ``ub_total - ubg[t]`` reassociates the float sum — a
    # few ulps of noise must never prune a doc whose score ties θ (the
    # tie-break on doc_id needs every tied doc as a candidate). The
    # relaxation only ADMITS borderline blocks: rank-safety is
    # unconditional, pruning strength loses nothing measurable.
    theta_p = theta - 1e-9 * max(1.0, abs(theta))
    cand = np.zeros(width, dtype=bool)
    for i in range(nrows):
        rest = ub_total - ubg[terms[i]]
        js = np.flatnonzero(block_ubs[i] + rest >= theta_p)
        ids, _, _ = tb[i].decode(js)
        cand[ids - start] = True
    if allow is not None:
        cand &= allow  # only allowed docs are ever exact-scored
    n_cand = int(cand.sum())
    if n_cand == 0:
        return None

    # ---- phase 4: exact scoring of candidates (ascending term order;
    # one batch decode per term — blocks holding a candidate, found via
    # a prefix-sum over the candidate mask) ----
    cum_cand = np.zeros(width + 1, dtype=np.int64)
    np.cumsum(cand, out=cum_cand[1:])
    acc = np.zeros(width, dtype=np.float64)
    for i in sorted(range(nrows), key=lambda i: terms[i]):
        idf, qtf = qmeta[terms[i]]
        lasts = tb[i].lasts
        prevs = np.empty_like(lasts)
        prevs[0] = start - 1
        prevs[1:] = lasts[:-1]
        lo = np.maximum(prevs + 1 - start, 0)
        hi = np.minimum(lasts - start, width - 1)
        # block contains a candidate iff any candidate in (prev, last]
        js = np.flatnonzero(cum_cand[hi + 1] > cum_cand[lo])
        ids, tfs, dls = tb[i].decode(js)
        if ids.size == 0:
            continue
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
    hit, scores = C.topk_tiebreak(hit, acc[hit], k)
    return pd.DataFrame({"doc_id": (hit + start).astype(np.int64),
                         "score": scores})
