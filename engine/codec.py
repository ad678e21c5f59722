"""Posting-list codec: delta + VByte (varint) compression, block metadata.

Pure numpy, no Spark imports — unit-testable standalone (SURVEY.md D2/D3).
Runs inside Arrow UDFs on executors, so every function is vectorized over
*all* values of an Arrow batch at once; there is no per-value Python loop
in either direction.

Wire format (frozen):
  * VByte, little-endian 7-bit groups. Byte layout per value:
    ``byte_k = (v >> 7k) & 0x7F``, with the high bit (0x80) SET on every
    byte except the last (continuation-bit convention; P:VBYTE).
  * doc_ids are stored as deltas: first value absolute, then gaps
    ``doc_id[i] - doc_id[i-1]`` (strictly positive — doc_ids strictly
    increasing within a posting list).
  * tfs are stored as raw varints (tf >= 1).
  * blocks: per `block_size` postings, a struct
    (last_doc_id:int64, max_tf:int32, off:int32, n:int32) where `off` is
    the POSTING-INDEX offset of the block inside the decoded list.
"""

from __future__ import annotations

import numpy as np

_MAX_VBYTE_LEN = 10  # 64 bits / 7 bits-per-byte, rounded up


# --------------------------------------------------------------------------
# VByte — vectorized over a whole uint64 array
# --------------------------------------------------------------------------

def vbyte_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode non-negative int64/uint64 values.

    Returns ``(bytes_u8, nbytes_per_value)`` so callers can split the byte
    stream at arbitrary value boundaries (per-term slicing) without
    re-encoding.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # number of 7-bit groups: ceil(bit_length / 7), with v==0 -> 1;
    # bit_length via log2 is unsafe for large ints, so use comparisons
    nbytes = np.ones(v.size, dtype=np.int64)
    thresh = np.uint64(1 << 7)
    for k in range(1, _MAX_VBYTE_LEN):
        mask = v >= thresh
        if not mask.any():
            break
        nbytes[mask] = k + 1
        if k + 1 < _MAX_VBYTE_LEN:
            thresh = np.uint64(thresh) * np.uint64(128)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.cumsum(nbytes) - nbytes
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        pos = starts[mask] + k
        byte = (v[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8) << 7
        out[pos] = byte.astype(np.uint8) | cont
    return out, nbytes


def vbyte_decode(data: np.ndarray | bytes) -> np.ndarray:
    """Decode a VByte stream back to uint64 values. Fully vectorized:
    terminator bytes (high bit clear) mark value ends; a segmented
    shift-and-add via ``np.add.reduceat`` reconstructs values."""
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (buf & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its value
    within = np.arange(buf.size, dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    contrib = (buf.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * within.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


# --------------------------------------------------------------------------
# Posting-list pack / unpack (delta on doc_ids)
# --------------------------------------------------------------------------

def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """doc_ids strictly increasing int64; tfs int >=1 aligned with doc_ids."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    gaps = np.empty_like(d)
    if d.size:
        gaps[0] = d[0]
        np.subtract(d[1:], d[:-1], out=gaps[1:])
    db, _ = vbyte_encode(gaps.astype(np.uint64))
    tb, _ = vbyte_encode(np.ascontiguousarray(tfs, dtype=np.uint64))
    return db.tobytes(), tb.tobytes()


def decode_postings(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    gaps = vbyte_decode(doc_bytes).astype(np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = vbyte_decode(tf_bytes).astype(np.int64)
    return doc_ids, tfs


def decode_many(payloads, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode many VByte payloads in ONE vectorized pass.

    VByte streams are self-delimiting, so concatenating payloads and
    decoding once yields the concatenated values; ``counts`` (values per
    payload) gives the CSR bounds to re-split.

    Returns ``(values:uint64[], bounds:int64[G+1])``.
    """
    counts = np.asarray(counts, dtype=np.int64)
    bounds = np.zeros(counts.size + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    blob = b"".join(payloads)
    values = vbyte_decode(blob)
    assert values.size == bounds[-1], (values.size, bounds[-1])
    return values, bounds


def decode_postings_many(doc_payloads, tf_payloads, counts: np.ndarray):
    """Decode many posting lists at once (delta-decoded doc_ids via
    segmented cumsum). Returns ``(doc_ids, tfs, bounds)``."""
    gaps, bounds = decode_many(doc_payloads, counts)
    gaps = gaps.astype(np.int64)
    if gaps.size:
        total = np.cumsum(gaps)
        # value of running total just before each segment start
        base = np.zeros(counts.size, dtype=np.int64)
        nz = bounds[:-1] > 0
        base[nz] = total[bounds[:-1][nz] - 1]
        doc_ids = total - np.repeat(base, np.diff(bounds))
    else:
        doc_ids = gaps
    tfs, tb = decode_many(tf_payloads, counts)
    return doc_ids, tfs.astype(np.int64), bounds


def topk_tiebreak(ids: np.ndarray, scores: np.ndarray, k: int):
    """Top-k under the frozen TOTAL order (score desc, id asc) — tie-SAFE
    at the k boundary (r4 fix, shared by every scorer).

    ``argpartition(-scores, k-1)[:k]`` alone keeps an ARBITRARY subset of
    docs whose score ties the k-th value — float scores tie for real
    (uniform-length corpora, integer-ish tf patterns), and the pure-Python
    oracle breaks ties on doc id. This selects by score first (cheap
    partition), widens to ALL ids tying the boundary score, then applies
    the full lexicographic order before cutting. Cost stays
    O(n + (k + ties) log(k + ties)).
    """
    if ids.size <= k:
        srt = np.lexsort((ids, -scores))
        return ids[srt], scores[srt]
    part = np.argpartition(-scores, k - 1)
    kth = scores[part[k - 1]]
    keep = np.flatnonzero(scores >= kth)
    srt = np.lexsort((ids[keep], -scores[keep]))[:k]
    keep = keep[srt]
    return ids[keep], scores[keep]


# Block skip-metadata record (r4: serialized as ONE binary column — a
# packed little-endian numpy structured array — instead of a parquet
# array<struct>; the struct form materialized one Python dict per block
# in every Arrow->pandas scorer task, which dominated WAND's runtime the
# moment block counts grew. np.frombuffer on the binary form is free.)
BLOCK_DTYPE = np.dtype([
    ("last_doc_id", "<i8"), ("max_tf", "<i4"), ("min_dl", "<i4"),
    ("off", "<i4"), ("n", "<i4"),
    ("dbyte", "<i4"), ("tbyte", "<i4"), ("lbyte", "<i4")])


def decode_blocks(buf: bytes) -> np.ndarray:
    """Zero-copy view of a packed block-metadata payload."""
    return np.frombuffer(buf, dtype=BLOCK_DTYPE)


def block_meta(doc_ids: np.ndarray, tfs: np.ndarray,
               block_size: int) -> np.ndarray:
    """Per-block skip metadata as a BLOCK_DTYPE structured array
    (standalone/unit form; byte offsets zero — use pack_lists for the
    full stream layout)."""
    n = int(doc_ids.size)
    out = np.zeros(-(-n // block_size) if n else 0, dtype=BLOCK_DTYPE)
    if n == 0:
        return out
    offs = np.arange(0, n, block_size, dtype=np.int64)
    ends = np.minimum(offs + block_size, n)
    out["last_doc_id"] = doc_ids[ends - 1]
    out["max_tf"] = np.maximum.reduceat(
        np.ascontiguousarray(tfs, dtype=np.int64), offs)
    out["off"] = offs
    out["n"] = ends - offs
    return out


# --------------------------------------------------------------------------
# Batch (many-terms-at-once) encoding for the partition-level packer.
# One vectorized pass over ALL postings of ALL terms in a partition:
# gaps are computed globally with resets at term boundaries, VByte-encoded
# in one call, then sliced per term via byte-offset cumsums.
# --------------------------------------------------------------------------

def encode_many(term_starts: np.ndarray, doc_ids: np.ndarray, tfs: np.ndarray,
                block_size: int | None = None):
    """Encode postings for many terms at once.

    Parameters
    ----------
    term_starts : int64[G+1] — postings index boundaries per term (CSR style);
        term g owns doc_ids[term_starts[g]:term_starts[g+1]] (sorted asc).
    Returns ``(doc_payloads, tf_payloads)`` — two lists of ``bytes`` length G —
    plus, when ``block_size`` is given, a third element: per-term block
    metadata ``list[list[dict]]`` where each block dict carries
    (last_doc_id, max_tf, off, n, dbyte, tbyte) — ``dbyte``/``tbyte`` are
    BYTE offsets of the block within the term's payloads, making every
    block independently decodable (WAND skip-decode, SURVEY.md D3/E5).
    """
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    gaps = np.empty_like(d)
    if d.size:
        gaps[0] = d[0]
        np.subtract(d[1:], d[:-1], out=gaps[1:])
        # reset gap at each term start to the absolute doc_id
        s = term_starts[:-1]
        s = s[s < d.size]
        gaps[s] = d[s]
    db, dn = vbyte_encode(gaps.astype(np.uint64))
    tb, tn = vbyte_encode(np.ascontiguousarray(tfs, dtype=np.uint64))
    # byte offsets per term boundary
    dcum = np.zeros(dn.size + 1, dtype=np.int64)
    np.cumsum(dn, out=dcum[1:])
    tcum = np.zeros(tn.size + 1, dtype=np.int64)
    np.cumsum(tn, out=tcum[1:])
    dbytes = db.tobytes()
    tbytes = tb.tobytes()
    g_count = term_starts.size - 1
    doc_payloads = [dbytes[dcum[term_starts[g]]:dcum[term_starts[g + 1]]]
                    for g in range(g_count)]
    tf_payloads = [tbytes[tcum[term_starts[g]]:tcum[term_starts[g + 1]]]
                   for g in range(g_count)]
    if block_size is None:
        return doc_payloads, tf_payloads
    blocks = _block_meta_many(term_starts, d, tfs, dcum, tcum, block_size)
    return doc_payloads, tf_payloads, blocks


def pack_lists(term_starts: np.ndarray, doc_ids: np.ndarray, tfs: np.ndarray,
               dls: np.ndarray, block_size: int):
    """Full posting-row encoder: doc_ids (delta+VByte), tfs (VByte),
    per-posting document lengths ``dls`` (VByte) and block metadata with
    byte offsets into all three streams.

    Inlining dl per posting costs ~1 byte/posting but removes the
    docmap join/shuffle from the query hot path entirely — the scorer
    reads everything it needs from the pruned postings scan.

    Returns ``(doc_payloads, tf_payloads, dl_payloads, blocks)``.
    """
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    gaps = np.empty_like(d)
    if d.size:
        gaps[0] = d[0]
        np.subtract(d[1:], d[:-1], out=gaps[1:])
        s = term_starts[:-1]
        s = s[s < d.size]
        gaps[s] = d[s]
    db, dn = vbyte_encode(gaps.astype(np.uint64))
    tb, tn = vbyte_encode(np.ascontiguousarray(tfs, dtype=np.uint64))
    lb, ln = vbyte_encode(np.ascontiguousarray(dls, dtype=np.uint64))
    dcum = np.zeros(dn.size + 1, dtype=np.int64); np.cumsum(dn, out=dcum[1:])
    tcum = np.zeros(tn.size + 1, dtype=np.int64); np.cumsum(tn, out=tcum[1:])
    lcum = np.zeros(ln.size + 1, dtype=np.int64); np.cumsum(ln, out=lcum[1:])
    dbytes, tbytes, lbytes = db.tobytes(), tb.tobytes(), lb.tobytes()
    G = term_starts.size - 1
    doc_payloads = [dbytes[dcum[term_starts[g]]:dcum[term_starts[g + 1]]] for g in range(G)]
    tf_payloads = [tbytes[tcum[term_starts[g]]:tcum[term_starts[g + 1]]] for g in range(G)]
    dl_payloads = [lbytes[lcum[term_starts[g]]:lcum[term_starts[g + 1]]] for g in range(G)]
    blocks = _block_meta_many(term_starts, d, tfs, dcum, tcum, block_size,
                              lcum=lcum, dls=dls)
    return doc_payloads, tf_payloads, dl_payloads, blocks


# --------------------------------------------------------------------------
# Positions stream (phrase queries). Per (term, shard) row: the positions
# of the term in each of its documents, concatenated in posting order.
# Within one posting the first position is absolute and the rest are
# deltas (strictly positive), so the stream is self-delimiting given the
# per-posting counts (== tfs). Because every posting's encoding restarts
# at an absolute value, MERGING rows is plain byte concatenation in run
# order — no decode/re-encode in the merge pass.
# --------------------------------------------------------------------------

def encode_positions_groups(group_starts_occ: np.ndarray,
                            posting_starts_occ: np.ndarray,
                            pos: np.ndarray) -> list[bytes]:
    """Encode per-occurrence positions into one payload per row group.

    Parameters
    ----------
    group_starts_occ : int64[G+1] — occurrence-index bounds per (term,
        shard) row group (CSR).
    posting_starts_occ : int64[P] — occurrence index of each posting's
        first occurrence (ascending; every group start is a posting start).
    pos : int64[] — positions sorted by (group, posting, pos).
    """
    p = np.ascontiguousarray(pos, dtype=np.int64)
    gaps = np.empty_like(p)
    if p.size:
        gaps[0] = p[0]
        np.subtract(p[1:], p[:-1], out=gaps[1:])
        s = posting_starts_occ[posting_starts_occ < p.size]
        gaps[s] = p[s]  # absolute at each posting start
    b, nb = vbyte_encode(gaps.astype(np.uint64))
    cum = np.zeros(nb.size + 1, dtype=np.int64)
    np.cumsum(nb, out=cum[1:])
    blob = b.tobytes()
    G = group_starts_occ.size - 1
    return [blob[cum[group_starts_occ[g]]:cum[group_starts_occ[g + 1]]]
            for g in range(G)]


def decode_positions(pos_bytes: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode one row's positions payload.

    Returns ``(pos:int64[], bounds:int64[df+1])`` — ``bounds`` (from the
    cumsum of ``tfs``) splits the flat position array per posting; the
    per-posting delta chains are reconstructed with a segmented cumsum."""
    tfs = np.asarray(tfs, dtype=np.int64)
    bounds = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(tfs, out=bounds[1:])
    gaps = vbyte_decode(pos_bytes).astype(np.int64)
    if gaps.size == 0:
        return gaps, bounds
    assert gaps.size == bounds[-1], (gaps.size, bounds[-1])
    total = np.cumsum(gaps)
    base = np.zeros(tfs.size, dtype=np.int64)
    nz = bounds[:-1] > 0
    base[nz] = total[bounds[:-1][nz] - 1]
    pos = total - np.repeat(base, np.diff(bounds))
    return pos, bounds


def _block_meta_many(term_starts, doc_ids, tfs, dcum, tcum, block_size,
                     lcum=None, dls=None):
    """Per-term block metadata with byte offsets, vectorized across all
    terms; one packed BLOCK_DTYPE payload (bytes) per term.

    ``min_dl`` (r4): the block's minimum document length. BM25 is
    monotone increasing in tf and decreasing in dl, so
    ``ub(max_tf, min_dl)`` is a valid per-block score upper bound that is
    MUCH tighter than the classic dl->0 bound (``min_dl=0`` encodes
    exactly that legacy bound, so absent dls degrade gracefully) —
    tight bounds are what lets Block-Max WAND prune non-seed terms'
    blocks at all (see engine/wand.py)."""
    tfs64 = np.ascontiguousarray(tfs, dtype=np.int64)
    dls64 = (np.ascontiguousarray(dls, dtype=np.int64)
             if dls is not None else None)
    out: list[bytes] = []
    for g in range(term_starts.size - 1):
        s, e = int(term_starts[g]), int(term_starts[g + 1])
        n = e - s
        if n == 0:
            out.append(b"")
            continue
        offs = np.arange(0, n, block_size, dtype=np.int64)
        ends = np.minimum(offs + block_size, n)
        arr = np.zeros(offs.size, dtype=BLOCK_DTYPE)
        arr["last_doc_id"] = doc_ids[s + ends - 1]
        arr["max_tf"] = np.maximum.reduceat(tfs64[s:e], offs)
        if dls64 is not None:
            arr["min_dl"] = np.minimum.reduceat(dls64[s:e], offs)
        arr["off"] = offs
        arr["n"] = ends - offs
        arr["dbyte"] = dcum[s + offs] - dcum[s]
        arr["tbyte"] = tcum[s + offs] - tcum[s]
        if lcum is not None:
            arr["lbyte"] = lcum[s + offs] - lcum[s]
        out.append(arr.tobytes())
    return out
