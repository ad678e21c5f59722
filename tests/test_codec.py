"""Codec unit tests (SURVEY.md §5.2): varint/delta round-trip, block invariants."""
import numpy as np
import pytest

from engine import codec


RNG = np.random.default_rng(42)


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 1000, 50_000])
def test_vbyte_roundtrip_random(n):
    vals = RNG.integers(0, 2**62, size=n).astype(np.uint64)
    enc, nbytes = codec.vbyte_encode(vals)
    assert int(nbytes.sum()) == enc.size
    dec = codec.vbyte_decode(enc.tobytes())
    np.testing.assert_array_equal(dec, vals)


def test_vbyte_boundaries():
    # every 7-bit group boundary, 0, and max
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21,
                     2**28, 2**35, 2**42, 2**49, 2**56, 2**62], dtype=np.uint64)
    enc, nbytes = codec.vbyte_encode(vals)
    np.testing.assert_array_equal(codec.vbyte_decode(enc), vals)
    assert nbytes[0] == 1 and nbytes[2] == 1 and nbytes[3] == 2


def test_postings_roundtrip():
    doc_ids = np.unique(RNG.integers(0, 10**9, size=5000)).astype(np.int64)
    tfs = RNG.integers(1, 500, size=doc_ids.size).astype(np.int64)
    db, tb = codec.encode_postings(doc_ids, tfs)
    d2, t2 = codec.decode_postings(db, tb)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(t2, tfs)


def test_block_meta_invariants():
    doc_ids = np.unique(RNG.integers(0, 10**7, size=1000)).astype(np.int64)
    tfs = RNG.integers(1, 9, size=doc_ids.size).astype(np.int64)
    blocks = codec.block_meta(doc_ids, tfs, block_size=128)
    # offsets partition the list; last_doc_id monotone increasing
    assert blocks[0]["off"] == 0
    total = sum(b["n"] for b in blocks)
    assert total == doc_ids.size
    lasts = [b["last_doc_id"] for b in blocks]
    assert lasts == sorted(lasts)
    for b in blocks:
        seg_tfs = tfs[b["off"]:b["off"] + b["n"]]
        assert b["max_tf"] == seg_tfs.max()
        assert b["last_doc_id"] == doc_ids[b["off"] + b["n"] - 1]


def test_encode_many_matches_single():
    # 50 terms with random-length sorted doc lists
    lens = RNG.integers(1, 400, size=50)
    starts = np.zeros(51, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    doc_ids = np.concatenate([
        np.sort(RNG.choice(10**6, size=int(l), replace=False)) for l in lens
    ]).astype(np.int64)
    tfs = RNG.integers(1, 50, size=doc_ids.size).astype(np.int64)
    dps, tps = codec.encode_many(starts, doc_ids, tfs)
    for g in range(50):
        s, e = starts[g], starts[g + 1]
        db, tb = codec.encode_postings(doc_ids[s:e], tfs[s:e])
        assert dps[g] == db and tps[g] == tb
        d2, t2 = codec.decode_postings(dps[g], tps[g])
        np.testing.assert_array_equal(d2, doc_ids[s:e])
        np.testing.assert_array_equal(t2, tfs[s:e])


def test_empty_postings():
    db, tb = codec.encode_postings(np.empty(0, np.int64), np.empty(0, np.int64))
    d, t = codec.decode_postings(db, tb)
    assert d.size == 0 and t.size == 0
    assert codec.block_meta(d, t, 128).size == 0
