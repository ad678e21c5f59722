"""Deterministic synthetic transcript corpus (FIXTURES.md §1-3, seed=42).

Shape is the contractual input (BASELINE.json input_hint):
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp``. One document per turn, keyed by (conv_id, turn_idx).

Generation is pure numpy + pandas so pytest, bench, and the driver all
rebuild byte-identical corpora from ``(n_convs, seed)`` alone — no external
data, no Spark needed to generate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["search", "python", "browser", "editor"])
_KNUTH = 2654435761  # multiplicative-hash constant for turn counts


def vocabulary(n_words: int = 500) -> np.ndarray:
    """500 word types incl. planted markers (FIXTURES.md §1)."""
    words = [f"w{i:03d}" for i in range(n_words)]
    words[0], words[1] = "hot0", "hot1"           # Zipf head -> skew + WAND
    for i in range(10):
        words[n_words - 10 + i] = f"rare{i}"       # Zipf tail -> 1-3 docs
    # 'ghost0' is deliberately NOT in the vocabulary (unknown-term queries)
    return np.array(words, dtype=object)


def make_transcripts(n_convs: int = 200, seed: int = SEED,
                     skew: bool = False) -> pd.DataFrame:
    """Build the corpus as a pandas DataFrame in stable (conv_id, turn_idx)
    order. ``skew=True`` -> transcripts_skewed (50% of texts get hot0 x3)."""
    rng = np.random.default_rng(seed)
    conv_i = np.arange(n_convs, dtype=np.int64)
    n_turns = 1 + (conv_i * _KNUTH) % 12                 # 1..12 turns/conv
    total = int(n_turns.sum())
    conv_rep = np.repeat(conv_i, n_turns)
    turn_idx = (np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(n_turns) - n_turns, n_turns))
    conv_id = np.char.add("conv-", np.char.zfill(conv_rep.astype(str), 8))
    role = _ROLES[turn_idx % 3]

    # text: 5-60 Zipf(s=1.1)-sampled tokens per row, deterministic via one
    # generator in stable row order (vectorized draw, then per-row slicing
    # through pandas string join)
    vocab = vocabulary()
    v = len(vocab)
    zipf_w = 1.0 / np.power(np.arange(1, v + 1, dtype=np.float64), 1.1)
    zipf_w[v - 10:] = 0.0  # rare0..rare9 are planted explicitly below, not sampled
    zipf_p = zipf_w / zipf_w.sum()
    lens = rng.integers(5, 61, size=total)
    flat = rng.choice(v, size=int(lens.sum()), p=zipf_p)
    starts = np.cumsum(lens) - lens
    tok_series = pd.Series(vocab[flat]).groupby(
        np.repeat(np.arange(total), lens)).agg(" ".join)
    text = tok_series.reindex(np.arange(total)).fillna("").to_numpy(object)

    # plant rare0..rare9 into exactly 1-3 deterministic docs each
    # (FIXTURES.md: short-list / singleton paths)
    for i in range(10):
        n_hits = 1 + (i * 7) % 3
        rows = (np.arange(n_hits, dtype=np.int64) * 9973 + i * 131) % total
        for r in np.unique(rows):
            text[r] = (text[r] + " " if text[r] else "") + f"rare{i}"

    # planted analyzer cases: ~1% rows get a MiXeD-Case7! token appended
    mixed_rows = rng.random(total) < 0.01
    text[mixed_rows] = np.char.add(text[mixed_rows].astype(str), " MiXeD-Case7!")
    # ~0.1% empty texts (dl=0 handling)
    empty_rows = rng.random(total) < 0.001
    text[empty_rows] = ""
    if skew:  # 50% of texts contain hot0 at least 3 times
        srows = rng.random(total) < 0.5
        text[srows] = np.char.add(text[srows].astype(str), " hot0 hot0 hot0")

    tool = np.where(role == "tool",
                    _TOOLS[(conv_rep * 31 + turn_idx) % 4], "")
    ts = (np.datetime64("2026-01-01T00:00:00") +
          np.arange(total, dtype="timedelta64[s]") * 60)
    return pd.DataFrame({
        "conv_id": conv_id.astype(object),
        "turn_idx": turn_idx.astype(np.int32),
        "role": role.astype(object),
        "text": [str(t) for t in text],
        "tool": [str(t) for t in tool],
        "ts": ts,
    })


def spark_transcripts(spark, n_convs: int = 200, seed: int = SEED,
                      skew: bool = False, n_parts: int | None = None):
    """Corpus as a Spark DataFrame with the contractual schema."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ])
    pdf = make_transcripts(n_convs, seed, skew)
    df = spark.createDataFrame(pdf, schema=schema)
    return df.repartition(n_parts) if n_parts else df


def make_wand_corpus(n_docs: int = 650_000, seed: int = SEED,
                     n_hot: int = 6, n_gold: int = 32,
                     seed_df: int = 5000) -> pd.DataFrame:
    """Deterministic WAND-regime corpus (BENCH protocol, r4).

    The transcript fixtures' flat Zipf tf distribution is hostile to
    block-max pruning (every block's bound is ~the global bound), which
    is why the r1-r3 cost gate correctly routed everything exhaustive.
    This corpus is the regime Block-Max WAND exists for — a large shard
    where the top-k is decided by a few high-impact docs:

    * every doc is EXACTLY 64 tokens (uniform dl -> per-block
      (max_tf, min_dl) bounds are EXACT for the block's best posting);
    * hot terms ``h0..h{n_hot-1}``: df ~ (0.40..0.70) * n, tf = 1
      everywhere except gold docs;
    * seed term ``wq0``: df = seed_df + n_gold, tf = 1 except gold docs
      (the selective list WAND seeds θ from);
    * ``n_gold`` scattered gold docs contain wq0 x4 and every hot term
      x8 (plus filler to 64) — the true top-k, concentrated impact;
    * filler vocab ``f000..f399`` pads every doc to 64 tokens.

    Query ``wq0 h0 .. h5``: posting mass ~2.2M/shard at the default
    size, seed list ~5k -> the driver-side cost gate routes WAND, and
    with θ refinement + min_dl bounds phases 3-4 decode only the
    gold-bearing blocks instead of the full 2.2M postings.
    """
    rng = np.random.default_rng(seed)
    filler = np.array([f"f{i:03d}" for i in range(400)], dtype=object)
    hot = [f"h{i}" for i in range(n_hot)]
    # hot-term membership: independent per (doc, term), tf=1
    fracs = np.linspace(0.40, 0.70, n_hot)
    member = rng.random((n_docs, n_hot)) < fracs[None, :]
    # seed-term docs (tf=1) and gold docs, disjoint, deterministic
    gold = (np.arange(n_gold, dtype=np.int64) * 9973 + 137) % n_docs
    gold = np.unique(gold)
    non_gold = np.setdiff1d(np.arange(n_docs, dtype=np.int64), gold)
    seed_docs = rng.choice(non_gold, size=seed_df, replace=False)
    member[gold] = False  # gold rows are constructed explicitly below
    in_seed = np.zeros(n_docs, dtype=bool)
    in_seed[seed_docs] = True
    # token counts: query-term tokens per doc, filler pads to 64
    n_q = member.sum(axis=1) + in_seed.astype(np.int64)
    n_fill = 64 - n_q
    flat_fill = filler[rng.integers(0, filler.size, size=int(n_fill.sum()))]
    fill_series = pd.Series(flat_fill).groupby(
        np.repeat(np.arange(n_docs), n_fill)).agg(" ".join)
    texts = fill_series.reindex(np.arange(n_docs)).fillna("").to_numpy(object)
    hot_arr = np.array(hot, dtype=object)
    for t in range(n_hot):
        rows = np.flatnonzero(member[:, t])
        texts[rows] = np.char.add(texts[rows].astype(str), f" {hot[t]}")
    texts[seed_docs] = np.char.add(texts[seed_docs].astype(str), " wq0")
    gold_text = ("wq0 " * 4 + " ".join(
        h for h in hot_arr for _ in range(8))
        + " " + " ".join(filler[:64 - 4 - 8 * n_hot]))
    texts[gold] = gold_text
    conv_id = np.char.add("conv-", np.char.zfill(
        np.arange(n_docs).astype(str), 10))
    return pd.DataFrame({
        "conv_id": conv_id.astype(object),
        "turn_idx": np.zeros(n_docs, dtype=np.int32),
        "role": np.where(np.arange(n_docs) % 2 == 0, "user",
                         "assistant").astype(object),
        "text": [str(t) for t in texts],
        "tool": [""] * n_docs,
        "ts": (np.datetime64("2026-01-01T00:00:00")
               + np.arange(n_docs, dtype="timedelta64[s]")),
    })


def wand_query(n_hot: int = 6) -> str:
    return "wq0 " + " ".join(f"h{i}" for i in range(n_hot))


def spark_wand_corpus(spark, n_docs: int = 650_000, seed: int = SEED,
                      n_parts: int | None = None, **kw):
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ])
    pdf = make_wand_corpus(n_docs, seed, **kw)
    df = spark.createDataFrame(pdf, schema=schema)
    return df.repartition(n_parts) if n_parts else df


# Frozen query set (FIXTURES.md §3): 20 queries, k=10.
QUERY_SET: list[dict] = [
    {"id": "q01", "query": "hot0", "mode": "OR"},
    {"id": "q02", "query": "w020", "mode": "OR"},
    {"id": "q03", "query": "rare3", "mode": "OR"},
    {"id": "q04", "query": "ghost0", "mode": "OR"},
    {"id": "q05", "query": "hot0 hot1", "mode": "AND"},
    {"id": "q06", "query": "hot0 rare5", "mode": "AND"},
    {"id": "q07", "query": "rare1 rare2", "mode": "AND"},
    {"id": "q08", "query": "w010 ghost0", "mode": "AND"},
    {"id": "q09", "query": "hot0 hot1", "mode": "OR"},
    {"id": "q10", "query": "hot0 rare5", "mode": "OR"},
    {"id": "q11", "query": "rare1 rare2", "mode": "OR"},
    {"id": "q12", "query": "w010 ghost0", "mode": "OR"},
    {"id": "q13", "query": "hot0 w015 rare7", "mode": "AND"},
    {"id": "q14", "query": "hot1 w030 w031", "mode": "OR"},
    {"id": "q15", "query": "w005 w050 w100", "mode": "AND"},
    {"id": "q16", "query": "MiXeD-Case7!", "mode": "OR"},
    {"id": "q17", "query": "hot1 hot1", "mode": "OR"},
    {"id": "q18", "query": "w012 w034 w056 w078", "mode": "OR"},
    {"id": "q19", "query": "w003 w007 w011 w013 w017", "mode": "OR"},
    {"id": "q20", "query": "w002 w004 w008 w016 w032 w064", "mode": "OR"},
]
