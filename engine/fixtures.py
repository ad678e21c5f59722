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


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-spec bijective mixer) —
    the per-doc hash that makes the WAND corpus CHUNK-DETERMINISTIC:
    every row depends only on its global doc index + salt, never on a
    sequential RNG stream, so any [lo, hi) slice can be generated
    independently (distributed gen == driver gen, byte-identical)."""
    x = x.astype(np.uint64, copy=True)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _u01(key: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """Deterministic uniforms in [0,1) per (key, salt, seed)."""
    mask = (1 << 64) - 1  # Python-int modular mult (no scalar overflow)
    c = ((salt * 0x9E3779B97F4A7C15) + (seed * 0xD1B54A32D192ED03)) & mask
    h = _mix64(key.astype(np.uint64) + np.uint64(c))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _wand_rows(lo: int, hi: int, n_docs: int, seed: int, n_hot: int,
               n_gold: int, seed_df: int) -> pd.DataFrame:
    """Rows [lo, hi) of the WAND-regime corpus — the single source of
    truth shared by the pandas twin (make_wand_corpus) and the
    distributed Spark generator (spark_wand_corpus)."""
    idx = np.arange(lo, hi, dtype=np.int64)
    n = idx.size
    filler = np.array([f"f{i:03d}" for i in range(400)], dtype=object)
    fracs = np.linspace(0.40, 0.70, n_hot)
    member = np.stack([_u01(idx, 1000 + t, seed) < fracs[t]
                       for t in range(n_hot)], axis=1)
    in_seed = _u01(idx, 2000, seed) < (seed_df / n_docs)
    gold_all = np.unique(
        (np.arange(n_gold, dtype=np.int64) * 9973 + 137) % n_docs)
    is_gold = np.isin(idx, gold_all)
    member[is_gold] = False  # gold rows are constructed explicitly below
    in_seed[is_gold] = False
    # token counts: query-term tokens per doc, filler pads to 64
    n_q = member.sum(axis=1) + in_seed.astype(np.int64)
    n_fill = 64 - n_q
    reps = np.repeat(idx, n_fill)
    slot = (np.arange(reps.size, dtype=np.int64)
            - np.repeat(np.cumsum(n_fill) - n_fill, n_fill))
    f_idx = (_mix64((reps * np.int64(64) + slot).astype(np.uint64)
                    + np.uint64(seed) * np.uint64(3000))
             % np.uint64(400)).astype(np.int64)
    fill_series = pd.Series(filler[f_idx]).groupby(
        np.repeat(np.arange(n), n_fill)).agg(" ".join)
    texts = fill_series.reindex(np.arange(n)).fillna("").to_numpy(object)
    for t in range(n_hot):
        rows = np.flatnonzero(member[:, t])
        texts[rows] = np.char.add(texts[rows].astype(str), f" h{t}")
    srows = np.flatnonzero(in_seed)
    texts[srows] = np.char.add(texts[srows].astype(str), " wq0")
    gold_hot_tf = max(1, (64 - 4) // n_hot)
    n_pad = 64 - 4 - gold_hot_tf * n_hot
    gold_text = ("wq0 " * 4 + " ".join(
        f"h{t}" for t in range(n_hot) for _ in range(gold_hot_tf))
        + ((" " + " ".join(filler[:n_pad])) if n_pad > 0 else ""))
    texts[is_gold] = gold_text
    conv_id = np.char.add("conv-", np.char.zfill(idx.astype(str), 10))
    return pd.DataFrame({
        "conv_id": conv_id.astype(object),
        "turn_idx": np.zeros(n, dtype=np.int32),
        "role": np.where(idx % 2 == 0, "user", "assistant").astype(object),
        "text": [str(t) for t in texts],
        "tool": [""] * n,
        "ts": (np.datetime64("2026-01-01T00:00:00")
               + idx.astype("timedelta64[s]")),
    })


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
    * seed term ``wq0``: df ~ seed_df (+ gold), tf = 1 except gold docs
      (the selective list WAND seeds θ from; membership is per-doc
      hashed, so df is binomial around seed_df — the cost gate reads
      the ACTUAL df from the lexicon, nothing depends on exactness);
    * ``n_gold`` scattered gold docs contain wq0 x4 and every hot term
      x floor(60 / n_hot) (plus filler to exactly 64) — the true top-k,
      concentrated impact;
    * filler vocab ``f000..f399`` pads every doc to 64 tokens.

    Query ``wq0 h0 .. h{n_hot-1}``: posting mass ~= n_docs x
    mean(hot fracs) x n_hot per shard, seed list ~seed_df -> the
    driver-side cost gate routes WAND, and with θ refinement + min_dl
    bounds phases 3-4 decode only the gold-bearing blocks instead of
    the full posting mass. ``n_hot`` scales the exhaustive scorer's
    per-shard work WITHOUT growing the corpus (docs stay 64 tokens), so
    the bench can make the kernel gap dominate single-box noise.

    Every row is a pure function of (doc index, seed) — _wand_rows —
    so the Spark generator builds partitions in parallel and this
    pandas twin is byte-identical to it at any scale.
    """
    return _wand_rows(0, n_docs, n_docs, seed, n_hot, n_gold, seed_df)


def wand_query(n_hot: int = 6) -> str:
    return "wq0 " + " ".join(f"h{i}" for i in range(n_hot))


def spark_wand_corpus(spark, n_docs: int = 650_000, seed: int = SEED,
                      n_parts: int | None = None, n_hot: int = 6,
                      n_gold: int = 32, seed_df: int = 5000):
    """WAND-regime corpus as a Spark DataFrame, generated DISTRIBUTED:
    one _wand_rows chunk per partition via mapInPandas over the chunk
    bounds (nothing corpus-sized ever exists on the driver — the same
    no-driver-materialization rule the engine holds itself to). Rows are
    hash-per-doc deterministic, so the result is byte-identical to
    make_wand_corpus at any partition count."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ])
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bounds = np.linspace(0, n_docs, n_parts + 1).astype(np.int64)

    def gen(pdfs):
        for pdf0 in pdfs:
            for i in pdf0["id"]:
                lo, hi = int(bounds[int(i)]), int(bounds[int(i) + 1])
                if hi > lo:
                    yield _wand_rows(lo, hi, n_docs, seed, n_hot,
                                     n_gold, seed_df)

    chunks = spark.range(0, n_parts, 1, n_parts)
    return chunks.mapInPandas(gen, schema)


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
