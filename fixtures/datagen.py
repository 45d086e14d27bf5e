"""Deterministic synthetic transcript table generator (FIXTURES.md §1).

Seed-pinned; Zipf-distributed vocabulary so hot terms exercise the
salted-key skew path (the fixture analogue of the reference's randomized
GeoHexGridAggregatorTests.testWithSeveralDocs, which generates random
points and builds the expected aggregation independently).

No wall-clock, no external data. All sizes are derived from n_convs.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

VOCAB_SIZE = 5000
ZIPF_S = 1.1
EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["bash", "search", "python", "browser"])


def _vocab(size: int = VOCAB_SIZE) -> np.ndarray:
    # word ids 0..size-1 → "w{i}" with a few realistic words mixed in so
    # query fixtures read naturally; rank 0 is the hottest term.
    words = [f"w{i}" for i in range(size)]
    for i, w in enumerate(
        ["the", "spark", "deploy", "job", "table", "query", "index", "scan",
         "merge", "token", "run", "test", "data", "shuffle", "join", "agg"]
    ):
        words[i] = w
    return np.array(words)


def _zipf_probs(size: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def gen_transcripts(n_convs: int, seed: int = 42,
                    min_turns: int = 3, max_turns: int = 8,
                    min_tokens: int = 5, max_tokens: int = 120) -> pd.DataFrame:
    """Generate the transcript table as a pandas DataFrame.

    Includes the mandatory edge rows from FIXTURES.md §1 (empty text,
    punctuation-only, single-token, tf-saturated, duplicate text across
    convs, 1-turn conv) when n_convs >= 8.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = _zipf_probs(len(vocab))

    conv_ids, turn_idxs, roles, texts, tools = [], [], [], [], []
    for c in range(n_convs):
        conv_id = f"conv-{c:08d}"
        n_turns = int(rng.integers(min_turns, max_turns + 1))
        for t in range(n_turns):
            role = ROLES[int(rng.integers(0, 3))]
            n_tok = int(rng.integers(min_tokens, max_tokens + 1))
            words = vocab[rng.choice(len(vocab), size=n_tok, p=probs)]
            # mixed case + punctuation so the tokenizer has real work
            text_parts = []
            for w in words:
                r = rng.random()
                if r < 0.05:
                    w = w.upper()
                elif r < 0.10:
                    w = w.capitalize()
                if rng.random() < 0.15:
                    w = w + rng.choice([",", ".", "!", "?", ";"])
                text_parts.append(w)
            conv_ids.append(conv_id)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(" ".join(text_parts))
            tools.append(TOOLS[int(rng.integers(0, 4))] if role == "tool" else None)

    df = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": np.array(turn_idxs, dtype=np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
        }
    )

    if n_convs >= 8:
        # Edge rows (overwrite turn 0 of the first convs; deterministic).
        edits = {
            0: "",                                   # empty text
            1: "?!... ---",                          # punctuation only
            2: "singleton",                          # single token
            3: " ".join(["the"] * 12),               # tf saturation
            4: "duplicate turn text across convs",   # tie pair (a)
            5: "duplicate turn text across convs",   # tie pair (b)
        }
        for conv_i, new_text in edits.items():
            mask = (df["conv_id"] == f"conv-{conv_i:08d}") & (df["turn_idx"] == 0)
            df.loc[mask, "text"] = new_text
        # one conv with exactly 1 turn: drop all but turn 0 of conv 6
        drop = (df["conv_id"] == "conv-00000006") & (df["turn_idx"] > 0)
        df = df[~drop].reset_index(drop=True)

    # deterministic, monotone timestamps over the final row order
    df["ts"] = pd.Series(
        [EPOCH + dt.timedelta(seconds=7 * i) for i in range(len(df))],
        dtype="datetime64[us]",
    )
    return df


def write_parquet(df: pd.DataFrame, path: str) -> None:
    df.to_parquet(path, index=False)


def _gen_conv_range(start: int, end: int, seed: int,
                    min_turns: int = 3, max_turns: int = 8,
                    min_tokens: int = 5, max_tokens: int = 120) -> pd.DataFrame:
    """Vectorized bulk generator for convs [start, end) — deterministic
    for a given (start, end, seed) regardless of partition layout
    (each conv range re-derives its rng from (seed, start))."""
    rng = np.random.default_rng((seed << 32) ^ start)
    vocab = _vocab()
    probs = _zipf_probs(len(vocab))
    n_convs = end - start
    turns_per_conv = rng.integers(min_turns, max_turns + 1, size=n_convs)
    n_rows = int(turns_per_conv.sum())

    conv_idx = np.repeat(np.arange(start, end), turns_per_conv)
    conv_ids = np.array([f"conv-{i:08d}" for i in range(start, end)], dtype=object)
    conv_col = np.repeat(conv_ids, turns_per_conv)
    turn_idx = np.concatenate([np.arange(t) for t in turns_per_conv]).astype(np.int32)

    roles = ROLES[rng.integers(0, 3, size=n_rows)]
    n_tok = rng.integers(min_tokens, max_tokens + 1, size=n_rows)
    total = int(n_tok.sum())
    flat = vocab[rng.choice(len(vocab), size=total, p=probs)].astype(object)
    # sparse embellishment (mixed case + punctuation), vectorized on subsets
    up = rng.random(total) < 0.05
    flat[up] = np.char.upper(flat[up].astype(str)).astype(object)
    pn = rng.random(total) < 0.10
    flat[pn] = flat[pn] + rng.choice([",", ".", "!", "?"], size=int(pn.sum())).astype(object)

    bounds = np.concatenate(([0], np.cumsum(n_tok)))
    texts = np.array(
        [" ".join(flat[bounds[i]: bounds[i + 1]]) for i in range(n_rows)],
        dtype=object,
    )
    tools = np.where(roles == "tool",
                     TOOLS[rng.integers(0, 4, size=n_rows)], None)
    ts = (np.datetime64("2026-01-01T00:00:00", "us")
          + (conv_idx * 60 + turn_idx) * np.timedelta64(7, "s"))
    return pd.DataFrame(
        {"conv_id": conv_col, "turn_idx": turn_idx, "role": roles,
         "text": texts, "tool": tools, "ts": ts}
    )


def gen_transcripts_spark(spark, n_convs: int, seed: int = 42,
                          n_partitions: int = 64):
    """Distributed deterministic transcript generation: each partition
    generates a contiguous conv range with a range-derived rng, so the
    table is reproducible at any scale without a driver-side loop."""
    from pyspark.sql import functions as F

    from geospatial_spark.schemas import TRANSCRIPT_SCHEMA

    step = (n_convs + n_partitions - 1) // n_partitions
    ranges = [(i, min(i + step, n_convs)) for i in range(0, n_convs, step)]
    rdf = spark.createDataFrame(ranges, ["start", "end"]).repartition(len(ranges))

    def gen(batches):
        for b in batches:
            for s, e in zip(b["start"], b["end"]):
                out = _gen_conv_range(int(s), int(e), seed)
                out["ts"] = out["ts"].astype("datetime64[us]")
                yield out

    return rdf.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = sys.argv[2] if len(sys.argv) > 2 else "transcripts.parquet"
    write_parquet(gen_transcripts(n), out)
    print(f"wrote {n} convs to {out}")
