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


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = sys.argv[2] if len(sys.argv) > 2 else "transcripts.parquet"
    write_parquet(gen_transcripts(n), out)
    print(f"wrote {n} convs to {out}")
