"""Vectorized tokenize+normalize stage.

Reference analogue: the ingest processors that mutate each document
before indexing (processor/FeatureProcessor.java:34-48,
ip2geo/processor/Ip2GeoProcessor.java:112-136). Here the enrichment is
text normalization: lowercase, split into [a-z0-9]+ runs, drop tokens
longer than MAX_TOKEN_LEN (input-validation analogue of the geometry
complexity caps in settings/GeospatialSettings.java:12-41).

Three implementations share ONE spec so engine, pure-Python oracle and
DuckDB oracle SQL produce identical token streams:
  * tokenize_py      — pure Python (oracle)
  * tokenize_pandas  — pandas/Arrow vectorized (Spark mapInPandas stage)
  * Spark SQL expression builder (engine fast path, JVM-side regex)
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

TOKEN_RE = re.compile(r"[a-z0-9]+")
MAX_TOKEN_LEN = 64

# The same spec as SQL fragments, used to build oracle SQL for DuckDB and
# JVM-side Spark expressions (regexp 'X' must be identical in both).
SQL_TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize_py(text: str | None) -> list[str]:
    """Reference implementation of the token spec."""
    if not text:
        return []
    return [t for t in TOKEN_RE.findall(text.lower()) if len(t) <= MAX_TOKEN_LEN]


def tokenize_pandas(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer: Series[str] -> Series[list[str]].

    No per-row Python in the hot loop beyond the final list comps on the
    already-split arrays; lowercase + findall run as pandas .str
    vectorized ops.
    """
    lowered = texts.fillna("").str.lower()
    token_lists = lowered.str.findall(TOKEN_RE)
    return token_lists.map(lambda toks: [t for t in toks if len(t) <= MAX_TOKEN_LEN])


def tokenize_flat(texts: pd.Series):
    """Hot-path tokenizer for the index-build kernel: one flat token
    array + per-doc kept-token counts, all filtering vectorized on the
    flat array (no per-doc Python). Token stream identical to
    tokenize_py doc-by-doc.

    Returns (flat_tokens: np.ndarray[U], doc_idx: np.ndarray[int64],
    dl: np.ndarray[int64]).
    """
    import numpy as np

    lowered = texts.fillna("").str.lower()
    token_lists = lowered.str.findall(TOKEN_RE)
    counts_raw = token_lists.str.len().to_numpy(dtype=np.int64)
    n = len(texts)
    if counts_raw.sum() == 0:
        return (np.empty(0, dtype="U1"), np.empty(0, dtype=np.int64),
                np.zeros(n, dtype=np.int64))
    flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists]).astype("U")
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts_raw)
    keep = np.char.str_len(flat) <= MAX_TOKEN_LEN
    flat, doc_idx = flat[keep], doc_idx[keep]
    dl = np.bincount(doc_idx, minlength=n).astype(np.int64)
    return flat, doc_idx, dl


def tokenize_encoded(texts: pd.Series, normalization: dict[str, str] | None = None):
    """Fastest build-path tokenizer: Arrow-native lower/split/filter +
    dictionary encoding, so term identity is integer codes and only the
    (tiny) vocabulary is ever sorted or normalized.

    Returns (codes: int64 per kept token, vocab: np.ndarray[U] sorted
    ascending, doc_idx: int64 per kept token, dl: int64 per doc,
    pos: int64 per kept token — the token's 0-based position in its
    document's KEPT token stream, the position contract shared with the
    DuckDB oracle's filtered token list) with
    vocab[codes[i]] == the i-th token of tokenize_flat(texts) after
    normalization.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    arr = pa.array(texts.fillna(""), type=pa.string())
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), SQL_TOKEN_SPLIT_RE)
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = (lens >= 1) & (lens <= MAX_TOKEN_LEN)
    flat = pc.filter(flat, pa.array(keep))
    doc_idx = doc_idx[keep]
    if len(doc_idx) == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype="U1"),
                doc_idx, np.zeros(n, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    dl = np.bincount(doc_idx, minlength=n).astype(np.int64)
    # position within the kept stream: doc_idx is ascending (tokens are
    # flattened doc by doc), so position = token index − doc's first
    tok_starts = np.concatenate(([0], np.cumsum(dl)[:-1]))
    pos = np.arange(len(doc_idx), dtype=np.int64) - tok_starts[doc_idx]

    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pylist(), dtype="U")
    if normalization:
        # normalize the VOCAB (tiny), not the token stream
        vocab = np.asarray(
            [normalization.get(str(v), str(v)) for v in vocab], dtype="U")
    # sort + dedupe the vocab (normalization can merge entries), then
    # remap token codes into sorted-vocab space
    uniq_vocab = np.unique(vocab)
    rank_of_old = np.searchsorted(uniq_vocab, vocab)
    codes = rank_of_old[codes]
    return codes, uniq_vocab, doc_idx, dl, pos


def normalize_flat(flat, mapping: dict[str, str]):
    """Apply a token→canonical dictionary to a flat token array,
    vectorized (the tokenizer's ip2geo-style enrichment lookup: the
    dictionary is broadcast-sized and immutable). Tokens not in the
    dictionary pass through; tokens are NORMALIZED AFTER the base spec,
    so doc lengths are unchanged."""
    import numpy as np
    import pandas as pd

    if not mapping or len(flat) == 0:
        return flat
    s = pd.Series(flat)
    out = s.map(mapping).fillna(s)
    return out.to_numpy().astype("U")


def spark_tokens_col(text_col: str = "text"):
    """JVM-side tokens column: array<string> of normalized tokens.

    Stays inside whole-stage codegen (no Python). Matches tokenize_py
    exactly: lower → split on non-alnum runs → drop empty and >64-char
    tokens.
    """
    from pyspark.sql import functions as F

    raw = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), SQL_TOKEN_SPLIT_RE)
    return F.filter(raw, lambda t: (F.length(t) >= 1) & (F.length(t) <= MAX_TOKEN_LEN))


def duckdb_tokens_sql(text_expr: str = "text") -> str:
    """DuckDB expression producing the same token list."""
    return (
        f"list_filter(string_split_regex(lower(coalesce({text_expr}, '')), "
        f"'{SQL_TOKEN_SPLIT_RE}'), t -> len(t) >= 1 AND len(t) <= {MAX_TOKEN_LEN})"
    )


def tokenize_partition(
    batches: Iterator[pd.DataFrame], text_col: str = "text"
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: adds `tokens` (list[str]) and `dl` (int32).

    Usage:
        df.mapInPandas(tokenize_partition, schema=...)
    Kept as a standalone function so tests can drive it without Spark.
    """
    for batch in batches:
        toks = tokenize_pandas(batch[text_col])
        out = batch.copy()
        out["tokens"] = toks
        out["dl"] = toks.map(len).astype("int32")
        yield out
