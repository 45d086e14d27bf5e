"""Snippet highlighting: the best token window for a query over a doc.

The reference serves highlights through Lucene's unified highlighter —
passages scored by query-term coverage. This is that contract reduced
to a deterministic, engine-portable rule:

    the best window is the ``window``-token span containing the MOST
    DISTINCT query terms; ties break to the EARLIEST start.

Three implementations, one rule: a pure-Python kernel (serving path,
O(n) two-pointer), a Spark Column expression (whole-stage codegen,
no Python — batch highlighting of joined result sets), and a DuckDB
SQL twin (the gate oracle). The Spark/DuckDB forms are O(n·w) per doc
(windowed list ops); the Python form is the O(n) one serving latency
cares about.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def best_window_py(tokens: list[str], qterms: list[str],
                   window: int = 12) -> tuple[int, int]:
    """(start, n_distinct_hits) of the best window — start is 0-based;
    (0, 0) when nothing matches (the snippet is then the doc head,
    same as Lucene's no-match fallback passage)."""
    n = len(tokens)
    q = set(qterms)
    if n == 0 or not q:
        return 0, 0
    w = max(int(window), 1)
    counts: dict[str, int] = {}
    best_start, best_hits = 0, 0
    lo = 0
    for hi, tok in enumerate(tokens):
        if tok in q:
            counts[tok] = counts.get(tok, 0) + 1
        if hi - lo + 1 > w:
            out = tokens[lo]
            if out in q:
                c = counts[out] - 1
                if c:
                    counts[out] = c
                else:
                    del counts[out]
            lo += 1
        if hi - lo + 1 == min(w, n):
            hits = len(counts)
            if hits > best_hits:
                best_start, best_hits = lo, hits
    return best_start, best_hits


def highlight_text_py(text: str, qterms: list[str],
                      window: int = 12) -> tuple[str, int]:
    """(snippet, n_distinct_hits) for raw text via the shared
    tokenizer."""
    from geospatial_spark.functions.tokenize import tokenize_py

    toks = tokenize_py(text)
    start, hits = best_window_py(toks, qterms, window)
    return " ".join(toks[start:start + max(int(window), 1)]), hits


def _qarr_sql(qterms: list[str]) -> str:
    return "array(" + ", ".join(f"'{t}'" for t in sorted(set(qterms))) + ")"


def snippet_cols(qterms: list[str], window: int = 12,
                 tokens_expr: str = "tk") -> tuple[Column, Column]:
    """(snippet, n_hit) Spark Columns over a let-bound tokens column
    named ``tokens_expr`` (array<string>) — pure Catalyst expressions,
    the window scan stays inside codegen."""
    w = max(int(window), 1)
    qa = _qarr_sql(qterms)
    tk = tokens_expr
    scores = (f"transform(sequence(1, greatest(size({tk}) - {w} + 1, 1)), "
              f"i -> size(array_distinct(array_intersect("
              f"slice({tk}, i, {w}), {qa}))))")
    pos = f"array_position({scores}, array_max({scores}))"
    snippet = F.expr(
        f"array_join(slice({tk}, CAST({pos} AS INT), {w}), ' ')")
    n_hit = F.expr(f"array_max({scores})").cast("int")
    return snippet, n_hit


def snippet_sql(qterms: list[str], window: int = 12,
                tokens_expr: str = "tk") -> tuple[str, str]:
    """(snippet_sql, n_hit_sql) DuckDB twins of snippet_cols — same
    rule, same tie-break (list_position returns the FIRST max)."""
    w = max(int(window), 1)
    qa = "[" + ", ".join(f"'{t}'" for t in sorted(set(qterms))) + "]"
    tk = tokens_expr
    scores = (f"list_transform(range(1, greatest(len({tk}) - {w} + 1, 1) + 1), "
              f"i -> len(list_distinct(list_intersect("
              f"{tk}[i:i + {w} - 1], {qa}))))")
    pos = f"list_position({scores}, list_max({scores}))"
    # NULL text → NULL token list in SQL; the kernel's contract is
    # ('', 0) (tokenize_py(None) == []) — coalesce to match
    snippet = (f"coalesce(array_to_string("
               f"{tk}[({pos}):({pos}) + {w} - 1], ' '), '')")
    n_hit = f"coalesce(list_max({scores}), 0)::INT"
    return snippet, n_hit
