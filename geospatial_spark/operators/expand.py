"""Multi-term query expansion: prefix and fuzzy term queries.

Reference analogue: the query-builder surface that rewrites a single
user term into a dictionary-driven disjunction before scoring (the
plugin's query extension point, GeospatialPlugin.java:121-133; Lucene's
PrefixQuery / FuzzyQuery rewrite). The pinned semantics here:

  * expansion runs over the INDEX DICTIONARY (term, df), never the
    postings — the dictionary is the small side (vocab-sized);
  * the expansion set is deterministic: every matching term when the
    match count is within ``max_expansions``, else the
    ``max_expansions`` highest-df terms (ties broken by term asc) —
    Lucene's top-terms rewrite shape, with a pinned tie-break;
  * the rewritten query scores as a plain BM25 should-OR over the
    expanded terms (each term keeps its own idf) — unlike Lucene's
    default constant-score rewrite we keep full scoring, which is the
    pinned, oracle-checkable contract.

Scale: the dictionary scan is a distributed filter + bounded top-k;
``StartsWith`` pushes to the parquet dictionary scan as a data filter,
the Levenshtein band first prunes by length (|len(t) - len(q)| ≤
max_edits, an index-friendly range predicate) before the O(len²)
distance kernel runs JVM-side. The driver only ever materialises
``max_expansions`` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_EXPANSIONS = 64


def levenshtein_py(a: str, b: str) -> int:
    """Standard (unit-cost) Levenshtein — the same metric as Spark's
    ``F.levenshtein`` and DuckDB's ``levenshtein``, so all three tiers
    expand identically."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def pick_top_py(df_by_term: dict[str, int], max_expansions: int) -> list[str]:
    """The pinned cap: highest-df ``max_expansions`` terms, ties broken
    term-asc — identical to _top_terms' DataFrame form."""
    ranked = sorted(df_by_term.items(), key=lambda kv: (-kv[1], kv[0]))
    return sorted(t for t, _ in ranked[:int(max_expansions)])


def rank_suggestions(df_by_term: dict[str, int], input_term: str,
                     size: int) -> list[tuple[str, int, int]]:
    """Did-you-mean ranking (the term-suggester analogue), pinned:
    (edit distance asc, df desc, term asc), top ``size`` →
    [(term, df, distance)]. Candidates are assumed pre-filtered to the
    edit-distance band."""
    ranked = sorted((levenshtein_py(t, input_term), -int(df), t)
                    for t, df in df_by_term.items())
    return [(t, -negdf, d) for d, negdf, t in ranked[:int(size)]]


def select_mlt_terms(term_tf: dict[str, int], df_by_term: dict[str, int],
                     n_docs: int, max_query_terms: int = 25,
                     min_term_freq: int = 1,
                     min_doc_freq: int = 2) -> list[str]:
    """more_like_this term selection (the Lucene MoreLikeThis
    ``interestingTerms`` analogue): candidate terms of the source doc
    with tf ≥ min_term_freq and corpus df ≥ min_doc_freq, ranked by
    tf·idf — the selection score is ROUNDED to ORDER_DP before ranking
    (ties broken term-asc) so the engine and the DuckDB oracle cut the
    same top ``max_query_terms`` set even when two products differ by
    an ulp between ln implementations."""
    from geospatial_spark.functions.bm25 import idf
    from geospatial_spark.functions.oracle_sql import ORDER_DP

    scored = []
    for t, tf_v in term_tf.items():
        if tf_v < min_term_freq:
            continue
        d = df_by_term.get(t, 0)
        if d < min_doc_freq:
            continue
        scored.append((round(tf_v * idf(d, n_docs), ORDER_DP), t))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return sorted(t for _, t in scored[:int(max_query_terms)])


def _top_terms(matches: DataFrame, max_expansions: int) -> list[str]:
    """Deterministic bounded expansion: global df per term, then the
    max_expansions highest-df terms (df desc, term asc)."""
    rows = (
        matches.groupBy("term").agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(int(max_expansions))
        .collect()
    )
    return sorted(r["term"] for r in rows)


def expand_prefix(dict_df: DataFrame, prefix: str,
                  max_expansions: int = MAX_EXPANSIONS) -> list[str]:
    """Terms in the dictionary starting with ``prefix`` (already
    normalized/lowercase), highest-df ``max_expansions`` of them."""
    prefix = (prefix or "").lower()
    if not prefix:
        return []
    return _top_terms(
        dict_df.where(F.col("term").startswith(prefix)), max_expansions)


def wildcard_regex(pattern: str) -> str:
    """Anchored regex for a Lucene-style wildcard pattern: ``*`` = any
    run (including empty), ``?`` = exactly one char, everything else
    literal. The same compiled form drives all three tiers."""
    import re

    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    return "^" + "".join(parts) + "$"


def wildcard_literal_prefix(pattern: str) -> str:
    """The literal run before the first wildcard — the scan-pushdown
    pre-filter (Lucene's prefix-accelerated wildcard)."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


def expand_wildcard(dict_df: DataFrame, pattern: str,
                    max_expansions: int = MAX_EXPANSIONS) -> list[str]:
    """Terms matching a ``*``/``?`` wildcard pattern (WildcardQuery
    shape). A leading literal prefix pushes to the parquet dictionary
    scan as ``StartsWith``; the anchored regex runs JVM-side on the
    survivors."""
    pattern = (pattern or "").lower()
    if not pattern or pattern.strip("*?") == "":
        # all-wildcard patterns (match-everything) are rejected rather
        # than expanded — the cap would pick an arbitrary-feeling slice
        # of the whole vocabulary (Lucene guards these the same way)
        return []
    cand = dict_df
    pfx = wildcard_literal_prefix(pattern)
    if pfx:
        cand = cand.where(F.col("term").startswith(pfx))
    cand = cand.where(F.col("term").rlike(wildcard_regex(pattern)))
    return _top_terms(cand, max_expansions)


REGEX_META = set(".?*+{}[]()|\\^$")


def regexp_literal_prefix(pattern: str) -> str:
    """The literal run before the first regex metacharacter — the
    scan-pushdown pre-filter (the RegexpQuery analogue of
    wildcard_literal_prefix)."""
    for i, ch in enumerate(pattern):
        if ch in REGEX_META:
            return pattern[:i]
    return pattern


def regexp_guard(pattern: str) -> str:
    """Normalize + reject degenerate regexp patterns. Returns the
    lowercased pattern, or '' when the query must expand to nothing:
    empty input and the trivially-universal forms ('.*', '.+', '.?')
    are rejected the same way all-wildcard patterns are — the cap
    would otherwise pick an arbitrary-feeling slice of the whole
    vocabulary."""
    pattern = (pattern or "").lower()
    if not pattern or pattern in (".*", ".+", ".?"):
        return ""
    return pattern


def expand_regexp(dict_df: DataFrame, pattern: str,
                  max_expansions: int = MAX_EXPANSIONS) -> list[str]:
    """Terms matching an ANCHORED regex (Lucene RegexpQuery shape: the
    pattern must match the whole term). The pinned portable subset —
    literals, '.', quantifiers, character classes, groups, alternation
    — behaves identically in Java regex (Spark ``rlike``), RE2 (DuckDB
    ``regexp_full_match``) and Python ``re.fullmatch``, so all three
    tiers expand the same set; backreferences/lookaround are outside
    the contract. A leading literal run pushes to the dictionary scan
    as ``StartsWith``."""
    pattern = regexp_guard(pattern)
    if not pattern:
        return []
    cand = dict_df
    pfx = regexp_literal_prefix(pattern)
    if pfx:
        cand = cand.where(F.col("term").startswith(pfx))
    cand = cand.where(F.col("term").rlike("^(?:" + pattern + ")$"))
    return _top_terms(cand, max_expansions)


def expand_fuzzy(dict_df: DataFrame, term: str, max_edits: int = 1,
                 prefix_length: int = 0,
                 max_expansions: int = MAX_EXPANSIONS) -> list[str]:
    """Terms within ``max_edits`` Levenshtein edits of ``term``
    (FuzzyQuery shape). ``prefix_length`` pins an exact shared prefix
    (Lucene's cheap pre-filter); the length band prunes before the
    distance kernel."""
    term = (term or "").lower()
    if not term:
        return []
    cand = dict_df.where(
        F.abs(F.length("term") - F.lit(len(term))) <= int(max_edits))
    if prefix_length > 0:
        cand = cand.where(
            F.col("term").startswith(term[:int(prefix_length)]))
    cand = cand.where(F.levenshtein(F.col("term"), F.lit(term)) <= int(max_edits))
    return _top_terms(cand, max_expansions)
