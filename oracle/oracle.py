"""Pure-Python reference oracle: dict-based inverted index + exact BM25.

The independent-oracle pattern mirrors the reference's randomized tests,
which build the expected aggregation in plain Java and compare
(src/test/java/.../geogrid/GeoHexGridAggregatorTests.java:94-120,
GeoHexAggregationIT.java:73-75). This oracle never touches Spark; the
engine's results must be rank- AND score-identical to it.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from geospatial_spark.functions.bm25 import term_score
from geospatial_spark.functions.tokenize import tokenize_py


@dataclass
class OracleIndex:
    # term -> {doc_id: tf}
    postings: dict[str, dict[str, int]] = field(default_factory=dict)
    doclens: dict[str, int] = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0

    @classmethod
    def build(cls, rows: list[tuple[str, int, str]]) -> "OracleIndex":
        """rows: (conv_id, turn_idx, text)."""
        idx = cls()
        total = 0
        for conv_id, turn_idx, text in rows:
            doc_id = f"{conv_id}:{turn_idx}"
            toks = tokenize_py(text)
            idx.doclens[doc_id] = len(toks)
            total += len(toks)
            for term, tf in Counter(toks).items():
                idx.postings.setdefault(term, {})[doc_id] = tf
        idx.n_docs = len(idx.doclens)
        idx.avgdl = (total / idx.n_docs) if idx.n_docs else 0.0
        return idx

    @staticmethod
    def doc_sort_key(doc_id: str) -> tuple[str, int]:
        """Tie-break contract (FIXTURES.md §3): ascending
        (conv_id, turn_idx). doc_id = conv_id ':' turn_idx, conv_id may
        itself contain ':' so split at the LAST colon."""
        conv, _, turn = doc_id.rpartition(":")
        return (conv, int(turn))

    def search_phrase(self, rows: list[tuple[str, int, str]], phrase: str,
                      k: int = 10) -> list[tuple[str, float, int]]:
        """Exact-phrase reference: (doc_id, score, phrase_tf) for docs
        whose kept token stream contains the phrase's tokens
        consecutively; score = sum of the phrase's DISTINCT terms' BM25
        contributions (the engine contract, operators/phrase.py).
        rows must be the same rows the index was built from."""
        slots = tokenize_py(phrase)
        if not slots:
            return []
        hits = []
        for conv_id, turn_idx, text in rows:
            toks = tokenize_py(text)
            m = sum(1 for s in range(len(toks) - len(slots) + 1)
                    if toks[s: s + len(slots)] == slots)
            if not m:
                continue
            doc_id = f"{conv_id}:{turn_idx}"
            score = 0.0
            for t in sorted(set(slots)):
                plist = self.postings.get(t, {})
                score += term_score(plist.get(doc_id, 0), self.doclens[doc_id],
                                    self.avgdl, len(plist), self.n_docs)
            hits.append((doc_id, score, m))
        hits.sort(key=lambda h: (-h[1], self.doc_sort_key(h[0])))
        return hits[:k]

    def search_phrase_prefix(self, rows: list[tuple[str, int, str]],
                             query: str, k: int = 10,
                             max_expansions: int = 64
                             ) -> list[tuple[str, float]]:
        """match_phrase_prefix reference: the trailing token is a term
        prefix expanded under the pinned cap (highest-df, ties
        term-asc); a doc's score is the MAX over matching variants of
        the variant's phrase score (the engine contract,
        operators/phrase.phrase_prefix_match_shard)."""
        from geospatial_spark.operators.expand import pick_top_py

        toks = tokenize_py(query)
        if not toks:
            return []
        fixed, pfx = toks[:-1], toks[-1]
        dfs = {t: len(p) for t, p in self.postings.items()
               if t.startswith(pfx)}
        exp = pick_top_py(dfs, max_expansions)
        best: dict[str, float] = {}
        for e in exp:
            variant = " ".join(fixed + [e])
            for doc_id, score, _m in self.search_phrase(
                    rows, variant, k=len(rows) + 1):
                if doc_id not in best or score > best[doc_id]:
                    best[doc_id] = score
        hits = sorted(best.items(),
                      key=lambda h: (-h[1], self.doc_sort_key(h[0])))
        return hits[:k]

    def search_near(self, rows: list[tuple[str, int, str]], query: str,
                    slop: int, k: int = 10) -> list[tuple[str, float, int]]:
        """Proximity reference: (doc_id, score, min_span) for docs where
        some position window of width ≤ slop holds ALL distinct query
        terms; brute-force over position tuples (independent of the
        engine's two-pointer algorithm)."""
        from itertools import product

        terms = sorted(set(tokenize_py(query)))
        if not terms:
            return []
        hits = []
        for conv_id, turn_idx, text in rows:
            toks = tokenize_py(text)
            plists = [[i for i, x in enumerate(toks) if x == t] for t in terms]
            if any(not pl for pl in plists):
                continue
            best = min(max(combo) - min(combo) for combo in product(*plists))
            if best > slop:
                continue
            doc_id = f"{conv_id}:{turn_idx}"
            score = 0.0
            for t in terms:
                plist = self.postings.get(t, {})
                score += term_score(plist.get(doc_id, 0), self.doclens[doc_id],
                                    self.avgdl, len(plist), self.n_docs)
            hits.append((doc_id, score, best))
        hits.sort(key=lambda h: (-h[1], self.doc_sort_key(h[0])))
        return hits[:k]

    def search(self, query: str, k: int = 10) -> list[tuple[str, float]]:
        """Exact BM25 top-k; unique query terms (no idf double-count);
        per-doc score = sum over terms in canonical sorted term order
        (float64 summation order pinned on oracle and engine);
        tie-break score desc then (conv_id, turn_idx) asc."""
        terms = sorted(set(tokenize_py(query)))
        scores: dict[str, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            df_t = len(plist)
            for doc_id, tf in plist.items():
                s = term_score(tf, self.doclens[doc_id], self.avgdl, df_t, self.n_docs)
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        hits = sorted(scores.items(), key=lambda kv: (-kv[1], self.doc_sort_key(kv[0])))
        return hits[:k]
