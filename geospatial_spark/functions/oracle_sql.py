"""DuckDB oracle SQL builders for the driver correctness gate.

Each builder mirrors one engine operator, assembled from the SAME
tokenizer / BM25 SQL fragments the Spark side uses
(functions/tokenize.py, functions/bm25.py), so engine and oracle agree
by construction. Scores are rounded (ROUND_DP) on both sides because
the driver value-hashes results; ordering ties are broken by doc_id.
"""

from __future__ import annotations

from geospatial_spark.functions.bm25 import (idf_sql, quantize_dl_sql,
                                             score_sql)
from geospatial_spark.functions.tokenize import duckdb_tokens_sql, tokenize_py

ROUND_DP = 4          # emitted score precision (both engines)
ORDER_DP = 6          # ranking precision before doc_id tie-break


def _tok_ctes(table: str = "documents", id_col: str = "doc_id",
              text_col: str = "text") -> str:
    return f"""
docs AS (SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS toks FROM {table}),
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
stats AS (SELECT count(*) AS n, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
tf AS (SELECT term, doc_id, count(*)::INT AS tf FROM tok GROUP BY 1, 2)
""".strip()


def _qterms_values(query: str) -> str:
    terms = sorted(set(tokenize_py(query)))
    if not terms:
        return "SELECT NULL::VARCHAR AS term WHERE 1=0"
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"SELECT * FROM (VALUES {vals}) AS q(term)"


def bm25_topk_sql(query: str, k: int = 10, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text",
                  quantized: bool = False) -> str:
    """quantized=True scores with log-quantized doc lengths — the same
    quantizer the engine's opt-in quantized mode applies
    (functions/bm25.quantize_dl / quantize_dl_sql), pinned here so both
    sides agree to the bit. avgdl stays exact (corpus stat, not a
    per-doc norm)."""
    dl_expr = quantize_dl_sql("dl.dl") if quantized else "dl.dl"
    per_term = score_sql("tf.tf", dl_expr, "s.avgdl", "dft.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
qt AS ({_qterms_values(query)}),
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
LIMIT {k}
""".strip()


def bm25_topk_page_sql(query: str, k: int = 10, offset: int = 0,
                       table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Cursor-pagination oracle (IndexSearcher.search_after): the page
    at ``offset`` of the full ranking. The page is CUT under the
    engine's pagination contract — rounded score desc, then doc_id
    STRING asc (catalog doc_ids are '<n>:0', whose string order equals
    VARCHAR(n) order) — and EMITTED under the gate contract (rounded
    desc, bigint doc_id asc)."""
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
qt AS ({_qterms_values(query)}),
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
page AS (
  SELECT doc_id, raw FROM scored
  ORDER BY round(raw, {ORDER_DP}) DESC, CAST(doc_id AS VARCHAR) ASC
  LIMIT {int(k)} OFFSET {int(offset)}
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score FROM page
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
""".strip()


def bm25_expansion_sql(term_pred_sql: str, k: int = 10,
                       max_expansions: int = 64,
                       table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Prefix/fuzzy rewrite oracle (plans/query.search_prefix_df /
    search_fuzzy_df): the expansion set is the ``max_expansions``
    highest-df dictionary terms matching ``term_pred_sql`` (a predicate
    over column ``term``), ties broken term-asc — then scored as the
    plain BM25 should-OR (each expanded term keeps its own idf)."""
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
vocab AS (SELECT term, count(*)::INT AS df FROM tf GROUP BY 1),
qt AS (
  SELECT term FROM vocab WHERE {term_pred_sql}
  ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}
),
dft AS (SELECT term, df FROM vocab WHERE term IN (SELECT term FROM qt)),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
LIMIT {k}
""".strip()


def bm25_phrase_sql(phrase: str, k: int = 10, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    """Exact-phrase top-k: docs whose KEPT token stream contains the
    phrase's tokens consecutively, scored as the sum of the phrase's
    distinct terms' BM25 contributions (phrase-as-filter,
    terms-as-scorer — the engine contract in operators/phrase.py).
    Adjacency is checked on the space-joined token string with space
    sentinels on both ends: tokens are [a-z0-9]+ runs, so the join
    separator can never occur inside a token."""
    slots = tokenize_py(phrase)
    if not slots:
        return f"SELECT NULL::BIGINT AS doc_id, NULL::DOUBLE AS score WHERE 1=0"
    needle = " " + " ".join(slots) + " "
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
phrase_docs AS (
  SELECT doc_id FROM docs
  WHERE position('{needle}' IN ' ' || array_to_string(toks, ' ') || ' ') > 0
),
qt AS ({_qterms_values(phrase)}),
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.doc_id IN (SELECT doc_id FROM phrase_docs)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
LIMIT {k}
""".strip()


def bm25_phrase_prefix_sql(query: str, k: int = 10,
                           max_expansions: int = 64,
                           table: str = "documents", id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """match_phrase_prefix oracle (plans/query.search_phrase_prefix_df):
    the trailing token is a term prefix expanded under the pinned cap
    (highest-df ``max_expansions`` dictionary terms, ties term-asc); a
    doc matches variant e iff its kept token stream contains the fixed
    tokens followed immediately by e, scores per variant as the sum of
    the variant's distinct terms' BM25 contributions, and per doc as
    the MAX over matching variants. Adjacency via the space-joined
    token string (the bm25_phrase_sql trick)."""
    toks = tokenize_py(query)
    if not toks:
        return "SELECT NULL::BIGINT AS doc_id, NULL::DOUBLE AS score WHERE 1=0"
    fixed = toks[:-1]
    pfx = toks[-1]
    fixed_needle = " " + " ".join(fixed) + " " if fixed else " "
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "vc.df", "s.n")
    if fixed:
        vals = ", ".join(f"('{t}')" for t in sorted(set(fixed)))
        vterms = f"""
  SELECT DISTINCT v.doc_id, v.eterm, f.term
  FROM variants v CROSS JOIN (VALUES {vals}) AS f(term)
  UNION
  SELECT DISTINCT doc_id, eterm, eterm AS term FROM variants
""".strip()
    else:
        vterms = "SELECT DISTINCT doc_id, eterm, eterm AS term FROM variants"
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
vocab AS (SELECT term, count(*)::INT AS df FROM tf GROUP BY 1),
exp AS (
  SELECT term FROM vocab WHERE term LIKE '{pfx}%'
  ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}
),
joined AS (
  SELECT doc_id, ' ' || array_to_string(toks, ' ') || ' ' AS s FROM docs
),
variants AS (
  SELECT j.doc_id, e.term AS eterm
  FROM joined j CROSS JOIN exp e
  WHERE position('{fixed_needle}' || e.term || ' ' IN j.s) > 0
),
vterms AS ({vterms}),
scored_v AS (
  SELECT vt.doc_id, vt.eterm, SUM({per_term}) AS raw
  FROM vterms vt
  JOIN tf ON tf.doc_id = vt.doc_id AND tf.term = vt.term
  JOIN vocab vc ON vc.term = vt.term
  JOIN dl ON dl.doc_id = vt.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
scored AS (SELECT doc_id, MAX(raw) AS raw FROM scored_v GROUP BY 1)
SELECT doc_id, round(raw, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
LIMIT {k}
""".strip()


def bm25_phrase_scored_sql(phrase: str, k: int = 10,
                           table: str = "documents",
                           id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """Phrase-as-term oracle (Lucene PhraseQuery semantics, mirroring
    IndexSearcher.search_phrase_scored): the phrase scores as ONE
    synthetic term with tf = occurrence-start count (overlaps included,
    counted on the kept token array, exactly the engine's position
    intersection) and df = number of matching docs."""
    slots = tokenize_py(phrase)
    if not slots:
        return "SELECT NULL::BIGINT AS doc_id, NULL::DOUBLE AS score WHERE 1=0"
    m = len(slots)
    cond = " AND ".join(f"toks[i + {j}] = '{t}'" for j, t in enumerate(slots))
    per = score_sql("p.ptf", "dl.dl", "s.avgdl", "pd.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
ph AS (
  SELECT doc_id,
         len(list_filter(range(1, len(toks) - {m} + 2), i -> {cond})) AS ptf
  FROM docs
),
pdocs AS (SELECT doc_id, ptf FROM ph WHERE ptf > 0),
pd AS (SELECT count(*)::INT AS df FROM pdocs),
scored AS (
  SELECT p.doc_id, {per} AS raw
  FROM pdocs p JOIN dl USING (doc_id) CROSS JOIN stats s CROSS JOIN pd
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
LIMIT {k}
""".strip()


def bm25_near_sql(query: str, slop: int, k: int = 10,
                  table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Two-term proximity top-k: docs where min |pos(t1) − pos(t2)| ≤
    slop over the kept token stream, scored as the two terms' BM25 sum
    (the engine contract, operators/phrase.near_match_shard). The SQL
    form is pinned to exactly two distinct terms (the k-term engine
    generalization is oracle-tested in pure Python instead — a k-way
    lateral-unnest min-window in SQL buys nothing for the gate)."""
    terms = sorted(set(tokenize_py(query)))
    assert len(terms) == 2, "bm25_near_sql oracle covers 2-term queries"
    t1, t2 = terms
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
pos AS (
  SELECT doc_id,
         list_filter(range(1, len(toks) + 1), i -> toks[i] = '{t1}') AS p1,
         list_filter(range(1, len(toks) + 1), i -> toks[i] = '{t2}') AS p2
  FROM docs
),
near_docs AS (
  SELECT p.doc_id
  FROM pos p, unnest(p.p1) AS u1(a), unnest(p.p2) AS u2(b)
  GROUP BY p.doc_id
  HAVING min(abs(u1.a - u2.b)) <= {int(slop)}
),
qt AS ({_qterms_values(query)}),
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.doc_id IN (SELECT doc_id FROM near_docs)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
LIMIT {k}
""".strip()


def bm25_bool_sql(should: str = "", filter_q: str = "", must_not: str = "",
                  k: int = 10, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text",
                  meta_pred: str | None = None, msm: int = 1,
                  boosts: dict[str, float] | None = None) -> str:
    """Bool-query oracle mirroring IndexSearcher.search_bool: scored
    should-OR (a hit contains ≥ msm distinct should terms; msm=0 makes
    the should clause optional — filter context decides matching and
    present should terms only contribute score) ∩ filter-AND ∖
    must_not, hits score 0.0 in pure filter context.

    meta_pred: optional SQL predicate over the doc universe (alias `d`,
    e.g. "d.doc_id % 3 = 0") mirroring the engine's metadata-filter
    mask (operators/metafilter.py) — the catalog derives role/ts
    deterministically from doc_id, so the predicate is exact arithmetic
    on both sides. Scoring stats stay corpus-global, same as the
    engine (filter context does not change idf).

    boosts: per-should-term multipliers (Lucene clause boosts) —
    score = Σ per_term · boost, matching untouched, mirroring
    bool_match_shard(boosts=). Keys are tokenized like the engine."""
    bst: dict[str, float] = {}
    for key, w in (boosts or {}).items():
        for t in tokenize_py(str(key)):
            bst[t] = float(w)
    sh = sorted(set(tokenize_py(should)))
    fl = sorted(set(tokenize_py(filter_q)))
    mn = sorted(set(tokenize_py(must_not)))
    msm = int(msm)
    # no positive clause: pure-NOT (or match-all) over the doc universe

    def in_list(terms):
        return ", ".join(f"'{t}'" for t in terms)

    parts = []
    if meta_pred:
        parts.append(f"({meta_pred})")
    if fl:
        parts.append(
            f"(SELECT count(DISTINCT term) FROM tok t2 WHERE t2.doc_id = d.doc_id "
            f"AND t2.term IN ({in_list(fl)})) = {len(fl)}")
    if mn:
        parts.append(
            f"NOT EXISTS (SELECT 1 FROM tok t3 WHERE t3.doc_id = d.doc_id "
            f"AND t3.term IN ({in_list(mn)}))")
    if sh and msm > 0:
        parts.append(
            f"(SELECT count(DISTINCT term) FROM tok t4 WHERE t4.doc_id = d.doc_id "
            f"AND t4.term IN ({in_list(sh)})) >= {msm}")
    where = " AND ".join(parts) or "TRUE"

    if sh:
        per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
        if any(bst.get(t, 1.0) != 1.0 for t in sh):
            whens = " ".join(
                f"WHEN '{t}' THEN {bst[t]!r}" for t in sh
                if bst.get(t, 1.0) != 1.0)
            per_term = (f"({per_term}) * (CASE tf.term {whens} "
                        f"ELSE 1.0 END)")
        return f"""
WITH {_tok_ctes(table, id_col, text_col)},
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN ({in_list(sh)}) GROUP BY 1),
hits AS (SELECT DISTINCT d.doc_id FROM dl d WHERE {where}),
sums AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN ({in_list(sh)})
  GROUP BY tf.doc_id
),
scored AS (
  SELECT h.doc_id, COALESCE(m.raw, 0.0) AS raw
  FROM hits h LEFT JOIN sums m USING (doc_id)
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC LIMIT {k}
""".strip()
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
hits AS (SELECT DISTINCT d.doc_id FROM dl d WHERE {where})
SELECT doc_id, CAST(0.0 AS DOUBLE) AS score FROM hits
ORDER BY doc_id ASC LIMIT {k}
""".strip()


def bm25_highlight_sql(query: str, k: int = 10, window: int = 12,
                       table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Highlighted top-k oracle (catalog _bm25_highlight): the BM25
    page joined to its docs' token lists, snippet/n_hit from the SAME
    best-window rule as the engine (operators/highlight.snippet_sql)."""
    from geospatial_spark.operators.highlight import snippet_sql

    sh = sorted(set(tokenize_py(query)))
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    in_sh = ", ".join(f"'{t}'" for t in sh)
    snippet, n_hit = snippet_sql(sh, window)
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN ({in_sh}) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN ({in_sh})
  GROUP BY tf.doc_id
),
top AS (
  SELECT doc_id, raw FROM scored
  ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC LIMIT {int(k)}
),
dtk AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tk
  FROM {table}
)
SELECT t.doc_id, round(t.raw, {ROUND_DP}) AS score,
       {snippet} AS snippet, {n_hit} AS n_hit
FROM top t JOIN dtk USING (doc_id)
ORDER BY round(t.raw, {ROUND_DP}) DESC, t.doc_id ASC
""".strip()


def bm25_explain_sql(query: str, table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    """Score-explanation oracle (IndexSearcher.explain / catalog
    _bm25_explain): the top-1 doc under the gate ordering, decomposed
    into one row per query term the doc contains — (doc_id, term, tf,
    dl, df, idf, contrib), where contrib is the term's BM25 summand and
    Σ contrib over the rows is exactly the doc's top-k score."""
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    idf_e = idf_sql("dft.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
qt AS ({_qterms_values(query)}),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
top1 AS (
  SELECT doc_id FROM scored
  ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC LIMIT 1
)
SELECT tf.doc_id, tf.term, tf.tf::BIGINT AS tf, dl.dl::BIGINT AS dl,
       dft.df,
       round({idf_e}, {ROUND_DP}) AS idf,
       round({per_term}, {ROUND_DP}) AS contrib
FROM tf JOIN top1 USING (doc_id) JOIN dft USING (term)
     JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
ORDER BY tf.term ASC
""".strip()


def hybrid_rrf_sql(query: str, query_vec_id: int, k: int = 10,
                   depth: int = 50, k0: int = 60,
                   table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """Hybrid RRF oracle (operators/hybrid.py): BM25 ranking over the
    text + exact-cosine ranking for the query vector (self excluded),
    both cut at ``depth`` under (rounded score desc, id asc), fused by
    Σ 1/(k0 + rank)."""
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
qt AS ({_qterms_values(query)}),
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id, row_number() OVER (
    ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC) AS rank
  FROM scored
),
{_VEC_CTE},
qv AS (SELECT ve, nrm FROM nv WHERE vec_id = {int(query_vec_id)}),
cosed AS (
  SELECT nv.vec_id AS doc_id,
    list_sum(list_transform(list_zip(qv.ve, nv.ve), p -> p[1] * p[2]))
      / (qv.nrm * nv.nrm) AS raw
  FROM nv, qv WHERE nv.vec_id != {int(query_vec_id)}
),
vec AS (
  SELECT doc_id, row_number() OVER (
    ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC) AS rank
  FROM cosed
),
contrib AS (
  SELECT doc_id, 1.0 / ({int(k0)} + rank) AS c FROM lex WHERE rank <= {int(depth)}
  UNION ALL
  SELECT doc_id, 1.0 / ({int(k0)} + rank) AS c FROM vec WHERE rank <= {int(depth)}
)
SELECT doc_id, round(SUM(c), {ROUND_DP}) AS rrf
FROM contrib GROUP BY 1
ORDER BY round(SUM(c), {ORDER_DP}) DESC, doc_id ASC
LIMIT {int(k)}
""".strip()


def bm25_synonyms_sql(groups: list[list[str]], k: int = 10,
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """SynonymQuery oracle (operators/scorer.bm25_topk_synonyms): each
    group scores as one pseudo-term — tf summed over members, df = max
    member df (the blended docFreq)."""
    pairs = [(t, i) for i, g in enumerate(groups) for t in sorted(set(g))]
    vals = ", ".join(f"('{t}', {i})" for t, i in pairs)
    per_group = score_sql("gtf.tf", "gtf.dl", "s.avgdl", "gdf.df", "s.n")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
gm AS (SELECT * FROM (VALUES {vals}) AS g(term, gid)),
dft AS (
  SELECT term, count(*)::INT AS df FROM tf
  WHERE term IN (SELECT term FROM gm) GROUP BY 1
),
gdf AS (SELECT gm.gid, max(dft.df)::INT AS df FROM gm JOIN dft USING (term) GROUP BY 1),
gtf AS (
  SELECT gm.gid, tf.doc_id, SUM(tf.tf)::INT AS tf, max(dl.dl)::INT AS dl
  FROM tf JOIN gm USING (term) JOIN dl USING (doc_id)
  GROUP BY 1, 2
),
scored AS (
  SELECT gtf.doc_id, SUM({per_group}) AS raw
  FROM gtf JOIN gdf USING (gid) CROSS JOIN stats s
  GROUP BY gtf.doc_id
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
LIMIT {int(k)}
""".strip()


def funnel_sql(steps: list[str], table: str = "events") -> str:
    """Ordered-funnel oracle (operators/funnel.funnel_counts): step i
    counts users whose first step-i event is at-or-after their first
    qualifying step-(i−1) time (inclusive)."""
    ctes = []
    prev = None
    for i, step in enumerate(steps):
        name = f"s{i + 1}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id, min(ts) AS t FROM {table} "
                f"WHERE event_type = '{step}' GROUP BY 1)")
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(e.ts) AS t "
                f"FROM {table} e JOIN {prev} p ON p.user_id = e.user_id "
                f"WHERE e.event_type = '{step}' AND e.ts >= p.t "
                f"GROUP BY 1)")
        prev = name
    selects = " UNION ALL ".join(
        f"SELECT {i + 1}::INT AS step_idx, '{s}' AS step, "
        f"count(*)::BIGINT AS n_users FROM s{i + 1}"
        for i, s in enumerate(steps))
    return f"WITH {', '.join(ctes)} {selects} ORDER BY step_idx".strip()


def top_bigrams_sql(limit: int = 20, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    """Corpus-wide top bigrams (count desc, bigram asc) — the n-gram
    corpus-profiling pass a training-data pipeline runs."""
    toks = duckdb_tokens_sql(text_col)
    return f"""
WITH d AS (SELECT {toks} AS tk FROM {table}),
g AS (
  SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM d WHERE len(tk) >= 2
)
SELECT bigram, count(*)::BIGINT AS n
FROM g GROUP BY 1
ORDER BY n DESC, bigram ASC
LIMIT {int(limit)}
""".strip()


def tpch_q5ish_sql() -> str:
    """TPC-H Q5 analogue over the driver tables: revenue by nation for
    orders whose customer and line-supplier share the nation, one
    region, one order-date year."""
    return f"""
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), {ROUND_DP}) AS revenue,
       count(*)::BIGINT AS n_lines
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE s.s_nationkey = c.c_nationkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY revenue DESC, nation ASC
""".strip()


def percolate_counts_sql(queries: list[tuple[str, str]],
                         table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """Percolator oracle (operators/percolate.percolate_counts): per
    stored query, how many docs contain its FULL term set; queries
    matching nothing emit 0."""
    qrows = []
    nrows = []
    for qid, text in queries:
        terms = sorted(set(tokenize_py(text)))
        nrows.append(f"('{qid}', {len(terms)})")
        for t in terms:
            qrows.append(f"('{qid}', '{t}')")
    qvals = ", ".join(qrows) if qrows else "('x', 'x') LIMIT 0"
    nvals = ", ".join(nrows)
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
qt AS (SELECT * FROM (VALUES {qvals}) AS q(query_id, term)),
nq AS (SELECT * FROM (VALUES {nvals}) AS n(query_id, n_terms)),
hit AS (
  SELECT tf.doc_id, qt.query_id, count(*) AS nm
  FROM tf JOIN qt USING (term)
  GROUP BY 1, 2
),
matched AS (
  SELECT h.query_id, count(*)::BIGINT AS n
  FROM hit h JOIN nq USING (query_id)
  WHERE h.nm = nq.n_terms
  GROUP BY 1
)
SELECT nq.query_id, COALESCE(matched.n, 0)::BIGINT AS n_matches
FROM nq LEFT JOIN matched USING (query_id)
ORDER BY nq.query_id
""".strip()


def bm25_rescore_sql(query: str, rescore_query: str, k: int = 10,
                     window: int = 50, query_weight: float = 1.0,
                     rescore_weight: float = 1.0,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Rescore-window oracle (IndexSearcher.search_rescored): window =
    top ``window`` of the base ranking under (rounded score desc,
    engine doc_id string asc — stated here as CAST||':0' so the cut is
    bit-identical to the engine's '<n>:0' ids), then
    score' = qw·base + rw·COALESCE(secondary, 0) over the window, top-k
    under the same ordering, emitted under the gate contract."""
    per1 = score_sql("tf.tf", "dl.dl", "s.avgdl", "d1.df", "s.n")
    per2 = score_sql("tf.tf", "dl.dl", "s.avgdl", "d2.df", "s.n")
    sid = "CAST(doc_id AS VARCHAR) || ':0'"
    qw, rw = float(query_weight), float(rescore_weight)
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
q1 AS ({_qterms_values(query)}),
q2 AS ({_qterms_values(rescore_query)}),
d1 AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN (SELECT term FROM q1) GROUP BY 1),
d2 AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN (SELECT term FROM q2) GROUP BY 1),
s1 AS (
  SELECT tf.doc_id, SUM({per1}) AS raw
  FROM tf JOIN d1 USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
s2 AS (
  SELECT tf.doc_id, SUM({per2}) AS raw
  FROM tf JOIN d2 USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
win AS (
  SELECT doc_id, raw FROM s1
  ORDER BY round(raw, {ORDER_DP}) DESC, {sid} ASC LIMIT {int(window)}
),
comb AS (
  SELECT w.doc_id, {qw!r} * w.raw + {rw!r} * COALESCE(s2.raw, 0.0) AS raw
  FROM win w LEFT JOIN s2 ON s2.doc_id = w.doc_id
),
page AS (
  SELECT doc_id, raw FROM comb
  ORDER BY round(raw, {ORDER_DP}) DESC, {sid} ASC LIMIT {int(k)}
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score FROM page
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
""".strip()


def match_stats_sql(should: str, filter_q: str = "", must_not: str = "",
                    epoch_s: int = 1_767_225_600,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Match-set stats oracle (IndexSearcher.match_stats_df): one row
    (n_matched, sum_dl, min_ts_us, max_ts_us) over the bool match set;
    ts derives from doc_id arithmetic (the catalog index's pinned
    ts = epoch + doc_id minutes)."""
    sh = sorted(set(tokenize_py(should)))
    fl = sorted(set(tokenize_py(filter_q)))
    mn = sorted(set(tokenize_py(must_not)))
    preds = []
    if sh:
        in_sh = ", ".join(f"'{t}'" for t in sh)
        preds.append(f"doc_id IN (SELECT doc_id FROM tf WHERE term IN ({in_sh}))")
    if fl:
        in_fl = ", ".join(f"'{t}'" for t in fl)
        preds.append(f"doc_id IN (SELECT doc_id FROM tf WHERE term IN ({in_fl}) "
                     f"GROUP BY doc_id HAVING count(*) = {len(fl)})")
    if mn:
        in_mn = ", ".join(f"'{t}'" for t in mn)
        preds.append(f"doc_id NOT IN (SELECT doc_id FROM tf WHERE term IN ({in_mn}))")
    where = " AND ".join(preds) if preds else "TRUE"
    ts = f"({epoch_s}::BIGINT + doc_id::BIGINT * 60) * 1000000"
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
m AS (SELECT doc_id FROM dl WHERE {where})
SELECT count(*)::BIGINT AS n_matched,
       sum(dl.dl)::BIGINT AS sum_dl,
       min({ts})::BIGINT AS min_ts_us,
       max({ts})::BIGINT AS max_ts_us
FROM m JOIN dl USING (doc_id)
""".strip()


def significant_terms_sql(should: str, filter_q: str = "", size: int = 10,
                          min_fg: int = 3, table: str = "documents",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """Significant-terms oracle (operators/postings.significant_terms):
    match set = docs with ANY should term AND ALL filter terms;
    lift = (fg/|M|)/(bg/N), min_fg noise floor, top size by
    (lift rounded to ORDER_DP desc, term asc)."""
    sh = sorted(set(tokenize_py(should)))
    fl = sorted(set(tokenize_py(filter_q)))
    in_sh = ", ".join(f"'{t}'" for t in sh)
    fl_pred = ""
    if fl:
        in_fl = ", ".join(f"'{t}'" for t in fl)
        fl_pred = (f" AND doc_id IN (SELECT doc_id FROM tf "
                   f"WHERE term IN ({in_fl}) GROUP BY doc_id "
                   f"HAVING count(*) = {len(fl)})")
    lift = "(fg.fg::DOUBLE / mc.c) / (bg.bg::DOUBLE / s.n)"
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({in_sh}){fl_pred}),
mc AS (SELECT count(*)::DOUBLE AS c FROM m),
fg AS (
  SELECT term, count(*)::BIGINT AS fg FROM tf JOIN m USING (doc_id)
  GROUP BY 1 HAVING count(*) >= {int(min_fg)}
),
bg AS (SELECT term, count(*)::BIGINT AS bg FROM tf GROUP BY 1)
SELECT fg.term, fg.fg, bg.bg, round({lift}, {ROUND_DP}) AS lift
FROM fg JOIN bg USING (term) CROSS JOIN mc CROSS JOIN stats s
ORDER BY round({lift}, {ORDER_DP}) DESC, fg.term ASC
LIMIT {int(size)}
""".strip()


def complete_sql(prefix: str, size: int = 10, table: str = "documents",
                 id_col: str = "doc_id", text_col: str = "text") -> str:
    """Completion-suggester oracle (IndexSearcher.complete): vocabulary
    terms with the prefix, df desc / term asc, top size."""
    p = prefix.lower().replace("'", "''")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
SELECT term, df FROM vocab
WHERE term LIKE '{p}%'
ORDER BY df DESC, term ASC
LIMIT {int(size)}
""".strip()


def suggest_sql(term: str, size: int = 5, max_edits: int = 2,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    """Term-suggester oracle (IndexSearcher.suggest): vocabulary terms
    within max_edits Levenshtein of the input (input excluded), ranked
    (distance asc, df desc, term asc)."""
    t = term.lower().replace("'", "''")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
SELECT term, df, levenshtein(term, '{t}')::BIGINT AS distance
FROM vocab
WHERE term != '{t}'
  AND abs(length(term) - {len(term)}) <= {int(max_edits)}
  AND levenshtein(term, '{t}') <= {int(max_edits)}
ORDER BY distance ASC, df DESC, term ASC
LIMIT {int(size)}
""".strip()


def bm25_recency_sql(query: str, k: int = 10,
                     half_life_s: float = 604_800.0,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Recency-decay oracle (IndexSearcher.search_decayed): the catalog
    index derives ts = META_EPOCH + doc_id minutes and the decay origin
    is the newest doc's ts, so the multiplier is pure doc_id arithmetic:
    0.5^((max_id − doc_id)·60 / half_life). The age product and the
    division are exact in doubles (integer-valued < 2^53), so both
    engines feed the same exponent to pow."""
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    mult = (f"power(0.5, ((SELECT max({id_col}) FROM {table}) - "
            f"scored.doc_id) * 60.0 / {float(half_life_s)!r})")
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
qt AS ({_qterms_values(query)}),
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw * {mult}, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw * {mult}, {ORDER_DP}) DESC, doc_id ASC
LIMIT {int(k)}
""".strip()


def bm25_mlt_sql(seed_query: str, k: int = 10, max_query_terms: int = 25,
                 min_term_freq: int = 1, min_doc_freq: int = 2,
                 table: str = "documents", id_col: str = "doc_id",
                 text_col: str = "text") -> str:
    """more_like_this oracle (IndexSearcher.more_like_this): the source
    doc is the gate-contract top-1 of ``seed_query``; its terms with
    tf ≥ min_term_freq and corpus df ≥ min_doc_freq rank by tf·idf
    ROUNDED to ORDER_DP (ties term-asc — the pinned selection contract,
    operators/expand.select_mlt_terms), the top max_query_terms score
    as a plain BM25 should-OR, and the source doc itself is excluded."""
    seed_score = score_sql("tf.tf", "dl.dl", "s.avgdl", "sdft.df", "s.n")
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    sel = f"round(st.tf * {idf_sql('v.df', 's.n')}, {ORDER_DP})"
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
seed AS ({_qterms_values(seed_query)}),
sdft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM seed) GROUP BY 1),
sscored AS (
  SELECT tf.doc_id, SUM({seed_score}) AS raw
  FROM tf JOIN sdft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
src AS (SELECT doc_id FROM sscored ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC LIMIT 1),
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
qt AS (
  SELECT st.term
  FROM tf st JOIN src USING (doc_id) JOIN vocab v ON v.term = st.term
  CROSS JOIN stats s
  WHERE st.tf >= {int(min_term_freq)} AND v.df >= {int(min_doc_freq)}
  ORDER BY {sel} DESC, st.term ASC
  LIMIT {int(max_query_terms)}
),
dft AS (SELECT term, df FROM vocab WHERE term IN (SELECT term FROM qt)),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.doc_id != (SELECT doc_id FROM src)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw, {ROUND_DP}) AS score
FROM scored
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC
LIMIT {int(k)}
""".strip()


def bm25_collapse_sql(should: str, field_expr: str, k: int = 10,
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """Field-collapse oracle (IndexSearcher.search_collapsed): best hit
    per value of ``field_expr`` (SQL over column doc_id — the catalog
    index derives role deterministically from doc_id), top-k values.
    Per-value best under (round(raw, ORDER_DP) DESC, doc_id STRING asc)
    — the engine's '<n>:0' ids make string order ≡ VARCHAR(n) order —
    emitted under the gate contract (bigint doc_id tie-break)."""
    sh = sorted(set(tokenize_py(should)))
    per_term = score_sql("tf.tf", "dl.dl", "s.avgdl", "dft.df", "s.n")
    in_sh = ", ".join(f"'{t}'" for t in sh)
    return f"""
WITH {_tok_ctes(table, id_col, text_col)},
dft AS (SELECT term, count(*)::INT AS df FROM tf WHERE term IN ({in_sh}) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, SUM({per_term}) AS raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN ({in_sh})
  GROUP BY tf.doc_id
),
w AS (
  SELECT doc_id, raw, {field_expr} AS collapse,
         row_number() OVER (
           PARTITION BY {field_expr}
           ORDER BY round(raw, {ORDER_DP}) DESC,
                    CAST(doc_id AS VARCHAR) ASC) AS rn
  FROM scored
)
SELECT collapse, doc_id, round(raw, {ROUND_DP}) AS score
FROM w WHERE rn = 1
ORDER BY round(raw, {ORDER_DP}) DESC, doc_id ASC LIMIT {int(k)}
""".strip()


def bm25_facet_sql(should: str = "", filter_q: str = "",
                   must_not: str = "",
                   facet_expr: str = ("CASE d.doc_id % 3 WHEN 0 THEN "
                                      "'assistant' WHEN 1 THEN 'user' "
                                      "ELSE 'system' END"),
                   table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """Facet-aggregation oracle (IndexSearcher.facet_counts): count the
    FULL match set of a bool query per facet value — the facet value
    derives from doc_id by the same arithmetic the catalog's index
    derives its role metadata with."""
    sh = sorted(set(tokenize_py(should)))
    fl = sorted(set(tokenize_py(filter_q)))
    mn = sorted(set(tokenize_py(must_not)))

    def in_list(terms):
        return ", ".join(f"'{t}'" for t in terms)

    parts = []
    if fl:
        parts.append(
            f"(SELECT count(DISTINCT term) FROM tok t2 WHERE t2.doc_id = d.doc_id "
            f"AND t2.term IN ({in_list(fl)})) = {len(fl)}")
    if mn:
        parts.append(
            f"NOT EXISTS (SELECT 1 FROM tok t3 WHERE t3.doc_id = d.doc_id "
            f"AND t3.term IN ({in_list(mn)}))")
    if sh:
        parts.append(
            f"EXISTS (SELECT 1 FROM tok t4 WHERE t4.doc_id = d.doc_id "
            f"AND t4.term IN ({in_list(sh)}))")
    where = " AND ".join(parts) or "TRUE"
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT {facet_expr} AS facet, count(*)::BIGINT AS n
FROM dl d WHERE {where}
GROUP BY 1
ORDER BY n DESC, facet ASC
""".strip()


def term_buckets_sql(limit: int = 50, table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    """Bucket agg analogue of geohex_grid: term → df, top-N by df."""
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT term, count(*)::BIGINT AS df, max(tf)::INT AS max_tf
FROM tf GROUP BY term
ORDER BY df DESC, term ASC LIMIT {limit}
""".strip()


def doclens_sql(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT doc_id, dl::INT AS dl FROM dl
""".strip()


def corpus_stats_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT n::BIGINT AS n_docs, round(avgdl, {ROUND_DP}) AS avgdl FROM stats
""".strip()


def postings_sql(terms: list[str], table: str = "documents", id_col: str = "doc_id",
                 text_col: str = "text") -> str:
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT term, doc_id, tf FROM tf
WHERE term IN (SELECT term FROM (VALUES {vals}) AS q(term))
""".strip()


def posting_intersection_sql(terms: list[str], table: str = "documents",
                             id_col: str = "doc_id", text_col: str = "text") -> str:
    uniq = sorted(set(terms))
    vals = ", ".join(f"('{t}')" for t in uniq)
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT doc_id FROM tf
WHERE term IN (SELECT term FROM (VALUES {vals}) AS q(term))
GROUP BY doc_id HAVING count(*) = {len(uniq)}
""".strip()


def posting_union_sql(terms: list[str], table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    uniq = sorted(set(terms))
    vals = ", ".join(f"('{t}')" for t in uniq)
    return f"""
WITH {_tok_ctes(table, id_col, text_col)}
SELECT DISTINCT doc_id FROM tf
WHERE term IN (SELECT term FROM (VALUES {vals}) AS q(term))
""".strip()


# ---------- text analysis (operators/analysis.py mirrors) ----------

_STOP_SQL = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
_BPE_RE_SQL = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _docs_cte(table: str = "documents", id_col: str = "doc_id",
              text_col: str = "text") -> str:
    return (f"docs AS (SELECT {id_col} AS doc_id, coalesce({text_col}, '') AS text, "
            f"{duckdb_tokens_sql(text_col)} AS toks FROM {table})")


def token_stats_sql(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    return f"""
WITH {_docs_cte(table, id_col, text_col)}
SELECT doc_id,
  len(list_filter(string_split_regex(text, '\\s+'), t -> len(t) >= 1))::INT AS n_ws_tokens,
  len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}'))::INT AS n_bpe_pieces,
  len(toks)::INT AS n_tokens,
  len(text)::INT AS n_chars
FROM docs
""".strip()


def quality_sql(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    return f"""
WITH {_docs_cte(table, id_col, text_col)},
f AS (
  SELECT doc_id,
    len(toks)::DOUBLE AS n_tok,
    len(list_filter(toks, t -> t IN {_STOP_SQL}))::DOUBLE AS n_stop,
    len(lower(text))::DOUBLE AS n_chars,
    len(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))::DOUBLE AS n_alnum,
    CASE WHEN len(toks) > 0
         THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks)
         ELSE 0.0 END AS mean_tok
  FROM docs
),
r AS (
  SELECT doc_id,
    CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stop_ratio,
    CASE WHEN n_chars > 0 THEN n_alnum / n_chars ELSE 0.0 END AS alnum_ratio,
    mean_tok,
    CASE WHEN n_tok >= 5 AND n_tok <= 400 THEN 1.0
         WHEN n_tok > 0 THEN 0.5 ELSE 0.0 END AS len_band,
    n_tok
  FROM f
)
SELECT doc_id,
  round(stop_ratio, {ROUND_DP}) AS stop_ratio,
  round(alnum_ratio, {ROUND_DP}) AS alnum_ratio,
  round(mean_tok, {ROUND_DP}) AS mean_token_len,
  round(len_band * (0.5 + 0.5 * least(stop_ratio * 10, 1.0)) * alnum_ratio,
        {ROUND_DP}) AS quality
FROM r
""".strip()


def langid_sql(table: str = "documents", id_col: str = "doc_id",
               text_col: str = "text") -> str:
    return f"""
WITH {_docs_cte(table, id_col, text_col)}
SELECT doc_id,
  CASE WHEN len(toks) > 0 AND
    len(list_filter(toks, t -> t IN {_STOP_SQL}))::DOUBLE / len(toks) >= 0.02
  THEN 'en' ELSE 'unk' END AS lang
FROM docs
""".strip()


def repetition_sql(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """Gopher-style repetition features (operators/analysis.py
    with_repetition). The oracle counts the top n-gram the relational
    way (unnest + GROUP BY + max); the engine's sorted run-scan must
    produce the same multiplicity."""

    def grams(m: int) -> str:
        parts = " || ' ' || ".join(f"tk[i + {j}]" for j in range(m))
        # range() end is exclusive: starts run 1 .. len - (m-1)
        return (f"list_transform(range(1, len(tk) + {2 - m}), "
                f"i -> {parts})")

    def top(m: int, name: str) -> str:
        return f"""
g{m} AS (
  SELECT doc_id, unnest({grams(m)}) AS gram
  FROM d WHERE len(tk) >= {m}
),
{name} AS (
  SELECT doc_id, max(c) AS top_c FROM (
    SELECT doc_id, gram, count(*) AS c FROM g{m} GROUP BY 1, 2
  ) GROUP BY 1
)""".strip()

    toks = duckdb_tokens_sql(text_col)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {toks} AS tk FROM {table}
),
{top(2, "t2")},
{top(3, "t3")}
SELECT d.doc_id,
  len(tk)::INT AS n_tokens,
  round(CASE WHEN len(tk) > 0
        THEN len(list_distinct(tk))::DOUBLE / len(tk) ELSE 0.0 END,
        {ROUND_DP}) AS distinct_ratio,
  round(CASE WHEN len(tk) >= 2
        THEN COALESCE(t2.top_c, 0)::DOUBLE / (len(tk) - 1) ELSE 0.0 END,
        {ROUND_DP}) AS top_bigram_frac,
  round(CASE WHEN len(tk) >= 3
        THEN COALESCE(t3.top_c, 0)::DOUBLE / (len(tk) - 2) ELSE 0.0 END,
        {ROUND_DP}) AS top_trigram_frac
FROM d LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
""".strip()


def fingerprint_sql(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    return f"""
WITH {_docs_cte(table, id_col, text_col)}
SELECT doc_id, md5(array_to_string(toks, ' ')) AS fingerprint FROM docs
""".strip()


# ---------- dedup (operators/dedup.py mirrors) ----------

def _shingles_cte(table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Distinct 3-token shingles per doc (DuckDB lists are 1-indexed)."""
    return f"""
{_docs_cte(table, id_col, text_col)},
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3
      THEN list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
      ELSE [] END AS sh
  FROM docs
)""".strip()


def dedup_exact_sql(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    return f"""
WITH {_docs_cte(table, id_col, text_col)},
fp AS (SELECT doc_id, md5(array_to_string(toks, ' ')) AS fingerprint FROM docs)
SELECT doc_id, fingerprint,
  count(*) OVER (PARTITION BY fingerprint) AS group_size,
  min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id
FROM fp
""".strip()


def _minhash_sig_exprs(n_seeds: int) -> str:
    return ",\n    ".join(
        f"list_min(list_transform(sh, s -> md5('{i}' || ':' || s))) AS sig_{i}"
        for i in range(n_seeds)
    )


def minhash_sigs_sql(n_seeds: int = 16, table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
WITH {_shingles_cte(table, id_col, text_col)}
SELECT doc_id,
    {_minhash_sig_exprs(n_seeds)}
FROM sh WHERE len(sh) > 0
""".strip()


def _bands_union_sql(n_seeds: int, n_bands: int) -> str:
    """Shared banding SQL (one SELECT per band over the sigs CTE) —
    single source for every LSH-based oracle."""
    rows = n_seeds // n_bands
    band_selects = []
    for b in range(n_bands):
        concat = " || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({concat}) AS bucket FROM sigs"
        )
    return "\nUNION ALL\n".join(band_selects)


def minhash_lsh_pairs_sql(n_seeds: int = 16, n_bands: int = 4,
                          table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    bands_union = _bands_union_sql(n_seeds, n_bands)
    return f"""
WITH {_shingles_cte(table, id_col, text_col)},
sigs AS (
  SELECT doc_id, {_minhash_sig_exprs(n_seeds)}
  FROM sh WHERE len(sh) > 0
),
bk AS ({bands_union})
SELECT l.doc_id AS a, r.doc_id AS b, count(*)::INT AS n_bands
FROM bk l JOIN bk r ON l.band = r.band AND l.bucket = r.bucket
WHERE l.doc_id < r.doc_id
GROUP BY 1, 2
""".strip()


def ngram_jaccard_sql(threshold: float = 0.5, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
WITH {_shingles_cte(table, id_col, text_col)},
nz AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
sizes AS (SELECT doc_id, len(sh)::BIGINT AS n_sh FROM nz),
ex AS (SELECT doc_id, unnest(sh) AS s FROM nz),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*)::BIGINT AS inter
  FROM ex l JOIN ex r ON l.s = r.s
  WHERE l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a, b, round(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter), {ROUND_DP}) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) >= {threshold}
""".strip()


def lsh_verified_dups_sql(threshold: float = 0.8, n_seeds: int = 16,
                          n_bands: int = 4, table: str = "documents",
                          id_col: str = "doc_id", text_col: str = "text") -> str:
    bands_union = _bands_union_sql(n_seeds, n_bands)
    return f"""
WITH {_shingles_cte(table, id_col, text_col)},
sigs AS (
  SELECT doc_id, {_minhash_sig_exprs(n_seeds)}
  FROM sh WHERE len(sh) > 0
),
bk AS ({bands_union}),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bk l JOIN bk r ON l.band = r.band AND l.bucket = r.bucket
  WHERE l.doc_id < r.doc_id
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE len(sh) > 0),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM ex GROUP BY 1),
inter AS (
  SELECT c.a, c.b, count(*)::BIGINT AS inter
  FROM cand c JOIN ex la ON la.doc_id = c.a JOIN ex rb
    ON rb.doc_id = c.b AND rb.s = la.s
  GROUP BY 1, 2
)
SELECT a, b, round(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter), {ROUND_DP}) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) >= {threshold}
""".strip()


def dup_groups_sql(threshold: float = 0.8, n_seeds: int = 16,
                   n_bands: int = 4, table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """Connected components over the LSH-verified near-dup graph via a
    recursive reachability closure (fine at gate scale; the engine uses
    min-label propagation over the same edge set). Returns
    (doc_id, canonical_id, group_size) for every doc."""
    verified = lsh_verified_dups_sql(threshold, n_seeds, n_bands,
                                     table, id_col, text_col)
    # reuse the verified-pairs query as a subquery edge list
    return f"""
WITH RECURSIVE
verified AS ({verified}),
edges AS (SELECT a AS s, b AS d FROM verified
          UNION SELECT b, a FROM verified),
allnodes AS (SELECT {id_col} AS doc_id FROM {table}),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM allnodes
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON e.s = reach.r
),
comp AS (SELECT node AS doc_id, min(r) AS canonical_id FROM reach GROUP BY 1),
sizes AS (SELECT canonical_id, count(*)::BIGINT AS group_size
          FROM comp GROUP BY 1)
SELECT c.doc_id, c.canonical_id, s.group_size
FROM comp c JOIN sizes s USING (canonical_id)
""".strip()


def keep_canonical_sql(threshold: float = 0.8, n_seeds: int = 16,
                       n_bands: int = 4, table: str = "documents",
                       id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Dedup-retention oracle (operators/dedup.keep_canonical): one
    kept doc per near-dup group, pinned (token count desc, doc_id
    asc)."""
    groups = dup_groups_sql(threshold, n_seeds, n_bands, table, id_col,
                            text_col)
    return f"""
WITH g AS ({groups}),
d AS (SELECT {id_col} AS doc_id,
             len({duckdb_tokens_sql(text_col)}) AS dl
      FROM {table})
SELECT doc_id, group_size FROM (
  SELECT g.doc_id, g.group_size,
         row_number() OVER (PARTITION BY g.canonical_id
                            ORDER BY d.dl DESC, g.doc_id ASC) AS rn
  FROM g JOIN d USING (doc_id)
) WHERE rn = 1
""".strip()


def simhash_sql(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    return f"""
WITH {_docs_cte(table, id_col, text_col)},
tok AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
h AS (SELECT doc_id, tf, ('0x' || substr(md5(tok), 1, 8))::UBIGINT::BIGINT AS h FROM tf),
bits AS (
  SELECT doc_id, b,
    sum(CASE WHEN (h >> b) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM h, (SELECT unnest(range(0, 32)) AS b)
  GROUP BY 1, 2
)
SELECT doc_id,
  sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
""".strip()


# ---------- embeddings (operators/similarity.py mirrors) ----------

def _vec_cte(id_max: int | None = None) -> str:
    where = f"WHERE vec_id < {id_max}" if id_max is not None else ""
    return f"""v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve FROM embeddings {where}
),
nv AS (
  SELECT vec_id, ve,
    sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm
  FROM v
)"""


_VEC_CTE = _vec_cte()


def embed_norm_sql() -> str:
    return f"""
WITH {_VEC_CTE}
SELECT vec_id, round(nrm, {ROUND_DP}) AS l2_norm FROM nv
""".strip()


def ann_topk_sql(query_ids: list[int], k: int = 10,
                 corpus_pred: str | None = None) -> str:
    """corpus_pred: optional SQL predicate over nv.vec_id restricting
    the SEARCHED corpus (filtered vector search — metadata-filtered
    retrieval); query vectors still come from the full table and
    scoring stats are per-pair, so the restriction is a pure
    candidate-set mask, same contract as the engine's filtered ANN."""
    ids = ", ".join(str(i) for i in query_ids)
    pred = f"AND ({corpus_pred})" if corpus_pred else ""
    return f"""
WITH {_VEC_CTE},
q AS (SELECT vec_id AS q, ve AS qv, nrm AS qn FROM nv WHERE vec_id IN ({ids})),
pairs AS (
  SELECT q.q, nv.vec_id,
    list_sum(list_transform(list_zip(q.qv, nv.ve), p -> p[1] * p[2])) / (q.qn * nv.nrm) AS raw
  FROM nv, q WHERE nv.vec_id != q.q {pred}
),
ranked AS (
  SELECT q, vec_id, raw,
    row_number() OVER (PARTITION BY q ORDER BY round(raw, {ORDER_DP}) DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT q, vec_id, round(raw, {ROUND_DP}) AS cos, rank::INT AS rank
FROM ranked WHERE rank <= {k}
""".strip()


def embed_lsh_verified_sql(threshold: float = 0.4, n_planes: int = 6,
                           n_tables: int = 3, seed: int = 42,
                           dim: int = 64) -> str:
    """Oracle for the at-scale embedding near-dup pipeline: the SAME
    deterministic hyperplanes the Spark operator uses (shared generator,
    embedded as literal lists), same sign-bucket strings, same
    candidate-union-distinct, exact cosine on candidates. The dot for
    the sign test folds in element order on both engines (Spark
    F.aggregate, DuckDB list_sum) so bucket bits agree bit-for-bit."""
    from geospatial_spark.operators.similarity import lsh_planes

    tables = []
    for t in range(n_tables):
        planes = lsh_planes(n_planes, seed + 1000 * t, dim)
        bits = []
        for i in range(n_planes):
            lit = "[" + ", ".join(repr(float(x)) for x in planes[i]) + "]"
            bits.append(
                "CASE WHEN list_sum(list_transform(list_zip(ve, "
                f"{lit}::DOUBLE[]), p -> p[1] * p[2])) >= 0 "
                "THEN '1' ELSE '0' END")
        bexpr = " || ".join(bits)
        tables.append(
            f"b{t} AS (SELECT vec_id, {bexpr} AS bucket FROM v)")
    cand_parts = " UNION ALL ".join(
        f"SELECT l.vec_id AS a, r.vec_id AS b FROM b{t} l JOIN b{t} r "
        "ON l.bucket = r.bucket AND l.vec_id < r.vec_id"
        for t in range(n_tables))
    return f"""
WITH {_VEC_CTE},
{", ".join(tables)},
cand AS (SELECT DISTINCT a, b FROM ({cand_parts})),
pairs AS (
  SELECT cand.a, cand.b,
    list_sum(list_transform(list_zip(va.ve, vb.ve), p -> p[1] * p[2])) / (va.nrm * vb.nrm) AS raw
  FROM cand JOIN nv va ON va.vec_id = cand.a JOIN nv vb ON vb.vec_id = cand.b
)
SELECT a, b, round(raw, {ROUND_DP}) AS cos FROM pairs WHERE raw >= {threshold}
""".strip()


def cosine_dup_pairs_sql(threshold: float = 0.98, id_max: int | None = None) -> str:
    return f"""
WITH {_vec_cte(id_max)},
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
    list_sum(list_transform(list_zip(a.ve, b.ve), p -> p[1] * p[2])) / (a.nrm * b.nrm) AS raw
  FROM nv a JOIN nv b ON a.vec_id < b.vec_id
)
SELECT a, b, round(raw, {ROUND_DP}) AS cos FROM pairs WHERE raw >= {threshold}
""".strip()


# ---------- relational / reference-op analogues ----------

def range_lookup_sql(tiers: list[tuple[float, float, str]]) -> str:
    """Broadcast containment-lookup oracle (the CIDR-lookup analogue,
    operators/enrich.range_lookup): each customer's acctbal resolved to
    the [lo, hi) tier containing it; misses keep NULL."""
    vals = ", ".join(f"({lo!r}, {hi!r}, '{t}')" for lo, hi, t in tiers)
    return f"""
WITH dim(lo, hi, tier) AS (VALUES {vals})
SELECT c.c_custkey AS c_custkey, d.tier AS tier
FROM customer c
LEFT JOIN dim d ON c.c_acctbal >= d.lo AND c.c_acctbal < d.hi
""".strip()


def enrich_region_stats_sql() -> str:
    """ip2geo enrichment-join analogue over the star schema."""
    return f"""
SELECT r.r_name AS region, count(*)::BIGINT AS n_events,
  round(sum(e.value), 2) AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
""".strip()


def multi_value_join_sql() -> str:
    """J3 analogue: per order, sorted distinct supplier list."""
    return """
SELECT l_orderkey AS order_id,
  array_to_string(list_sort(list(DISTINCT l_suppkey)), ',') AS suppliers
FROM lineitem WHERE l_orderkey < 1000
GROUP BY 1
""".strip()


def stats_by_source_sql() -> str:
    """A4 stats fan-out analogue: per-source corpus metrics."""
    return f"""
WITH {_docs_cte('documents')}
, d2 AS (SELECT d.doc_id, s.source, len(d.toks) AS n_tokens, len(d.text) AS n_chars
         FROM docs d JOIN documents s ON d.doc_id = s.doc_id)
SELECT source, count(*)::BIGINT AS n_docs,
  sum(n_tokens)::BIGINT AS total_tokens,
  round(avg(n_chars), {ROUND_DP}) AS avg_chars
FROM d2 GROUP BY source
""".strip()


def events_hourly_sql() -> str:
    return """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  count(*)::BIGINT AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""".strip()


def json_props_sql() -> str:
    return """
SELECT event_type, count(*)::BIGINT AS n,
  sum(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
  min(json_extract(props, '$.k')::INT)::INT AS min_k,
  max(json_extract(props, '$.k')::INT)::INT AS max_k
FROM events GROUP BY event_type
""".strip()


def tpch_q1_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(avg(l_quantity), 4) AS avg_qty,
  count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""".strip()


def tpch_q3ish_sql() -> str:
    return """
SELECT o.o_orderkey AS orderkey,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
  o.o_orderdate AS orderdate
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY 1, 3
ORDER BY revenue DESC, orderkey ASC
LIMIT 20
""".strip()


def window_top_orders_sql() -> str:
    return """
WITH r AS (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
    round(o_totalprice, 2) AS totalprice,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT custkey, orderkey, totalprice, rn::INT AS rn
FROM r WHERE rn <= 2 AND custkey < 200
""".strip()


def set_except_sql() -> str:
    return """
SELECT custkey FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders
  EXCEPT
  SELECT DISTINCT user_id AS custkey FROM events
) WHERE custkey < 500
""".strip()


def rollup_region_sql() -> str:
    return """
SELECT r.r_name AS region, n.n_name AS nation,
  count(*)::BIGINT AS n_customers, round(sum(c.c_acctbal), 2) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (region, nation)
""".strip()


def distinct_users_sql() -> str:
    return """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type
""".strip()


def tpch_q6_sql() -> str:
    return """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24
""".strip()


def sessionize_sql() -> str:
    return """
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
),
per_session AS (
  SELECT user_id, session_no, count(*)::BIGINT AS n_events
  FROM s GROUP BY 1, 2
)
SELECT user_id, count(*)::BIGINT AS n_sessions,
  max(n_events)::BIGINT AS max_session_events
FROM per_session GROUP BY user_id
""".strip()


def part_supplier_sql() -> str:
    return """
SELECT p.p_brand AS brand, count(*)::BIGINT AS n_items,
  round(sum(l.l_extendedprice), 2) AS sum_price,
  count(DISTINCT s.s_suppkey)::BIGINT AS n_suppliers
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1
""".strip()


def multimodal_features_sql(table: str = "documents", id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    """Oracle for the binary-payload feature kernel: payload is the
    utf-8 bytes of text; features are byte length, md5, first-4-bytes
    hex."""
    return f"""
SELECT {id_col} AS doc_id,
  octet_length(encode(coalesce({text_col}, '')))::INT AS n_bytes,
  md5(coalesce({text_col}, '')) AS content_md5,
  upper(substr(to_hex(encode(coalesce({text_col}, ''))), 1, 8)) AS head_hex
FROM {table}
""".strip()


# ---------- curation (operators/curation.py mirrors) ----------

def sample_mixture_sql(weights: dict[str, float], seed: str = "mix",
                       table: str = "documents", id_col: str = "doc_id",
                       source_col: str = "source") -> str:
    """Deterministic stratified sample: keep iff
    hash01(seed, id) < weight(source). Same md5-prefix hash as the
    engine (('0x' || substr(md5, 1, 8))::UBIGINT / 2^32)."""
    cases = " ".join(
        f"WHEN '{s}' THEN {float(f)!r}" for s, f in sorted(weights.items()))
    w = f"(CASE {source_col} {cases} ELSE 0.0 END)"
    u = (f"(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), "
         f"1, 8))::UBIGINT::DOUBLE / 4294967296.0)")
    return f"""
SELECT {id_col} AS doc_id, {source_col} AS source
FROM {table}
WHERE {u} < {w}
""".strip()


def contamination_screen_sql(probe_mod: int = 31,
                             table: str = "documents",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """Benchmark-contamination screen: per NON-probe doc, distinct
    shingles total vs distinct shingles shared with the probe set
    (docs with id % probe_mod == 0); contaminated ⇔ 2·shared ≥ total
    > 0 (integer arithmetic, engine-identical)."""
    return f"""
WITH {_shingles_cte(table, id_col, text_col)},
flat AS (SELECT doc_id, unnest(sh) AS s FROM sh),
probe AS (SELECT DISTINCT s FROM flat WHERE doc_id % {probe_mod} = 0),
corpus AS (SELECT doc_id, s FROM flat WHERE doc_id % {probe_mod} != 0),
totals AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM corpus GROUP BY 1),
shared AS (
  SELECT c.doc_id, count(*)::BIGINT AS n_shared
  FROM corpus c JOIN probe p USING (s) GROUP BY 1
)
SELECT d.{id_col} AS doc_id,
       coalesce(t.n_shingles, 0)::BIGINT AS n_shingles,
       coalesce(sh2.n_shared, 0)::BIGINT AS n_shared,
       (coalesce(t.n_shingles, 0) > 0
        AND coalesce(sh2.n_shared, 0) * 2 >= coalesce(t.n_shingles, 0))
         AS contaminated
FROM {table} d
LEFT JOIN totals t ON t.doc_id = d.{id_col}
LEFT JOIN shared sh2 ON sh2.doc_id = d.{id_col}
WHERE d.{id_col} % {probe_mod} != 0
""".strip()


def chunk_documents_sql(window: int = 64, stride: int = 48,
                        table: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """Overlapping token-window chunks; chunk_idx = start // stride
    (starts are exact multiples, so integer division is the index on
    both engines)."""
    return f"""
WITH {_docs_cte(table, id_col, text_col)}
SELECT doc_id,
       (s // {stride})::INT AS chunk_idx,
       array_to_string(toks[s + 1 : least(s + {window}, len(toks))], ' ')
         AS chunk_text,
       (least(s + {window}, len(toks)) - s)::INT AS chunk_tokens
FROM docs, unnest(range(0, len(toks), {stride})) AS u(s)
""".strip()


def embed_int8_sql(table: str = "embeddings",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> str:
    """Symmetric per-vector int8 quantization mirror: identical scale,
    identical ⌊x/scale + 0.5⌋ rounding, identical clip, digest of the
    comma-joined codes."""
    return f"""
WITH v AS (
  SELECT {id_col} AS vec_id,
         list_transform({vec_col}, x -> x::DOUBLE) AS ve
  FROM {table}
),
s AS (
  SELECT vec_id, ve,
         list_max(list_transform(ve, x -> abs(x))) / 127.0 AS sc
  FROM v
),
q AS (
  SELECT vec_id, sc,
         CASE WHEN sc > 0
           THEN list_transform(ve, x ->
                  greatest(-127, least(127,
                    CAST(floor(x / sc + 0.5) AS INT))))
           ELSE list_transform(ve, x -> 0) END AS qv
  FROM s
)
SELECT vec_id,
       round(sc, 6) AS scale,
       md5(array_to_string(qv, ',')) AS q_digest,
       list_sum(qv)::BIGINT AS q_sum,
       list_min(qv)::INT AS q_min,
       list_max(qv)::INT AS q_max
FROM q
""".strip()


def events_retention_sql(table: str = "events") -> str:
    """Cohort retention: users by first-active day × day offset."""
    return f"""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM {table}),
firstd AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY 1),
act AS (SELECT DISTINCT user_id, d FROM ev)
SELECT CAST(cohort AS VARCHAR) AS cohort_day,
       (d - cohort)::INT AS day_offset,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM act JOIN firstd USING (user_id)
GROUP BY 1, 2
""".strip()
