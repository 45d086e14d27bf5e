#!/usr/bin/env python
"""Top-k query entry point (the _search analogue).

Usage:
  spark-submit --py-files geospatial_spark.zip cli/query.py \
      --index /path/index --query "deploy the spark job" [--k 10]

Prints one JSON line: {"query": ..., "hits": [{doc_id, score, rank}]}
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default="",
                    help="match query (scored OR); doubles as the bool "
                         "should clause when --filter/--must-not given")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--local", action="store_true",
                    help="serve without Spark (pyarrow row-group reads)")
    ap.add_argument("--phrase", action="store_true",
                    help="treat --query as an exact phrase")
    ap.add_argument("--phrase-scored", dest="phrase_scored",
                    action="store_true",
                    help="exact phrase scored AS A TERM (idf from the "
                         "phrase's df, tf = occurrence count)")
    ap.add_argument("--slop", type=int, default=None,
                    help="proximity: all query terms within a window "
                         "of this width")
    ap.add_argument("--phrase-prefix", dest="phrase_prefix",
                    action="store_true",
                    help="match_phrase_prefix: the query's last token "
                         "is a term prefix; docs must contain the fixed "
                         "tokens followed by any expansion")
    ap.add_argument("--prefix", action="store_true",
                    help="treat --query as a term prefix (bounded "
                         "dictionary expansion scored as a BM25 OR)")
    ap.add_argument("--fuzzy", action="store_true",
                    help="treat --query as a fuzzy term (Levenshtein "
                         "expansion, see --max-edits)")
    ap.add_argument("--wildcard", action="store_true",
                    help="treat --query as a */? wildcard pattern")
    ap.add_argument("--regexp", action="store_true",
                    help="treat --query as an anchored regex over "
                         "dictionary terms (must match the whole term)")
    ap.add_argument("--max-edits", dest="max_edits", type=int, default=1,
                    help="fuzzy: max Levenshtein edits (default 1)")
    ap.add_argument("--fuzzy-prefix-length", dest="fuzzy_prefix_length",
                    type=int, default=0,
                    help="fuzzy: exact shared prefix length (default 0)")
    ap.add_argument("--max-expansions", dest="max_expansions", type=int,
                    default=64,
                    help="prefix/fuzzy/wildcard: expansion cap — the "
                         "highest-df terms kept (default 64)")
    ap.add_argument("--filter", default="",
                    help="bool filter clause (unscored AND)")
    ap.add_argument("--must-not", dest="must_not", default="",
                    help="bool must_not clause (unscored NOT)")
    ap.add_argument("--min-should-match", dest="min_should_match",
                    type=int, default=1,
                    help="bool: distinct should terms a hit must "
                         "contain (0 = should is optional and only "
                         "contributes score; default 1)")
    ap.add_argument("--collapse", default=None, metavar="FIELD",
                    help="field collapsing: at most one hit per value "
                         "of this docmap field (e.g. role); query text "
                         "becomes the bool should clause")
    ap.add_argument("--boost", action="append", default=None,
                    metavar="TERM=WEIGHT",
                    help="bool: per-should-term score multiplier "
                         "(repeatable, e.g. --boost spark=2.5)")
    ap.add_argument("--after-score", dest="after_score", type=float,
                    default=None,
                    help="cursor pagination: score of the last hit of "
                         "the previous page (with --after-doc)")
    ap.add_argument("--after-doc", dest="after_doc", default=None,
                    help="cursor pagination: doc_id of the last hit of "
                         "the previous page (with --after-score)")
    ap.add_argument("--quantized", action="store_true",
                    help="score match queries with log-quantized doc "
                         "lengths (the Lucene norm-compression "
                         "contract; functions/bm25.quantize_dl)")
    ap.add_argument("--role", action="append", default=None,
                    help="metadata filter: role must equal one of the "
                         "given values (repeatable)")
    ap.add_argument("--ts-min", dest="ts_min", default=None,
                    help="metadata filter: ts >= ISO timestamp")
    ap.add_argument("--ts-max", dest="ts_max", default=None,
                    help="metadata filter: ts <= ISO timestamp")
    ap.add_argument("--conv-prefix", dest="conv_prefix", default=None,
                    help="metadata filter: conv_id prefix")
    ap.add_argument("--complete", action="store_true",
                    help="prefix autocomplete: (term, df) dictionary "
                         "completions of --query, most-frequent first")
    ap.add_argument("--rescore-query", dest="rescore_query", default=None,
                    help="rescore: re-rank the top --rescore-window "
                         "base hits by qw*base + rw*this query's BM25")
    ap.add_argument("--rescore-window", dest="rescore_window", type=int,
                    default=50, help="rescore window size (default 50)")
    ap.add_argument("--rescore-weight", dest="rescore_weight", type=float,
                    default=1.0, help="rescore secondary weight")
    ap.add_argument("--match-stats", dest="match_stats",
                    action="store_true",
                    help="stats agg over the bool match set: n_matched, "
                         "sum_dl, min/max ts (query text = should)")
    ap.add_argument("--suggest", action="store_true",
                    help="did-you-mean: rank dictionary corrections of "
                         "--query within --max-edits (term, df, "
                         "distance)")
    ap.add_argument("--suggest-size", dest="suggest_size", type=int,
                    default=5, help="--suggest: corrections returned")
    ap.add_argument("--decay-half-life", dest="decay_half_life",
                    type=float, default=None, metavar="SECONDS",
                    help="recency decay: score = BM25 * 0.5^(age / "
                         "half-life), age from each doc's indexed ts")
    ap.add_argument("--origin-us", dest="origin_us", type=int,
                    default=None,
                    help="decay origin in epoch microseconds "
                         "(default: now)")
    ap.add_argument("--more-like-this", dest="mlt", default=None,
                    metavar="DOC_ID",
                    help="more_like_this: query with the top tf·idf "
                         "terms of this indexed doc (requires "
                         "--docstore; source doc excluded from hits)")
    ap.add_argument("--max-query-terms", dest="max_query_terms",
                    type=int, default=25,
                    help="--more-like-this: selected-term cap")
    ap.add_argument("--explain", default=None, metavar="DOC_ID",
                    help="score explanation: per-term (tf, dl, df, idf, "
                         "contribution) decomposition of --query against "
                         "this indexed doc")
    ap.add_argument("--highlight", action="store_true",
                    help="attach best-window snippets to match hits "
                         "(requires --docstore)")
    ap.add_argument("--docstore", default=None,
                    help="transcripts parquet path for --highlight "
                         "(doc text is not stored in the index)")
    ap.add_argument("--window", type=int, default=12,
                    help="--highlight snippet window in tokens")
    args = ap.parse_args()
    meta = {k: v for k, v in (("role", args.role),
                              ("ts_min", args.ts_min),
                              ("ts_max", args.ts_max),
                              ("conv_prefix", args.conv_prefix))
            if v is not None} or None
    if (args.after_score is None) != (args.after_doc is None):
        ap.error("--after-score and --after-doc must be given together")
    boosts = None
    if args.boost:
        boosts = {}
        for item in args.boost:
            term, sep, w = item.partition("=")
            if not sep or not term:
                ap.error(f"--boost expects TERM=WEIGHT, got {item!r}")
            try:
                boosts[term] = float(w)
            except ValueError:
                ap.error(f"--boost weight must be a number, got {item!r}")
    after = ((args.after_score, args.after_doc)
             if args.after_doc is not None else None)


    mode = ("explain" if args.explain else
            "mlt" if args.mlt else
            "suggest" if args.suggest else
            "complete" if args.complete else
            "rescore" if args.rescore_query else
            "match_stats" if args.match_stats else
            "decay" if args.decay_half_life is not None else
            "highlight" if args.highlight else
            "collapse" if args.collapse else
            "phrase_scored" if args.phrase_scored else
            "phrase" if args.phrase else
            "near" if args.slop is not None else
            "phrase_prefix" if args.phrase_prefix else
            "prefix" if args.prefix else
            "fuzzy" if args.fuzzy else
            "wildcard" if args.wildcard else
            "regexp" if args.regexp else
            "bool" if (args.filter or args.must_not or boosts
                       or args.min_should_match != 1) else "match")
    if mode in ("highlight", "mlt") and not args.docstore:
        ap.error(f"--{'highlight' if mode == 'highlight' else 'more-like-this'} "
                 "requires --docstore (doc text is not stored in the index)")
    if meta and mode not in ("match", "bool", "prefix", "fuzzy",
                             "wildcard", "regexp", "highlight",
                             "match_stats"):
        ap.error("--role/--ts-min/--ts-max/--conv-prefix apply to match, "
                 "bool and expansion queries only")
    if after is not None and mode != "match":
        ap.error("--after-score/--after-doc apply to match queries only")
    if args.local:
        from geospatial_spark.plans.serve import LocalSearcher

        ls = LocalSearcher(args.index, docstore=args.docstore)
        if mode == "explain":
            ex = ls.explain(args.query, args.explain,
                            quantized=args.quantized)
        elif mode == "mlt":
            hits = ls.more_like_this(args.mlt, args.k,
                                     args.max_query_terms)
        elif mode == "suggest":
            sug = ls.suggest(args.query, args.suggest_size,
                             args.max_edits)
        elif mode == "complete":
            sug = [(t, df, 0) for t, df in
                   ls.complete(args.query, args.suggest_size)]
        elif mode == "rescore":
            hits = ls.search_rescored(args.query, args.rescore_query,
                                      args.k, args.rescore_window,
                                      1.0, args.rescore_weight)
        elif mode == "match_stats":
            stats = ls.match_stats(args.query, args.filter,
                                   args.must_not, meta=meta)
        elif mode == "decay":
            import time as _t

            hits = ls.search_decayed(
                args.query, args.k, args.decay_half_life,
                args.origin_us if args.origin_us is not None
                else int(_t.time() * 1e6))
        elif mode == "highlight":
            hits = ls.highlight(args.query, args.k, args.window,
                                quantized=args.quantized, meta=meta)
        elif mode == "collapse":
            hits = ls.search_collapsed(args.query, args.filter,
                                       args.must_not, args.k, meta=meta,
                                       field=args.collapse)
        elif mode == "phrase_scored":
            hits = ls.search_phrase_scored(args.query, args.k)
        elif mode == "phrase":
            hits = ls.search_phrase(args.query, args.k)
        elif mode == "near":
            hits = ls.search_near(args.query, args.slop, args.k)
        elif mode == "phrase_prefix":
            hits = ls.search_phrase_prefix(args.query, args.k,
                                           args.max_expansions)
        elif mode == "prefix":
            hits = ls.search_prefix(args.query, args.k,
                                    args.max_expansions, meta=meta)
        elif mode == "fuzzy":
            hits = ls.search_fuzzy(args.query, args.k, args.max_edits,
                                   args.fuzzy_prefix_length,
                                   args.max_expansions, meta=meta)
        elif mode == "wildcard":
            hits = ls.search_wildcard(args.query, args.k,
                                      args.max_expansions, meta=meta)
        elif mode == "regexp":
            hits = ls.search_regexp(args.query, args.k,
                                    args.max_expansions, meta=meta)
        elif mode == "bool":
            hits = ls.search_bool(args.query, args.filter, args.must_not,
                                  args.k, meta=meta,
                                  quantized=args.quantized,
                                  min_should_match=args.min_should_match,
                                  boosts=boosts)
        elif after is not None:
            hits = ls.search_after(args.query, args.k, after=after,
                                   quantized=args.quantized, meta=meta)
        else:
            hits = ls.search(args.query, args.k,
                             quantized=args.quantized, meta=meta)
    else:
        from geospatial_spark.plans.query import IndexSearcher
        from geospatial_spark.session import get_spark

        spark = get_spark("cli-query", cores=args.cores)
        s = IndexSearcher(spark, args.index)
        if mode == "explain":
            ex = s.explain(args.query, args.explain,
                           quantized=args.quantized)
        elif mode == "mlt":
            from geospatial_spark.sources.transcripts import read_transcripts

            hits = s.more_like_this(args.mlt,
                                    read_transcripts(spark, args.docstore),
                                    args.k, args.max_query_terms)
        elif mode == "suggest":
            sug = s.suggest(args.query, args.suggest_size,
                            args.max_edits)
        elif mode == "complete":
            sug = [(t, df, 0) for t, df in
                   s.complete(args.query, args.suggest_size)]
        elif mode == "rescore":
            hits = s.search_rescored(args.query, args.rescore_query,
                                     args.k, args.rescore_window,
                                     1.0, args.rescore_weight)
        elif mode == "match_stats":
            row = s.match_stats_df(args.query, args.filter,
                                   args.must_not, meta=meta)
            if row is None:
                stats = {"n_matched": 0, "sum_dl": None,
                         "min_ts_us": None, "max_ts_us": None}
            else:
                r = row.first()
                stats = {k: r[k] for k in ("n_matched", "sum_dl",
                                           "min_ts_us", "max_ts_us")}
        elif mode == "decay":
            import time as _t

            hits = s.search_decayed(
                args.query, args.k, args.decay_half_life,
                args.origin_us if args.origin_us is not None
                else int(_t.time() * 1e6))
        elif mode == "highlight":
            from geospatial_spark.sources.transcripts import read_transcripts

            hits = s.highlight(args.query,
                               read_transcripts(spark, args.docstore),
                               args.k, args.window,
                               quantized=args.quantized, meta=meta)
        elif mode == "collapse":
            hits = s.search_collapsed(args.query, args.filter,
                                      args.must_not, args.k, meta=meta,
                                      field=args.collapse)
        elif mode == "phrase_scored":
            hits = s.search_phrase_scored(args.query, args.k)
        elif mode == "phrase":
            hits = s.search_phrase(args.query, args.k)
        elif mode == "near":
            hits = s.search_near(args.query, args.slop, args.k)
        elif mode == "phrase_prefix":
            hits = s.search_phrase_prefix(args.query, args.k,
                                          args.max_expansions)
        elif mode == "prefix":
            hits = s.search_prefix(args.query, args.k,
                                   args.max_expansions, meta=meta)
        elif mode == "fuzzy":
            hits = s.search_fuzzy(args.query, args.k, args.max_edits,
                                  args.fuzzy_prefix_length,
                                  args.max_expansions, meta=meta)
        elif mode == "wildcard":
            hits = s.search_wildcard(args.query, args.k,
                                     args.max_expansions, meta=meta)
        elif mode == "regexp":
            hits = s.search_regexp(args.query, args.k,
                                   args.max_expansions, meta=meta)
        elif mode == "bool":
            hits = s.search_bool(args.query, args.filter, args.must_not,
                                 args.k, meta=meta,
                                 quantized=args.quantized,
                                 min_should_match=args.min_should_match,
                                 boosts=boosts)
        elif after is not None:
            hits = s.search_after(args.query, args.k, after=after,
                                  quantized=args.quantized, meta=meta)
        else:
            hits = s.search(args.query, args.k, quantized=args.quantized,
                            meta=meta)
    if mode == "explain":
        print(json.dumps({"query": args.query, "doc_id": args.explain,
                          "explanation": ex}))
        return
    if mode in ("suggest", "complete"):
        print(json.dumps({"query": args.query, "suggestions": [
            {"term": t, "df": df, "distance": d} for t, df, d in sug]}))
        return
    if mode == "match_stats":
        print(json.dumps({"query": args.query, "stats": stats}))
        return
    if mode == "highlight":
        out_hits = [{"doc_id": d, "score": sc, "snippet": sn,
                     "n_hit": nh, "rank": i + 1}
                    for i, (d, sc, sn, nh) in enumerate(hits)]
    elif mode == "collapse":
        out_hits = [{"collapse": v, "doc_id": d, "score": sc, "rank": i + 1}
                    for i, (v, d, sc) in enumerate(hits)]
    else:
        out_hits = [{"doc_id": d, "score": sc, "rank": i + 1}
                    for i, (d, sc) in enumerate(hits)]
    print(json.dumps({"query": args.query, "k": args.k, "hits": out_hits}))


if __name__ == "__main__":
    main()
