"""Doc-metadata predicates resolved to per-shard ordinal masks.

The reference embeds its scored queries inside bool/filter contexts
over ANY mapped field — XYPointQueryVisitor.java:165-178 walks FILTER
clauses mixing the spatial predicate with arbitrary field conditions.
The analogue here: a structured metadata predicate (role equality,
ts range, conv_id prefix) combined with a scored text query.

Execution shape (scale-first): metadata lives in the shard's docmap
side table, which is already LOCAL to every query kernel (it resolves
doc ordinals → doc_ids from it). A predicate therefore never shuffles
and never touches postings — each (gen, shard) kernel loads the
needed docmap columns of its OWN shard file and computes a boolean
mask over local ordinals; the bool kernel ANDs that mask into its
`allowed` set before scoring. Scoring stats (N, avgdl, df) stay
corpus-global: filter context does not change idf, matching the
reference's (Lucene's) filter semantics.

Null semantics are SQL-like: a NULL role/ts fails every predicate on
that field.
"""

from __future__ import annotations

import numpy as np

# docmap columns the metadata path needs; indexes built before the
# docmap-v2 format (fmt=4 config digest) lack them and must be rebuilt
# to serve metadata-filtered queries
META_COLS = ("role", "ts_us")

# derived facet fields (the date_histogram agg analogue): UTC calendar
# buckets of the docmap timestamp, emitted as sortable strings
FACET_TIME_FIELDS = {"ts_day": "%Y-%m-%d", "ts_hour": "%Y-%m-%dT%H"}
FACET_FIELDS = ("role",) + tuple(FACET_TIME_FIELDS)


def facet_values(dm_path, field: str, ordinals: list[int]) -> list:
    """The facet value per shard-local ordinal, from the shard's own
    docmap file: stored fields read directly, time-bucket fields
    derived from ts_us (UTC, second floor — µs never move a calendar
    bucket). None = missing (excluded by the facet contract)."""
    import datetime as _dt

    import pyarrow.parquet as pq

    fmt = FACET_TIME_FIELDS.get(field)
    col_name = "ts_us" if fmt else field
    col = pq.read_table(dm_path, columns=[col_name]).column(col_name)
    vals = col.take(list(ordinals)).to_pylist()
    if fmt is None:
        return vals
    utc = _dt.timezone.utc
    return [None if v is None else
            _dt.datetime.fromtimestamp(int(v) // 1_000_000, tz=utc)
            .strftime(fmt)
            for v in vals]


def _ts_us(v) -> int:
    """Accept datetime / ISO string / int microseconds → int µs."""
    import datetime as _dt

    if isinstance(v, bool):
        raise TypeError("ts bound cannot be a bool")
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return int(v)
    if isinstance(v, str):
        d = _dt.datetime.fromisoformat(v)
        v = d
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    raise TypeError(f"unsupported ts bound type {type(v).__name__}")


def normalize_meta(meta: dict | None) -> dict | None:
    """Driver-side canonicalization of a user metadata predicate.

    Accepted keys:
      role        — str or list[str]: role must equal one of them
      ts_min / ts_max — inclusive bounds; datetime, ISO string, or
                    int microseconds-since-epoch (UTC)
      conv_prefix — str: doc_id (= conv_id || ':' || turn) must start
                    with it; matches conv_id prefixes because ':' is
                    the conv/turn separator

    Returns a plain-value dict (role: list[str], ts_min_us / ts_max_us:
    int, conv_prefix: str) safe to close over in an executor kernel, or
    None when the predicate is empty.
    """
    if not meta:
        return None
    # idempotent: the canonical keys this function EMITS are accepted
    # back unchanged, so an already-normalized dict may flow through a
    # second entry point (e.g. the small-k local dispatch hands the
    # query path's canonical meta to the serving engine, which
    # normalizes on its own)
    known = {"role", "ts_min", "ts_max", "conv_prefix",
             "ts_min_us", "ts_max_us"}
    unknown = set(meta) - known
    if unknown:
        raise ValueError(f"unknown metadata filter keys: {sorted(unknown)}")
    if "ts_min" in meta and "ts_min_us" in meta:
        raise ValueError("give ts_min or ts_min_us, not both")
    if "ts_max" in meta and "ts_max_us" in meta:
        raise ValueError("give ts_max or ts_max_us, not both")
    out: dict = {}
    role = meta.get("role")
    if role is not None:
        roles = [role] if isinstance(role, str) else sorted(role)
        if not all(isinstance(r, str) for r in roles):
            raise TypeError("role filter values must be strings")
        out["role"] = roles
    if meta.get("ts_min") is not None:
        out["ts_min_us"] = _ts_us(meta["ts_min"])
    if meta.get("ts_max") is not None:
        out["ts_max_us"] = _ts_us(meta["ts_max"])
    if meta.get("ts_min_us") is not None:
        out["ts_min_us"] = int(meta["ts_min_us"])
    if meta.get("ts_max_us") is not None:
        out["ts_max_us"] = int(meta["ts_max_us"])
    cp = meta.get("conv_prefix")
    if cp is not None:
        if not isinstance(cp, str) or not cp:
            raise ValueError("conv_prefix must be a non-empty string")
        out["conv_prefix"] = cp
    return out or None


def needed_cols(meta: dict) -> list[str]:
    cols = []
    if "role" in meta:
        cols.append("role")
    if "ts_min_us" in meta or "ts_max_us" in meta:
        cols.append("ts_us")
    if "conv_prefix" in meta:
        cols.append("doc_id")
    return cols


def meta_mask_table(table, meta: dict) -> np.ndarray:
    """Boolean mask over the docmap table's rows (row i == local
    ordinal i: docmaps are written in doc_ord order) for a normalized
    predicate. `table` is a pyarrow Table holding `needed_cols`."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = table.num_rows
    mask = np.ones(n, dtype=bool)
    if "role" in meta:
        col = table.column("role")
        # NULL role fails the predicate (is_in → null, filled False)
        hit = pc.fill_null(pc.is_in(col, value_set=pa.array(meta["role"])),
                           False)
        mask &= hit.combine_chunks().to_numpy(zero_copy_only=False)
    if "ts_min_us" in meta or "ts_max_us" in meta:
        col = table.column("ts_us").combine_chunks()
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        vals = col.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        ok = valid.copy()
        if "ts_min_us" in meta:
            ok &= vals >= meta["ts_min_us"]
        if "ts_max_us" in meta:
            ok &= vals <= meta["ts_max_us"]
        mask &= ok
    if "conv_prefix" in meta:
        hit = pc.starts_with(table.column("doc_id"), pattern=meta["conv_prefix"])
        mask &= hit.combine_chunks().to_numpy(zero_copy_only=False)
    return mask


def meta_mask_from_docmap(docmap_path, meta: dict) -> np.ndarray:
    """Load only the predicate's columns from one shard's docmap file
    and compute its ordinal mask. Raises a descriptive error for
    pre-metadata (docmap-v1) indexes."""
    import pyarrow.parquet as pq

    cols = needed_cols(meta)
    pf = pq.ParquetFile(docmap_path)
    have = set(pf.schema_arrow.names)
    missing = [c for c in cols if c not in have]
    if missing:
        raise ValueError(
            f"index docmap lacks metadata columns {missing} — built "
            "before the docmap-v2 format; rebuild to serve "
            "metadata-filtered queries")
    return meta_mask_table(pf.read(columns=cols), meta)
