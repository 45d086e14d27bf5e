"""Property-based check: metafilter's pyarrow mask kernel agrees with a
row-at-a-time Python reference over random docmap contents (NULL roles,
NULL timestamps, arbitrary predicate combinations)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_spark.operators.metafilter import (
    meta_mask_table,
    needed_cols,
    normalize_meta,
)

ROLES = ["user", "assistant", "system", "tool"]

row = st.fixed_dictionaries({
    "role": st.one_of(st.none(), st.sampled_from(ROLES)),
    "ts_us": st.one_of(st.none(),
                       st.integers(min_value=0, max_value=10_000)),
    "conv": st.text(alphabet="abc", min_size=0, max_size=3),
    "turn": st.integers(min_value=0, max_value=9),
})

meta_strategy = st.fixed_dictionaries({}, optional={
    "role": st.one_of(st.sampled_from(ROLES),
                      st.lists(st.sampled_from(ROLES), min_size=1,
                               max_size=3, unique=True)),
    "ts_min": st.integers(min_value=0, max_value=10_000),
    "ts_max": st.integers(min_value=0, max_value=10_000),
    "conv_prefix": st.text(alphabet="abc", min_size=1, max_size=2),
})


def _ref(r, m) -> bool:
    if "role" in m and (r["role"] is None or r["role"] not in m["role"]):
        return False
    if ("ts_min_us" in m or "ts_max_us" in m) and r["ts_us"] is None:
        return False
    if "ts_min_us" in m and r["ts_us"] < m["ts_min_us"]:
        return False
    if "ts_max_us" in m and r["ts_us"] > m["ts_max_us"]:
        return False
    if "conv_prefix" in m and not (
            f"{r['conv']}:{r['turn']}".startswith(m["conv_prefix"])):
        return False
    return True


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(row, min_size=0, max_size=40), meta=meta_strategy)
def test_mask_matches_reference(rows, meta):
    m = normalize_meta(meta)
    if m is None:
        return  # empty predicate: callers never build a mask
    table = pa.table({
        "role": pa.array([r["role"] for r in rows], type=pa.string()),
        "ts_us": pa.array([r["ts_us"] for r in rows], type=pa.int64()),
        "doc_id": pa.array([f"{r['conv']}:{r['turn']}" for r in rows],
                           type=pa.string()),
    }).select(needed_cols(m) or ["doc_id"])
    got = meta_mask_table(table, m)
    want = [_ref(r, m) for r in rows]
    assert list(got) == want
