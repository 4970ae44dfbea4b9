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


def test_concurrent_committers_lose_nothing(tmp_path):
    """The optimistic-commit fence: N threads each append M fragments
    to ONE table concurrently. Every fragment must be in the final
    manifest exactly once and the version chain must be claim-complete
    (the pre-fence code lost whole commits to the read-modify-write
    race on ``_latest``)."""
    import threading

    root = str(tmp_path / "store")
    s0 = TableStore(root)
    s0.append(_tbl([0]), "seed")  # non-empty base
    N, M = 6, 12
    errs = []

    def writer(w):
        try:
            st = TableStore(root)  # own instance → own manifest cache
            for j in range(M):
                st.append(_tbl([w * 1000 + j]), f"w{w}-f{j}")
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(w,)) for w in range(N)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    fresh = TableStore(root)
    man = fresh.manifest()
    keys = [f["key"] for f in man["fragments"]]
    assert len(keys) == len(set(keys))  # no duplicate metas
    want = {"seed"} | {f"w{w}-f{j}" for w in range(N) for j in range(M)}
    assert set(keys) == want  # nothing lost
    got = sorted(fresh.read_table()["k"].to_pylist())
    assert got == sorted([0] + [w * 1000 + j for w in range(N) for j in range(M)])


def test_concurrent_same_key_commits_idempotent(tmp_path):
    """Two committers racing the SAME content key (a retried Ray task's
    double fire): both may land a delta, the fold collapses to one meta
    and the rows appear once."""
    import threading

    root = str(tmp_path / "store")
    s0 = TableStore(root)
    frag = s0.write_fragment(_tbl([7, 8, 9]), "shared-key")
    barrier = threading.Barrier(2)

    def committer():
        st = TableStore(root)
        st.manifest()  # warm a stale view
        barrier.wait()
        st.commit_fragments([dict(frag)])

    ts = [threading.Thread(target=committer) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    fresh = TableStore(root)
    keys = [f["key"] for f in fresh.manifest()["fragments"]]
    assert keys == ["shared-key"]
    assert sorted(fresh.read_table()["k"].to_pylist()) == [7, 8, 9]


def test_compaction_folds_in_racing_appends(tmp_path):
    """Appends that land between compaction's fold and its claim stay
    visible: compaction's snapshot merges the intervening deltas."""
    import threading

    root = str(tmp_path / "store")
    s = TableStore(root)
    for i in range(8):
        s.append(_tbl([i]), f"base-{i}")
    barrier = threading.Barrier(2)

    def appender():
        st = TableStore(root)
        barrier.wait()
        for j in range(6):
            st.append(_tbl([100 + j]), f"late-{j}")

    def compactor():
        st = TableStore(root)
        barrier.wait()
        st.compact(target_rows=3)

    ts = [threading.Thread(target=appender), threading.Thread(target=compactor)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    fresh = TableStore(root)
    got = sorted(fresh.read_table()["k"].to_pylist())
    assert got == sorted(list(range(8)) + [100 + j for j in range(6)])


def test_concurrent_ray_task_committers(ray_session, tmp_path):
    """Cross-PROCESS fencing: Ray worker tasks committing to one table
    concurrently (os.link atomicity holds across processes, unlike the
    in-process thread test above)."""
    import ray

    root = str(tmp_path / "store")
    TableStore(root).append(_tbl([0]), "seed")

    @ray.remote
    def writer(w):
        # self-contained: workers cannot import the test module
        import pyarrow as _pa

        from crawlkit.state.lancelike import TableStore as _TS

        st = _TS(root)
        for j in range(5):
            t = _pa.table({"k": _pa.array([w * 100 + j], _pa.int64())})
            st.append(t, f"rw{w}-f{j}")
        return w

    ray.get([writer.remote(w) for w in range(4)])
    fresh = TableStore(root)
    keys = [f["key"] for f in fresh.manifest()["fragments"]]
    assert len(keys) == len(set(keys)) == 21
    got = sorted(fresh.read_table()["k"].to_pylist())
    assert got == sorted([0] + [w * 100 + j for w in range(4) for j in range(5)])
