import numpy as np
import pandas as pd

from crawlkit.pipelines import windows

SF_DIR = "/root/testdata/sf0.001"


def test_hll_error_bound_vs_exact():
    approx = windows.hll_count_distinct(SF_DIR).set_index("event_type")["approx_users"]
    exact = (
        windows.count_distinct_exact(SF_DIR)
        .to_pandas()
        .set_index("event_type")["n_users"]
    )
    for et in exact.index:
        rel_err = abs(approx[et] - exact[et]) / exact[et]
        assert rel_err < 0.05, (et, approx[et], exact[et])  # p=12 → ~1.6% σ


def test_hll_merge_associative():
    rng = np.random.Generator(np.random.PCG64(3))
    h1 = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    h2 = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    a, b, c = windows._HLL(), windows._HLL(), windows._HLL()
    a.add_hashes(h1)
    b.add_hashes(h2)
    c.add_hashes(np.concatenate([h1, h2]))
    a.merge(b)
    assert np.array_equal(a.reg, c.reg)  # merge == union (mergeable sketch)


def test_session_windows_gap_semantics(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = [0, 10, 20, 120, 125, 300]  # gaps: 100min and 175min split sessions
    t = pa.table(
        {
            "user_id": np.full(6, 7, dtype=np.int64),
            "event_id": np.arange(6, dtype=np.int64),
            "ts": pa.array([base + np.timedelta64(m, "m") for m in mins], pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = windows.w_session(str(tmp_path)).to_pandas().sort_values("session_idx")
    assert out["n_events"].tolist() == [3, 2, 1]
    assert out["session_idx"].tolist() == [1, 2, 3]


def test_approx_quantile_rank_error_bound():
    """The weighted-sample sketch guarantees rank error <= 1/npoints
    after merge: for every (event_type, q) the returned value's true
    rank must lie within q +/- 1.5/npoints (slack for duplicate cents)."""
    import duckdb

    npoints = 64
    got = windows.approx_quantile(SF_DIR, qs=(0.1, 0.5, 0.9), npoints=npoints)
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT event_type, CAST(FLOOR(value*100) AS BIGINT) AS cents "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    for _, row in got.iterrows():
        v = np.sort(exact[exact["event_type"] == row["event_type"]]["cents"].to_numpy())
        n = len(v)
        # true rank range of the returned value (duplicates → a band)
        lo = np.searchsorted(v, row["approx_cents"], side="left") / n
        hi = np.searchsorted(v, row["approx_cents"], side="right") / n
        tol = 1.5 / npoints
        assert lo - tol <= row["q"] <= hi + tol, (row.to_dict(), lo, hi)


def test_approx_quantile_deterministic():
    a = windows.approx_quantile(SF_DIR)
    b = windows.approx_quantile(SF_DIR)
    pd.testing.assert_frame_equal(a, b)
