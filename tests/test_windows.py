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
