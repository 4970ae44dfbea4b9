"""Hot-key hatches for the per-group history operators (round-2 VERDICT
#7): ``j_asof`` / ``w_session`` assume one key's history fits one
map_groups task — a synthetic mega-user above ``group_cap`` must be
LOGGED AND SKIPPED (the same skew treatment as df_cap / bucket_cap /
host_salt_cap elsewhere), never OOM the task."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from crawlkit.pipelines import relational, windows


def _mk_events(tmp_path, mega_n=300, normal_n=20):
    t0 = pd.Timestamp("2026-01-01")
    rows = []
    eid = 0
    for uid, n in ((1, mega_n), (2, normal_n), (3, normal_n)):
        for i in range(n):
            rows.append((eid, uid, t0 + pd.Timedelta(minutes=i)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_asof_group_cap_skips_mega_user(tmp_path):
    d = _mk_events(tmp_path)
    out = relational.j_asof(d, group_cap=100).to_pandas()
    assert set(out["user_id"].unique()) == {2, 3}  # mega user skipped
    assert len(out) == 40
    full = relational.j_asof(d).to_pandas()  # default cap keeps everyone
    assert set(full["user_id"].unique()) == {1, 2, 3}
    assert len(full) == 340


def test_session_group_cap_skips_mega_user(tmp_path):
    d = _mk_events(tmp_path)
    out = windows.w_session(d, group_cap=100).to_pandas()
    assert set(out["user_id"].unique()) == {2, 3}
    full = windows.w_session(d).to_pandas()
    assert set(full["user_id"].unique()) == {1, 2, 3}


def test_fingerprint_collisions_fp_cap_drops_hot_fps():
    """fp_cap=1 drops every fingerprint shared by ≥2 docs — the pair set
    collapses to empty while the uncapped run finds pairs (the hot-key
    hatch is live, same contract as df_cap/bucket_cap)."""
    from crawlkit.pipelines import text

    sf = "/root/testdata/sf0.001"
    capped = text.fingerprint_collisions(sf, fp_cap=1)
    assert len(capped) == 0
    full = text.fingerprint_collisions(sf)
    assert len(full) > 0


def test_bloom_join_shuffle_confirm_matches_broadcast():
    """VERDICT r3 #6: forcing the build side past broadcast_cap must
    route the exact confirm through the hash-shard shuffle path and
    produce byte-identical output to the broadcast is_in path (which
    itself is SQL-oracle-checked)."""
    sf = "/root/testdata/sf0.001"

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for fn in (relational.j_bloom_semi, relational.j_bloom_anti):
        bc = canon(fn(sf))  # broadcast confirm (default cap)
        sh = canon(fn(sf, broadcast_cap=0))  # force shuffle confirm
        assert list(sh.dtypes) == list(bc.dtypes)
        pd.testing.assert_frame_equal(sh, bc)
