import pyarrow as pa

from crawlkit.state.lancelike import TableStore


def _t(n, off=0):
    return pa.table({"a": list(range(off, off + n)), "b": [f"x{i}" for i in range(n)]})


def test_append_versions_and_read(tmp_path):
    s = TableStore(str(tmp_path / "t"))
    assert s.latest_version() == 0
    v1 = s.append(_t(3), key="f1")
    v2 = s.append(_t(2, 10), key="f2")
    assert (v1, v2) == (1, 2)
    assert s.count_rows() == 5
    assert s.read_table(version=1).num_rows == 3  # time travel
    assert s.read_table()["a"].to_pylist() == [0, 1, 2, 10, 11]


def test_idempotent_recommit(tmp_path):
    """Task-retry / re-run safety: same fragment key never duplicates
    (fixes the reference's random-filename duplication, storage/handler.go:103)."""
    s = TableStore(str(tmp_path / "t"))
    s.append(_t(3), key="frag")
    v = s.latest_version()
    assert s.append(_t(3), key="frag") == v  # no new version
    assert s.count_rows() == 3


def test_concurrent_style_fragment_then_commit(tmp_path):
    s = TableStore(str(tmp_path / "t"))
    metas = [s.write_fragment(_t(2, i * 10), key=f"k{i}") for i in range(4)]
    assert s.count_rows() == 0  # not visible before commit
    s.commit_fragments(metas)
    assert s.count_rows() == 8


def test_read_as_ray_dataset(tmp_path):
    s = TableStore(str(tmp_path / "t"))
    s.append(_t(5), key="f")
    assert s.read_dataset().count() == 5


def test_export_partitioned_parquet(tmp_path):
    import os

    import ray.data as rd

    s = TableStore(str(tmp_path / "t"))
    s.append(
        pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3]}),
        key="f",
    )
    out = str(tmp_path / "hive")
    s.export_partitioned_parquet(out, partition_cols=["k"])
    parts = sorted(d for d in os.listdir(out) if d.startswith("k="))
    assert parts == ["k=a", "k=b"]  # reference's Hive layout (S5)
    back = rd.read_parquet(out).to_pandas()
    assert sorted(back["v"].astype(int).tolist()) == [1, 2, 3]


def test_compact_preserves_rows_and_time_travel(tmp_path):
    s = TableStore(str(tmp_path / "t"))
    for i in range(6):
        s.append(_t(2, i * 10), key=f"f{i}")
    v_before = s.latest_version()
    n_frag_before = len(s.manifest()["fragments"])
    v_after = s.compact(target_rows=5)
    assert v_after == v_before + 1
    assert s.count_rows() == 12  # same data
    assert len(s.manifest()["fragments"]) < n_frag_before  # fewer files
    # deterministic: compacting the same input again produces same keys
    # time travel: the pre-compaction version still reads the old files
    assert s.read_table(version=v_before).num_rows == 12
    a = sorted(s.read_table()["a"].to_pylist())
    b = sorted(s.read_table(version=v_before)["a"].to_pylist())
    assert a == b
