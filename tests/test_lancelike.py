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


def test_datasink_write_read_roundtrip(ray_session, tmp_path):
    """ds.write_datasink(LanceLikeDatasink) commits one version whose
    rows equal the dataset; re-writing IDENTICAL data commits zero new
    rows (content-derived fragment keys → re-runs are no-ops)."""
    import pyarrow as pa
    import ray.data as rd

    from crawlkit.state.lancelike import LanceLikeDatasink, TableStore

    root = str(tmp_path / "sinked")
    ds = rd.range(1000).map_batches(
        lambda t: pa.table({"id": t["id"], "sq": t["id"].to_numpy() ** 2}),
        batch_format="pyarrow",
    )
    sink = LanceLikeDatasink(root)
    ds.write_datasink(sink)
    store = TableStore(root)
    assert store.count_rows() == 1000
    got = store.read_table().to_pandas().sort_values("id").reset_index(drop=True)
    assert (got["sq"] == got["id"] ** 2).all()
    v1 = store.latest_version()

    # whole-run re-run over identical input: same keys, nothing re-commits
    ds2 = rd.range(1000).map_batches(
        lambda t: pa.table({"id": t["id"], "sq": t["id"].to_numpy() ** 2}),
        batch_format="pyarrow",
    )
    LanceLikeDatasink.__init__(sink, root)  # fresh sink, same root
    ds2.write_datasink(sink)
    assert store.count_rows() == 1000
    # appending DIFFERENT rows does land as a new version
    rd.range(50).map_batches(
        lambda t: pa.table({"id": t["id"].to_numpy() + 10_000, "sq": t["id"].to_numpy()}),
        batch_format="pyarrow",
    ).write_datasink(LanceLikeDatasink(root))
    assert store.count_rows() == 1050
    assert store.latest_version() > v1


def test_datasink_uncommitted_fragments_invisible(tmp_path):
    """A fragment written without commit (crash before
    on_write_complete) is invisible to every reader."""
    import pyarrow as pa

    from crawlkit.state.lancelike import TableStore, _content_key

    store = TableStore(str(tmp_path / "crash"))
    t = pa.table({"a": [1, 2, 3]})
    store.write_fragment(t, _content_key(t, "w"))  # no commit
    assert store.count_rows() == 0
    assert store.read_table().num_rows == 0


def test_fragment_stats_and_pruned_reads(tmp_path):
    """Iceberg-style manifest stats: write_fragment records per-column
    [lo, hi]; pruned_paths opens only fragments whose ranges can match."""
    from crawlkit.state.lancelike import fragment_stats

    store = TableStore(str(tmp_path / "s"))
    for lo in (0, 100, 200):
        t = pa.table(
            {
                "id": list(range(lo, lo + 50)),
                "host": [f"host{lo + i}.test" for i in range(50)],
                "blob": [b"x"] * 50,  # binary → no stats
            }
        )
        store.append(t, f"f{lo}")
    man = store.manifest()
    assert all("stats" in f for f in man["fragments"])
    s0 = man["fragments"][0]["stats"]
    assert s0["id"] == [0, 49] and "blob" not in s0
    # int range pruning: only the middle fragment can hold id 120-130
    paths, pruned = store.pruned_paths({"id": (120, 130)})
    assert len(paths) == 1 and pruned == 2
    # equality (scalar) form + string column — lexicographic bounds:
    # f0 spans host0..host9 (string order) which STRADDLES host205, so
    # only f100 (host100..host149) is prunable
    paths, pruned = store.pruned_paths({"host": "host205.test"})
    assert pruned == 1 and not any("f100" in p for p in paths)
    # unbounded side
    paths, pruned = store.pruned_paths({"id": (200, None)})
    assert len(paths) == 1 and pruned == 2
    # no-stats column → conservative keep
    paths, pruned = store.pruned_paths({"blob": (b"a", b"z")})
    assert len(paths) == 3 and pruned == 0
    # pruned read returns exactly the filtered rows
    tbl = pa.concat_tables(
        [__import__("pyarrow.parquet", fromlist=["pq"]).read_table(p) for p in
         store.pruned_paths({"id": (120, 130)})[0]]
    )
    assert set(range(100, 150)) == set(tbl["id"].to_pylist())
    # long-string truncation keeps bounds sound
    long_lo = "a" * 200
    long_hi = "m" * 200
    st = fragment_stats(pa.table({"s": [long_lo, long_hi]}))
    assert st["s"][0] <= long_lo and st["s"][1] >= long_hi
    assert len(st["s"][0]) <= 64 and len(st["s"][1]) <= 64


def test_crawl_manifests_carry_stats(tmp_path):
    """The fused fetch path threads fragment stats through the control
    rows into the committed manifests (both crawl modes share the
    stage); phash/host ranges then prune image/log scans."""
    from crawlkit.pipelines.crawl import run_crawl
    from crawlkit.refsim import CrawlSpec

    out = str(tmp_path / "run")
    res = run_crawl(
        "t1", spec=CrawlSpec(host_budget_per_round=16), out_dir=out,
        num_seen_shards=2, fetch_concurrency=2,
    )
    for st in (res.entries_store, res.images_store, res.fetch_log_store):
        frags = st.manifest()["fragments"]
        assert frags and all(f.get("stats") for f in frags)
    # a host-range prune on the fetch log skips at least one fragment
    img = res.images_store.manifest()["fragments"]
    phash_lo = min(f["stats"]["phash"][0] for f in img)
    paths, pruned = res.images_store.pruned_paths({"phash": (phash_lo, phash_lo)})
    assert len(paths) >= 1 and pruned >= 1
