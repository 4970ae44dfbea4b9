"""S3 connector conformance: the object-store seam must be a drop-in.

Mirrors test_fetcher_conformance's role for the storage tier (VERDICT
r3 "what's missing" #2): a localhost S3-compatible server that VERIFIES
AWS SigV4 signatures, the stdlib client exercised against it, pyarrow's
own S3FileSystem reading parquet through it (independent check of the
signing implementation), and — the contract that matters — TableStore
behaving BYTE-IDENTICALLY over a local root and an ``s3://`` root:
same manifests, same delta-log fold, same idempotent re-commit, same
stat pruning, same rows back.
"""

from __future__ import annotations

import io
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from minis3 import ACCESS_KEY, SECRET_KEY, MiniS3Server
from crawlkit.state.s3 import S3Client, S3Error, S3ObjectRoot, canonical_query
from crawlkit.state.lancelike import TableStore


@pytest.fixture(scope="module")
def server():
    srv = MiniS3Server().start()
    old = {
        k: os.environ.get(k)
        for k in ("AWS_ENDPOINT_URL", "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY", "AWS_REGION")
    }
    os.environ["AWS_ENDPOINT_URL"] = srv.endpoint
    os.environ["AWS_ACCESS_KEY_ID"] = ACCESS_KEY
    os.environ["AWS_SECRET_ACCESS_KEY"] = SECRET_KEY
    os.environ["AWS_REGION"] = "us-east-1"
    yield srv
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    srv.stop()


@pytest.fixture
def client(server):
    return S3Client(server.endpoint, ACCESS_KEY, SECRET_KEY)


# --- wire-level client conformance ---------------------------------------


def test_put_get_head_delete_roundtrip(client):
    etag = client.put_object("b", "k/a", b"payload")
    assert etag
    assert client.get_object("b", "k/a") == b"payload"
    assert client.head_object("b", "k/a") == {"size": 7, "etag": etag}
    client.delete_object("b", "k/a")
    assert client.head_object("b", "k/a") is None
    with pytest.raises(FileNotFoundError):
        client.get_object("b", "k/a")


def test_ranged_get(client):
    client.put_object("b", "r", bytes(range(100)))
    assert client.get_object("b", "r", byte_range=(10, 19)) == bytes(range(10, 20))


def test_list_prefix_and_continuation(client):
    for i in range(25):
        client.put_object("lb", f"p/{i:03d}", b"v")
    client.put_object("lb", "other/x", b"v")
    # force paging through the continuation loop with max-keys=10
    st, _, body = client._request(
        "GET", "/lb", canonical_query("list-type=2&prefix=p%2F&max-keys=10")
    )
    assert st == 200 and b"<IsTruncated>true</IsTruncated>" in body
    keys = [o["key"] for o in client.list_objects("lb", "p/")]
    assert keys == [f"p/{i:03d}" for i in range(25)]


def test_bad_signature_and_bad_key_rejected(server):
    bad = S3Client(server.endpoint, ACCESS_KEY, "not-the-secret")
    with pytest.raises(S3Error) as e:
        bad.put_object("b", "k", b"v")
    assert e.value.code == "SignatureDoesNotMatch"
    unknown = S3Client(server.endpoint, "who-is-this", SECRET_KEY)
    with pytest.raises(S3Error) as e:
        unknown.put_object("b", "k", b"v")
    assert e.value.code == "InvalidAccessKeyId"


def test_pyarrow_s3fs_reads_through_the_server(server, client):
    """Arrow's AWS-SDK-signed HEAD + ranged GETs must verify — an
    implementation-independent check of the SigV4 code."""
    t = pa.table({"a": list(range(1000)), "s": [f"row{i}" for i in range(1000)]})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    client.put_object("pa", "d/part-0.parquet", buf.getvalue())
    fs = S3ObjectRoot("s3://pa/d").filesystem()
    got = pq.read_table("pa/d/part-0.parquet", filesystem=fs)
    assert got.equals(t)


# --- TableStore drop-in conformance ---------------------------------------


def _tables():
    return [
        pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}),
        pa.table({"k": [4, 5], "v": ["d", "e"]}),
        pa.table({"k": [6], "v": ["f"]}),
    ]


def _drive(store: TableStore) -> dict:
    """One scripted op sequence; returns everything observable."""
    out = {}
    frags = [
        store.write_fragment(t, f"frag-{i}", stats_cols=["k", "v"])
        for i, t in enumerate(_tables())
    ]
    v1 = store.commit_fragments(frags[:2])
    v2 = store.commit_fragments(frags)  # frag-0/1 already in: delta adds only frag-2
    v_again = store.commit_fragments(frags)  # full re-commit: no-op
    out["versions"] = (v1, v2, v_again)
    out["rows_v1"] = store.read_table(v1).to_pydict()
    out["rows"] = store.read_table().to_pydict()
    out["cols"] = store.read_table(columns=["v", "missing"]).to_pydict()
    out["count"] = store.count_rows()
    pruned_paths, npruned = store.pruned_paths({"k": (5, None)})
    out["pruned"] = (len(pruned_paths), npruned)
    out["manifest_keys"] = [f["key"] for f in store.manifest()["fragments"]]
    out["stats"] = [f.get("stats", {}).get("k") for f in store.manifest()["fragments"]]
    vc = store.compact(target_rows=100)
    out["compacted"] = (vc, store.count_rows(vc), len(store.manifest(vc)["fragments"]))
    out["rows_after_compact"] = store.read_table().sort_by("k").to_pydict()
    out["time_travel"] = store.read_table(v1).num_rows
    return out


def test_tablestore_s3_matches_local(server, tmp_path):
    local = _drive(TableStore(str(tmp_path / "t")))
    s3 = _drive(TableStore("s3://conf/t"))
    assert local == s3


def test_tablestore_s3_delta_log_and_checkpoint(server):
    store = TableStore("s3://conf/delta")
    t = pa.table({"x": [1]})
    for i in range(20):  # crosses the every-16th snapshot checkpoint
        store.append(t, f"k{i}")
    assert store.latest_version() == 20
    # a FRESH instance (cold cache) folds the delta chain correctly
    cold = TableStore("s3://conf/delta")
    assert cold.count_rows() == 20
    assert [f["key"] for f in cold.manifest()["fragments"]] == [
        f"k{i}" for i in range(20)
    ]


def test_tablestore_s3_read_dataset_via_ray(server, ray_session):
    store = TableStore("s3://conf/rayds")
    store.append(pa.table({"a": list(range(50))}), "one")
    store.append(pa.table({"a": list(range(50, 90))}), "two")
    ds = store.read_dataset()
    assert sorted(r["a"] for r in ds.take_all()) == list(range(90))


def test_tablestore_s3_worker_side_write(server, ray_session):
    """The fused-fetch pattern: a Ray task constructs the store from its
    root STRING, writes a fragment, returns the meta; the driver
    commits. Credentials travel via env — on a real cluster the
    provisioned node env, here Ray's runtime_env env_vars (workers
    pre-dating this fixture don't see driver-side os.environ changes)."""
    import ray

    creds = {
        k: os.environ[k]
        for k in ("AWS_ENDPOINT_URL", "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY")
    }

    @ray.remote(runtime_env={"env_vars": creds})
    def write_one(root: str, i: int) -> dict:
        st = TableStore(root)
        return st.write_fragment(pa.table({"i": [i]}), f"w{i}")

    root = "s3://conf/workers"
    metas = ray.get([write_one.remote(root, i) for i in range(4)])
    store = TableStore(root)
    store.commit_fragments(metas)
    assert store.read_table().sort_by("i").to_pydict()["i"] == [0, 1, 2, 3]


def test_conditional_put_fences(client):
    """If-None-Match:* PUT — create-if-absent succeeds once, 412 →
    FileExistsError after (the TableStore multi-writer commit fence;
    the server recomputes the SigV4 signature over the conditional
    header like any other)."""
    client.put_object("bkt", "fence/one", b"v1", if_none_match=True)
    with pytest.raises(FileExistsError):
        client.put_object("bkt", "fence/one", b"v2", if_none_match=True)
    assert client.get_object("bkt", "fence/one") == b"v1"  # loser lost
    client.put_object("bkt", "fence/one", b"v3")  # unconditional still wins
    assert client.get_object("bkt", "fence/one") == b"v3"
