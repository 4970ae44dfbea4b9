"""Seen-set exactness: filters accelerate, the exact store decides
(SURVEY §7.5.2 — approximate-only would drop never-seen URLs)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlkit.state.seenset import (
    BloomFilter,
    CuckooFilter,
    SeenShardState,
    url_digests,
)


def test_bloom_no_false_negatives():
    d = url_digests([f"u{i}" for i in range(5000)])
    bf = BloomFilter(capacity=5000)
    bf.add_many(d)
    assert bf.maybe_contains(d).all()


def test_bloom_low_false_positive_rate():
    bf = BloomFilter(capacity=5000)
    bf.add_many(url_digests([f"u{i}" for i in range(5000)]))
    other = url_digests([f"v{i}" for i in range(5000)])
    fp = bf.maybe_contains(other).mean()
    assert fp < 0.05


def test_cuckoo_membership_and_delete():
    d = url_digests([f"u{i}" for i in range(1000)])
    cf = CuckooFilter(capacity=4000)
    cf.add_many(d)
    assert cf.maybe_contains(d).all()  # no false negatives (pre-overflow)
    other = url_digests([f"w{i}" for i in range(1000)])
    assert cf.maybe_contains(other).mean() < 0.01
    cf.delete_many(d[:500])
    assert cf.maybe_contains(d[500:]).all()


def test_cuckoo_overflow_degrades_safely():
    cf = CuckooFilter(capacity=64)
    d = url_digests([f"u{i}" for i in range(5000)])
    cf.add_many(d)
    if cf.overflowed:
        assert cf.maybe_contains(url_digests(["anything"])).all()


def test_shard_exactness_and_idempotency():
    s = SeenShardState(capacity=1 << 12)
    d = url_digests([f"u{i}" for i in range(100)])
    first = s.check_and_add(d)
    assert first.all()
    again = s.check_and_add(d)  # re-delivery (task retry) → all False
    assert not again.any()
    assert len(s) == 100


def test_shard_within_batch_duplicates():
    s = SeenShardState()
    d = url_digests(["a", "b", "a", "c", "b"])
    mask = s.check_and_add(d)
    assert mask.tolist() == [True, True, False, True, False]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 300), min_size=0, max_size=200))
def test_shard_matches_python_set(keys):
    """Property: shard == plain python set under arbitrary interleavings."""
    s = SeenShardState(capacity=1 << 10)
    ref: set[int] = set()
    urls = [f"k{k}" for k in keys]
    for i in range(0, len(urls), 7):
        chunk = urls[i : i + 7]
        mask = s.check_and_add(url_digests(chunk))
        for u, m in zip(chunk, mask):
            assert m == (u not in ref)
            ref.add(u)
    assert len(s) == len(ref)


def test_snapshot_restore_roundtrip(tmp_path):
    s = SeenShardState()
    d = url_digests([f"u{i}" for i in range(500)])
    s.check_and_add(d)
    p = str(tmp_path / "snap.parquet")
    s.snapshot(p)
    s2 = SeenShardState()
    assert s2.restore(p) == 500
    assert not s2.check_and_add(d).any()  # all seen after restore
    assert s2.check_and_add(url_digests(["fresh"])).all()


def test_bloom_negative_fast_path_skips_exact_probe(monkeypatch):
    """Bloom-negative rows must be admitted WITHOUT exact-set probes
    (the fast path is real, not decorative)."""
    s = SeenShardState(capacity=1 << 12)
    s.check_and_add(url_digests([f"u{i}" for i in range(100)]))

    probes = []
    real = set.__contains__

    class SpySet(set):
        def __contains__(self, k):
            probes.append(k)
            return real(self, k)

    s.exact = SpySet(s.exact)
    fresh = url_digests([f"v{i}" for i in range(1000)])
    mask = s.check_and_add(fresh)
    assert mask.all()
    # only bloom FALSE-POSITIVES may reach the exact store (<5% here)
    assert len(probes) < 50


def test_reshard_restore_reroutes(tmp_path):
    """Restoring with a DIFFERENT shard count must still see every URL
    (ADVICE r1: silent delta loss + re-routing under count change)."""
    import ray

    from crawlkit.state.seenset import SeenSet

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    urls = [f"http://h{i % 17}.test/p{i}" for i in range(300)]
    s4 = SeenSet(num_shards=4)
    assert s4.check_and_add_urls(urls).all()
    snap = str(tmp_path / "seen")
    s4.snapshot(snap)

    s3 = SeenSet(num_shards=3)  # fewer shards than checkpointed
    assert s3.restore(snap) == 300
    assert not s3.check_and_add_urls(urls).any()  # nothing re-admitted
    assert s3.check_and_add_urls(["http://new.test/x"]).all()

    s8 = SeenSet(num_shards=8)  # more shards than checkpointed
    assert s8.restore(snap) == 300
    assert not s8.check_and_add_urls(urls).any()


def test_propose_resolve_exchange():
    """The shard-side min-key exchange (crawl_dist's dup-discovery
    dedup): min-wins, idempotent under re-delivery (task retry), each
    digest admitted exactly once across rounds, late duplicate
    proposals filtered by the seen set at the next resolve."""
    import ray

    from crawlkit.state.seenset import SeenShard, url_digests

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    shard = SeenShard.remote(0)
    d = url_digests(["u1", "u2", "u3"]).astype(np.uint64)

    def tbl(idx, skeys):
        return pa.table(
            {
                "gk1": pa.array(d[idx, 0].view(np.int64)),
                "gk2": pa.array(d[idx, 1].view(np.int64)),
                "skey": pa.array(skeys, pa.string()),
            }
        )

    # two proposals for u1 (different sort keys) + one for u2; the
    # whole first batch re-delivered (simulated Ray task retry)
    b1 = tbl([0, 0, 1], ["b-late", "a-early", "m"])
    ray.get(shard.propose.remote(b1))
    ray.get(shard.propose.remote(b1))  # retry — idempotent
    out = ray.get(shard.resolve_admit.remote())
    assert sorted(out["skey"].to_pylist()) == ["a-early", "m"]  # min wins
    # resolve cleared proposals; the digests are now SEEN
    assert ray.get(shard.resolve_admit.remote())["skey"].to_pylist() == []
    # a late re-proposal of u1 + a fresh u3: only u3 survives admission
    ray.get(shard.propose.remote(tbl([0, 2], ["zzz", "fresh"])))
    assert ray.get(shard.resolve_admit.remote())["skey"].to_pylist() == ["fresh"]
