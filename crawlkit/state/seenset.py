"""Sharded URL-seen set: bloom pre-filter + cuckoo filter + exact store.

The reference's record-seen mechanism is Postgres ``INSERT … ON CONFLICT
DO NOTHING`` (D1, ``commons/Entry.go:37``) — a single, remote, exact
set. At 10^10-URL frontier scale that must become K partitioned shards,
each a Ray actor owning:

* a **bloom filter** (bit array, k hash probes) — O(1) "definitely new"
  fast path; never wrong about "new".
* a **cuckoo filter** (4-slot buckets, 16-bit fingerprints) — supports
  deletion and ~95% load; also approximate.
* an **exact store** (set of 128-bit digests, snapshot/restore to
  parquet) — the DECIDER. The metric demands URL-seen-set exactness;
  approximate filters alone would *drop* never-seen URLs on false
  positives, so filters only accelerate, the exact store answers.

Memory math for the north rule (10^10 URLs, K=10 shards → 1e9/shard):
bloom at 10 bits/key = 1.25 GB/shard; cuckoo at ~2 B/key = 2 GB/shard;
exact store spills to sorted parquet runs (digest-sorted, merge-checked)
— in this sandbox the exact store stays in-memory (tested to 1e6+) and
the spill path is the documented scale hatch.

Routing: shard = digest64 % K, computed inside ``map_batches`` (the
dedup-admit stage batches URLs per shard and issues one actor call per
shard per batch — calls are batched, never per-row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

_FP_MASK = np.uint64(0xFFFF)


def url_digests(urls: "list[str] | np.ndarray") -> np.ndarray:
    """(N, 2) uint64 array: 128-bit blake2b digest per url."""
    out = np.empty((len(urls), 2), dtype=np.uint64)
    blake = hashlib.blake2b
    for i, u in enumerate(urls):
        d = blake(str(u).encode("utf-8"), digest_size=16).digest()
        out[i, 0] = int.from_bytes(d[:8], "little")
        out[i, 1] = int.from_bytes(d[8:], "little")
    return out


class BloomFilter:
    """Plain k-probe bloom over a power-of-two bit array (double hashing)."""

    def __init__(self, capacity: int, bits_per_key: int = 10, k: int = 7):
        nbits = 1 << max(10, int(capacity * bits_per_key).bit_length())
        self.mask = np.uint64(nbits - 1)
        self.bits = np.zeros(nbits // 8, dtype=np.uint8)
        self.k = k

    def _positions(self, d: np.ndarray) -> np.ndarray:
        """(N, k) bit positions from the two 64-bit halves (Kirsch-Mitzenmacher)."""
        h1, h2 = d[:, 0:1], d[:, 1:2]
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1 + i * h2) & self.mask

    def add_many(self, d: np.ndarray) -> None:
        pos = self._positions(d).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8))

    def maybe_contains(self, d: np.ndarray) -> np.ndarray:
        """(N,) bool — False means DEFINITELY new."""
        pos = self._positions(d)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1).astype(bool)


class CuckooFilter:
    """4-slot-bucket cuckoo filter with 16-bit fingerprints.

    Approximate (FP rate ~2^-13 at 4 slots); supports delete. On
    insertion overflow the filter degrades to "always maybe" (exact
    store still decides — correctness unaffected, only speed).
    """

    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nbuckets = 1 << max(4, int(capacity / 4 * 1.1).bit_length())
        self.nbuckets = nbuckets
        self.table = np.zeros((nbuckets, 4), dtype=np.uint16)  # 0 = empty
        self.overflowed = False
        self._rng_state = 0x9E3779B97F4A7C15  # python int: wraps via mask

    def _fp(self, d: np.ndarray) -> np.ndarray:
        fp = (d[:, 0] & _FP_MASK).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # reserve 0 for empty

    def _i1(self, d: np.ndarray) -> np.ndarray:
        return (d[:, 1] % np.uint64(self.nbuckets)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # i XOR hash(fp) — standard partial-key cuckoo
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(self.nbuckets - 1)
        return (i.astype(np.uint64) ^ fph).astype(np.int64)

    def add_many(self, d: np.ndarray) -> None:
        """Bulk insert: 8 vectorized placement rounds (4 slots × 2
        buckets, first-occurrence-per-bucket to avoid double-claims
        within a batch), then the scalar kick loop only for the rare
        leftovers — no per-key numpy allocation on the common path."""
        if self.overflowed or len(d) == 0:
            return
        fps, i1s = self._fp(d), self._i1(d)
        i2s = self._alt(i1s, fps)
        pending = np.arange(len(d))
        for buckets in (i1s, i2s):
            for s in range(4):
                if not len(pending):
                    return
                b = buckets[pending]
                cand = pending[self.table[b, s] == 0]
                if not len(cand):
                    continue
                _, first = np.unique(buckets[cand], return_index=True)
                place = cand[first]
                self.table[buckets[place], s] = fps[place]
                pending = np.setdiff1d(pending, place, assume_unique=False)
        for j in pending:  # displacement (kick) path — rare below ~90% load
            self._add_one(int(fps[j]), int(i1s[j]))

    def _add_one(self, fp: int, i1: int) -> None:
        if self.overflowed:
            return
        nb1 = self.nbuckets - 1
        i2 = i1 ^ ((fp * 0x5BD1E995) & nb1)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        i = i1
        for _ in range(self.MAX_KICKS):
            self._rng_state = (self._rng_state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            slot = (self._rng_state >> 60) & 3
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = i ^ ((fp * 0x5BD1E995) & nb1)
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        self.overflowed = True  # degrade: maybe_contains → all True

    def maybe_contains(self, d: np.ndarray) -> np.ndarray:
        if self.overflowed:
            return np.ones(len(d), dtype=bool)
        fps, i1s = self._fp(d), self._i1(d)
        i2s = self._alt(i1s, fps)
        in1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, d: np.ndarray) -> None:
        fps, i1s = self._fp(d), self._i1(d)
        i2s = self._alt(i1s, fps)
        for fp, i1, i2 in zip(fps, i1s, i2s):
            for i in (int(i1), int(i2)):
                row = self.table[i]
                hit = np.nonzero(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    break


class SeenShardState:
    """The plain-python shard state (actor-independent; unit-testable)."""

    def __init__(self, capacity: int = 1 << 20):
        self.bloom = BloomFilter(capacity)
        self.cuckoo = CuckooFilter(capacity)
        # exact store keyed by the raw 16 digest bytes (C-speed hashing;
        # no bigint object math on the hot path)
        self.exact: set[bytes] = set()
        self._pending: list[np.ndarray] = []  # digests added since last snapshot

    @staticmethod
    def _keys(digests: np.ndarray) -> list[bytes]:
        b = np.ascontiguousarray(digests).tobytes()
        return [b[i : i + 16] for i in range(0, len(b), 16)]

    def check_and_add(self, digests: np.ndarray) -> np.ndarray:
        """(N, 2) uint64 digests → (N,) bool, True = first-ever-seen.

        Idempotent set-union: re-delivery of the same batch (Ray task
        retry) flips rows to False, never corrupts state. Duplicates
        WITHIN the batch: only the first occurrence reports True.

        Fast path: the bloom contains every key ever inserted, so a
        bloom NEGATIVE is definitely-new — those rows are bulk-admitted
        without touching the exact store (the exact store still decides
        bloom positives, so false positives cost time, never
        correctness). Within-batch duplicates are resolved first via a
        vectorized unique-first-occurrence pass.
        """
        n = len(digests)
        if n == 0:
            return np.zeros(0, dtype=bool)
        # 1. first occurrence within the batch (vectorized)
        _, first_idx = np.unique(digests, axis=0, return_index=True)
        new = np.zeros(n, dtype=bool)
        cand_idx = np.sort(first_idx)
        # 2. bloom: negatives are definitely new — no exact probe
        maybe = self.bloom.maybe_contains(digests[cand_idx])
        new[cand_idx[~maybe]] = True
        # 3. positives: exact store decides (bytes-key set membership)
        pos_idx = cand_idx[maybe]
        if len(pos_idx):
            exact = self.exact
            keys = self._keys(digests[pos_idx])
            sub = np.fromiter((k not in exact for k in keys), dtype=bool, count=len(keys))
            new[pos_idx[sub]] = True
        newd = digests[new]
        if len(newd):
            self.exact.update(self._keys(newd))
            self.bloom.add_many(newd)
            self.cuckoo.add_many(newd)
            self._pending.append(newd.copy())
        return new

    def contains(self, digests: np.ndarray) -> np.ndarray:
        """(N,) bool membership WITHOUT insertion (read-only probe — the
        recrawl path consults the PRIOR run's set this way). Bloom
        negatives short-circuit; positives ask the exact store."""
        n = len(digests)
        if n == 0:
            return np.zeros(0, dtype=bool)
        out = np.zeros(n, dtype=bool)
        maybe = self.bloom.maybe_contains(digests)
        pos = np.nonzero(maybe)[0]
        if len(pos):
            exact = self.exact
            keys = self._keys(digests[pos])
            out[pos] = np.fromiter((k in exact for k in keys), dtype=bool, count=len(keys))
        return out

    def __len__(self) -> int:
        return len(self.exact)

    # --- checkpoint ------------------------------------------------------

    def snapshot(self, path: str) -> int:
        """INCREMENTAL snapshot: writes only digests added since the last
        snapshot (O(delta), not O(set) — a full rewrite per round would
        dominate driver time as the seen set grows). Restore unions all
        deltas from all rounds."""
        if self._pending:
            d = np.concatenate(self._pending)
        else:
            d = np.empty((0, 2), dtype=np.uint64)
        pq.write_table(pa.table({"hi": d[:, 0] if len(d) else np.empty(0, np.uint64),
                                 "lo": d[:, 1] if len(d) else np.empty(0, np.uint64)}), path)
        self._pending = []
        return len(d)

    def restore(
        self,
        paths: "str | list[str]",
        shard_id: int | None = None,
        num_shards: int | None = None,
    ) -> int:
        """Union snapshot deltas into this shard. When ``shard_id`` /
        ``num_shards`` are given, keep only digests that route to this
        shard under the CURRENT modulus — this is the re-shard path: a
        run checkpointed with a different shard count restores by having
        every shard scan all delta files and claim its own digests."""
        if isinstance(paths, str):
            paths = [paths]
        for path in paths:
            t = pq.read_table(path)
            hi = t["hi"].to_numpy()
            lo = t["lo"].to_numpy()
            if len(hi) == 0:
                continue
            d = np.stack([hi, lo], axis=1).astype(np.uint64)
            if shard_id is not None and num_shards is not None:
                d = d[(d[:, 0] % np.uint64(num_shards)).astype(np.int64) == shard_id]
                if len(d) == 0:
                    continue
            self.exact.update(self._keys(d))
            self.bloom.add_many(d)
            self.cuckoo.add_many(d)
        self._pending = []
        return len(self.exact)


@ray.remote(num_cpus=0)
class SeenShard:
    """One seen-set partition. Actor = serialized access ⇒ exactness.

    num_cpus=0: shards are control-plane actors touched once per round
    with a short batched call — reserving whole CPU slots for them would
    starve the fetch stage (observed: 8 shards + 8-CPU session = zero
    slots left for Dataset tasks)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.state = SeenShardState(capacity)
        self._prop: dict[bytes, str] = {}  # round-scoped digest → min skey
        self._prior: SeenShardState | None = None  # recrawl cadence (read-only)

    def check_and_add(self, digests: np.ndarray) -> np.ndarray:
        return self.state.check_and_add(digests)

    def contains(self, digests: np.ndarray) -> np.ndarray:
        return self.state.contains(digests)

    def size(self) -> int:
        return len(self.state)

    # --- propose/resolve: the shard doubles as a min-key exchange --------
    #
    # The distributed-frontier crawl must pick, among a round's duplicate
    # discoveries of one URL, the row with the MIN packed sort key
    # (deterministic first-wins — crawl_dist.py). Expressing that as a
    # Dataset groupby costs a full sort shuffle per round; but the seen
    # shards already partition by the same digest route, so the round
    # tasks can PROPOSE (digest → min skey, an idempotent commutative
    # min-merge, safe under Ray task retries) and the driver RESOLVES
    # once per round after the round barrier: admission (check_and_add)
    # + winning-row return in one batched call per shard. This is the
    # "shared mutable index" case where an actor beats a shuffle: no
    # sort, no extra materialization, communication volume identical.
    # Proposal memory is O(round's fresh unique URLs / num_shards) and
    # is freed at resolve; the documented scale hatch is spilling the
    # proposal dict to digest-sorted runs like the exact store.

    def propose(self, t: "pa.Table") -> bool:
        """Min-merge (gk1, gk2 int64-view digest, skey) rows into the
        round's proposal map. Idempotent; within-batch dups fine."""
        hi = t["gk1"].to_numpy().view(np.uint64)
        lo = t["gk2"].to_numpy().view(np.uint64)
        keys = SeenShardState._keys(np.stack([hi, lo], axis=1))
        skeys = t["skey"].to_pylist()
        d = self._prop
        for k, s in zip(keys, skeys):
            cur = d.get(k)
            if cur is None or s < cur:
                d[k] = s
        return True

    def load_prior(self, snapshot_files: list[str], num_shards: int) -> int:
        """Recrawl cadence: load a PREVIOUS run's seen snapshots into a
        separate READ-ONLY store. Claim-filtered by the CURRENT routing
        (shard_id, num_shards), so the prior run's shard count is
        irrelevant. resolve_admit then withholds depth≥2 winners the
        prior run already fetched from the returned frontier rows —
        exactly driver mode's ``admit = mask & ~(depth2 & prior)``."""
        if self._prior is None:
            self._prior = SeenShardState()
        n = 0
        for p in snapshot_files:
            n += self._prior.restore(
                p, shard_id=self.shard_id, num_shards=num_shards
            )
        return n

    def resolve_admit(self) -> "pa.Table":
        """End-of-round: admit never-seen proposed digests into the seen
        set and return their winning skeys (owned Arrow table → object
        store; the driver passes the REF into from_arrow_refs, the rows
        never land on the driver). Clears the proposal map.

        Output columns: ``skey`` (mask-admitted winners — ALL of them,
        for seen-set reconstruction) and ``frontier`` (False for depth≥2
        rows a prior run already fetched — recrawl semantics; the
        downstream frontier build filters on it)."""
        if not self._prop:
            return pa.table(
                {"skey": pa.array([], pa.string()),
                 "frontier": pa.array([], pa.bool_())}
            )
        keys = list(self._prop.keys())
        skeys = list(self._prop.values())
        d = np.frombuffer(b"".join(keys), dtype=np.uint64).reshape(-1, 2)
        mask = self.state.check_and_add(d)
        win_keys = [k for k, m in zip(keys, mask) if m]
        win_skeys = [s for s, m in zip(skeys, mask) if m]
        if self._prior is not None and win_keys:
            wd = np.frombuffer(b"".join(win_keys), dtype=np.uint64).reshape(-1, 2)
            in_prior = self._prior.contains(wd)
            # skey packs depth first (2 zero-padded chars) — no unpack
            depth2 = np.array([s[:2] >= "02" for s in win_skeys], dtype=bool)
            front = ~(depth2 & in_prior)
        else:
            front = np.ones(len(win_skeys), dtype=bool)
        out = pa.table(
            {"skey": pa.array(win_skeys, pa.string()),
             "frontier": pa.array(front)}
        )
        self._prop = {}
        return out

    def resolve_admit_meta(self):
        """``(table, BlockMetadataWithSchema)`` — the metadata computed
        HERE, next to the rows, so the driver can build the round
        dataset via ``crawlkit.dataset_from_table_refs`` without Ray's
        one-metadata-task-per-ref round trip (call with
        ``.options(num_returns=2)`` to get separate refs)."""
        t = self.resolve_admit()
        from ray.data.block import BlockExecStats, BlockMetadataWithSchema

        stats = BlockExecStats.builder()
        return t, BlockMetadataWithSchema.from_block(t, stats=stats.build())

    def snapshot(self, path: str) -> int:
        return self.state.snapshot(path)

    def restore(self, path: str, shard_id: int | None = None, num_shards: int | None = None) -> int:
        return self.state.restore(path, shard_id=shard_id, num_shards=num_shards)


class SeenSet:
    """Driver-side handle over K shard actors; batch-routed exact dedup."""

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 20):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.options(name=None).remote(i, capacity_per_shard)
            for i in range(num_shards)
        ]

    def check_and_add_urls(self, urls: "list[str] | np.ndarray") -> np.ndarray:
        """(N,) bool mask, True = new. One actor call per involved shard."""
        if len(urls) == 0:
            return np.zeros(0, dtype=bool)
        return self.check_and_add_digests(url_digests(urls))

    def check_and_add_digests(self, d: np.ndarray) -> np.ndarray:
        """Same as check_and_add_urls, with (N, 2) uint64 digests already
        computed (upstream tasks hash in parallel; the driver only routes)."""
        route = (d[:, 0] % np.uint64(self.num_shards)).astype(np.int64)
        out = np.zeros(len(d), dtype=bool)
        futs, idxs = [], []
        for s in range(self.num_shards):
            ix = np.nonzero(route == s)[0]
            if len(ix):
                futs.append(self.shards[s].check_and_add.remote(d[ix]))
                idxs.append(ix)
        for ix, mask in zip(idxs, ray.get(futs)):
            out[ix] = mask
        return out

    def contains_digests(self, d: np.ndarray) -> np.ndarray:
        """Read-only membership mask (no insertion), batch-routed."""
        if len(d) == 0:
            return np.zeros(0, dtype=bool)
        route = (d[:, 0] % np.uint64(self.num_shards)).astype(np.int64)
        out = np.zeros(len(d), dtype=bool)
        futs, idxs = [], []
        for s in range(self.num_shards):
            ix = np.nonzero(route == s)[0]
            if len(ix):
                futs.append(self.shards[s].contains.remote(d[ix]))
                idxs.append(ix)
        for ix, mask in zip(idxs, ray.get(futs)):
            out[ix] = mask
        return out

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self, dir_path: str) -> list[str]:
        import json
        import os

        os.makedirs(dir_path, exist_ok=True)
        paths = [f"{dir_path}/shard-{i:04d}.parquet" for i in range(self.num_shards)]
        ray.get([s.snapshot.remote(p) for s, p in zip(self.shards, paths)])
        # record the shard count: restore validates it (a silent count
        # mismatch would drop higher-index deltas and re-route digests)
        with open(f"{dir_path}/.manifest.tmp", "w") as f:
            json.dump({"num_shards": self.num_shards}, f)
        os.replace(f"{dir_path}/.manifest.tmp", f"{dir_path}/manifest.json")
        return paths

    def restore(self, dir_paths: "str | list[str]") -> int:
        """Restore from one or more per-round snapshot dirs (incremental
        deltas — pass every round dir up to the resume point).

        Shard-count safe: each snapshot dir's manifest records the count
        it was written with. If every dir matches the current count, each
        shard reads only its own delta files; otherwise EVERY shard scans
        ALL delta files and claims the digests that route to it under the
        current modulus (correct for any old→new count)."""
        import glob
        import json
        import os

        if isinstance(dir_paths, str):
            dir_paths = [dir_paths]
        same_layout = True
        for d in dir_paths:
            mpath = f"{d}/manifest.json"
            if os.path.exists(mpath):
                with open(mpath) as f:
                    if json.load(f).get("num_shards") != self.num_shards:
                        same_layout = False
            else:  # pre-manifest snapshot: count unknown — take the safe path
                same_layout = False
        if same_layout:
            per_shard = [
                [f"{d}/shard-{i:04d}.parquet" for d in dir_paths]
                for i in range(self.num_shards)
            ]
            return sum(ray.get([s.restore.remote(ps) for s, ps in zip(self.shards, per_shard)]))
        all_files = sorted(
            f for d in dir_paths for f in glob.glob(f"{d}/shard-*.parquet")
        )
        return sum(
            ray.get(
                [
                    s.restore.remote(all_files, shard_id=i, num_shards=self.num_shards)
                    for i, s in enumerate(self.shards)
                ]
            )
        )
