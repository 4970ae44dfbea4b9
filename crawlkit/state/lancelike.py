"""Lance-like append/versioned table layer over Parquet fragments.

The north rule stores image+caption rows in Lance tables; ``pylance`` is
not installed in this sandbox (and there is no network), so this module
implements the subset of Lance semantics the engine needs — append-only
versioned fragments with an atomic manifest commit — over Parquet files
plus JSON manifests. The writer sits behind :class:`TableStore` so a
real ``lance`` binding drops in outside the sandbox.

Idempotency contract (fixes the reference's random-filename duplication,
``storage/handler.go:98-103`` + ``commons/helper.go:37-45``): fragment
names are DETERMINISTIC functions of their identifying keys; appending
an already-committed fragment key is a no-op, so Ray task retries and
whole-run re-runs never duplicate rows.

Layout:
    root/
      fragments/<key>.parquet        one file per committed fragment
      _versions/<n>.json             manifest per version (monotonic)
      _latest                        text file: highest committed version
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


class TableStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(f"{root}/fragments", exist_ok=True)
        os.makedirs(f"{root}/_versions", exist_ok=True)

    # --- manifest --------------------------------------------------------

    def latest_version(self) -> int:
        try:
            with open(f"{self.root}/_latest") as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v == 0:
            return {"version": 0, "fragments": []}
        with open(f"{self.root}/_versions/{v}.json") as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> int:
        v = self.latest_version() + 1
        manifest["version"] = v
        tmp = f"{self.root}/_versions/.{v}.json.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, f"{self.root}/_versions/{v}.json")  # atomic
        tmp2 = f"{self.root}/._latest.tmp"
        with open(tmp2, "w") as f:
            f.write(str(v))
        os.replace(tmp2, f"{self.root}/_latest")
        return v

    # --- write -----------------------------------------------------------

    def write_fragment(self, table: pa.Table, key: str) -> dict:
        """Write one fragment file (NOT yet visible — commit makes it so).

        Safe to call from concurrent Ray tasks: the name is deterministic
        in ``key`` and the write goes tmp→rename.
        """
        path = f"{self.root}/fragments/{key}.parquet"
        tmp = f"{self.root}/fragments/.{key}.tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        return {"key": key, "rows": table.num_rows, "path": path}

    def commit_fragments(self, frags: list[dict]) -> int:
        """Append fragments as a new version; already-committed keys are
        skipped (idempotent re-commit)."""
        man = self.manifest()
        have = {f["key"] for f in man["fragments"]}
        fresh = [f for f in frags if f["key"] not in have]
        if not fresh:
            return man["version"]
        man["fragments"] = man["fragments"] + fresh
        return self._commit(man)

    def append(self, table: pa.Table, key: str) -> int:
        """write_fragment + commit in one step (driver-side convenience)."""
        return self.commit_fragments([self.write_fragment(table, key)])

    # --- read ------------------------------------------------------------

    def fragment_paths(self, version: int | None = None) -> list[str]:
        return [f["path"] for f in self.manifest(version)["fragments"]]

    def read_dataset(self, version: int | None = None, **read_kwargs):
        """As a ``ray.data.Dataset`` (streaming; preferred for big tables)."""
        import ray.data as rd

        paths = self.fragment_paths(version)
        if not paths:
            return rd.from_items([])
        return rd.read_parquet(paths, **read_kwargs)

    def read_table(self, version: int | None = None, columns: list[str] | None = None) -> pa.Table:
        """Whole table as Arrow (small tables / tests only)."""
        paths = self.fragment_paths(version)
        if not paths:
            return pa.table({})
        return pa.concat_tables([pq.read_table(p, columns=columns) for p in paths])

    def count_rows(self, version: int | None = None) -> int:
        return sum(f["rows"] for f in self.manifest(version)["fragments"])

    def compact(self, target_rows: int = 1_000_000) -> int:
        """Compact small fragments into ~target_rows files as a NEW
        version (Lance-style: old versions still reference the old
        fragment files — time travel preserved; no file is deleted).

        The fused fetch stage writes one fragment per task — a long
        crawl accumulates thousands of small files; compaction restores
        read efficiency without breaking idempotent re-commits (the
        original keys stay recorded in prior versions)."""
        man = self.manifest()
        frags = man["fragments"]
        if len(frags) <= 1:
            return man["version"]
        new_frags: list[dict] = []
        bucket: list[pa.Table] = []
        rows = 0

        def flush() -> None:
            nonlocal bucket, rows
            if not bucket:
                return
            t = pa.concat_tables(bucket)
            import hashlib

            key = "compact-" + hashlib.blake2b(
                "|".join(m["key"] for m in bucket_meta).encode(), digest_size=8
            ).hexdigest()
            new_frags.append(self.write_fragment(t, key))
            bucket, rows = [], 0
            bucket_meta.clear()

        bucket_meta: list[dict] = []
        for f in frags:
            bucket.append(pq.read_table(f["path"]))
            bucket_meta.append(f)
            rows += f["rows"]
            if rows >= target_rows:
                flush()
        flush()
        return self._commit({"fragments": new_frags})

    def export_partitioned_parquet(
        self, out_dir: str, partition_cols: list[str], version: int | None = None
    ) -> str:
        """Export to Hive-partitioned parquet with Ray's native sink —
        the reference's MinIO layout (S5: bucket/schema_name=X/
        schema_version=Y/..., ``storage/handler.go:103``) re-expressed as
        ``ds.write_parquet(partition_cols=...)``. One directory per key
        → a consumer (or rerun) can skip finished partitions."""
        ds = self.read_dataset(version)
        ds.write_parquet(out_dir, partition_cols=partition_cols)
        return out_dir
