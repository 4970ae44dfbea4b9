"""Dataset-assembly operators: deterministic splits and source mixing.

The last mile of a training-data pipeline: after cleaning/dedup, the
corpus is (a) split into train/val/test partitions and (b) re-weighted
across sources (languages, domains) to a target mixture. Both must be
DETERMINISTIC functions of stable row identity — never `random` — so
any worker, any retry, and any re-run assigns identically, and the
split survives re-partitioning (contrast holding a global RNG, which
cannot exist across 256 nodes). The hash is md5-low64 (matching
DuckDB's ``md5_number_lower``) so both ops are SQL-oracle-checked
bit for bit; a production path would swap in the cheaper xxhash-style
``hash64_np`` with identical structure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .dedup import _md5_lower64, _read_docs

# default mixture: per-mille keep rate per language (the source axis the
# fixture carries); unlisted sources fall back to DEFAULT_RATE
MIX_RATES: dict[str, int] = {"en": 1000, "de": 600, "fr": 600, "es": 400, "zh": 300}
DEFAULT_RATE = 250


def _id_hash(ids: np.ndarray) -> np.ndarray:
    """md5-low64 of the DECIMAL doc_id string — the stable per-row coin."""
    return _md5_lower64([str(int(i)) for i in ids])


def split_assign(sf_dir: str, train_pct: int = 80, val_pct: int = 10) -> rd.Dataset:
    """Deterministic train/val/test assignment: bucket =
    ``md5_low64(doc_id) % 100``; train < train_pct ≤ val < train+val ≤
    test. Pure map — no shuffle, no state, identical on every re-run and
    at any partitioning; embarrassingly parallel at 100 TB."""
    ds = _read_docs(sf_dir, ["doc_id"])
    names = np.array(["train", "val", "test"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        bucket = (_id_hash(ids) % np.uint64(100)).astype(np.int64)
        code = np.where(
            bucket < train_pct, 0, np.where(bucket < train_pct + val_pct, 1, 2)
        )
        return pa.table(
            {
                "doc_id": ids.astype(np.int64),
                "bucket": bucket,
                "split": pa.array(names[code]),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def mix_sample(sf_dir: str, rates: dict[str, int] | None = None) -> rd.Dataset:
    """Source-weighted MIXING: keep a doc iff
    ``md5_low64(doc_id) % 1000 < rate[source]`` — the deterministic
    Bernoulli downsample that reshapes a crawl's natural source skew to
    a target training mixture (e.g. cap boilerplate-heavy languages,
    keep all high-resource text). Per-row coin = stable hash, so the
    sample is reproducible, retry-safe, and composes with
    ``split_assign`` (independent hash uses of the same id stay
    independent because the modulus differs). Pure map, no shuffle."""
    rates = MIX_RATES if rates is None else rates
    ds = _read_docs(sf_dir, ["doc_id", "lang"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        langs = t["lang"].to_pylist()
        rate = np.array([rates.get(l, DEFAULT_RATE) for l in langs], dtype=np.int64)
        coin = (_id_hash(ids) % np.uint64(1000)).astype(np.int64)
        keep = coin < rate
        return pa.table(
            {
                "doc_id": ids[keep].astype(np.int64),
                "lang": pa.array([l for l, k in zip(langs, keep) if k]),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
