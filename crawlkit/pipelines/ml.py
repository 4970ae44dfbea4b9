"""Distributed closed-form model training via mergeable sufficient
statistics.

The pattern every data-parallel trainer without gradients reduces to:
per-batch PARTIAL Gram matrix ``X^T X`` and moment vector ``X^T y``
(both d×d / d — independent of corpus size), merged by addition, solved
once on the driver. Features here are the feature-hashing signed counts
of :mod:`text` (md5-derived, so the Gram matrix itself is
SQL-oracle-checkable in exact integer arithmetic); the label is a
language indicator. At 100 TB the reduce ships d²·8 bytes per batch —
kilobytes — regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .dedup import _md5_lower64, _read_docs

DIM = 16  # hashed-feature dimensionality (d² must stay broadcast-small)


def _hashed_features(texts: list[str], dim: int) -> np.ndarray:
    """Dense signed hashed-count matrix (n × dim), int64 — the same
    bucket/sign derivation as text.embed_counts (md5 % dim, sign bit 63)."""
    n = len(texts)
    acc = np.zeros((n, dim), dtype=np.int64)
    words_per = [(s or "").split() for s in texts]
    lens = np.array([len(w) for w in words_per], dtype=np.int64)
    flat = [w for ws in words_per for w in ws]
    if flat:
        uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
        h = _md5_lower64(list(uniq))
        bucket = (h % np.uint64(dim)).astype(np.int64)[inv]
        sign = np.where((h >> np.uint64(63)) & np.uint64(1) > 0, -1, 1).astype(
            np.int64
        )[inv]
        np.add.at(acc, (np.repeat(np.arange(n), lens), bucket), sign)
    return acc


def gram_matrix(sf_dir: str, dim: int = DIM) -> rd.Dataset:
    """Exact integer SUFFICIENT STATISTICS of a hashed-feature linear
    model: rows ``(i, j, g)`` = Σ_docs cᵢ·cⱼ for i ≤ j (upper-triangle
    Gram matrix), plus ``(i, -1, Σ_docs cᵢ·y)`` rows for the moment
    vector against the label y = [lang = 'en']. One corpus pass of
    per-batch ``X^T X`` partials (einsum over the dense n×d batch
    matrix) → a d²-row groupby — the shuffle is O(d²·batches), never
    O(corpus). SQL-checked: the oracle self-joins the embed_counts CTE."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    iu, ju = np.triu_indices(dim)

    def partial(t: pa.Table) -> pa.Table:
        X = _hashed_features(t["text"].to_pylist(), dim)
        y = (np.asarray(t["lang"].to_pylist()) == "en").astype(np.int64)
        G = X.T @ X  # (d, d) int64 — exact
        xty = X.T @ y  # (d,)
        return pa.table(
            {
                "i": np.concatenate([iu, np.arange(dim)]).astype(np.int64),
                "j": np.concatenate([ju, np.full(dim, -1)]).astype(np.int64),
                "g": np.concatenate([G[iu, ju], xty]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("g", alias_name="g"))
    )


def train_linear_probe(
    sf_dir: str, dim: int = DIM, ridge: float = 1.0
) -> pd.DataFrame:
    """Closed-form RIDGE-REGRESSION language probe: solve
    ``(X^T X + λI) w = X^T y`` from the distributed sufficient
    statistics (one corpus pass; the reduce is d² ints per batch), then
    ONE scoring pass for training accuracy (threshold 0.5). A bias
    column of ones is appended (dim+1 features). Output: one row per
    weight plus an ``accuracy_milli`` summary row — small by
    construction.

    Rows-only query: the solve is float linear algebra (no SQL form),
    but its integer inputs are the SQL-checked :func:`gram_matrix` and
    the weights are pinned against a single-process numpy closed form in
    tests/test_ml.py."""
    import ray

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    d1 = dim + 1

    def partial(t: pa.Table) -> pa.Table:
        X = _hashed_features(t["text"].to_pylist(), dim)
        Xb = np.concatenate([X, np.ones((len(X), 1), dtype=np.int64)], axis=1)
        y = (np.asarray(t["lang"].to_pylist()) == "en").astype(np.int64)
        G = Xb.T @ Xb
        xty = Xb.T @ y
        return pa.table(
            {
                "g": pa.array([G.ravel()], pa.list_(pa.int64(), d1 * d1)),
                "xty": pa.array([xty], pa.list_(pa.int64(), d1)),
            }
        )

    G = np.zeros((d1, d1), dtype=np.int64)
    xty = np.zeros(d1, dtype=np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        G += np.asarray(row["g"], dtype=np.int64).reshape(d1, d1)
        xty += np.asarray(row["xty"], dtype=np.int64)
    w = np.linalg.solve(G.astype(np.float64) + ridge * np.eye(d1), xty.astype(np.float64))
    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        ww = ray.get(w_ref)
        X = _hashed_features(t["text"].to_pylist(), dim).astype(np.float64)
        pred = X @ ww[:-1] + ww[-1] >= 0.5
        y = np.asarray(t["lang"].to_pylist()) == "en"
        return pa.table(
            {
                "n": pa.array([len(y)], pa.int64()),
                "correct": pa.array([int((pred == y).sum())], pa.int64()),
            }
        )

    tot_n = tot_c = 0
    for row in ds.map_batches(score, batch_format="pyarrow").take_all():
        tot_n += row["n"]
        tot_c += row["correct"]
    out = pd.DataFrame(
        {
            "feature": [f"w{i}" for i in range(dim)] + ["bias", "accuracy_milli"],
            "value": list(w) + [1000.0 * tot_c / max(tot_n, 1)],
        }
    )
    return out
