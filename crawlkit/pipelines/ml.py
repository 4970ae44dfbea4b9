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
import ray
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
        # hash-based factorize: ~40x faster than sort-based np.unique on
        # object strings; downstream is hash-per-unique + [inv] lookup,
        # so unique ORDER is irrelevant
        inv, uniq = pd.factorize(np.array(flat, dtype=object))
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


# --- distributed k-means (Lloyd) over the embeddings table ---------------

_KM_SCALE = np.int64(1) << np.int64(24)  # fixed-point quantum for reduces


@ray.remote(num_cpus=1)
def _km_block_task(block: pa.Table):
    """(vec_ids, float64 matrix) for one block — built once, re-read by
    every Lloyd pass from the object store."""
    return (
        block["vec_id"].to_numpy().astype(np.int64),
        np.stack(block["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64),
    )


@ray.remote(num_cpus=1)
def _km_seed_task(vx, k: int):
    """Per-block k smallest vec_ids + their vectors; the driver merge of
    these (k × blocks rows) equals a global sort+limit(k) seed."""
    ids, X = vx
    order = np.argsort(ids, kind="stable")[:k]
    return ids[order], X[order]


@ray.remote(num_cpus=1)
def _km_partials_task(vx, cents: np.ndarray):
    """One block's Lloyd partials: per-cluster QUANTIZED coordinate sums
    (int64 fixed-point ×2^24) + counts. Integer partials make the
    driver reduce order-INDEPENDENT — float partial sums would make
    centroid trajectories depend on task arrival order, breaking the
    repo's determinism invariant (same trick as the FLOOR(×100) cents
    convention). argmin over ||x-c||² = argmin over -2xCᵀ + ||c||²."""
    _, X = vx
    d2 = -2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)
    assign = d2.argmin(axis=1)
    k, dim = cents.shape
    sums = np.zeros((k, dim), dtype=np.float64)
    np.add.at(sums, assign, X)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    return np.rint(sums * float(_KM_SCALE)).astype(np.int64), counts


def _km_block_refs(ds) -> list:
    """Materialize ``ds`` and convert each non-empty block to a
    (vec_ids, matrix) object-store ref — one task wave, spillable."""
    refs = []
    for bundle in ds.materialize().iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if (meta.num_rows or 0) > 0:
                refs.append(_km_block_task.remote(block_ref))
    return refs


def _lloyd_centroids(ds, k: int, max_iters: int) -> np.ndarray:
    """The distributed Lloyd loop shared by ``kmeans_embeddings`` and
    ``dedup.semdedup``: embedding blocks are converted to matrices once
    (object-store refs), then every pass is ONE task wave of quantized
    partials (int64 fixed-point — driver reduce order-independent)
    with the centroids broadcast via ``ray.put``; no per-iteration
    Dataset-executor startup. Exact fixed-point convergence test.
    Init = the k smallest vec_ids (deterministic, partition-independent:
    per-block top-k then driver merge ≡ global sort+limit)."""
    refs = _km_block_refs(ds)
    seeds = ray.get([_km_seed_task.remote(r, k) for r in refs])
    sids = np.concatenate([s[0] for s in seeds])
    sX = np.vstack([s[1] for s in seeds])
    order = np.argsort(sids, kind="stable")[:k]
    cents = sX[order].copy()
    dim = cents.shape[1]
    k_eff = cents.shape[0]

    for _ in range(max_iters):
        qs = np.zeros((k_eff, dim), dtype=np.int64)
        cnt = np.zeros(k_eff, dtype=np.int64)
        c_ref = ray.put(cents)
        for qsums, counts in ray.get(
            [_km_partials_task.remote(r, c_ref) for r in refs]
        ):
            qs += qsums
            cnt += counts
        new = cents.copy()
        nz = cnt > 0
        new[nz] = qs[nz] / (float(_KM_SCALE) * cnt[nz, None])
        if np.array_equal(
            np.rint(new * float(_KM_SCALE)), np.rint(cents * float(_KM_SCALE))
        ):
            break
        cents = new
    return cents


def kmeans_embeddings(
    sf_dir: str, k: int = 8, max_iters: int = 10
) -> rd.Dataset:
    """Distributed K-MEANS (Lloyd) over the embedding column — the
    full-corpus version of the driver-side sampled Lloyd that trains the
    IVF index: every iteration is ONE streaming pass of per-batch
    partials (k×d quantized sums + counts — kilobytes per batch,
    independent of corpus size) reduced on the driver; centroids are
    broadcast per iteration via ``ray.put``. Converges when the
    quantized centroids are bit-identical between iterations (exact —
    no epsilon). Init is the k vectors with the smallest vec_id
    (deterministic, partition-independent). Output: (vec_id, cluster)
    assignment under the final centroids. Rows-only query: float linear
    algebra has no SQL form; parity with a single-process Lloyd using
    the same quantized updates is pinned in tests/test_ml.py."""
    import ray

    from .. import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()  # shared by the Lloyd loop and the final assign pass
    cents_ref = ray.put(_lloyd_centroids(ds, k, max_iters))

    def final_assign(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        a = (-2.0 * (X @ c.T) + (c * c).sum(axis=1)).argmin(axis=1)
        return pa.table(
            {"vec_id": t["vec_id"], "cluster": pa.array(a.astype(np.int64))}
        )

    return ds.map_batches(final_assign, batch_format="pyarrow")


# --- distributed PCA (top principal component by power iteration) --------


@ray.remote(num_cpus=1)
def _emb_matrix_task(block: pa.Table) -> np.ndarray:
    return np.stack(block["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )


@ray.remote(num_cpus=1)
def _emb_sum_task(X: np.ndarray):
    return np.rint(X.sum(axis=0) * float(_KM_SCALE)).astype(np.int64), X.shape[0]


@ray.remote(num_cpus=1)
def _emb_matvec_task(X: np.ndarray, v: np.ndarray):
    # Σ x (xᵀv) and Σ (xᵀv): centered matvec = Σ x(xᵀv) − mean·Σ(xᵀv)
    # (the second mean term Σ(x−m)(−mᵀv) telescopes via n on the driver)
    p = X @ v
    return (
        np.rint((X.T @ p) * float(_KM_SCALE)).astype(np.int64),
        int(round(p.sum() * float(_KM_SCALE))),
    )


def pca_power(sf_dir: str, max_iters: int = 20) -> pd.DataFrame:
    """Top principal component of the embedding corpus by POWER
    ITERATION, with every distributed reduce in fixed-point integers so
    the result is order-independent (the kmeans/_KM_SCALE convention).

    Per iteration, ONE streaming pass computes the matvec
    ``Σ_x x·(x·v)`` as per-batch quantized d-vector partials (kilobytes
    per batch, corpus-size-independent) minus the mean projection — the
    covariance matrix itself (d²) is never materialized, and no raw
    rows reach the driver. The mean is one prior pass of quantized
    sums. Deterministic init: the all-ones direction. Converges when
    the quantized direction is bit-identical between iterations.
    Rows-only query (float linear algebra has no SQL form); parity with
    a single-process numpy power iteration using the same quantized
    reduces — and alignment with numpy's true eigvector — is pinned in
    tests/test_ml.py. Output: one row per dimension (dim, component,
    eigenvalue share numerator/denominator as quantized ints)."""
    import ray

    from .. import read_parquet_clean

    # Embedding blocks are converted to contiguous float64 matrices
    # ONCE (one task wave; the matrices live in the object store and
    # spill like any block), then every power-iteration pass is one
    # task wave over those refs — no per-iteration Dataset-executor
    # startup, no per-iteration restacking. Partial-quantization
    # boundaries are the (deterministic) read blocks, so run-to-run
    # determinism holds as before.
    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).materialize()
    x_refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if (meta.num_rows or 0) > 0:
                x_refs.append(_emb_matrix_task.remote(block_ref))
    if not x_refs:
        return pd.DataFrame(
            {
                "dim": pd.Series([], dtype="int64"),
                "q_component": pd.Series([], dtype="int64"),
            }
        )

    qs = None
    n = 0
    for qsum, cnt in ray.get([_emb_sum_task.remote(x) for x in x_refs]):
        qs = qsum if qs is None else qs + qsum
        n += cnt
    mean = qs / (float(_KM_SCALE) * n)
    dim = mean.shape[0]

    v = np.ones(dim, dtype=np.float64) / np.sqrt(dim)
    for _ in range(max_iters):
        v_ref = ray.put(v)
        acc = np.zeros(dim, dtype=np.int64)
        psum_q = 0
        for qxv, qpv in ray.get([_emb_matvec_task.remote(x, v_ref) for x in x_refs]):
            acc += qxv
            psum_q += qpv
        # centered covariance matvec (×n): Σ(x−m)(x−m)ᵀ v
        #   = Σ x(xᵀv) − m·Σ(xᵀv) − (Σx)(mᵀv) + n·m(mᵀv), and Σx = n·m
        #   = Σ x(xᵀv) − m·Σ(xᵀv) − n·m(mᵀv) + n·m(mᵀv)
        w = acc / float(_KM_SCALE) - mean * (psum_q / float(_KM_SCALE))
        nv = w / np.linalg.norm(w)
        if np.array_equal(
            np.rint(nv * float(_KM_SCALE)), np.rint(v * float(_KM_SCALE))
        ):
            v = nv
            break
        v = nv

    qcomp = np.rint(v * float(_KM_SCALE)).astype(np.int64)
    return pd.DataFrame(
        {"dim": np.arange(dim, dtype=np.int64), "q_component": qcomp}
    ).astype({"dim": "int64", "q_component": "int64"})
