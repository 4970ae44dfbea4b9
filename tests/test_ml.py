"""Closed-form distributed training: Gram-matrix stats and ridge probe
vs single-process numpy on the same data."""

import numpy as np
import pyarrow.parquet as pq

from crawlkit.pipelines import ml

SF_DIR = "/root/testdata/sf0.001"


def _full_matrices(dim: int):
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text", "lang"])
    X = ml._hashed_features(t["text"].to_pylist(), dim)
    y = (np.asarray(t["lang"].to_pylist()) == "en").astype(np.int64)
    return X, y


def test_gram_matrix_matches_numpy():
    X, y = _full_matrices(ml.DIM)
    G, xty = X.T @ X, X.T @ y
    got = ml.gram_matrix(SF_DIR).to_pandas()
    gm = got[got["j"] >= 0].set_index(["i", "j"])["g"]
    for (i, j), g in gm.items():
        assert g == G[i, j], (i, j)
    xv = got[got["j"] == -1].set_index("i")["g"]
    assert (xv.sort_index().to_numpy() == xty).all()
    # dense: every upper-triangle cell + every xty entry present exactly once
    assert len(got) == ml.DIM * (ml.DIM + 1) // 2 + ml.DIM


def test_train_linear_probe_matches_closed_form():
    X, y = _full_matrices(ml.DIM)
    Xb = np.concatenate([X, np.ones((len(X), 1), dtype=np.int64)], axis=1)
    G = Xb.T @ Xb
    w_ref = np.linalg.solve(
        G.astype(np.float64) + np.eye(ml.DIM + 1), (Xb.T @ y).astype(np.float64)
    )
    out = ml.train_linear_probe(SF_DIR).set_index("feature")["value"]
    w_got = out.drop("accuracy_milli").to_numpy()
    assert np.allclose(w_got, w_ref, rtol=1e-10, atol=1e-12)
    acc = out["accuracy_milli"]
    # better than the majority-class baseline on the fixture
    base = 1000.0 * max(y.mean(), 1 - y.mean())
    assert acc >= base


def test_kmeans_matches_single_process_lloyd():
    """Distributed Lloyd ≡ single-process Lloyd with the same seed and
    the same fixed-point quantized centroid updates."""
    t = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    order = np.argsort(t["vec_id"].to_numpy())
    X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)[order]
    vec_ids = t["vec_id"].to_numpy()[order]
    k, scale = 8, float(ml._KM_SCALE)
    cents = X[:k].copy()
    for _ in range(10):
        d2 = -2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)
        a = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(k):
            m = a == c
            if m.any():
                q = np.rint(X[m].sum(axis=0) * scale).astype(np.int64)
                new[c] = q / (scale * m.sum())
        if np.array_equal(np.rint(new * scale), np.rint(cents * scale)):
            break
        cents = new
    want = dict(zip(vec_ids, (-2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)).argmin(axis=1)))

    got = ml.kmeans_embeddings(SF_DIR, k=8, max_iters=10).to_pandas()
    assert dict(zip(got["vec_id"], got["cluster"])) == want
    assert got["cluster"].nunique() > 1  # non-degenerate on the fixture


def test_kmeans_deterministic():
    a = ml.kmeans_embeddings(SF_DIR, k=4).to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = ml.kmeans_embeddings(SF_DIR, k=4).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_pca_power_aligns_with_numpy_eig(tmp_path):
    """Distributed power iteration recovers numpy's top covariance
    eigenvector (up to sign) on a PLANTED-spectrum corpus — the sf
    embeddings are near-isotropic (eigengap ratio ~0.93 at sf0.001),
    where NO power method converges quickly, so the test controls the
    spectrum: a dominant direction + small noise. Also pins run-to-run
    determinism (quantized reduces)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    rng = np.random.default_rng(7)
    u = rng.normal(size=32)
    u /= np.linalg.norm(u)
    X = np.outer(rng.normal(size=400) * 3.0, u) + rng.normal(size=(400, 32)) * 0.3
    d = tmp_path / "emb"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(400), pa.int64()),
                "embedding": pa.array(
                    list(X.astype(np.float32)), pa.list_(pa.float32(), 32)
                ),
            }
        ),
        d / "embeddings.parquet",
    )
    Xd = X.astype(np.float32).astype(np.float64)
    Xc = Xd - Xd.mean(axis=0)
    _, V = np.linalg.eigh(Xc.T @ Xc)
    top = V[:, -1]

    got = ml.pca_power(str(d), max_iters=40)
    v = got.sort_values("dim")["q_component"].to_numpy() / float(ml._KM_SCALE)
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos >= 0.999, cos

    again = ml.pca_power(str(d), max_iters=40)
    assert got.equals(again)
