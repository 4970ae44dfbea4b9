import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlkit.pipelines import text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


def test_token_count_matches_sql(con):
    got = text.token_count(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = con.execute(
        r"""SELECT doc_id, len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens
            FROM documents ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quality_counts_matches_sql(con):
    got = text.quality_counts(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = con.execute(
        r"""SELECT doc_id,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
               len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens
            FROM documents ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_bpe_ish_token_count_matches_sql(con):
    got = (
        text.bpe_ish_token_count(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = con.execute(
        r"""SELECT doc_id, len(regexp_extract_all(text,
              '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+')) AS n_bpe_tokens
            FROM documents ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_text_score_deterministic_and_sane():
    a = text.text_score(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = text.text_score(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["quality_score"].between(0, 1).all()
    assert (a["lang_pred"] == "en").mean() > 0.9  # corpus is english-ish


def test_langid_distinguishes_languages(tmp_path):
    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat and the dog are in the house with a ball",
                "der hund und die katze sind in dem haus mit einem ball",
                "le chat et le chien sont dans la maison avec une balle",
                "el gato y el perro son en la casa con una pelota",
            ],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = text.text_score(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["en", "de", "fr", "es"]


def test_fingerprint_properties(tmp_path):
    docs = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # exact dup
                "totally different content here with other words entirely",
            ],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = text.fingerprint(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "fp_full"] == out.loc[2, "fp_full"]
    assert out.loc[1, "fp_winmin"] == out.loc[2, "fp_winmin"]
    assert out.loc[1, "fp_full"] != out.loc[3, "fp_full"]


def test_winnow_fingerprint_robust_to_local_edit(tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    edited = base + "tail-edit"
    docs = pa.table({"doc_id": [1, 2], "text": [base, edited]})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = text.fingerprint(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "fp_full"] != out.loc[2, "fp_full"]  # full hash changes
    # appending only ADDS windows: every base window hash survives, so the
    # min can only stay or decrease (position-robustness of winnowing)
    w1 = np.uint64(np.int64(out.loc[1, "fp_winmin"]))
    w2 = np.uint64(np.int64(out.loc[2, "fp_winmin"]))
    assert w2 <= w1
    from crawlkit.pipelines.text import _window_hashes

    assert w2 in _window_hashes(edited.encode(), 32)
    assert w1 in _window_hashes(base.encode(), 32)


def test_text_embed_unit_norm_and_matches_counts():
    """Dense hashed embedding: unit L2 norm (or exactly zero), and its
    unnormalized integer core equals embed_counts' sparse rows."""
    dense = text.text_embed(SF_DIR).to_pandas().set_index("doc_id")
    sparse = text.embed_counts(SF_DIR).to_pandas()
    mats = np.stack(dense["embedding"].to_numpy())
    norms = np.linalg.norm(mats, axis=1)
    assert ((np.abs(norms - 1.0) < 1e-6) | (norms == 0.0)).all()
    # reconstruct: dense * ||counts|| rounds back to the signed counts
    for doc_id, grp in sparse.groupby("doc_id"):
        vec = np.zeros(64, dtype=np.int64)
        vec[grp["bucket"].to_numpy()] = grp["signed_cnt"].to_numpy()
        d = mats[dense.index.get_loc(doc_id)].astype(np.float64)
        n = np.linalg.norm(vec.astype(np.float64))
        assert np.allclose(d * n, vec, atol=1e-3)


def test_text_embed_deterministic():
    a = text.text_embed(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = text.text_embed(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].equals(b["doc_id"])
    assert all(np.array_equal(x, y) for x, y in zip(a["embedding"], b["embedding"]))
