"""Dedup family: correctness vs brute-force oracles on controlled
corpora (near-dups constructed, not hoped-for)."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlkit.pipelines import dedup



def _pdf(res):
    import pandas as _pd
    return res if isinstance(res, _pd.DataFrame) else res.to_pandas()

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi omicron pi rho sigma tau"


def _mk_corpus(tmp_path):
    """Docs 1/2 near-dup (1-word edit), 3 exact dup of 1, 4/5 unrelated."""
    words = BASE.split()
    edited = " ".join(words[:-1] + ["CHANGED"])
    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                BASE,
                edited,
                BASE,
                "one two three four five six seven eight nine ten eleven twelve",
                "red orange yellow green blue indigo violet cyan magenta white black grey",
            ],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    return str(tmp_path), docs


def _brute_jaccard_pairs(docs: pa.Table, tau: float):
    out = []
    sh = {
        i: set(map(tuple, zip(*[t.split()[k:] for k in range(3)])))
        for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= tau:
            out.append((a, b))
    return sorted(out)


def test_ngram_jaccard_exact_matches_brute(tmp_path):
    d, docs = _mk_corpus(tmp_path)
    got = _pdf(dedup.ngram_jaccard_pairs(d, tau_tenths=2))
    got_pairs = sorted(map(tuple, got[["doc_id_a", "doc_id_b"]].to_numpy()))
    assert got_pairs == _brute_jaccard_pairs(docs, 0.2)
    # the exact-dup pair and the near-dup pairs must be present
    assert (1, 3) in got_pairs and (1, 2) in got_pairs and (2, 3) in got_pairs


def test_minhash_lsh_no_false_positives_and_finds_strong_dups(tmp_path):
    d, docs = _mk_corpus(tmp_path)
    got = _pdf(dedup.minhash_lsh_pairs(d, tau_tenths=2))
    got_pairs = sorted(map(tuple, got[["doc_id_a", "doc_id_b"]].to_numpy()))
    brute = _brute_jaccard_pairs(docs, 0.2)
    assert set(got_pairs) <= set(brute)  # verify stage kills false positives
    assert (1, 3) in got_pairs  # exact dup always collides in every band
    assert (1, 2) in got_pairs and (2, 3) in got_pairs  # J≈0.8 → recall ~1


def test_minhash_lsh_degenerate_bucket_capped(tmp_path):
    """A band bucket with > bucket_cap identical docs must be SKIPPED
    (not go quadratic / OOM): plant 40 byte-identical docs with cap=8 —
    no pair among them survives candidate generation; distinct near-dup
    pairs elsewhere in the corpus still come through."""
    n_clones = 40
    other = "one two three four five six seven eight nine ten eleven twelve"
    docs = pa.table(
        {
            "doc_id": list(range(1, n_clones + 1)) + [100, 101],
            "text": ["clone " + BASE] * n_clones + [other, other],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = _pdf(dedup.minhash_lsh_pairs(str(tmp_path), tau_tenths=2, bucket_cap=8))
    got_pairs = set(map(tuple, got[["doc_id_a", "doc_id_b"]].to_numpy()))
    # identical clones share EVERY band bucket → every bucket they form is
    # over cap → zero clone pairs emitted
    assert not any(a <= n_clones and b <= n_clones for a, b in got_pairs)
    # the shingle-disjoint exact-dup pair collides in all 16 bands with
    # bucket size 2 ≤ cap → always survives
    assert (100, 101) in got_pairs


def test_simhash_exact_and_near(tmp_path):
    d, docs = _mk_corpus(tmp_path)
    sigs = dedup.simhash_signatures(d).to_pandas().set_index("doc_id")["simhash"]
    assert sigs[1] == sigs[3]  # identical docs → identical simhash
    pairs = _pdf(dedup.simhash_pairs(d, max_hamming=16))
    ps = set(map(tuple, pairs[["doc_id_a", "doc_id_b"]].to_numpy()))
    assert (1, 3) in ps
    assert (1, 2) in ps  # 1-word edit → small hamming
    # sanity: hamming values are the true bit distances
    for _, r in pairs.iterrows():
        want = bin((int(sigs[r.doc_id_a]) ^ int(sigs[r.doc_id_b])) & ((1 << 64) - 1)).count("1")
        assert r.hamming == want


def _mk_embeddings(tmp_path, n=80, dim=16):
    rng = np.random.Generator(np.random.PCG64(11))
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # rows 0/1 exact dup; rows 2/3 near-dup (tiny perturbation)
    base[1] = base[0]
    base[3] = base[2] + rng.standard_normal(dim).astype(np.float32) * 0.01
    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(base), pa.list_(pa.float32(), dim)),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path), base


def test_embedding_neardup_vs_brute(tmp_path):
    d, emb = _mk_embeddings(tmp_path)
    got = _pdf(dedup.embedding_neardup_pairs(d, tau=0.95))
    got_pairs = set(map(tuple, got[["vec_id_a", "vec_id_b"]].to_numpy()))
    e = emb.astype(np.float64)
    e /= np.linalg.norm(e, axis=1)[:, None]
    sims = e @ e.T
    a, b = np.triu_indices(len(e), k=1)
    brute = {(int(x), int(y)) for x, y in zip(a[sims[a, b] >= 0.95], b[sims[a, b] >= 0.95])}
    assert got_pairs <= brute  # exact verify → no false positives
    assert (0, 1) in got_pairs  # exact dup: identical code → guaranteed
    assert (2, 3) in got_pairs  # near-dup at cos≈0.9999: hamming(code)≈0


def test_embedding_neardup_planted_driver_fixture():
    """The driver-fixture path (plant_every) must emit exactly the
    planted (id, id+OFFSET) pairs on the sf testdata — the end-to-end
    check is non-vacuous (round-2 VERDICT #2)."""
    got = _pdf(dedup.embedding_neardup_pairs("/root/testdata/sf0.001", plant_every=100))
    pairs = set(map(tuple, got[["vec_id_a", "vec_id_b"]].to_numpy()))
    want = {(i, i + dedup.PLANT_ID_OFFSET) for i in range(0, 500, 100)}
    assert want <= pairs
    assert len(pairs) == len(want)  # random embeddings add no extras


def _mk_chain_corpus(tmp_path, n_chain=5, words_per=12, step=4):
    """Docs 1..n_chain overlap pairwise in a CHAIN (consecutive J≈0.43,
    skip-one J≈0.11): at tau=0.3 the pair graph is a path, so clustering
    must be TRANSITIVE (min label walks the whole chain — exercises
    multiple propagation iterations). Docs 100/101 are exact dups
    (second component); 200 is a singleton (must not appear)."""
    vocab = [f"w{i}" for i in range(100)]
    texts, ids = [], []
    for i in range(n_chain):
        ids.append(i + 1)
        texts.append(" ".join(vocab[step * i : step * i + words_per]))
    ids += [100, 101, 200]
    dup = " ".join(vocab[60:72])
    texts += [dup, dup, " ".join(vocab[80:92][::-1])]
    docs = pa.table({"doc_id": ids, "text": texts})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dedup_clusters_transitive_chain(tmp_path):
    d = _mk_chain_corpus(tmp_path)
    got = dedup.dedup_clusters(d, tau_tenths=3)
    by_doc = dict(zip(got["doc_id"], got["cluster_id"]))
    # chain 1-2-3-4-5 is ONE component labeled by its min id
    assert {by_doc[i] for i in range(1, 6)} == {1}
    # exact-dup pair is its own component
    assert by_doc[100] == 100 and by_doc[101] == 100
    # singleton never appears (no incident pair)
    assert 200 not in by_doc
    assert len(by_doc) == 7


def test_dedup_clusters_driver_and_dataset_paths_agree():
    """The small-graph union-find fast path and the Dataset-native
    min-label propagation loop produce identical labelings."""
    sf = "/root/testdata/sf0.001"
    fast = dedup.dedup_clusters(sf)  # fast path (fixture is small)
    dist = dedup.dedup_clusters(sf, driver_cc_cap=0)  # force loop
    f = fast.sort_values("doc_id").reset_index(drop=True)
    d = dist.sort_values("doc_id").reset_index(drop=True)
    assert f.equals(d)


def test_dedup_incremental_first_wins_across_microbatches(tmp_path):
    """Planted duplicates that straddle micro-batch boundaries: only the
    first (min doc_id) arrival of each text survives the seen-set
    admission — including duplicates within ONE micro-batch."""
    import pyarrow.parquet as pq_

    n = 40
    texts = [f"unique text number {i}" if i % 3 else "repeated body" for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["t"] * n),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq_.write_table(t, tmp_path / "documents.parquet")
    out = dedup.dedup_incremental(str(tmp_path), num_shards=2, microbatch=7)
    # every non-multiple-of-3 id is unique; of the repeated body only id 0
    want = sorted(i for i in range(n) if i % 3) + [0]
    assert sorted(out["doc_id"]) == sorted(want)
    assert (out.loc[out["text"] == "repeated body", "doc_id"] == 0).all()


def test_semdedup_pruning_rule_brute_force():
    """SemDeDup on the sf0.001 corpus with planted near-dups: re-verify
    the within-cluster pruning rule brute-force (per cluster, j drops
    iff some earlier member's cosine ≥ τ), confirm every planted
    near-dup is dropped and every original kept."""
    import pyarrow.parquet as pq_

    got = _pdf(dedup.semdedup("/root/testdata/sf0.001", plant_every=100))
    emb = pq_.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    for vid in list(vecs):
        if vid % 100 == 0:
            p = vecs[vid] * 1.001
            p = p.copy()
            p[0] += 0.001
            vecs[vid + dedup.PLANT_ID_OFFSET] = p
    assert set(got["vec_id"]) == set(vecs)
    for _, g in got.groupby("cluster"):
        g = g.sort_values("vec_id").reset_index(drop=True)
        X = np.stack([vecs[int(v)] for v in g["vec_id"]])
        X = X / np.maximum(np.linalg.norm(X, axis=1), 1e-12)[:, None]
        sim = X @ X.T
        for j in range(len(g)):
            want_drop = any(sim[i, j] >= 0.95 for i in range(j))
            assert bool(g["keep"].iloc[j]) == (not want_drop)
    planted = got[got["vec_id"] >= dedup.PLANT_ID_OFFSET]
    assert len(planted) > 0 and not planted["keep"].any()
    originals = got[got["vec_id"] % 100 == 0]
    originals = originals[originals["vec_id"] < dedup.PLANT_ID_OFFSET]
    assert originals["keep"].all()


def test_semdedup_unplanted_keeps_everything():
    """Random embeddings are near-orthogonal: without planted dups no
    within-cluster pair reaches τ, so SemDeDup keeps the whole corpus."""
    got = _pdf(dedup.semdedup("/root/testdata/sf0.001"))
    assert got["keep"].all() and len(got) == 500


def test_exact_substr_planted_span_removed(tmp_path):
    """A 7-word span copied into a second doc disappears from the COPY
    (w=5 grams cover it end to end) while the first occurrence — the
    min-(doc_id,pos) winner — survives verbatim. Unique docs untouched."""
    import pyarrow.parquet as pq_

    span = "alpha beta gamma delta epsilon zeta eta"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                f"one two {span} three four",
                f"xx yy zz {span} qq rr",
                "totally unique words here nothing repeats at all",
            ],
        }
    )
    pq_.write_table(docs, tmp_path / "documents.parquet")
    out = _pdf(dedup.exact_substr_dedup(str(tmp_path))).set_index("doc_id")
    assert out.loc[1, "kept_text"] == f"one two {span} three four"
    assert out.loc[1, "n_removed"] == 0
    assert out.loc[2, "kept_text"] == "xx yy zz qq rr"
    assert out.loc[2, "n_removed"] == 7
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[3, "n_tokens"] == 8


def test_exact_substr_broadcast_and_shuffle_paths_agree():
    """The sparse-kill broadcast fast path and the union-shard merge
    (heavy-duplication) path return identical corpora on sf0.001."""
    sf = "/root/testdata/sf0.001"
    cols = ["doc_id", "n_tokens", "n_removed", "kept_text"]
    a = _pdf(dedup.exact_substr_dedup(sf)).sort_values("doc_id").reset_index(drop=True)
    b = (
        _pdf(dedup.exact_substr_dedup(sf, broadcast_cap=0))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[cols], b[cols])
