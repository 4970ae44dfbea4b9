"""BPE vocabulary training: engine ≡ brute-force reference on the same
corpus (merge-for-merge, including tie-breaks), plus determinism."""

from collections import Counter

import pyarrow.parquet as pq

from crawlkit.pipelines import text

SF_DIR = "/root/testdata/sf0.001"


def _brute_bpe(texts: list[str], num_merges: int):
    """Single-process reference BPE (Sennrich): distinct-word freq table,
    weighted pair counts, deterministic (count desc, lexicographic) pick."""
    wf: Counter = Counter()
    for s in texts:
        wf.update((s or "").split())
    seqs = {w: list(w[:-1]) + [w[-1] + "</w>"] for w in wf}
    merges = []
    for rank in range(num_merges):
        pc_: Counter = Counter()
        for w, c in wf.items():
            syms = seqs[w]
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += c
        if not pc_:
            break
        (a, b), n = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((rank, a, b, n))
        for w, syms in seqs.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_bruteforce():
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    want = _brute_bpe(texts, 10)
    got = text.bpe_train(SF_DIR, num_merges=10)
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_bpe_train_deterministic():
    a = text.bpe_train(SF_DIR, num_merges=5)
    b = text.bpe_train(SF_DIR, num_merges=5)
    assert a.equals(b)
    # learned merges compose: later merges may reference earlier outputs
    assert (a["pair_count"] >= 2).all()


def test_bpe_tokenize_counts_matches_bruteforce():
    """Per-doc BPE token counts ≡ brute-force encode with the same
    merge table (greedy lowest-rank-first)."""
    texts_tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = texts_tbl["text"].to_pylist()
    merges = _brute_bpe(texts, 6)
    ranks = {(a, b): r for r, a, b, _ in merges}

    def encode_len(word):
        syms = list(word[:-1]) + [word[-1] + "</w>"] if word else []
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return len(syms)

    want = {
        int(d): sum(encode_len(w) for w in (s or "").split())
        for d, s in zip(texts_tbl["doc_id"].to_pylist(), texts)
    }
    got = text.bpe_tokenize_counts(SF_DIR, num_merges=6).to_pandas()
    assert dict(zip(got["doc_id"], got["n_bpe_tokens"])) == want
