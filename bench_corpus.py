#!/usr/bin/env python
"""Corpus-scale benchmark: the training-data operator family at 20-100x
the sf0.1 document count (prints ONE JSON line).

Generates a deterministic synthetic corpus once per size under /tmp —
Zipf-ish vocabulary (stable-hash-derived, seeded PCG64: reproducible,
never wall-clock), 1% planted near-duplicates so dedup outputs are
non-vacuous — then times the heavy text/dedup/assembly operators over
it. This is the would-it-still-work-at-1000x evidence for the text
side; the crawl side's equivalent is bench_frontier.py.

Usage: python bench_corpus.py [n_docs]   (default 100_000)
Env:   RAY_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time


def make_corpus(n_docs: int, out_dir: str, vocab: int = 50_000) -> str:
    """Deterministic synthetic documents.parquet (idempotent per size)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)  # fixed seed → bit-reproducible
    # Zipf-ish: rank r has weight 1/(r+10); realistic head/tail split
    ranks = np.arange(vocab, dtype=np.float64)
    w = 1.0 / (ranks + 10.0)
    p = w / w.sum()
    def b26(i: int) -> str:  # alphabetic-only vocab so [a-z]+ tokenizers
        s = ""               # (word_freq/top_keyword) see the real words
        i += 26              # skip 1-char head so no token is a substring trap
        while i:
            i, d = divmod(i, 26)
            s += chr(97 + d)
        return s

    words = np.array([b26(i) for i in range(vocab)], dtype=object)
    lens = rng.integers(50, 200, size=n_docs)
    langs = np.array(["en", "de", "fr", "es", "zh"], dtype=object)[
        rng.integers(0, 5, size=n_docs)
    ]
    texts: list[str] = []
    tok = rng.choice(vocab, size=int(lens.sum()), p=p)
    off = 0
    for i in range(n_docs):
        ln = int(lens[i])
        texts.append(" ".join(words[tok[off : off + ln]]))
        off += ln
    # plant near-dups: every 100th doc = previous doc with 2 words changed
    for i in range(100, n_docs, 100):
        base = texts[i - 1].split()
        base[0], base[-1] = "xdup", "ydup"
        texts[i] = " ".join(base)
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array([f"s{i % 97}" for i in range(n_docs)]),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, path)
    return out_dir


def run(n_docs: int) -> dict:
    import logging

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sf_dir = make_corpus(n_docs, f"/tmp/crawlkit_corpus_{n_docs}")
    ray.data.range(1_000_000).map_batches(lambda b: b).count()  # warm pool

    from crawlkit.pipelines import dedup, mixing, text

    import pandas as pd

    timings: dict[str, float] = {}
    extra: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        n = len(r) if isinstance(r, pd.DataFrame) else r.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        extra[f"{name}_rows"] = int(n)

    timed("token_count", lambda: text.token_count(sf_dir))
    timed("dedup_exact_first", lambda: __import__("crawlkit.pipelines.relational", fromlist=["x"]).dedup_exact_first(sf_dir))
    # df_cap engages the stop-shingle hatch — the Zipf head would
    # otherwise make shingle groups quadratic (the documented scale knob)
    timed("dedup_minhash_lsh", lambda: dedup.minhash_lsh_pairs(sf_dir))
    # session-9: ExactSubstr span removal (gram-shard election + kill apply)
    timed("dedup_exact_substr", lambda: dedup.exact_substr_dedup(sf_dir))
    timed("decontaminate", lambda: dedup.decontaminate(sf_dir))
    timed("split_assign", lambda: mixing.split_assign(sf_dir))
    timed("inverted_index", lambda: text.inverted_index(sf_dir, min_df=5, max_df=n_docs))
    timed("bpe_train10", lambda: text.bpe_train(sf_dir, num_merges=10))
    timed("text_classify", lambda: text.text_classify(sf_dir))
    timed("word_freq", lambda: text.word_freq(sf_dir))
    timed("top_keyword", lambda: text.top_keyword(sf_dir))
    # session-4 additions (all shuffle-free or slim-shuffle by design)
    timed("gopher_repetition", lambda: text.gopher_repetition(sf_dir))
    # the fixed English query terms don't exist in the b26 vocabulary —
    # query the three head words instead (same code path, non-vacuous)
    def _b26(i):
        s2 = ""
        i += 26
        while i:
            i, d = divmod(i, 26)
            s2 += chr(97 + d)
        return s2

    head_terms = tuple(_b26(i) for i in range(3))
    timed("search_conjunctive", lambda: text.search_conjunctive(sf_dir, terms=head_terms))
    timed("bm25_topk", lambda: text.bm25_topk(sf_dir, terms=head_terms))
    timed("pack_sequences", lambda: mixing.pack_sequences(sf_dir))
    # session-5: DSIR — two passes, zero shuffles, O(nbuckets) driver state
    timed("dsir_weights", lambda: mixing.dsir_weights(sf_dir))
    timed("dsir_sample", lambda: mixing.dsir_sample(sf_dir, k=1000))

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "corpus-scale operator wall time",
        "value": total,
        "unit": "sec",
        "n_docs": n_docs,
        "queries": timings,
        **extra,
        "num_cpus": num_cpus,
        "docs_per_sec_total": round(n_docs * len(timings) / total, 1),
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print(json.dumps(run(n)))
