"""Text-analysis operators for large-scale training-data pipelines.

Each operator is a vectorized ``map_batches`` transform over the
``documents`` table (Arrow kernels / compiled regex; no per-row Python
in hot paths except where a string kernel doesn't exist, and then the
loop is per-batch-amortized). Stateful pieces (compiled profiles) use
the callable-class actor-pool pattern.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    from .. import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


# --- token counting (SQL-checked) ---------------------------------------


def token_count(sf_dir: str) -> rd.Dataset:
    """Whitespace token count per doc — pure Arrow regex kernel."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], r"\S+")
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def bpe_ish_token_count(sf_dir: str) -> rd.Dataset:
    """Sub-word-ish token count: GPT-2-style pretokenizer regex (public
    pattern: contractions | letter runs | digit runs | punct runs) —
    the 'BPE-ish regex' token counter. Arrow RE2 kernel, zero Python."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    pat = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"

    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], pat)
        return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def redact(sf_dir: str) -> rd.Dataset:
    """PII-shaped redaction: email-like tokens → ``<email>`` then digit
    runs → ``#`` (order matters — emails contain digits). Pure Arrow
    RE2 kernels (replace_substring_regex), zero Python per row; DuckDB
    oracle uses the same RE2 class so outputs match byte for byte."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    email = r"[A-Za-z0-9.%+-]+@[A-Za-z0-9.-]+"

    def fn(t: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(t["text"], pattern=email, replacement="<email>")
        red = pc.replace_substring_regex(red, pattern=r"[0-9]+", replacement="#")
        return pa.table({"doc_id": t["doc_id"], "redacted": red})

    return ds.map_batches(fn, batch_format="pyarrow")


# --- quality counts (SQL-checked, integers only) ------------------------


def quality_counts(sf_dir: str) -> rd.Dataset:
    """Per-doc integer quality signals: chars/alpha/digit/punct/tokens."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_alpha": pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.int64()),
                "n_digit": pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.int64()),
                "n_punct": pc.cast(pc.count_substring_regex(text, "[.,;:!?]"), pa.int64()),
                "n_tokens": pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def word_freq(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus-level top-k word frequencies (lowercase [a-z]+ tokens) —
    the vocabulary/statistics pass of a training-data pipeline.

    Shape: per-batch explode+count partials (vectorized polars
    extract_all; the shuffle moves (word, cnt) partials, never tokens)
    hash-routed to 32 coarse word shards (a vocab-keyed Aggregate is one
    sort boundary per DISTINCT word — measured 16 s at 50k words where
    this takes ~2 s) → per-shard vectorized sum + top-k prefilter →
    ≤ k×shards-row driver merge with the (cnt desc, word asc) tiebreak."""
    import polars as pl

    from ..hashing import hash64_np

    nshards = 32
    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t["text"]).rename("text")
        counts = (
            s.str.to_lowercase()
            .str.extract_all(r"[a-z]+")
            .explode()
            .drop_nulls()
            .value_counts()
        )
        out = counts.to_arrow().rename_columns(["word", "cnt"])
        wl = out["word"].cast(pa.string()).to_pylist()
        shard = (hash64_np(wl) % np.uint64(nshards)).astype(np.int64)
        return pa.table(
            {"word": pa.array(wl, pa.string()),
             "cnt": out["cnt"].cast(pa.int64()),
             "_shard": pa.array(shard)}
        )

    def shard_topk(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        agg = g.groupby("word", as_index=False)["cnt"].sum()
        agg = agg.sort_values(["cnt", "word"], ascending=[False, True]).head(k)
        return pandas_to_clean_arrow(agg.astype({"word": "string", "cnt": "int64"}))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_topk, batch_format="pandas")
        .to_pandas()  # ≤ k×shards rows
        .sort_values(["cnt", "word"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def top_keyword(sf_dir: str, nshards: int = 32) -> rd.Dataset:
    """Per-document keyword extraction (TF×rarity): for each doc the
    token maximizing the integer score ``tf * 1_000_000 // df`` (df =
    corpus document frequency) — the exact-arithmetic surrogate of
    tf-idf, so the DuckDB oracle matches bit-for-bit (float idf would
    be order-dependent).

    Shape: per-batch polars explode → (doc_id, word, tf) — final, not
    partial, since a doc never spans batches → ONE word-hash-shard
    shuffle CO-PARTITIONS everything needed: a word's shard holds ALL
    its (doc, word) rows, so document frequency is a per-shard pandas
    transform('size') and the score is computed in place — no
    vocab-keyed Aggregate (one sort boundary per distinct word — the
    measured pathology: 48.6 s at 100k docs / 50k words) and no
    Dataset.join (the df table never exists as a separate dataset) →
    per-doc argmax via the doc-hash shard reduce. Two coarse shuffles
    total; 48.6 s → ~7 s at 100k docs."""
    import polars as pl

    from ..hashing import hash64_np

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tf_batch(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t.select(["doc_id", "text"]))
        e = (
            d.with_columns(
                pl.col("text").str.to_lowercase().str.extract_all(r"[a-z]+").alias("word")
            )
            .drop("text")
            .explode("word")
            .drop_nulls()
            .group_by(["doc_id", "word"])
            .len()
        )
        out = e.to_arrow().replace_schema_metadata(None)
        words = out["word"].cast(pa.string())
        wl = words.to_pylist()
        uniq = list(set(wl))
        smap = dict(zip(uniq, (hash64_np(uniq) % np.uint64(nshards)).astype(np.int64)))
        return pa.table(
            {
                "doc_id": out["doc_id"].cast(pa.int64()),
                "word": words,
                "tf": out["len"].cast(pa.int64()),
                "_wshard": pa.array([smap[w] for w in wl], pa.int64()),
            }
        )

    def score_in_shard(g: pd.DataFrame) -> pa.Table:
        """One call per WORD shard: rows are distinct (doc, word), so
        df(word) = the word's row count within its home shard."""
        from .. import pandas_to_clean_arrow

        # factorize + bincount ≫ string-keyed transform('size')
        codes, _ = pd.factorize(g["word"], sort=False)
        df = pd.Series(np.bincount(codes)[codes], index=g.index)
        doc = g["doc_id"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            shard = ((doc * np.uint64(2654435761)) % np.uint64(nshards)).astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "word": g["word"].to_numpy(),
                "tf": g["tf"].to_numpy(),
                "df": df.to_numpy(),
                "score": g["tf"].to_numpy() * 1_000_000 // df.to_numpy(),
                "_shard": shard,
            }
        )
        return pandas_to_clean_arrow(
            out.astype({"doc_id": "int64", "word": "string", "tf": "int64",
                        "df": "int64", "score": "int64", "_shard": "int64"})
        )

    def pick_top(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        g = g.sort_values(
            ["doc_id", "score", "word"], ascending=[True, False, True], kind="mergesort"
        ).drop_duplicates("doc_id", keep="first")
        return pandas_to_clean_arrow(
            g[["doc_id", "word", "tf", "df", "score"]].astype(
                {"doc_id": "int64", "tf": "int64", "df": "int64", "score": "int64"}
            )
        )

    return (
        ds.map_batches(tf_batch, batch_format="pyarrow")
        .groupby("_wshard")
        .map_groups(score_in_shard, batch_format="pandas")
        .groupby("_shard")
        .map_groups(pick_top, batch_format="pandas")
    )


# --- quality score + language ID (actor-pool stage; rows-only check) ----

_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the a an and or of to in is are was were be been for with on at by "
        "from that this it as not but have has had do does did will would".split()
    ),
    "de": frozenset(
        "der die das und oder von zu in ist sind war waren sein für mit auf "
        "bei aus dass es als nicht aber haben hat hatte wird würde ein eine".split()
    ),
    "fr": frozenset(
        "le la les un une et ou de du des à dans est sont était pour avec "
        "sur par que ce il ne pas mais avoir a avait sera serait".split()
    ),
    "es": frozenset(
        "el la los las un una y o de del a en es son era para con sobre "
        "por que este no pero haber ha había será sería".split()
    ),
}


class TextScore:
    """Stateful scoring stage: stopword profiles + compiled regexes built
    once per actor/worker (the T1 memoized-init pattern).

    Emits: lang_pred (argmax stopword-hit ratio, deterministic 'en'-first
    tiebreak), stop_ratio, quality_score in [0,1] (length, alpha ratio,
    punct density, stopword presence — the classic heuristic mix).
    """

    def __init__(self):
        self.word = re.compile(r"[A-Za-z]+")
        self.profiles = {k: v for k, v in _LANG_STOPWORDS.items()}
        self.order = ["en", "de", "fr", "es"]  # deterministic tiebreak
        # one hash lookup per token instead of 4 set probes: word →
        # bitmask of languages whose stopword list contains it
        self.word2mask: dict[str, int] = {}
        for j, lang in enumerate(self.order):
            for w in self.profiles[lang]:
                self.word2mask[w] = self.word2mask.get(w, 0) | (1 << j)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        toks = texts.str.lower().str.findall(self.word)
        n_tok = toks.map(len).to_numpy()
        # flatten once, map word→lang-bitmask, count hits per (doc, lang)
        # with bincount — no per-token Python membership loop
        flat = pd.Series(
            [w for ws in toks for w in ws], dtype="object"
        )
        doc_idx = np.repeat(np.arange(len(texts)), n_tok)
        mask = (
            flat.map(self.word2mask).fillna(0).astype(np.int64).to_numpy()
            if len(flat)
            else np.zeros(0, dtype=np.int64)
        )
        hit_mat = np.stack(
            [
                np.bincount(doc_idx[(mask >> j) & 1 == 1], minlength=len(texts))
                for j in range(len(self.order))
            ]
        )
        best = hit_mat.argmax(axis=0)  # first (en) wins ties — argmax is first-max
        lang_pred = np.array(self.order, dtype=object)[best]
        lang_pred[hit_mat.max(axis=0) == 0] = "unknown"
        stop_ratio = hit_mat.max(axis=0) / np.maximum(n_tok, 1)
        n_chars = texts.str.len().to_numpy()
        alpha = texts.str.count("[A-Za-z]").to_numpy()
        punct = texts.str.count("[.,;:!?]").to_numpy()
        alpha_ratio = alpha / np.maximum(n_chars, 1)
        punct_density = punct / np.maximum(n_tok, 1)
        length_score = np.clip(n_tok / 50.0, 0, 1)
        quality = np.clip(
            0.35 * alpha_ratio + 0.25 * np.clip(stop_ratio * 4, 0, 1)
            + 0.25 * length_score + 0.15 * (1 - np.clip(punct_density, 0, 1)),
            0,
            1,
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": lang_pred,
                "stop_ratio": stop_ratio,
                "quality_score": quality,
            }
        )


def text_score(sf_dir: str, concurrency: int = 2) -> rd.Dataset:
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    # max_restarts=0: the stage is deterministic and stateless-per-batch;
    # silences ray#53727 (constructor args in object store + restarts)
    return ds.map_batches(
        TextScore, batch_format="pandas", batch_size=2048, concurrency=concurrency,
        max_restarts=0,
    )


# --- document fingerprinting (rolling hash; rows-only check) ------------

_FP_BASE = np.uint64(1_000_003)  # odd → invertible mod 2^64
_FP_INV = np.uint64(pow(1_000_003, -1, 1 << 64))


def _window_hashes(data: "bytes | np.ndarray", window: int) -> np.ndarray:
    """All rolling polynomial window-hashes of ``data`` (mod 2^64),
    fully vectorized: prefix sums of d[i]·B^(n-1-i) with uint64
    wraparound; W[j] = (S[j+w]−S[j])·B^−(n−j−w). ``data`` is raw bytes
    or a uint64 symbol array (e.g. unicode CODEPOINTS — the fingerprint
    ops hash codepoints so the DuckDB ``unicode(c)`` oracles match on
    non-ASCII text, not just the ASCII fixture)."""
    if isinstance(data, (bytes, bytearray)):
        d = np.frombuffer(data, dtype=np.uint8).astype(np.uint64) + np.uint64(1)
    else:
        d = data.astype(np.uint64) + np.uint64(1)
    n = len(d)
    w = min(window, n)
    if n == 0:
        return np.zeros(1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powers = np.empty(n, dtype=np.uint64)  # powers[i] = B^(n-1-i)
        powers[-1] = np.uint64(1)
        for_rev = np.full(n - 1, _FP_BASE, dtype=np.uint64)
        if n > 1:
            powers[:-1] = np.multiply.accumulate(for_rev[::-1])[::-1]
        terms = d * powers
        prefix = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(terms, out=prefix[1:])
        j = np.arange(n - w + 1)
        inv_pows = np.empty(n - w + 1, dtype=np.uint64)  # B^-(n-j-w)
        inv_pows[-1] = np.uint64(1)
        if len(j) > 1:
            inv_rev = np.full(len(j) - 1, _FP_INV, dtype=np.uint64)
            inv_pows[:-1] = np.multiply.accumulate(inv_rev[::-1])[::-1]
        return (prefix[j + w] - prefix[j]) * inv_pows


def fingerprint32(sf_dir: str) -> rd.Dataset:
    """SQL-checkable 32-bit full-content polynomial fingerprint:
    fp32 = (Σ (bytes[i]+1)·B^(n−1−i) mod 2⁶⁴) mod 2³², i.e. the low 32
    bits of the 64-bit fingerprint (2³² | 2⁶⁴ makes the truncation the
    exact mod-2³² Horner hash the DuckDB ``list_reduce`` oracle runs)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            cp = np.fromiter(map(ord, s or ""), dtype=np.uint64)
            h64 = _window_hashes(cp, max(len(cp), 1))[0] if len(cp) else np.uint64(0)
            out[i] = np.int64(h64 & np.uint64(0xFFFFFFFF))
        return pa.table({"doc_id": t["doc_id"], "fp32": out})

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprint(sf_dir: str, window: int = 32) -> rd.Dataset:
    """Per-doc fingerprints: full-content polynomial hash + winnowed
    min window-hash (the classic winnowing idea: the MINIMUM rolling
    hash is robust to local edits). Vectorized numpy per document."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        full = np.empty(len(texts), dtype=np.int64)
        winmin = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            cp = np.fromiter(map(ord, s or ""), dtype=np.uint64)
            full[i] = _window_hashes(cp, max(len(cp), 1))[:1].view(np.int64)[0]
            wh = _window_hashes(cp, window)
            winmin[i] = wh.min(keepdims=True).view(np.int64)[0]
        return pa.table({"doc_id": t["doc_id"], "fp_full": full, "fp_winmin": winmin})

    return ds.map_batches(fn, batch_format="pyarrow")


# --- hashed-linear classifier (batched model inference, SQL-checked) ----


class HashedLinearClassifier:
    """Batched MODEL-INFERENCE stage: a hashed bag-of-words linear
    classifier (the fastText-style quality/topic-filter shape every
    training-data pipeline runs at scale). The "model" is a hashed
    weight table — weight(w) = md5_lower64(w) % 1001 − 500 — so there is
    no weight file to load, yet the stage exercises the real pattern:
    stateful actor (the word→weight cache persists ACROSS batches, so a
    Zipf-distributed corpus hashes each frequent word once per actor,
    not once per batch), vectorized per-batch scoring (np.unique →
    hash-only-misses → np.add.at), integer scores (order-independent,
    hash-comparable). md5 keeps it DuckDB-reproducible bit for bit —
    swap ``_weights_for`` for a real embedding-table lookup and the Ray
    plumbing is unchanged."""

    def __init__(self):
        self._cache: dict[str, int] = {}

    def _weights_for(self, uniq: np.ndarray) -> np.ndarray:
        from ..pipelines.dedup import _md5_lower64

        miss = [w for w in uniq.tolist() if w not in self._cache]
        if miss:
            hw = (_md5_lower64(miss) % np.uint64(1001)).astype(np.int64) - 500
            self._cache.update(zip(miss, hw.tolist()))
        return np.array([self._cache[w] for w in uniq.tolist()], dtype=np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        words_per = [(s or "").split() for s in t["text"].to_pylist()]
        lens = np.array([len(w) for w in words_per], dtype=np.int64)
        scores = np.zeros(len(ids), dtype=np.int64)
        flat = [w for ws in words_per for w in ws]
        if flat:
            # hash-based factorize: ~40x faster than sort-based np.unique on
            # object strings; downstream is hash-per-unique + [inv] lookup,
            # so unique ORDER is irrelevant
            inv, uniq = pd.factorize(np.array(flat, dtype=object))
            w_all = self._weights_for(uniq)[inv]
            np.add.at(scores, np.repeat(np.arange(len(ids)), lens), w_all)
        label = np.where(scores > 0, "pos", "neg")
        return pa.table(
            {"doc_id": ids, "score": scores, "label": pa.array(label.tolist())}
        )


def text_classify(sf_dir: str, concurrency: int = 2) -> rd.Dataset:
    """Hashed-linear classify over documents (actor pool — the model
    cache is per-actor state built across batches)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        HashedLinearClassifier, batch_format="pyarrow", concurrency=concurrency,
        max_restarts=0,
    )


# --- feature-hashing embeddings (the hashing trick) ----------------------


def embed_counts(sf_dir: str, dim: int = 64) -> rd.Dataset:
    """Feature-hashing (hashing-trick) SPARSE embedding: per doc, each
    token hashes to bucket ``md5_lower64(w) % dim`` with sign
    ``±1 = md5 bit 63``; output is the signed count per non-empty
    (doc_id, bucket) — the exact integer sufficient statistics of the
    classic hashed bag-of-words embedding (Weinberger et al., feature
    hashing). SQL-checked: md5 on both sides, integer sums. One
    vectorized pass (np.unique → hash per distinct word → np.add.at),
    no shuffle at all — the groupby is per-doc within the batch."""
    from .dedup import _md5_lower64

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        words_per = [(s or "").split() for s in t["text"].to_pylist()]
        lens = np.array([len(w) for w in words_per], dtype=np.int64)
        flat = [w for ws in words_per for w in ws]
        if not flat:
            return pa.schema(
                [("doc_id", pa.int64()), ("bucket", pa.int64()),
                 ("signed_cnt", pa.int64())]
            ).empty_table()
        # hash-based factorize: ~40x faster than sort-based np.unique on
        # object strings; downstream is hash-per-unique + [inv] lookup,
        # so unique ORDER is irrelevant
        inv, uniq = pd.factorize(np.array(flat, dtype=object))
        h = _md5_lower64(list(uniq))
        bucket = (h % np.uint64(dim)).astype(np.int64)[inv]
        sign = np.where((h >> np.uint64(63)) & np.uint64(1) > 0, -1, 1).astype(
            np.int64
        )[inv]
        doc_idx = np.repeat(np.arange(len(ids)), lens)
        acc = np.zeros((len(ids), dim), dtype=np.int64)
        np.add.at(acc, (doc_idx, bucket), sign)
        nz_doc, nz_b = np.nonzero(acc)
        return pa.table(
            {
                "doc_id": ids[nz_doc].astype(np.int64),
                "bucket": nz_b.astype(np.int64),
                "signed_cnt": acc[nz_doc, nz_b],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def text_embed(sf_dir: str, dim: int = 64) -> rd.Dataset:
    """DENSE L2-normalized hashed embedding per doc (the float vector a
    downstream ANN / clustering stage consumes; ``embed_counts`` is its
    SQL-checked integer core). All-zero docs stay zero vectors."""
    from .dedup import _md5_lower64

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        words_per = [(s or "").split() for s in t["text"].to_pylist()]
        lens = np.array([len(w) for w in words_per], dtype=np.int64)
        acc = np.zeros((len(ids), dim), dtype=np.float64)
        flat = [w for ws in words_per for w in ws]
        if flat:
            # hash-based factorize: ~40x faster than sort-based np.unique on
            # object strings; downstream is hash-per-unique + [inv] lookup,
            # so unique ORDER is irrelevant
            inv, uniq = pd.factorize(np.array(flat, dtype=object))
            h = _md5_lower64(list(uniq))
            bucket = (h % np.uint64(dim)).astype(np.int64)[inv]
            sign = np.where((h >> np.uint64(63)) & np.uint64(1) > 0, -1.0, 1.0)[inv]
            doc_idx = np.repeat(np.arange(len(ids)), lens)
            np.add.at(acc, (doc_idx, bucket), sign)
        norm = np.maximum(np.linalg.norm(acc, axis=1), 1e-12)
        emb = (acc / norm[:, None]).astype(np.float32)
        return pa.table(
            {
                "doc_id": ids.astype(np.int64),
                "embedding": pa.array(list(emb), pa.list_(pa.float32(), dim)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- BPE vocabulary training (distributed iterative merge learning) ------


def _bpe_pairs(syms_list: list, cnts) -> pd.DataFrame:
    """PARTIAL weighted adjacent-pair counts over (syms, cnt) rows — the
    map side of one BPE iteration. The per-word loop is the nature of
    the algorithm, but it runs over the DISTINCT-WORD frequency table
    (the classic Sennrich formulation), which is orders of magnitude
    smaller than the corpus: counts are weighted by word frequency
    instead of touching every corpus token."""
    acc: dict[tuple[str, str], int] = {}
    for syms, c in zip(syms_list, cnts):
        c = int(c)
        for i in range(len(syms) - 1):
            k = (syms[i], syms[i + 1])
            acc[k] = acc.get(k, 0) + c
    ks = list(acc)
    return pd.DataFrame(
        {
            "a": [k[0] for k in ks],
            "b": [k[1] for k in ks],
            "n": np.array([acc[k] for k in ks], dtype=np.int64),
        }
    )


@ray.remote(num_cpus=1, num_returns=2)
def _bpe_init_task(block: pa.Table):
    """(sym-table state, first pair-count partial) for one block; the
    state stays in the object store across all merge iterations — only
    the SMALL pair partial is ever pulled to the driver."""
    syms_list = block["syms"].to_pylist()
    cnts = block["cnt"].to_numpy()
    return (syms_list, cnts), _bpe_pairs(syms_list, cnts)


@ray.remote(num_cpus=1, num_returns=2)
def _bpe_step_task(state, a: str, b: str):
    """Apply merge (a,b) to one block's sym table and count the NEXT
    iteration's pairs in the same task — one wave per merge."""
    syms_list, cnts = state
    m = a + b
    out = []
    for syms in syms_list:
        i, n, res = 0, len(syms), []
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                res.append(m)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        out.append(res)
    return (out, cnts), _bpe_pairs(out, cnts)


def bpe_train(sf_dir: str, num_merges: int = 30) -> pd.DataFrame:
    """Distributed BPE VOCABULARY TRAINING (Sennrich et al., subword
    NMT): learn the top-``num_merges`` byte-pair merges over the corpus.
    Output: (rank, left, right, pair_count) — the merge table a
    tokenizer ships.

    Ray-Data shape per the standard distributed formulation:
    1. ONE corpus pass builds the distinct-word frequency table
       (map_batches partial counts → groupby(word) Sum) — after this the
       corpus is never read again; all iterations run over the
       word-frequency Dataset, which is vocabulary-sized, not
       corpus-sized.
    2. Each of the ``num_merges`` iterations is ONE raw-task wave over
       the object-store-resident sym-table blocks (merge-apply fused
       with the next pair count, ``num_returns=2`` so only the SMALL
       pair partials reach the driver) → driver reduce → deterministic
       argmax (count desc, then lexicographic — retries/replays pick
       the same merge). Raw tasks instead of per-iteration
       ``map_batches``: the Dataset-executor startup (~0.5 s) would
       dominate 2×``num_merges`` times over; the block state never
       leaves the object store either way.
    Words carry the standard '</w>' end-of-word marker on their final
    symbol."""
    from ray.data.aggregate import Sum as _Sum

    docs = _read_docs(sf_dir, ["text"])

    def word_counts(t: pa.Table) -> pa.Table:
        flat: list[str] = []
        for s in t["text"].to_pylist():
            flat.extend((s or "").split())
        if not flat:
            return pa.schema(
                [("word", pa.string()), ("cnt", pa.int64())]
            ).empty_table()
        uniq, counts = np.unique(np.array(flat, dtype=object), return_counts=True)
        return pa.table(
            {"word": pa.array(list(uniq), pa.string()),
             "cnt": pa.array(counts.astype(np.int64), pa.int64())}
        )

    wf = (
        docs.map_batches(word_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(_Sum("cnt", alias_name="cnt"))
    )

    def to_syms(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("syms", pa.list_(pa.string())), ("cnt", pa.int64())]
            ).empty_table()
        syms = [
            list(w[:-1]) + [w[-1] + "</w>"] if w else []
            for w in t["word"].to_pylist()
        ]
        return pa.table(
            {"syms": pa.array(syms, pa.list_(pa.string())), "cnt": t["cnt"]}
        )

    cur = wf.map_batches(to_syms, batch_format="pyarrow").materialize()

    state_refs, pair_refs = [], []
    for bundle in cur.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if (meta.num_rows or 0) > 0:
                s, p = _bpe_init_task.remote(block_ref)
                state_refs.append(s)
                pair_refs.append(p)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        parts = [df for df in ray.get(pair_refs) if len(df)]
        if not parts:
            break
        agg = (
            pd.concat(parts, ignore_index=True)
            .groupby(["a", "b"], as_index=False)["n"].sum()
            .sort_values(["n", "a", "b"], ascending=[False, True, True])
        )
        if agg.empty or agg.iloc[0]["n"] < 2:
            break  # nothing repeats — further merges are noise
        best_a, best_b, best_n = (
            str(agg.iloc[0]["a"]), str(agg.iloc[0]["b"]), int(agg.iloc[0]["n"])
        )
        merges.append((rank, best_a, best_b, best_n))
        if rank + 1 < num_merges:
            outs = [_bpe_step_task.remote(s, best_a, best_b) for s in state_refs]
            state_refs = [o[0] for o in outs]
            pair_refs = [o[1] for o in outs]

    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": "int64", "pair_count": "int64"})


class BpeTokenizer:
    """Actor-pool BPE ENCODE stage: applies a learned merge table (rank
    priority, standard greedy lowest-rank-first) to every doc and emits
    per-doc BPE token counts — the data-budgeting number a training
    pipeline schedules by.

    Stateful-actor shape: the merge-rank dict is built once per actor in
    ``__init__`` from the broadcast merge table, and a per-WORD memo
    grows across batches — tokenization is a pure function of the word,
    and corpus word frequency is Zipfian, so the memo's hit rate
    approaches 1 after the first batches (the classic tokenizer-server
    optimization)."""

    def __init__(self, merges_ref):
        import ray

        merges = ray.get(merges_ref)  # small (rank, left, right) table
        self.ranks = {
            (l, r): k for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
        }
        self.memo: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        n = self.memo.get(word)
        if n is not None:
            return n
        syms = list(word[:-1]) + [word[-1] + "</w>"] if word else []
        while len(syms) > 1:
            best_i, best_rank = -1, None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_i, best_rank = i, r
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        n = len(syms)
        self.memo[word] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        out = np.empty(t.num_rows, dtype=np.int64)
        for j, s in enumerate(t["text"].to_pylist()):
            out[j] = sum(self._encode_len(w) for w in (s or "").split())
        return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": pa.array(out)})


def bpe_tokenize_counts(
    sf_dir: str, num_merges: int = 10, concurrency: int = 2
) -> rd.Dataset:
    """Train-then-apply: learn ``num_merges`` BPE merges
    (:func:`bpe_train`), broadcast the merge table once, and stream the
    corpus through the :class:`BpeTokenizer` actor pool → per-doc BPE
    token counts. Rows-only query (iterative training has no SQL form);
    engine ≡ brute-force reference pinned in tests/test_bpe.py."""
    import ray

    merges = bpe_train(sf_dir, num_merges=num_merges)
    merges_ref = ray.put(
        {
            "rank": merges["rank"].tolist(),
            "left": merges["left"].tolist(),
            "right": merges["right"].tolist(),
        }
    )
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        BpeTokenizer,
        fn_constructor_kwargs={"merges_ref": merges_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        max_restarts=0,
    )


def inverted_index(
    sf_dir: str, min_df: int = 2, max_df: int = 1000
) -> rd.Dataset:
    """Sharded INVERTED-INDEX build — the search-engine product of a
    crawl corpus: for every term with document frequency in
    [min_df, max_df], its document-frequency count and the full sorted
    posting list (comma-joined doc_ids). The df band is the standard
    index-pruning hatch: stopword-frequency terms (df > max_df here;
    Zipf's head) would make single postings corpus-sized — production
    indexes chunk those, diagnostics drop them — and hapax terms carry
    no retrieval signal.

    Shape: per-batch DISTINCT (term, doc_id) explode → terms hash-route
    to ``nshards`` coarse shards (a groupby keyed on the raw term string
    = one sort boundary per DISTINCT term — measured 40 s at 46k terms
    where the sharded shape takes ~3 s; same lesson as ``_sharded_agg``)
    → posting assembly vectorized inside one map_groups call per shard.
    At 100 TB the digest-key trick from the exact dedup (hash64 the
    term, keep one exemplar string) also halves the shuffle bytes.
    SQL-checked: DuckDB string_agg over the same distinct pairs."""
    from ..hashing import hash64_np

    nshards = 32
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        words_per = [(s or "").split() for s in t["text"].to_pylist()]
        lens = np.array([len(w) for w in words_per], dtype=np.int64)
        flat = np.array(
            [w for ws in words_per for w in ws], dtype=object
        )
        if len(flat) == 0:
            return pa.schema(
                [("term", pa.string()), ("doc_id", pa.int64()),
                 ("_shard", pa.int64())]
            ).empty_table()
        doc = np.repeat(ids, lens)
        pairs = pd.DataFrame({"term": flat, "doc_id": doc}).drop_duplicates()
        uniq = pairs["term"].unique()
        smap = dict(zip(uniq, (hash64_np(list(uniq)) % np.uint64(nshards)).astype(np.int64)))
        return pa.table(
            {
                "term": pa.array(pairs["term"].tolist(), pa.string()),
                "doc_id": pairs["doc_id"].to_numpy().astype(np.int64),
                "_shard": pa.array(pairs["term"].map(smap).to_numpy(), pa.int64()),
            }
        )

    def postings(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        # multiple batches may re-emit the same (term, doc) pair
        g = g.drop(columns=["_shard"]).drop_duplicates(["term", "doc_id"])
        g = g.sort_values(["term", "doc_id"])
        # df-band filter BEFORE string assembly, so Zipf-head terms never
        # pay the posting-join cost
        df_counts = g.groupby("term")["doc_id"].transform("size")
        g = g[(df_counts >= min_df) & (df_counts <= max_df)]
        agg = g.groupby("term", as_index=False).agg(
            df=("doc_id", "size"),
            postings=("doc_id", lambda s: ",".join(map(str, s))),
        )
        return pandas_to_clean_arrow(
            agg.astype({"term": "string", "df": "int64", "postings": "string"})
        )

    from .dedup import ensure_schema

    out_schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
    )
    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(postings, batch_format="pandas")
        .map_batches(ensure_schema(out_schema), batch_format="pyarrow")
    )


def collocations(
    sf_dir: str, k: int = 20, min_count: int = 3, nshards: int = 32
) -> pd.DataFrame:
    """Top-k BIGRAM COLLOCATIONS by integer PMI surrogate — the classic
    corpus-statistics pass (Church & Hanks pointwise mutual information)
    that finds multi-word expressions. Rank score =
    ``c_xy · 10¹² // (c_x · c_y)`` — monotone in PMI because the global
    N factors are shared by every bigram, and integer so the result is
    order-independent and SQL-hash-comparable. ``min_count`` is the
    standard low-frequency cutoff (PMI explodes on hapax pairs).

    Shape: ONE corpus pass emits per-batch partial unigram AND bigram
    counts; unigram totals reduce to a vocab-sized table (broadcast via
    ``ray.put`` — the textbook small side; at a 100-TB corpus the pruned
    counting vocabulary is still MBs), bigram partials hash-shard-reduce
    with in-shard scoring + top-k prefilter, driver merges ≤ k·shards
    rows. int64 bound: c_xy·10¹² needs c_xy < 9.2e6 — assert guards it
    (beyond that, rescale the surrogate)."""
    import ray

    from ..hashing import hash64_np

    ds = _read_docs(sf_dir, ["text"])

    def partials(t: pa.Table) -> pa.Table:
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        for s in t["text"].to_pylist():
            ws = (s or "").split()
            for w in ws:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ws, ws[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        w1 = [w for w in uni] + [p[0] for p in bi]
        w2 = [""] * len(uni) + [p[1] for p in bi]
        cnt = list(uni.values()) + list(bi.values())
        kind = np.concatenate(
            [np.zeros(len(uni), np.int64), np.ones(len(bi), np.int64)]
        )
        shard = (
            hash64_np([a + "\x1f" + b for a, b in zip(w1, w2)]) % np.uint64(nshards)
        ).astype(np.int64)
        return pa.table(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
                "kind": pa.array(kind),
                "_shard": pa.array(shard),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow")

    def shard_sum(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        agg = g.groupby(["kind", "w1", "w2"], as_index=False)["cnt"].sum()
        return pandas_to_clean_arrow(
            agg.astype({"kind": "int64", "w1": "string", "w2": "string", "cnt": "int64"})
        )

    from .dedup import ensure_schema

    counted = (
        parts.groupby("_shard")
        .map_groups(shard_sum, batch_format="pandas")
        .map_batches(
            ensure_schema(pa.schema(
                [("kind", pa.int64()), ("w1", pa.string()), ("w2", pa.string()),
                 ("cnt", pa.int64())]
            )),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # unigram totals: vocab-sized by construction → broadcast dict
    uni_df = counted.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    uni_ref = ray.put(dict(zip(uni_df["w1"], uni_df["cnt"].astype(int))))

    def score_topk(t: pa.Table) -> pa.Table:
        u = ray.get(uni_ref)
        df = t.to_pandas()
        df = df[(df["kind"] == 1) & (df["cnt"] >= min_count)]
        if df.empty:
            return pa.schema(
                [("w1", pa.string()), ("w2", pa.string()),
                 ("pair_cnt", pa.int64()), ("pmi_score", pa.int64())]
            ).empty_table()
        assert int(df["cnt"].max()) < 9_200_000, "rescale the PMI surrogate"
        c1 = df["w1"].map(u).astype("int64")
        c2 = df["w2"].map(u).astype("int64")
        score = df["cnt"].astype("int64") * 1_000_000_000_000 // (c1 * c2)
        out = pd.DataFrame(
            {"w1": df["w1"], "w2": df["w2"],
             "pair_cnt": df["cnt"].astype("int64"), "pmi_score": score}
        ).sort_values(["pmi_score", "w1", "w2"], ascending=[False, True, True]).head(k)
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(
            out.astype({"w1": "string", "w2": "string",
                        "pair_cnt": "int64", "pmi_score": "int64"})
        )

    merged = (
        counted.map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()  # ≤ k×blocks rows
        .sort_values(["pmi_score", "w1", "w2"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
    )
    return merged.astype(
        {"w1": "object", "w2": "object", "pair_cnt": "int64", "pmi_score": "int64"}
    )


# --- Gopher-style repetition signals (SQL-checked) -----------------------


def gopher_repetition(sf_dir: str) -> rd.Dataset:
    """Per-doc repetition-quality signals (the Gopher/MassiveText rules,
    Rae et al. 2021 §A1.1: "fraction of characters in the most common
    n-gram" family), with the float threshold cleared to an exact
    integer cross-multiply: a doc is flagged ``is_repetitive`` when its
    top bigram covers > 1/5 of all bigram occurrences
    (``top_bigram_count * 5 > n_bigrams``). Embarrassingly parallel —
    bigrams never leave the batch (each doc's statistic is local), so
    there is NO shuffle at any corpus size; one vectorized pandas
    value_counts per batch. Reference analog: the extractor quality
    filters the reference lacks (flat_crawler/handler.go only
    drops unparseable rows) — this is the training-corpus version."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        words_per = [(s or "").split() for s in t["text"].to_pylist()]
        lens = np.array([len(w) for w in words_per], dtype=np.int64)
        n_bg = np.zeros(len(ids), dtype=np.int64)
        n_distinct = np.zeros(len(ids), dtype=np.int64)
        top = np.zeros(len(ids), dtype=np.int64)
        flat = [w for ws in words_per for w in ws]
        if flat:
            allw = np.array(flat, dtype=object)
            didx = np.repeat(np.arange(len(ids)), lens)
            same = didx[:-1] == didx[1:]
            if same.any():
                bdoc = didx[:-1][same]
                bg = pd.Series(allw[:-1][same]).str.cat(
                    pd.Series(allw[1:][same]), sep=" "
                )
                cnt = (
                    pd.DataFrame({"d": bdoc, "bg": bg.to_numpy()})
                    .groupby(["d", "bg"], sort=False)
                    .size()
                )
                per = cnt.groupby(level=0).agg(["sum", "count", "max"])
                di = per.index.to_numpy().astype(np.int64)
                n_bg[di] = per["sum"].to_numpy()
                n_distinct[di] = per["count"].to_numpy()
                top[di] = per["max"].to_numpy()
        return pa.table(
            {
                "doc_id": ids,
                "n_bigrams": n_bg,
                "n_distinct_bigrams": n_distinct,
                "top_bigram_count": top,
                "is_repetitive": (top * 5 > n_bg) & (n_bg > 0),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- conjunctive keyword search over the corpus (SQL-checked) ------------

SEARCH_TERMS = ("table", "hash", "sort")


def search_conjunctive(sf_dir: str, terms: tuple = SEARCH_TERMS, k: int = 20) -> rd.Dataset:
    """Top-k docs containing ALL query terms, ranked by summed term
    frequency (ties → doc_id asc): the conjunctive (AND) retrieval
    primitive behind corpus search / targeted-subset extraction. Scale
    shape: the term set is a tiny broadcast constant; each batch
    reduces to its matching docs via one np.isin + bincount pass, then
    a per-batch top-k prefilter caps what the global sort sees at
    k×blocks rows — no fact-table shuffle, no inverted index needed
    for a fixed small query. (For many-query workloads see
    ``inverted_index``, which amortizes the posting build.)"""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    term_list = list(terms)
    nt = len(term_list)
    tmap = {w: i for i, w in enumerate(term_list)}

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        words_per = [(s or "").split() for s in t["text"].to_pylist()]
        lens = np.array([len(w) for w in words_per], dtype=np.int64)
        empty = pa.schema(
            [("doc_id", pa.int64()), ("tf_total", pa.int64())]
        ).empty_table()
        flat = [w for ws in words_per for w in ws]
        if not flat:
            return empty
        allw = np.array(flat, dtype=object)
        didx = np.repeat(np.arange(len(ids)), lens)
        hit = np.isin(allw, term_list)
        if not hit.any():
            return empty
        tidx = np.array([tmap[w] for w in allw[hit].tolist()], dtype=np.int64)
        acc = np.zeros((len(ids), nt), dtype=np.int64)
        np.add.at(acc, (didx[hit], tidx), 1)
        ok = (acc > 0).all(axis=1)
        if not ok.any():
            return empty
        out = pd.DataFrame(
            {"doc_id": ids[ok].astype(np.int64), "tf_total": acc[ok].sum(axis=1)}
        ).sort_values(["tf_total", "doc_id"], ascending=[False, True]).head(k)
        return pa.table(
            {"doc_id": pa.array(out["doc_id"].to_numpy()),
             "tf_total": pa.array(out["tf_total"].to_numpy())}
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .sort(["tf_total", "doc_id"], descending=[True, False])
        .limit(k)
    )
    from .dedup import pandas_with_schema

    return pandas_with_schema(out, {"doc_id": "int64", "tf_total": "int64"})


# --- BM25-surrogate ranked retrieval (SQL-checked) ------------------------


def bm25_topk(sf_dir: str, terms: tuple = SEARCH_TERMS, k: int = 20) -> rd.Dataset:
    """Disjunctive (OR) ranked retrieval with an integer BM25 surrogate:
    ``score = Σ_terms idf_i · sat(tf)`` where
    ``idf_i = 1_000_000·(N − df_i) // (df_i + 1)`` (Robertson idf with
    the log dropped — rank-monotone in df) and
    ``sat(tf) = tf·1000 // (tf + 2)`` (the k1=2 saturation curve,
    integer-floored) — every division is integer floor division on BOTH
    sides, so ranking is bit-exact SQL-checkable (ties → doc_id asc).

    Scale shape: one corpus pass emits only the matching postings
    (doc_id, term, tf); df then falls out of the postings themselves
    (count per term — a |terms|-row aggregate, no second scan; N comes
    from the read metadata via ds.count()); scoring is a vectorized
    map over postings with the tiny df map broadcast in the closure;
    a per-batch top-k prefilter caps the global sort at k×blocks."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    term_list = list(terms)
    tmap = {w: i for i, w in enumerate(term_list)}
    n_docs = ds.count()  # parquet metadata — no data scan

    empty_post = pa.schema(
        [("doc_id", pa.int64()), ("term_idx", pa.int64()), ("tf", pa.int64())]
    ).empty_table()

    def postings(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        words_per = [(s or "").split() for s in t["text"].to_pylist()]
        lens = np.array([len(w) for w in words_per], dtype=np.int64)
        flat = [w for ws in words_per for w in ws]
        if not flat:
            return empty_post
        allw = np.array(flat, dtype=object)
        didx = np.repeat(np.arange(len(ids)), lens)
        hit = np.isin(allw, term_list)
        if not hit.any():
            return empty_post
        tidx = np.array([tmap[w] for w in allw[hit].tolist()], dtype=np.int64)
        acc = np.zeros((len(ids), len(term_list)), dtype=np.int64)
        np.add.at(acc, (didx[hit], tidx), 1)
        nz_d, nz_t = np.nonzero(acc)
        return pa.table(
            {
                "doc_id": ids[nz_d].astype(np.int64),
                "term_idx": nz_t.astype(np.int64),
                "tf": acc[nz_d, nz_t],
            }
        )

    posts = ds.map_batches(postings, batch_format="pyarrow").materialize()
    # df per term from the postings (tiny: ≤ |terms| rows)
    from .dedup import pandas_with_schema

    df_rows = pandas_with_schema(
        posts.groupby("term_idx").count(),
        {"term_idx": "int64", "count()": "int64"},
    )
    df_map = np.zeros(len(term_list), dtype=np.int64)
    if len(df_rows):
        df_map[df_rows["term_idx"].to_numpy()] = df_rows["count()"].to_numpy()
    idf = 1_000_000 * (n_docs - df_map) // (df_map + 1)

    # a doc's text is ONE row in ONE block, so all its postings are
    # emitted together — the per-doc sum is final within a block; score
    # + top-k prefilter per block, tiny global sort, done (no shuffle)
    def score_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("score", pa.int64())]
            ).empty_table()
        tf = t["tf"].to_numpy()
        part = idf[t["term_idx"].to_numpy()] * (tf * 1000 // (tf + 2))
        agg = (
            pd.DataFrame({"doc_id": t["doc_id"].to_numpy(), "score": part})
            .groupby("doc_id", as_index=False)["score"].sum()
            .sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)
        )
        return pa.table(
            {"doc_id": pa.array(agg["doc_id"].to_numpy()),
             "score": pa.array(agg["score"].to_numpy())}
        )

    out = (
        posts.map_batches(score_topk, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )
    return pandas_with_schema(out, {"doc_id": "int64", "score": "int64"})


# --- langid model evaluation: confusion matrix (SQL-checked) -------------


class _LangidConfusion(TextScore):
    """TextScore's langid head + the gold ``lang`` column → per-batch
    (lang, lang_pred, n) partials. Inherits the once-per-actor profile
    build (T1 pattern); the batch reduces to ≤ |langs|² rows."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scored = super().__call__(batch[["doc_id", "text"]])
        df = pd.DataFrame(
            {"lang": batch["lang"].fillna("").to_numpy(),
             "lang_pred": scored["lang_pred"].to_numpy()}
        )
        g = df.groupby(["lang", "lang_pred"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return g.astype({"lang": "object", "lang_pred": "object", "n": "int64"})


def langid_confusion(sf_dir: str, concurrency: int = 2) -> pd.DataFrame:
    """Model evaluation over the corpus: confusion matrix of the langid
    head against the gold ``lang`` labels — the per-class
    accuracy/confusion report an offline-eval pipeline emits after any
    classifier stage. Scale shape: per-batch partials are ≤ |langs|²
    rows, the final fold is a driver groupby over blocks×|langs|² rows
    — no shuffle of any corpus-sized table."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    partials = ds.map_batches(
        _LangidConfusion, batch_format="pandas", concurrency=concurrency,
        max_restarts=0,
    )
    from .dedup import pandas_with_schema

    df = pandas_with_schema(
        partials, {"lang": "object", "lang_pred": "object", "n": "int64"}
    )
    out = (
        df.groupby(["lang", "lang_pred"], as_index=False)["n"].sum()
        .sort_values(["lang", "lang_pred"])
        .reset_index(drop=True)
    )
    return out.astype({"lang": "object", "lang_pred": "object", "n": "int64"})


# --- winnowing fingerprint collisions (MOSS-style; SQL-checked) ----------


def fingerprint_collisions(
    sf_dir: str,
    window: int = 16,
    guarantee: int = 8,
    min_shared: int = 2,
    fp_cap: int | None = None,
    nshards: int = 32,
) -> pd.DataFrame:
    """Document pairs sharing ≥ ``min_shared`` WINNOWED fingerprints —
    the Schleimer-Wilkerson-Aiken (MOSS) local-similarity channel:
    positional ``window``-char rolling hashes, winnowed to the minimum
    of every ``guarantee`` consecutive hashes (any shared substring of
    length ≥ window+guarantee−1 is guaranteed to collide), distinct per
    doc. Complements the jaccard/minhash/simhash family: it detects
    LOCAL copied spans, not global set overlap.

    Scale shape = the shared pair-engine pattern (_exact_jaccard_pairs):
    per-batch winnow (vectorized sliding-min per doc), distinct (fp,
    doc) rows sharded by fp → per-shard self-merge emits pair partials →
    pair-hash-shard combine + threshold. ``fp_cap`` is the hot-key
    hatch (drop fps shared by more than cap docs); None keeps
    exactness for the SQL oracle, which mirrors the winnow via a
    ROWS-window MIN over the same Horner window hashes."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode_fps(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        rows_doc, rows_fp = [], []
        for did, s in zip(ids, t["text"].to_pylist()):
            cp = np.fromiter(map(ord, s or ""), dtype=np.uint64)
            if len(cp) == 0:  # no content → no fingerprints (oracle parity)
                continue
            wh = _window_hashes(cp, window)
            if len(wh) >= guarantee:
                sel = np.lib.stride_tricks.sliding_window_view(
                    wh, guarantee
                ).min(axis=1)
            else:
                sel = wh.min(keepdims=True)
            u = np.unique(sel)
            rows_doc.append(np.full(len(u), did, dtype=np.int64))
            rows_fp.append(u.view(np.int64))
        if not rows_doc:
            return pa.schema(
                [("fp", pa.int64()), ("doc_id", pa.int64()), ("shard", pa.int32())]
            ).empty_table()
        fp = np.concatenate(rows_fp)
        did = np.concatenate(rows_doc)
        shard = (fp.view(np.uint64) % np.uint64(nshards)).astype(np.int32)
        return pa.table({"fp": fp, "doc_id": did, "shard": shard})

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        from .. import pandas_to_clean_arrow

        if fp_cap is not None:
            df = g.groupby("fp")["doc_id"].transform("size")
            g = g[df <= fp_cap]
        m = g.merge(g, on="fp", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        agg = m.groupby(["doc_id_a", "doc_id_b"], as_index=False).agg(
            n=("fp", "size")
        )
        a64 = agg["doc_id_a"].to_numpy(dtype=np.int64, na_value=0).astype(np.uint64)
        b64 = agg["doc_id_b"].to_numpy(dtype=np.int64, na_value=0).astype(np.uint64)
        with np.errstate(over="ignore"):
            agg["pshard"] = (
                ((a64 * np.uint64(0x9E3779B97F4A7C15)) ^ b64) % np.uint64(nshards)
            ).astype(np.int64)
        return pandas_to_clean_arrow(agg.astype(
            {"doc_id_a": "int64", "doc_id_b": "int64", "n": "int64", "pshard": "int64"}
        ))

    def combine_threshold(g: pd.DataFrame) -> pd.DataFrame:
        from .. import pandas_to_clean_arrow

        m = g.groupby(["doc_id_a", "doc_id_b"], as_index=False).agg(
            n_shared=("n", "sum")
        )
        m = m[m["n_shared"] >= min_shared]
        return pandas_to_clean_arrow(
            m.astype({"doc_id_a": "int64", "doc_id_b": "int64", "n_shared": "int64"})
        )

    from .dedup import pandas_with_schema

    out = (
        ds.map_batches(explode_fps, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby("pshard")
        .map_groups(combine_threshold, batch_format="pandas")
    )
    df = pandas_with_schema(
        out, {"doc_id_a": "int64", "doc_id_b": "int64", "n_shared": "int64"}
    )
    return df.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)


# --- corpus-LM predictability score (SQL-checked) -------------------------


def lm_score(sf_dir: str, nshards: int = 32) -> rd.Dataset:
    """CCNet-style LM quality proxy with the log dropped: per doc the
    sum over its bigram TOKENS of the integer conditional-probability
    surrogate ``(c(xy)·10⁶) // c(x·)`` where c(xy) is the corpus count
    of the bigram and c(x·) the corpus count of x as a bigram head.
    High = predictable/common phrasing, low = novel or noisy — the
    screen CCNet implements with a KenLM perplexity and a float log;
    integer floor division keeps it bit-exact SQL-checkable.

    Scale shape (the ``top_keyword`` co-partition trick, one level up):
    every bigram occurrence routes by hash(head word), so ONE shuffle
    co-locates everything both counts need — c(xy) and c(x·) are
    in-shard ``transform('size')`` lookups, no count table exists as a
    separate dataset and no join runs; per-doc partials then meet in a
    doc-hash shard reduce (second slim shuffle). Zero-bigram docs ride
    along as explicit zero partials, not a driver-side backfill."""
    from ..hashing import hash64_np

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        # the shuffle carries 64-bit HASHES of head word and bigram, not
        # the strings (the jaccard engine's hashed-shingle precedent:
        # count-by-equality tolerates the ~1e-8 64-bit collision odds,
        # and int groupbys are several times faster than object-string
        # ones); pad rows keep bigram-less docs in the result
        ids = t["doc_id"].to_numpy()
        words_per = [(s or "").split() for s in t["text"].to_pylist()]
        lens = np.array([len(w) for w in words_per], dtype=np.int64)
        zdoc = ids.astype(np.int64)
        parts_doc = np.empty(0, np.int64)
        hx = hb = np.empty(0, np.uint64)
        flat = [w for ws in words_per for w in ws]
        if flat:
            allw = np.array(flat, dtype=object)
            didx = np.repeat(np.arange(len(ids)), lens)
            same = didx[:-1] == didx[1:]
            if same.any():
                parts_doc = ids[didx[:-1][same]].astype(np.int64)
                xs = allw[:-1][same]
                bgs = pd.Series(xs).str.cat(
                    pd.Series(allw[1:][same]), sep=" "
                ).to_numpy(dtype=object)
                uniq, inv = np.unique(
                    np.concatenate([xs, bgs]), return_inverse=True
                )
                hu = hash64_np(uniq.tolist())
                hx = hu[inv[: len(xs)]]
                hb = hu[inv[len(xs):]]
        n_b = len(parts_doc)
        doc = np.concatenate([zdoc, parts_doc])
        x64 = np.concatenate([np.zeros(len(zdoc), np.uint64), hx]).view(np.int64)
        b64 = np.concatenate([np.zeros(len(zdoc), np.uint64), hb]).view(np.int64)
        is_pad = np.concatenate([np.ones(len(zdoc), np.int8), np.zeros(n_b, np.int8)])
        shard = (x64.view(np.uint64) % np.uint64(nshards)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "x": pa.array(x64),
                "bg": pa.array(b64),
                "is_pad": pa.array(is_pad, pa.int8()),
                "_shard": pa.array(shard),
            }
        )

    def shard_score(g: pd.DataFrame) -> pd.DataFrame:
        from .. import pandas_to_clean_arrow

        pads = g[g["is_pad"] == 1]
        real = g[g["is_pad"] == 0]
        rows = [pd.DataFrame({"doc_id": pads["doc_id"].to_numpy(),
                              "part": np.zeros(len(pads), np.int64)})]
        if len(real):
            cx = real.groupby("x")["doc_id"].transform("size").to_numpy()
            cxy = real.groupby("bg")["doc_id"].transform("size").to_numpy()
            score = (cxy.astype(np.int64) * 1_000_000) // cx.astype(np.int64)
            rows.append(
                pd.DataFrame({"doc_id": real["doc_id"].to_numpy(), "part": score})
                .groupby("doc_id", as_index=False)["part"].sum()
            )
        out = pd.concat(rows, ignore_index=True)
        out = out.groupby("doc_id", as_index=False)["part"].sum()
        return pandas_to_clean_arrow(out.astype({"doc_id": "int64", "part": "int64"}))

    from .relational import _sharded_agg

    scored = _sharded_agg(
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_score, batch_format="pandas"),
        "doc_id",
        {"lm_score": ("part", "sum")},
        nshards=nshards,
    )
    from .dedup import pandas_with_schema

    df = pandas_with_schema(scored, {"doc_id": "int64", "lm_score": "int64"})
    return df.sort_values("doc_id").reset_index(drop=True)
