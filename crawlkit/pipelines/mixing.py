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
import pandas as pd
import pyarrow as pa
import ray.data as rd

from crawlkit.hashing import md5_lower64_ids

from .dedup import _md5_lower64, _read_docs

# default mixture: per-mille keep rate per language (the source axis the
# fixture carries); unlisted sources fall back to DEFAULT_RATE
MIX_RATES: dict[str, int] = {"en": 1000, "de": 600, "fr": 600, "es": 400, "zh": 300}
DEFAULT_RATE = 250


def _id_hash(ids: np.ndarray) -> np.ndarray:
    """md5-low64 of the DECIMAL doc_id string — the stable per-row coin
    (fully vectorized: numpy digit synthesis + one-block MD5)."""
    return md5_lower64_ids(ids)


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


def assemble_corpus(
    sf_dir: str,
    tau_tenths: int = 2,
    bench_mod: int = 97,
    rates: dict[str, int] | None = None,
    train_pct: int = 80,
    val_pct: int = 10,
) -> rd.Dataset:
    """END-TO-END training-corpus assembly — the flagship composition a
    reference user actually runs: near-dup dedup (keep each Jaccard
    cluster's min-id representative) → eval-set exclusion + n-gram
    decontamination → source-weighted mixture downsample → deterministic
    train/val/test split. Output: (doc_id, lang, split) — the corpus
    manifest a trainer consumes.

    Scale shape: the two drop sets are OUTPUTS of the dedup/decontam
    stages (O(near-dups) and O(contaminated) — ~1% of corpus each, not
    corpus-sized), so they broadcast once via ``ray.put``; the corpus
    itself streams through ONE vectorized map pass (bench-slice filter,
    ``pc.is_in`` anti-filters, two md5 coins). If a drop set ever
    outgrew a broadcast, the join-back shape from
    ``minhash_lsh_pairs``' verify applies. The split coin is salted
    (``id || ':split'``) so it is independent of the mix coin. Fully
    SQL-checked: every stage reuses an already-green oracle CTE."""
    import ray
    import pyarrow.compute as pc

    from .dedup import decontaminate, dedup_clusters

    clusters = dedup_clusters(sf_dir, tau_tenths)  # small pd.DataFrame
    drop_dups = clusters.loc[
        clusters["doc_id"] != clusters["cluster_id"], "doc_id"
    ].to_numpy()
    contam = decontaminate(sf_dir, bench_mod)["doc_id"].to_numpy()
    drop = np.union1d(drop_dups.astype(np.int64), contam.astype(np.int64))
    drop_ref = ray.put(pa.array(drop, pa.int64()))
    rates = MIX_RATES if rates is None else rates
    names = np.array(["train", "val", "test"])

    ds = _read_docs(sf_dir, ["doc_id", "lang"])

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t["doc_id"].to_numpy() % bench_mod != 0))
        t = t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=ray.get(drop_ref))))
        ids = t["doc_id"].to_numpy()
        langs = t["lang"].to_pylist()
        rate = np.array([rates.get(l, DEFAULT_RATE) for l in langs], dtype=np.int64)
        coin = (_id_hash(ids) % np.uint64(1000)).astype(np.int64)
        keep = coin < rate
        ids = ids[keep]
        langs = [l for l, k in zip(langs, keep) if k]
        sbucket = (md5_lower64_ids(ids, ":split") % np.uint64(100)).astype(np.int64)
        code = np.where(
            sbucket < train_pct, 0, np.where(sbucket < train_pct + val_pct, 1, 2)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "split": pa.array(names[code].tolist(), pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def group_sample(sf_dir: str, k: int = 20, nshards: int = 32) -> rd.Dataset:
    """Deterministic PER-GROUP UNIFORM SAMPLE: for every language, the
    ``k`` docs with the smallest md5 coin — "give me a balanced
    inspection subset of every source" without a global sort or an RNG.
    The coin ordering is a uniform random permutation (md5 is a PRF of
    the id) yet fully reproducible and partition-invariant; ties cannot
    occur (the coin is the 64-bit hash of a unique id).

    Shape: hash-shard by group → per-shard vectorized head-k (each
    shard holds all of a group's rows) → driver-free; the per-group
    winner set is k·|groups| rows. SQL oracle: QUALIFY row_number()
    OVER (PARTITION BY lang ORDER BY coin, doc_id) <= k."""
    ds = _read_docs(sf_dir, ["doc_id", "lang"])

    def add_coin(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        langs = t["lang"].to_pylist()
        coin = _id_hash(ids).astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)
        # stable group→shard route (Python's hash() is process-seeded —
        # it would split a group across shards between workers)
        uniq = sorted(set(langs))
        smap = {
            l: int(h % np.uint64(nshards))
            for l, h in zip(uniq, _md5_lower64(uniq))
        }
        shard = np.array([smap[l] for l in langs], dtype=np.int64)
        # PARTIAL head-k inside the batch: a batch can contribute at most
        # k winners per group, so the shuffle ships k·|groups| rows per
        # batch instead of the corpus (same partial-before-shuffle rule
        # as every aggregate here)
        df = pd.DataFrame(
            {"doc_id": ids.astype(np.int64), "lang": langs, "coin": coin,
             "_shard": shard}
        ).sort_values(["lang", "coin", "doc_id"])
        df = df.groupby("lang", as_index=False, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def head_k(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        g = g.sort_values(["lang", "coin", "doc_id"])
        out = g.groupby("lang", as_index=False, sort=False).head(k)
        return pandas_to_clean_arrow(
            out[["doc_id", "lang", "coin"]].astype(
                {"doc_id": "int64", "lang": "string", "coin": "int64"}
            )
        )

    from .dedup import ensure_schema

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("coin", pa.int64())]
    )
    return (
        ds.map_batches(add_coin, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(head_k, batch_format="pandas")
        .map_batches(ensure_schema(out_schema), batch_format="pyarrow")
    )


# --- sequence packing: concatenate-and-chunk (distributed prefix sum) ----


def pack_sequences(sf_dir: str, seq_len: int = 128) -> rd.Dataset:
    """GPT-style sample packing: conceptually concatenate every doc's
    token stream in doc_id order and chunk it into fixed ``seq_len``
    training sequences; report, per non-empty doc, its absolute token
    offset and the first/last sequence it lands in (the packing
    manifest a loader needs to slice sequences without re-tokenizing).

    The distributed primitive here is an exact PREFIX SUM, which Ray
    Data has no operator for: (1) reduce each doc to its whitespace
    token count (slim rows, Arrow regex kernel), (2) range-sort by
    doc_id — the one shuffle, and of counts only, never text, (3) one
    O(#blocks) metadata pass sums each sorted block (tiny ray tasks
    over materialized block refs — same pattern as _CtrlCollector),
    (4) the driver folds block sums into exclusive offsets (O(blocks)
    state), and (5) each block adds its scalar offset and derives
    seq_first/seq_last locally. Steps 3+5 touch each row once; at 100
    TB the driver holds one int per block."""
    import ray

    from . import text as _t  # noqa: F401  (token definition parity)
    from ..pipelines.relational import _read

    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        out = pa.table({"doc_id": t["doc_id"], "n_tokens": n})
        return out.filter(pc.greater(out["n_tokens"], 0))

    slim = ds.map_batches(counts, batch_format="pyarrow").sort("doc_id")
    # materialize() so the sorted result executes ONCE (a bare
    # to_arrow_refs would re-run the pipeline for the second pass)
    blocks = [r for r in slim.materialize().to_arrow_refs()]

    @ray.remote(num_cpus=0)
    def block_sum(t: pa.Table) -> int:
        import pyarrow.compute as _pc

        return int(_pc.sum(t["n_tokens"]).as_py() or 0) if t.num_rows else 0

    sums = ray.get([block_sum.remote(b) for b in blocks])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote(num_cpus=0)
    def place(t: pa.Table, base: int, L: int) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                 ("tok_offset", pa.int64()), ("seq_first", pa.int64()),
                 ("seq_last", pa.int64())]
            ).empty_table()
        n = t["n_tokens"].to_numpy()
        off = base + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "tok_offset": pa.array(off),
                "seq_first": pa.array(off // L),
                "seq_last": pa.array((off + n - 1) // L),
            }
        )

    out_refs = [place.remote(b, int(o), seq_len) for b, o in zip(blocks, offsets)]
    return rd.from_arrow_refs(out_refs)


# --- DSIR-style importance weights (target-distribution matching) ---------


def _dsir_buckets(texts, nbuckets: int):
    """per-batch tokenize + hash: returns (bucket per token, doc idx per
    token, tokens per doc) using one md5 per DISTINCT word."""
    words_per = [(s or "").split() for s in texts]
    lens = np.array([len(w) for w in words_per], dtype=np.int64)
    flat = [w for ws in words_per for w in ws]
    if not flat:
        return (np.empty(0, np.int64), np.empty(0, np.int64), lens)
    # hash-based factorize: ~40x faster than sort-based np.unique on
    # object strings; downstream is hash-per-unique + [inv] lookup,
    # so unique ORDER is irrelevant
    inv, uniq = pd.factorize(np.array(flat, dtype=object))
    bucket = (_md5_lower64(list(uniq)) % np.uint64(nbuckets)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    return bucket[inv], doc_idx, lens


def _dsir_score_vector(
    ds: rd.Dataset, nbuckets: int, scale: int, target_lang: str
) -> np.ndarray:
    """Fold per-batch bucket-count partials (≤ nbuckets rows each) into
    the global integer score vector s[b] = (tgt[b]·scale) // raw[b] —
    O(nbuckets) driver state, zero shuffles."""
    from .dedup import pandas_with_schema

    def partial_counts(t: pa.Table) -> pa.Table:
        bucket, _, lens = _dsir_buckets(t["text"].to_pylist(), nbuckets)
        is_tgt = np.repeat(
            np.array([l == target_lang for l in t["lang"].to_pylist()]), lens
        )
        raw = np.bincount(bucket, minlength=nbuckets)
        tgt = np.bincount(bucket[is_tgt], minlength=nbuckets)
        nz = np.nonzero(raw)[0]
        return pa.table(
            {
                "bucket": nz.astype(np.int64),
                "raw_c": raw[nz].astype(np.int64),
                "tgt_c": tgt[nz].astype(np.int64),
            }
        )

    parts = pandas_with_schema(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        {"bucket": "int64", "raw_c": "int64", "tgt_c": "int64"},
    )
    agg = parts.groupby("bucket", as_index=False).sum()
    score = np.zeros(nbuckets, dtype=np.int64)
    b = agg["bucket"].to_numpy()
    score[b] = (agg["tgt_c"].to_numpy() * np.int64(scale)) // agg["raw_c"].to_numpy()
    return score


def dsir_weights(
    sf_dir: str,
    nbuckets: int = 1024,
    scale: int = 1_000_000,
    target_lang: str = "en",
) -> rd.Dataset:
    """DSIR-style IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    doc by how much its hashed-unigram feature mass looks like a TARGET
    distribution (here: the ``target_lang`` slice stands in for the
    high-quality target corpus, e.g. Wikipedia). Per-bucket score is
    the integer ratio surrogate ``s[b] = (tgt[b] * scale) // raw[b]``
    (the paper's log-likelihood ratio, kept in exact integers so the
    DuckDB oracle matches bit for bit); a doc's weight is the sum of
    its tokens' bucket scores. ``dsir_sample`` below is the matching
    resampling step.

    Scale shape — ZERO shuffles: pass 1 reduces each batch to at most
    ``nbuckets`` partial count rows (the per-batch bincount is the
    combiner), the driver folds the tiny partials into one
    ``nbuckets``-long score vector, and pass 2 is a pure map with that
    broadcast vector closed over (8 KB — ships once per worker). At
    100 TB the driver state is O(nbuckets), never O(corpus)."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    score = _dsir_score_vector(ds, nbuckets, scale, target_lang)

    def weigh(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        bucket, doc_idx, _ = _dsir_buckets(t["text"].to_pylist(), nbuckets)
        w = np.zeros(len(ids), dtype=np.int64)
        np.add.at(w, doc_idx, score[bucket])
        return pa.table({"doc_id": ids, "dsir_weight": w})

    return ds.map_batches(weigh, batch_format="pyarrow")


def dsir_sample(
    sf_dir: str,
    k: int = 50,
    nbuckets: int = 1024,
    scale: int = 1_000_000,
    target_lang: str = "en",
) -> pd.DataFrame:
    """DSIR importance RESAMPLING: select the k docs whose deterministic
    weighted-reservoir priority wins — the integer surrogate of
    Efraimidis–Spirakis A-Res (key = u^(1/w), keep largest): here
    ``priority = (coin + 1) * scale // (dsir_weight + 1)`` with the
    stable per-row coin ``md5(doc_id || ':dsir') % 2^31``, keep the k
    SMALLEST (higher weight → smaller priority → likelier selected;
    +1s dodge zero weights). Deterministic, retry-safe, SQL-checkable.

    Scale shape: the weigh pass also emits the priority, each batch
    keeps only its k smallest candidates (the combiner), and the final
    reduce sees ≤ k × #batches slim rows — no global sort, no shuffle
    of the corpus."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    score = _dsir_score_vector(ds, nbuckets, scale, target_lang)
    coin_mod = np.uint64(1 << 31)

    def candidates(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        bucket, doc_idx, _ = _dsir_buckets(t["text"].to_pylist(), nbuckets)
        w = np.zeros(len(ids), dtype=np.int64)
        np.add.at(w, doc_idx, score[bucket])
        coin = (_id_hash_salted(ids, ":dsir") % coin_mod).astype(np.int64)
        prio = ((coin + 1) * np.int64(scale)) // (w + 1)
        order = np.lexsort((ids, prio))[:k]
        return pa.table(
            {
                "doc_id": ids[order],
                "dsir_weight": w[order],
                "priority": prio[order],
            }
        )

    from .dedup import pandas_with_schema

    cand = pandas_with_schema(
        ds.map_batches(candidates, batch_format="pyarrow"),
        {"doc_id": "int64", "dsir_weight": "int64", "priority": "int64"},
    )
    return (
        cand.sort_values(["priority", "doc_id"])
        .head(k)
        .reset_index(drop=True)
    )


def _id_hash_salted(ids: np.ndarray, salt: str) -> np.ndarray:
    """md5-low64 of the decimal id string + salt — an independent stable
    coin per (row, use-site); vectorized digit synthesis, no per-row
    Python."""
    return md5_lower64_ids(ids, salt)


# --- snapshot diff / reconciliation ---------------------------------------


def table_diff(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """SNAPSHOT DIFF (the reconciliation / CDC-merge primitive): compare
    corpus snapshot A against snapshot B by content hash and emit one
    row per divergent key — ``added`` (B only), ``removed`` (A only),
    ``changed`` (both, content differs); identical rows produce nothing.
    Snapshot B is DERIVED deterministically from A inside the same pass
    (md5 coins: %17 removed, %13 text-perturbed, %19 spawns an added
    row at ``doc_id + 10^9``) — stands in for reading yesterday's
    partition next to today's; the diff mechanism is what's real.

    Scale shape: each side is reduced to slim (doc_id, content-hash)
    rows AT THE READ — full text never shuffles; both sides ride ONE
    id-hash-sharded exchange and a per-shard vectorized outer merge
    classifies (the repo's standard replacement for a generic two-sided
    join when the compare is the only consumer). At 100 TB the moved
    bytes are 17/row/side."""
    from .dedup import pandas_with_schema

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    out_types = {"doc_id": "int64", "status": "object"}

    def both_sides(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        assert (ids < 1_000_000_000).all(), "added-row id offset would collide"
        texts = [(s or "") for s in t["text"].to_pylist()]
        h_a = _md5_lower64(texts).view(np.int64)
        rm = _id_hash_salted(ids, ":rm") % np.uint64(17) == 0
        ch = _id_hash_salted(ids, ":ch") % np.uint64(13) == 0
        ad = _id_hash_salted(ids, ":add") % np.uint64(19) == 0
        h_b = h_a.copy()
        if ch.any():
            h_b[ch] = _md5_lower64([texts[i] + " v2" for i in np.nonzero(ch)[0]]).view(np.int64)
        keep = ~rm
        new_ids = ids[ad] + np.int64(1_000_000_000)
        new_h = (
            _md5_lower64([texts[i] + " new" for i in np.nonzero(ad)[0]]).view(np.int64)
            if ad.any()
            else np.empty(0, np.int64)
        )
        all_ids = np.concatenate([ids, ids[keep], new_ids])
        all_h = np.concatenate([h_a, h_b[keep], new_h])
        side = np.concatenate(
            [np.zeros(len(ids), np.int64), np.ones(int(keep.sum()) + len(new_ids), np.int64)]
        )
        shard = (_id_hash(all_ids) % np.uint64(nshards)).astype(np.int64)
        return pa.table(
            {"doc_id": all_ids, "h": all_h, "side": side, "shard": shard}
        )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["doc_id", "h"]]
        b = g[g["side"] == 1][["doc_id", "h"]]
        m = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"))
        status = np.where(
            m["h_b"].isna(), "removed",
            np.where(m["h_a"].isna(), "added",
                     np.where(m["h_a"] != m["h_b"], "changed", "same")),
        )
        m = m.assign(status=status)
        m = m[m["status"] != "same"]
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(
            m[["doc_id", "status"]].astype(out_types).reset_index(drop=True)
        )

    return pandas_with_schema(
        ds.map_batches(both_sides, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(classify, batch_format="pandas"),
        out_types,
    )


# --- training-shard materialization (the artifact a trainer consumes) ----


def build_training_shards(
    sf_dir: str,
    out_root: str | None = None,
    seq_len: int = 128,
    vocab: int = 32_768,
) -> pd.DataFrame:
    """END-TO-END shard build: corpus → token ids → exact GPT-style
    packing → fixed-length training sequences MATERIALIZED in an
    idempotent versioned store (the artifact a trainer actually mounts;
    ``pack_sequences`` computes the manifest, this one writes the data).

    Tokens are hashed-vocabulary ids (md5-low64(word) % vocab — the
    deterministic stand-in for a trained tokenizer; ``bpe_tokenize``
    holds the learned-merges path). Packing is exact concatenate-in-
    doc_id-order-and-chunk; the trailing partial sequence is dropped
    (standard GPT packing).

    Distribution shape (the 100-TB story):
    1. per-batch vectorized tokenize+hash → (doc_id, ids, n) rows; ONE
       range sort by doc_id moves token IDS (2-4 bytes/token — the
       compressed stream, never raw text).
    2. exact prefix sum over the sorted blocks (the pack_sequences
       primitive: O(blocks) metadata tasks + a driver fold).
    3. each block CUTS its fully-owned sequences locally (one vectorized
       reshape) and writes them as a content-keyed fragment from inside
       the task — task retries and whole re-runs commit zero duplicate
       rows (the lancelike manifest dedups keys).
    4. boundary leftovers (≤ 2 pieces × seq_len tokens per block, each
       piece provably within one sequence) are stitched on the driver —
       O(blocks·seq_len) tokens of driver state — and committed as one
       more fragment. One atomic manifest commit publishes the version.

    Returns a one-row summary (n_docs, n_tokens, n_seqs, n_fragments,
    version). Exactness (store ≡ brute concat+chunk) and re-run
    idempotency are pinned in tests/test_mixing.py.
    """
    import ray

    from ..hashing import hash64_np
    from ..state.lancelike import TableStore, _content_key

    out_root = out_root or f"/tmp/crawlkit_shards_{seq_len}"
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tokenize(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        words_per: list[np.ndarray] = []
        counts = np.empty(len(ids), dtype=np.int64)
        for i, s in enumerate(t["text"].to_pylist()):
            w = (s or "").split()
            counts[i] = len(w)
            words_per.append(w)
        flat = [w for ws in words_per for w in ws]
        tok = (
            (hash64_np(flat) % np.uint64(vocab)).astype(np.int32)
            if flat
            else np.empty(0, np.int32)
        )
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        keep = counts > 0
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(tok))
        out = pa.table({"doc_id": pa.array(ids), "ids": la, "n": pa.array(counts)})
        return out.filter(pa.array(keep))

    slim = ds.map_batches(tokenize, batch_format="pyarrow").sort("doc_id")
    blocks = [r for r in slim.materialize().to_arrow_refs()]

    @ray.remote(num_cpus=0)
    def block_sum(t: pa.Table) -> tuple[int, int]:
        import pyarrow.compute as _pc

        if t.num_rows == 0:
            return 0, 0
        return int(_pc.sum(t["n"]).as_py() or 0), t.num_rows

    stats = ray.get([block_sum.remote(b) for b in blocks])
    sums = [s for s, _ in stats]
    n_docs = sum(r for _, r in stats)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)
    total = int(np.sum(sums))
    n_keep_seqs = total // seq_len

    store = TableStore(out_root)

    @ray.remote
    def cut_block(t: pa.Table, off: int):
        """Cut fully-owned sequences, write them as a content-keyed
        fragment, return (frag_meta|None, stitch_table)."""
        stitch_schema = pa.schema([("pos", pa.int64()), ("ids", pa.list_(pa.int32()))])
        if t.num_rows == 0:
            return None, stitch_schema.empty_table()
        vals = t["ids"].combine_chunks()
        flat = vals.flatten().to_numpy()
        n = len(flat)
        end = off + n
        s0 = -(-off // seq_len) * seq_len  # first seq start ≥ off
        m = max(0, (end - s0) // seq_len)  # fully-owned sequences
        frag = None
        pieces = []
        if m > 0:
            body = flat[s0 - off : s0 - off + m * seq_len].reshape(m, seq_len)
            seq_idx = (s0 // seq_len) + np.arange(m, dtype=np.int64)
            la = pa.ListArray.from_arrays(
                pa.array((np.arange(m + 1) * seq_len).astype(np.int32)),
                pa.array(body.reshape(-1)),
            )
            ft = pa.table({"seq_idx": pa.array(seq_idx), "ids": la})
            frag = TableStore(store.root).write_fragment(ft, _content_key(ft, "seqs"))
            head_end = s0 - off
            tail_start = s0 - off + m * seq_len
        else:
            head_end = n
            tail_start = n
        if head_end > 0:
            pieces.append((off, flat[:head_end]))
        if tail_start < n:
            pieces.append((off + tail_start, flat[tail_start:]))
        st = pa.table(
            {
                "pos": pa.array([p for p, _ in pieces], pa.int64()),
                "ids": pa.array([a.tolist() for _, a in pieces], pa.list_(pa.int32())),
            }
        )
        return frag, st

    results = ray.get([cut_block.remote(b, int(o)) for b, o in zip(blocks, offsets)])
    frags = [f for f, _ in results if f is not None]

    # --- driver stitch: boundary pieces → the sequences no block owns
    pieces: list[tuple[int, np.ndarray]] = []
    for _, st in results:
        for pos, arr in zip(st["pos"].to_pylist(), st["ids"].to_pylist()):
            pieces.append((pos, np.asarray(arr, np.int32)))
    pieces.sort(key=lambda x: x[0])
    by_seq: dict[int, list[tuple[int, np.ndarray]]] = {}
    for pos, arr in pieces:
        by_seq.setdefault(pos // seq_len, []).append((pos, arr))
    stitch_rows = []
    for sidx in sorted(by_seq):
        if sidx >= n_keep_seqs:
            continue  # trailing partial — dropped by the packing rule
        parts = [a for _, a in sorted(by_seq[sidx], key=lambda x: x[0])]
        seq = np.concatenate(parts)
        assert len(seq) == seq_len, (sidx, len(seq))
        stitch_rows.append((sidx, seq))
    if stitch_rows:
        st_tab = pa.table(
            {
                "seq_idx": pa.array([s for s, _ in stitch_rows], pa.int64()),
                "ids": pa.array(
                    [a.tolist() for _, a in stitch_rows], pa.list_(pa.int32())
                ),
            }
        )
        frags.append(store.write_fragment(st_tab, _content_key(st_tab, "stitch")))
    # snapshot commit: a rebuild REPLACES the logical table (block splits
    # may differ run to run, so append semantics would duplicate rows;
    # the row SET per version is what's invariant — pinned in tests)
    version = store.commit_snapshot(frags) if frags else store.latest_version()

    return pd.DataFrame(
        {
            "n_docs": [n_docs],
            "n_tokens": [total],
            "seq_len": [seq_len],
            "n_seqs": [n_keep_seqs],
            "n_fragments": [len(frags)],
            "version": [version],
        }
    ).astype("int64")
