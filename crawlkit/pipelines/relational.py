"""Relational operator suite over the driver's TPC-H-ish tables.

Each function here is one operator from the reference's inventory
(SURVEY.md §2, IDs cited per function) re-expressed Ray-Data-first and
exercised against the driver testdata with a DuckDB SQL oracle (see
``__ray_entry__.oracle_sql``). Column names match the SQL exactly.

Determinism for the driver's value-hash compare: aggregate FLOATS are
summed as integer cents (``FLOOR(x * 100)`` before the sum) because
double addition is order-dependent and a distributed sum would differ
from DuckDB's in the last bits; integer sums are exact in any order.

Scale notes live on each operator: partial (per-batch) aggregation
before every groupby, column pruning at the read, broadcast for small
sides, explicit hash-shuffle join for large sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _read(
    sf_dir: str, table: str, columns: list[str] | None = None, **kwargs
) -> rd.Dataset:
    """Column-pruned parquet read (prune at the read — SURVEY steering);
    metadata-stripped so Ray's schema-dedup fast path works. Extra
    kwargs (e.g. ``filter=``) pass through to ``read_parquet``."""
    from .. import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns, **kwargs)


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """FLOOR(x*100) as int64 — order-independent summable money."""
    return pc.cast(pc.floor(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def _sharded_agg(
    ds: rd.Dataset, key: str, aggs: "dict[str, tuple[str, str]]", nshards: int = 32
) -> rd.Dataset:
    """HIGH-CARDINALITY groupby: Ray's sort-based Aggregate pays seconds
    per block at 1e5+ distinct keys (measured 15 s for 150k orderkeys at
    sf0.1 where this shape takes 1.5 s). Shard rows by key-hash into
    ``nshards`` groups and aggregate each shard with ONE vectorized
    pandas groupby — same single shuffle, boundary count nshards instead
    of |keys|. ``aggs``: out_col → (in_col, pandas agg fn name)."""

    def add_shard(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            s = (k * np.uint64(2654435761)) % np.uint64(nshards)
        return t.append_column("_shard", pa.array(s.astype(np.int64)))

    def agg_shard(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(
            g.drop(columns=["_shard"])
            .groupby(key, as_index=False)
            .agg(**{out: pd.NamedAgg(column=c, aggfunc=f) for out, (c, f) in aggs.items()})
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(agg_shard, batch_format="pandas")
    )


# --- G1: group-merge (orchestrator merge loop, otodom/orchestrator/handler.go:100-119)


def g1_group_merge(sf_dir: str) -> rd.Dataset:
    """Group events by event_type: count + integer-cents sum of value.

    Ray-Data shape: per-batch PARTIAL aggregation inside ``map_batches``
    (one row per key per batch) then a tiny groupby over partials — the
    shuffle moves |keys|×|batches| rows, not 10k/100TB rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table(
            {"event_type": t["event_type"], "cents": _cents(t["value"])}
        ).to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "events", ["event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("event_type").aggregate(
        Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents")
    )


# --- G2: running max (total_pages lastPage, otodom/total_pages/handler.go:39-41)


def g2_running_max(sf_dir: str) -> rd.Dataset:
    """Max value-cents per user — the distributed form of the reference's
    running-max over pagination anchors."""

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"user_id": t["user_id"], "cents": _cents(t["value"])}).to_pandas()
        g = df.groupby("user_id", as_index=False).agg(max_cents=("cents", "max"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "events", ["user_id", "value"])
    return ds.map_batches(partial, batch_format="pyarrow").groupby("user_id").aggregate(
        Max("max_cents", alias_name="max_cents")
    )


# --- D1: exact dedup (INSERT ON CONFLICT DO NOTHING, commons/Entry.go:37)


def d1_distinct(sf_dir: str) -> rd.Dataset:
    """DISTINCT (user_id, event_type) via hash-partitioned groupby."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:  # per-batch pre-dedup shrinks the shuffle
        return t.group_by(["user_id", "event_type"]).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["user_id", "event_type"])
    )


def dedup_exact_first(sf_dir: str) -> rd.Dataset:
    """Exact content dedup: keep MIN(doc_id) per identical text.

    Scale shape (round-1 VERDICT #4): the shuffle KEY is a 128-bit
    content digest (two independent 64-bit vectorized hashes), not the
    full document body — sort/exchange comparisons touch 16 bytes per
    row. Texts in a digest group are identical by construction (128-bit
    collision odds ~n²/2¹²⁹), so Min("text") recovers the content."""
    import polars as pl

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_digest(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t["text"])  # vectorized xxhash, two seeds → 128 bits
        # int64 VIEW of the uint64 hashes: Ray's sort-boundary sampling
        # round-trips group keys through Python ints and overflows Arrow
        # int64 on raw uint64 values (logged ArrowConversionError + slow
        # fallback); the bit-pattern view groups identically
        h1 = s.hash(seed=0x9E3779B9).to_numpy().astype(np.uint64).view(np.int64)
        h2 = s.hash(seed=0x85EBCA6B).to_numpy().astype(np.uint64).view(np.int64)
        return t.append_column("h1", pa.array(h1)).append_column("h2", pa.array(h2))

    return (
        ds.map_batches(add_digest, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Min("doc_id", alias_name="doc_id"), Min("text", alias_name="text"))
        .select_columns(["doc_id", "text"])
    )


# --- F1/F4: filters (orchestrator skip-unkeyed, permissive int cast)


def f1_filter(sf_dir: str) -> rd.Dataset:
    """Vectorized predicate filter inside map_batches (not row ds.filter)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["event_type"], "purchase"), pc.greater(t["value"], 50.0))
        out = t.filter(m)
        return pa.table({"event_id": out["event_id"], "cents": _cents(out["value"])})

    return ds.map_batches(keep, batch_format="pyarrow")


def f4_permissive_cast(sf_dir: str) -> rd.Dataset:
    """Permissive digit-concat cast over documents.source, nulls dropped
    (the reference's skip-invalid-int pagination parse, total_pages:32-34)."""
    from .. import canon

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def fn(t: pa.Table) -> pa.Table:
        num = canon.extract_number(t["source"].combine_chunks())
        out = pa.table({"doc_id": t["doc_id"], "src_num": num})
        return out.filter(pc.is_valid(out["src_num"]))

    return ds.map_batches(fn, batch_format="pyarrow")


def f_above_avg(sf_dir: str) -> rd.Dataset:
    """Scalar-subquery pattern: lineitems priced above the GLOBAL mean.

    Two-pass broadcast aggregate: pass 1 reduces to TWO integers (sum of
    cents, row count) via per-batch partials; pass 2 filters with the
    exact-fraction compare ``cents * n > sum`` — no float division, so
    the cut is bit-exact and order-independent (int64 safe to ~1e11 rows
    × 1e7 cents). The reduced scalar travels in the task closure; at
    100 TB the second pass re-reads the pruned column rather than
    holding pass 1's input materialized."""
    cols = ["l_orderkey", "l_linenumber", "l_extendedprice"]
    ds = _read(sf_dir, "lineitem", cols)

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"])
        return pa.table(
            {
                "s": pa.array([pc.sum(c).as_py() or 0], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    small = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    s, n = int(small["s"].sum()), int(small["n"].sum())

    def keep(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "cents": _cents(t["l_extendedprice"]),
            }
        )
        return out.filter(
            pc.greater(pc.multiply_checked(out["cents"], pa.scalar(n, pa.int64())),
                       pa.scalar(s, pa.int64()))
        )

    return _read(sf_dir, "lineitem", cols).map_batches(keep, batch_format="pyarrow")


# --- M2/M3: normalizers over driver data (FIXTURES.md §7)


def m2_extract_number(sf_dir: str) -> rd.Dataset:
    from .. import canon

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "num": canon.extract_number(t["source"].combine_chunks())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def m3_take_before(sf_dir: str) -> rd.Dataset:
    from .. import canon

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "prefix": canon.take_characters_before(t["text"].combine_chunks(), "table"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- M6: range expansion (page-URL generation, total_pages:53-65)


def m6_range_expand(sf_dir: str) -> rd.Dataset:
    """Per order: max linenumber m → rows (l_orderkey, page) for page in
    1..m-1 — the reference's 1..last-1 frontier expansion as dataflow."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def max_partial(t: pa.Table) -> pa.Table:  # pre-agg shrinks the shuffle
        df = pa.table({"l_orderkey": t["l_orderkey"], "m": t["l_linenumber"]}).to_pandas()
        g = df.groupby("l_orderkey", as_index=False).agg(m=("m", "max"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    maxes = _sharded_agg(
        ds.map_batches(max_partial, batch_format="pyarrow"),
        "l_orderkey",
        {"m": ("m", "max")},
    )

    def expand(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        m = t["m"].to_numpy()
        reps = np.maximum(m.astype(np.int64) - 1, 0)
        keys = np.repeat(ok, reps)
        pages = np.concatenate([np.arange(1, mm, dtype=np.int64) if mm > 1 else np.empty(0, dtype=np.int64) for mm in m]) if len(m) else np.empty(0, dtype=np.int64)
        return pa.table({"l_orderkey": keys, "page": pages})

    return maxes.map_batches(expand, batch_format="pyarrow")


# --- M13: JSON envelope decode (json.RawMessage data column, commons/Entry.go:17)


def m13_json_extract(sf_dir: str) -> rd.Dataset:
    """Extract the integer ``k`` from the events.props JSON column —
    the schema-as-data envelope decode, vectorized with Arrow regex
    (props shape: {"k": N})."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        k = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        kv = pc.cast(pc.struct_field(k, "k"), pa.int64())
        return pa.table({"event_id": t["event_id"], "k": kv})

    return ds.map_batches(fn, batch_format="pyarrow")


# --- O1: priority sort + top-k (PageSorter, otodom/commons/page.go:10-14)


def o1_sort_topk(sf_dir: str, k: int = 100) -> rd.Dataset:
    """Global top-k by (cents desc, event_id asc). Scale shape: per-batch
    top-k prefilter so the global sort sees ≤ k rows per block."""
    ds = _read(sf_dir, "events", ["event_id", "value"])

    def prefilter(t: pa.Table) -> pa.Table:
        t = pa.table({"event_id": t["event_id"], "cents": _cents(t["value"])})
        idx = pc.select_k_unstable(
            t, k=min(k, t.num_rows), sort_keys=[("cents", "descending"), ("event_id", "ascending")]
        )
        return t.take(idx)

    return (
        ds.map_batches(prefilter, batch_format="pyarrow")
        .sort(["cents", "event_id"], descending=[True, False])
        .limit(k)
    )


# --- joins -------------------------------------------------------------


def j_broadcast_join(sf_dir: str) -> rd.Dataset:
    """Customers per region name: two SMALL dimension tables (nation,
    region) broadcast via ray.put and joined as an in-batch dict lookup —
    no shuffle (SURVEY: 'broadcast small sides')."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    lookup_ref = ray.put({k: r2name[v] for k, v in n2r.items()})

    def partial(t: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)  # zero-copy shared object per node
        names = pd.Series(t["c_nationkey"].to_numpy()).map(lookup)
        g = names.value_counts().rename_axis("r_name").reset_index(name="n_customers")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    return ds.map_batches(partial, batch_format="pyarrow").groupby("r_name").aggregate(
        Sum("n_customers", alias_name="n_customers")
    )


def j_hash_join(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k orders by lineitem revenue: partial-agg revenue per order,
    sort+limit to k rows, THEN fetch order priority for just those k keys
    (pushdown read) — the join happens after the limit, never shuffling
    the orders table. The full shuffle-join operator lives in
    ``j_shuffle_join``."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.multiply(
                    pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
                    pa.scalar(100.0),
                )
            ),
            pa.int64(),
        )
        df = pa.table({"l_orderkey": t["l_orderkey"], "cents": cents}).to_pandas()
        g = df.groupby("l_orderkey", as_index=False).agg(revenue_cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    revenue = _sharded_agg(
        li.map_batches(rev_partial, batch_format="pyarrow"),
        "l_orderkey",
        {"revenue_cents": ("revenue_cents", "sum")},
    )
    # LIMIT BEFORE JOIN (round-1 VERDICT #6): top-k the aggregated
    # revenue first — only k rows survive, so the orders side is a
    # k-key pushdown read + tiny merge instead of a full hash-shuffle
    # join of two sf-sized tables for 10 output rows. The top-k itself
    # is per-block select_k + a ≤k×blocks driver merge (a global
    # ds.sort here would be one more full shuffle for k rows).
    # OVER-FETCH 2k (round-2 ADVICE): SQL's LIMIT applies after the
    # join, so an aggregated l_orderkey absent from orders must be
    # backfilled by the next key — fetch 2k candidates, merge, then
    # re-limit to k (and fail loudly rather than silently shrink if
    # even 2k candidates leave fewer than k joined rows).
    kk = 2 * k

    def topk_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("l_orderkey", pa.int64()), ("revenue_cents", pa.int64())]
            ).empty_table()
        idx = pc.select_k_unstable(
            t,
            k=min(kk, t.num_rows),
            sort_keys=[("revenue_cents", "descending"), ("l_orderkey", "ascending")],
        )
        return t.take(idx)

    top = (
        revenue.map_batches(topk_block, batch_format="pyarrow")
        .to_pandas()  # ≤ 2k×blocks rows
        .sort_values(["revenue_cents", "l_orderkey"], ascending=[False, True])
        .head(kk)
        .rename(columns={"l_orderkey": "o_orderkey"})
    )
    keys = top["o_orderkey"].tolist()
    from .. import read_parquet_clean

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=pc.field("o_orderkey").isin(keys),  # row-group pushdown
    ).to_pandas()
    out = top.merge(orders, on="o_orderkey").sort_values(
        ["revenue_cents", "o_orderkey"], ascending=[False, True]
    )
    n_candidates = len(top)
    out = out.head(k)
    if len(out) < k and n_candidates >= kk:
        raise RuntimeError(
            f"j_hash_join: {kk}-candidate over-fetch joined to only "
            f"{len(out)} rows — raise the over-fetch factor"
        )
    return out[["o_orderkey", "o_orderpriority", "revenue_cents"]].reset_index(drop=True)


def j_shuffle_join(sf_dir: str) -> rd.Dataset:
    """Revenue by order priority — a GENUINE large×large hash-shuffle
    join (Ray ``Dataset.join``): every lineitem-revenue row must meet its
    order row (no limit to hide behind, neither side broadcastable at
    scale), then partial-agg by priority so the second shuffle moves only
    |priorities|×|batches| rows."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.multiply(
                    pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
                    pa.scalar(100.0),
                )
            ),
            pa.int64(),
        )
        df = pa.table({"l_orderkey": t["l_orderkey"], "cents": cents}).to_pandas()
        g = df.groupby("l_orderkey", as_index=False).agg(revenue_cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    from .dedup import _nonempty_blocks

    # Dataset.join inputs must not carry 0-column empty-partition blocks
    # (Acero: 'Invalid'/'no match for key field') — small inputs with
    # empty agg partitions hit this, so filter block refs (metadata-only)
    revenue = _nonempty_blocks(
        _sharded_agg(
            li.map_batches(rev_partial, batch_format="pyarrow"),
            "l_orderkey",
            {"revenue_cents": ("revenue_cents", "sum")},
        ),
        pa.schema([("l_orderkey", pa.int64()), ("revenue_cents", pa.int64())]),
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    # modest partition count on one node — each join partition is an actor
    joined = revenue.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def prio_partial(t: pa.Table) -> pa.Table:
        df = pa.table(
            {"o_orderpriority": t["o_orderpriority"], "cents": t["revenue_cents"]}
        ).to_pandas()
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("cents", "size"), sum_rev_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        joined.map_batches(prio_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("sum_rev_cents", alias_name="sum_rev_cents"),
        )
    )


def j_asof(sf_dir: str, group_cap: int = 2_000_000) -> rd.Dataset:
    """As-of self-join (operator Ray Data lacks — SURVEY custom-op rule):
    for each event, the latest STRICTLY-earlier event ts of the same
    user. Composition: hash-partition by user (groupby) + per-group
    sorted search — the documented partitioning assumption is that one
    user's history fits one group; a key above ``group_cap`` rows is
    LOGGED AND SKIPPED (hot-key hatch, round-2 VERDICT #7 — same skew
    treatment as df_cap/bucket_cap) instead of OOMing the task."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "j_asof: user %s history %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            empty = g.iloc[0:0].copy()
            empty["prior_ts"] = empty["ts"]
            return empty[["event_id", "user_id", "ts", "prior_ts"]]
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].to_numpy()
        # latest strictly-earlier ts: searchsorted left of own ts - 1 step
        idx = np.searchsorted(ts, ts, side="left") - 1
        prior = np.where(idx >= 0, ts[np.maximum(idx, 0)], np.datetime64("NaT"))
        g["prior_ts"] = prior
        return g[["event_id", "user_id", "ts", "prior_ts"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


# --- windowed aggregate (streaming-shaped; absent in reference §2.10) ---


def w_tumbling(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour windows per event_type: count + cents sum.
    Window id computed vectorized per batch; partial agg → tiny shuffle."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())  # microseconds since epoch
        hour = pc.divide(us, pa.scalar(3_600_000_000))
        df = pa.table(
            {"event_type": t["event_type"], "hour": pc.cast(hour, pa.int64()), "cents": _cents(t["value"])}
        ).to_pandas()
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


# --- Q1-style pricing summary (headline wide aggregate) -----------------


def q1_pricing(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q1-shaped summary over lineitem: filter at the read, partial
    per-batch aggregation, final groupby over (returnflag, linestatus)."""
    from .. import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
        filter=(pc.field("l_shipdate") <= pc.scalar(np.datetime64("1998-09-02", "us"))),
    )

    def partial(t: pa.Table) -> pa.Table:
        one = pa.scalar(1.0)
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(one, t["l_discount"]))
        df = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(pc.floor(t["l_quantity"]), pa.int64()),
                "base_cents": _cents(t["l_extendedprice"]),
                "disc_cents": pc.cast(pc.floor(pc.multiply(disc_price, pa.scalar(100.0))), pa.int64()),
            }
        ).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_cents=("base_cents", "sum"),
            sum_disc_cents=("disc_cents", "sum"),
            count_order=("qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("count_order", alias_name="count_order"),
        )
    )


def rollup_agg(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): revenue cents + row
    counts at all three levels (pair, per-flag subtotal, grand total).

    Ray-Data shape: ONE pass over the fact table (per-batch partial agg →
    tiny groupby on the pair); the subtotal and grand-total levels are
    derived from the |pairs|-sized aggregate (≤ |flag|×|status| rows — a
    driver-side fold over an already-reduced result, the same cost class
    as a top-k merge, NOT a second fact-table scan)."""

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "cents": pc.cast(pc.floor(pc.multiply(disc, pa.scalar(100.0))), pa.int64()),
            }
        ).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_disc_cents=("cents", "sum"), n_rows=("cents", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"])
    base = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()  # |flag|×|status| rows — small by construction
    )
    lvl1 = base.groupby("l_returnflag", as_index=False).agg(
        sum_disc_cents=("sum_disc_cents", "sum"), n_rows=("n_rows", "sum")
    )
    lvl1["l_linestatus"] = None
    lvl0 = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "sum_disc_cents": [base["sum_disc_cents"].sum()],
            "n_rows": [base["n_rows"].sum()],
        }
    )
    out = pd.concat([base, lvl1, lvl0], ignore_index=True)
    return out[["l_returnflag", "l_linestatus", "sum_disc_cents", "n_rows"]].astype(
        {"sum_disc_cents": "int64", "n_rows": "int64"}
    )


def pivot_wide(sf_dir: str) -> rd.Dataset:
    """PIVOT as conditional aggregation: per order status, counts of
    urgent / high / other priorities as COLUMNS (the wide reshape).
    Per-batch vectorized conditional counts → tiny groupby sum — the raw
    table never shuffles, only |status|×|batches| partial rows."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        pr = t["o_orderpriority"]
        urgent = pc.cast(pc.equal(pr, "1-URGENT"), pa.int64())
        high = pc.cast(pc.equal(pr, "2-HIGH"), pa.int64())
        other = pc.cast(
            pc.invert(pc.is_in(pr, value_set=pa.array(["1-URGENT", "2-HIGH"]))), pa.int64()
        )
        df = pa.table(
            {"o_orderstatus": t["o_orderstatus"], "u": urgent, "h": high, "o": other}
        ).to_pandas()
        g = df.groupby("o_orderstatus", as_index=False).agg(
            n_urgent=("u", "sum"), n_high=("h", "sum"), n_other=("o", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(
            Sum("n_urgent", alias_name="n_urgent"),
            Sum("n_high", alias_name="n_high"),
            Sum("n_other", alias_name="n_other"),
        )
    )


def string_agg_segments(sf_dir: str) -> rd.Dataset:
    """Per-group ordered string aggregation: the comma-joined SORTED set
    of distinct market segments per nation (the collect_set→sort→join
    shape). Per-batch pre-dedup shrinks the shuffle to distinct pairs;
    the join happens per group in a tiny map_groups."""
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["c_nationkey", "c_mktsegment"]).aggregate([])

    def join_sorted(g: pd.DataFrame) -> pd.DataFrame:
        segs = ",".join(sorted(g["c_mktsegment"].unique()))
        return pd.DataFrame(
            {"c_nationkey": [int(g["c_nationkey"].iloc[0])], "segments": [segs]}
        ).astype({"c_nationkey": "int64"})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Count(alias_name="_c"))
        .groupby("c_nationkey")
        .map_groups(join_sorted, batch_format="pandas")
    )


def j_left_outer(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER join (completes the join family): every customer with
    their total URGENT-order spend in cents, customers without urgent
    orders preserved (the urgent restriction keeps the NULL path
    non-vacuous — every TPC-H customer has SOME order). The
    null-producing side is COALESCEd to -1 on BOTH sides so the driver's
    dtype-strict compare stays int64 (DuckDB's .df() would float-ify a
    nullable BIGINT). Ray shape: predicate pushed to the parquet read,
    then the orders side is pre-reduced to one row per custkey (partial
    agg, high-cardinality sharded groupby) BEFORE the shuffle join, so
    the outer join moves |customers| + |custkeys-with-urgent-orders|
    rows, never raw orders."""
    from .. import read_parquet_clean

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        # the filter column must be in the projection for Ray's scanner
        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    )

    def spend_partial(t: pa.Table) -> pa.Table:
        df = pa.table(
            {"o_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
        ).to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(sum_spent_cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    from .dedup import _nonempty_blocks

    spend = _nonempty_blocks(  # join inputs: no 0-column empty blocks
        _sharded_agg(
            orders.map_batches(spend_partial, batch_format="pyarrow"),
            "o_custkey",
            {"sum_spent_cents": ("sum_spent_cents", "sum")},
        ),
        pa.schema([("o_custkey", pa.int64()), ("sum_spent_cents", pa.int64())]),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = cust.join(
        spend,
        join_type="left_outer",
        num_partitions=8,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        spent = pc.fill_null(
            pc.cast(t["sum_spent_cents"], pa.int64()), pa.scalar(-1, pa.int64())
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "sum_spent_cents": spent,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def stratified_sample(sf_dir: str) -> rd.Dataset:
    """Class-balancing stratified sample (training-data prep): keep 100%
    of rare 'purchase' events, 25% of 'click', 10% of the rest — rates
    applied with the same deterministic Knuth-multiplicative bucket as
    ``sample_deterministic`` so the SQL oracle reproduces the exact row
    set. Pure per-batch filter: no shuffle, rates broadcast in the
    closure."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])

    def pick(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        bucket = (eid * 2654435761) % 100
        et = t["event_type"].to_numpy(zero_copy_only=False)
        rate = np.where(et == "purchase", 100, np.where(et == "click", 25, 10))
        return t.filter(pa.array(bucket < rate))

    return ds.map_batches(pick, batch_format="pyarrow")


# --- set ops ------------------------------------------------------------


def u_union(sf_dir: str) -> rd.Dataset:
    """UNION ALL of two filtered branches (frontier-delta merge analog)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    a = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")), batch_format="pyarrow"
    )
    b = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "error")), batch_format="pyarrow"
    )
    return a.union(b)


def _distinct_high_value_purchasers(sf_dir: str) -> "ray.ObjectRef":
    """Distinct user_ids with a purchase of value > 90, computed AS A RAY
    AGGREGATION (per-batch dedup → groupby) — the fact table never lands
    on the driver; only the small distinct-key result does, and that is
    broadcast once via ray.put for in-batch ``pc.is_in`` membership tests.
    (At 100 TB the broadcast side would become a bloom/cuckoo digest — the
    same seen-set machinery as crawlkit.state.seenset.)"""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["event_type"], "purchase"), pc.greater(t["value"], 90.0))
        return t.filter(m).select(["user_id"]).group_by(["user_id"]).aggregate([])

    keys = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Count(alias_name="_c"))
    )
    arr = keys.to_pandas()["user_id"].to_numpy()  # small: |distinct purchasers|
    return ray.put(pa.array(np.sort(arr), type=pa.int64()))


def _click_set_op(sf_dir: str, invert: bool) -> rd.Dataset:
    """Shared semi/anti broadcast-join body for s_except / s_intersect:
    distinct clickers tested against the broadcast purchaser key-set with
    vectorized ``pc.is_in`` — no Python row loop, no driver fact-table
    read (round-1 VERDICT 'What's wrong' #2)."""
    ref = _distinct_high_value_purchasers(sf_dir)
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def member(t: pa.Table) -> pa.Table:
        p = ray.get(ref)  # zero-copy shared Arrow array per node
        clicks = t.filter(pc.equal(t["event_type"], "click"))
        m = pc.is_in(clicks["user_id"], value_set=p)
        if invert:
            m = pc.invert(m)
        return clicks.filter(m).select(["user_id"]).group_by(["user_id"]).aggregate([])

    from .dedup import pandas_with_schema

    out = ds.map_batches(member, batch_format="pyarrow").groupby("user_id").aggregate(
        Count(alias_name="_c")
    )
    return pandas_with_schema(out, {"user_id": "int64"})


def s_except(sf_dir: str) -> rd.Dataset:
    """EXCEPT as a broadcast ANTI-join: users who clicked but never made a
    high-value (>90) purchase — the D1 frontier-vs-seen anti-join shape
    without a shuffle. The >90 predicate keeps the result non-empty on
    the driver fixture (a 0-vs-0 row compare proves nothing)."""
    return _click_set_op(sf_dir, invert=True)


def s_intersect(sf_dir: str) -> rd.Dataset:
    """INTERSECT as a broadcast SEMI-join: users who both clicked and
    made a high-value purchase (same broadcast shape, inverted
    predicate)."""
    return _click_set_op(sf_dir, invert=False)


def sample_deterministic(sf_dir: str, rate_pct: int = 10) -> rd.Dataset:
    """Deterministic hash-sample: keep rows whose key-hash % 100 < rate.
    Unlike ds.random_sample this is reproducible AND SQL-expressible
    (hash on event_id via the same integer arithmetic both sides)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def pick(t: pa.Table) -> pa.Table:
        # Knuth-multiplicative bucket, exactly mirrored in the SQL
        # oracle (int64; ids here are far from overflow)
        eid = t["event_id"].to_numpy()
        bucket = (eid * 2654435761) % 100
        return t.filter(pa.array(bucket < rate_pct))

    return ds.map_batches(pick, batch_format="pyarrow")


# --- full-outer join (completes the join family) ------------------------


def j_full_outer(sf_dir: str) -> rd.Dataset:
    """FULL OUTER join: BUILDING-segment customers × per-custkey URGENT
    order spend. Both null paths are non-vacuous by construction —
    BUILDING customers without urgent orders survive with -1 cents
    (left-only), urgent-order custkeys outside BUILDING survive with
    segment '(none)' (right-only). Ray shape mirrors ``j_left_outer``:
    predicate pushed to both reads, the orders side pre-reduced to one
    row per custkey before the shuffle join. The right key is duplicated
    into a data column before the join because ``Dataset.join`` merges
    key columns (left-null rows would otherwise lose the key)."""
    from .. import read_parquet_clean

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    )

    def spend_partial(t: pa.Table) -> pa.Table:
        df = pa.table(
            {"o_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
        ).to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(sum_spent_cents=("cents", "sum"))
        g["okey"] = g["o_custkey"]  # survives the join's key-column merge
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    from .dedup import _nonempty_blocks

    spend = _nonempty_blocks(  # join inputs: no 0-column empty blocks
        _sharded_agg(
            orders.map_batches(spend_partial, batch_format="pyarrow"),
            "o_custkey",
            {"sum_spent_cents": ("sum_spent_cents", "sum"), "okey": ("okey", "first")},
        ),
        pa.schema([("o_custkey", pa.int64()), ("sum_spent_cents", pa.int64()),
                   ("okey", pa.int64())]),
    )
    from .. import read_parquet_clean as _rpc

    cust = _rpc(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=pc.field("c_mktsegment") == "BUILDING",
    )
    joined = cust.join(
        spend,
        join_type="full_outer",
        num_partitions=8,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        custkey = pc.coalesce(
            pc.cast(t["c_custkey"], pa.int64()), pc.cast(t["okey"], pa.int64())
        )
        seg = pc.coalesce(t["c_mktsegment"], pa.scalar("(none)"))
        spent = pc.fill_null(
            pc.cast(t["sum_spent_cents"], pa.int64()), pa.scalar(-1, pa.int64())
        )
        return pa.table({"custkey": custkey, "seg": seg, "sum_spent_cents": spent})

    return joined.map_batches(finish, batch_format="pyarrow")


# --- correlation / covariance moments (distributed two-variable stats) --


def corr_moments(sf_dir: str) -> rd.Dataset:
    """Per-event-type covariance/correlation MOMENTS between value-cents
    and user_id: (n, Σx, Σy, Σx², Σy², Σxy) as exact int64 — the
    mergeable sufficient statistics every distributed corr/covar/linear
    regression reduces to (corr itself is one float division the
    consumer applies; keeping the moments integral makes the result
    order-independent and hash-comparable). Shape: per-batch vectorized
    partials → tiny groupby(event_type) sum, same as ``g1_group_merge``.
    int64 safety: |x|≤1e5 cents, |y|≤~1e5 ids → Σxy < 1e10·rows, fine
    past sf1e3."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "x": _cents(t["value"]).to_numpy(),
                "y": t["user_id"].to_numpy(),
            }
        )
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        df["xy"] = df["x"] * df["y"]
        g = df.groupby("event_type", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "events", ["event_type", "value", "user_id"])
    return ds.map_batches(partial, batch_format="pyarrow").groupby("event_type").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
        Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"),
        Sum("sxy", alias_name="sxy"),
    )


# --- bloom-filter semi join (IO-pruning prefilter + exact confirm) ------


def _bloom_set_bits(keys: np.ndarray, words: np.ndarray) -> None:
    """Set the 4 double-hash bloom bits of each key into ``words``
    (vectorized; in place)."""
    m_bits = np.uint64(len(words) * 64)
    with np.errstate(over="ignore"):
        h1 = keys * np.uint64(0x9E3779B97F4A7C15)
        h2 = (keys * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
        for i in range(4):
            bit = (h1 + np.uint64(i) * h2) % m_bits
            np.bitwise_or.at(
                words, (bit >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (bit & np.uint64(63)),
            )


def _bloom_hits(keys: np.ndarray, words: np.ndarray) -> np.ndarray:
    """Membership mask (may contain false POSITIVES, never negatives)."""
    m_bits = np.uint64(len(words) * 64)
    hit = np.ones(len(keys), dtype=bool)
    with np.errstate(over="ignore"):
        h1 = keys * np.uint64(0x9E3779B97F4A7C15)
        h2 = (keys * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
        for i in range(4):
            bit = (h1 + np.uint64(i) * h2) % m_bits
            hit &= (
                words[(bit >> np.uint64(6)).astype(np.int64)] >> (bit & np.uint64(63))
            ) & np.uint64(1) > 0
    return hit


def _urgent_order_bloom(sf_dir: str, broadcast_cap: int = 5_000_000):
    """Distributed bloom build over urgent-order keys: per-batch partial
    bitmaps OR-merged (each m_words·8 bytes — bitmap size is independent
    of fact-table size, so the driver merge stays cheap at any scale).

    Returns ``(bloom_ref, keys_ref)``: ``keys_ref`` is the broadcast
    exact key set when the build side fits ``broadcast_cap`` keys, else
    None — the caller must confirm the bloom's false positives with the
    shuffle path (``_bloom_shuffle_confirm``) instead of an in-map
    ``is_in`` against a driver-materialized array."""
    import ray

    from .. import read_parquet_clean

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    )
    nkeys = max(orders.count(), 1)
    m_words = max(1, (nkeys * 16) // 64)  # ~16 bits/key → <0.1% FP at k=4

    def batch_bitmap(t: pa.Table) -> pa.Table:
        words = np.zeros(m_words, dtype=np.uint64)
        _bloom_set_bits(t["o_orderkey"].to_numpy().astype(np.uint64), words)
        return pa.table({"words": pa.array([words], pa.list_(pa.uint64(), m_words))})

    parts = [
        np.asarray(row["words"], dtype=np.uint64)
        for row in orders.map_batches(batch_bitmap, batch_format="pyarrow").take_all()
    ]
    bloom = np.bitwise_or.reduce(np.stack(parts), axis=0) if parts else np.zeros(
        m_words, dtype=np.uint64
    )
    if nkeys > broadcast_cap:
        return ray.put(bloom), None
    keys_exact = pa.array(
        orders.select_columns(["o_orderkey"]).to_pandas()["o_orderkey"].to_numpy()
    )
    return ray.put(bloom), ray.put(keys_exact)


def _urgent_keys_dataset(sf_dir: str) -> rd.Dataset:
    """The build-side key column as a DATASET (never driver-resident) —
    the shuffle-confirm's right side."""
    from .. import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    ).select_columns(["o_orderkey"])


def _bloom_shuffle_confirm(
    admitted: rd.Dataset, keys_ds: rd.Dataset, *, anti: bool, nshards: int = 32
) -> rd.Dataset:
    """Exact confirm of bloom-admitted fact rows WITHOUT broadcasting
    the build-side key set: both sides ride ONE hash-shard exchange on
    the join key (union + side tag), and a vectorized per-shard ``isin``
    keeps members (semi) or drops them (anti — only the bloom's false
    positives survive, the caller unions the proven misses back). The
    moved bytes are O(bloom-admitted + |build keys|), never the fact
    table; this is the docstring's promised 100-TB confirm stage."""
    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            k = t["l_orderkey" if side == 0 else "o_orderkey"].to_numpy()
            with np.errstate(over="ignore"):
                s = (k.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(nshards)
            cols = {
                "l_orderkey": pa.array(k.astype(np.int64), pa.int64()),
                "price_cents": (
                    t["price_cents"]
                    if side == 0
                    else pa.array(np.zeros(len(k), np.int64), pa.int64())
                ),
                "_side": pa.array(np.full(len(k), side, np.int64), pa.int64()),
                "_shard": pa.array(s.astype(np.int64), pa.int64()),
            }
            return pa.table(cols)

        return fn

    def confirm(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        bk = g.loc[g["_side"] == 1, "l_orderkey"].to_numpy()
        fact = g[g["_side"] == 0]
        member = np.isin(fact["l_orderkey"].to_numpy(), bk)
        keep = fact[~member if anti else member]
        return pandas_to_clean_arrow(
            keep[["l_orderkey", "price_cents"]].reset_index(drop=True)
        )

    both = admitted.map_batches(tag(0), batch_format="pyarrow").union(
        keys_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    return both.groupby("_shard").map_groups(confirm, batch_format="pandas")


def j_bloom_semi(sf_dir: str, broadcast_cap: int = 5_000_000) -> rd.Dataset:
    """Semi join lineitem ⋉ urgent orders via a BROADCAST BLOOM FILTER
    prefilter + exact confirm — the scale pattern for joining a 100-TB
    fact table against a small key side without shuffling the fact
    table: build a bloom bitmap over the build side's keys (distributed
    partial bitmaps OR-merged), ``ray.put`` it once, and drop non-member
    fact rows inside ``map_batches`` before any exact work. The exact
    confirm removes the bloom's false positives so the output equals
    the SQL semi join bit-for-bit — an in-map ``pc.is_in`` against the
    broadcast key set while the build side fits ``broadcast_cap`` keys,
    else a hash-shard SHUFFLE confirm over only the bloom-admitted rows
    (``_bloom_shuffle_confirm``) — both paths byte-identical."""
    import ray

    bloom_ref, keys_ref = _urgent_order_bloom(sf_dir, broadcast_cap)

    def probe(t: pa.Table) -> pa.Table:
        hit = _bloom_hits(
            t["l_orderkey"].to_numpy().astype(np.uint64), ray.get(bloom_ref)
        )
        t = t.filter(pa.array(hit))  # bloom prefilter (no false negatives)
        if keys_ref is not None:
            t = t.filter(pc.is_in(t["l_orderkey"], value_set=ray.get(keys_ref)))
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "price_cents": _cents(t["l_extendedprice"])}
        )

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    admitted = line.map_batches(probe, batch_format="pyarrow")
    if keys_ref is not None:
        return admitted
    return _bloom_shuffle_confirm(admitted, _urgent_keys_dataset(sf_dir), anti=False)


def j_bloom_anti(sf_dir: str, broadcast_cap: int = 5_000_000) -> rd.Dataset:
    """ANTI join lineitem ▷ urgent orders with the same broadcast bloom —
    but the polarity flips WHERE the exact check is needed: a bloom MISS
    proves non-membership (no false negatives) so those rows pass
    straight through with zero further work; only bloom HITS — true
    members plus the ~0.1% false positives — need the exact check, and
    only the false positives among them are kept. The exact-check cost
    is O(|members| + FP), not O(fact table): the asymmetry that makes
    bloom anti-joins nearly free when most fact rows don't match.

    Above ``broadcast_cap`` build keys the exact check becomes the
    hash-shard shuffle confirm over ONLY the bloom-hit slice (a second
    column-pruned scan emits the pass-through misses — at 100 TB a
    re-scan of two pruned columns is far cheaper than shipping the
    ~whole fact table through an exchange)."""
    import ray

    bloom_ref, keys_ref = _urgent_order_bloom(sf_dir, broadcast_cap)

    def probe(t: pa.Table) -> pa.Table:
        hit = _bloom_hits(
            t["l_orderkey"].to_numpy().astype(np.uint64), ray.get(bloom_ref)
        )
        misses = t.filter(pa.array(~hit))  # proven non-members: keep
        maybe = t.filter(pa.array(hit))
        fp = maybe.filter(  # exact check ONLY on the bloom-hit slice
            pc.invert(pc.is_in(maybe["l_orderkey"], value_set=ray.get(keys_ref)))
        )
        out = pa.concat_tables([misses, fp])
        return pa.table(
            {"l_orderkey": out["l_orderkey"], "price_cents": _cents(out["l_extendedprice"])}
        )

    def misses_only(t: pa.Table) -> pa.Table:
        hit = _bloom_hits(
            t["l_orderkey"].to_numpy().astype(np.uint64), ray.get(bloom_ref)
        )
        out = t.filter(pa.array(~hit))
        return pa.table(
            {"l_orderkey": out["l_orderkey"], "price_cents": _cents(out["l_extendedprice"])}
        )

    def hits_only(t: pa.Table) -> pa.Table:
        hit = _bloom_hits(
            t["l_orderkey"].to_numpy().astype(np.uint64), ray.get(bloom_ref)
        )
        out = t.filter(pa.array(hit))
        return pa.table(
            {"l_orderkey": out["l_orderkey"], "price_cents": _cents(out["l_extendedprice"])}
        )

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    if keys_ref is not None:
        return line.map_batches(probe, batch_format="pyarrow")
    admitted = line.map_batches(hits_only, batch_format="pyarrow")
    fp = _bloom_shuffle_confirm(admitted, _urgent_keys_dataset(sf_dir), anti=True)
    passthrough = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
        misses_only, batch_format="pyarrow"
    )
    return passthrough.union(fp)


def cube_agg(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(event_type, dow): value-cents + counts at all four
    grouping levels (pair, per-type, per-dow, grand total), dow =
    day-of-week from the epoch ((days + 4) % 7; 1970-01-01 = Thursday).
    Rolled-up dimensions are encoded as '(all)' / -1 on BOTH sides —
    integer NULLs would come back float64 from the oracle and
    dtype-mismatch the driver hash.

    Same shape as ``rollup_agg``: ONE fact pass (per-batch partials →
    tiny pair groupby), the other three cube levels folded from the
    |types|×7-row aggregate driver-side — never a second scan."""

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy()
        dow = ((us // 86_400_000_000) + 4) % 7
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "dow": dow.astype(np.int64),
                "cents": _cents(t["value"]).to_numpy(),
            }
        )
        g = df.groupby(["event_type", "dow"], as_index=False).agg(
            sum_cents=("cents", "sum"), n=("cents", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    base = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Sum("sum_cents", alias_name="sum_cents"), Sum("n", alias_name="n"))
        .to_pandas()  # |types|×7 rows — small by construction
    )
    by_type = base.groupby("event_type", as_index=False).agg(
        sum_cents=("sum_cents", "sum"), n=("n", "sum")
    )
    by_type["dow"] = -1
    by_dow = base.groupby("dow", as_index=False).agg(
        sum_cents=("sum_cents", "sum"), n=("n", "sum")
    )
    by_dow["event_type"] = "(all)"
    total = pd.DataFrame(
        {"event_type": ["(all)"], "dow": [-1],
         "sum_cents": [base["sum_cents"].sum()], "n": [base["n"].sum()]}
    )
    out = pd.concat([base, by_type, by_dow, total], ignore_index=True)
    return out[["event_type", "dow", "sum_cents", "n"]].astype(
        {"dow": "int64", "sum_cents": "int64", "n": "int64"}
    )


def spearman_moments(sf_dir: str) -> pd.DataFrame:
    """SPEARMAN rank-correlation moments between l_quantity and
    l_discount-cents — exact integers via DISTRIBUTED RANKING WITHOUT A
    GLOBAL SORT: pass 1 builds the per-column value histogram (a
    groupby over the ~50/~11 DISTINCT values — the rank map is
    O(cardinality), not O(rows), so it broadcasts at any corpus size);
    the driver converts counts to doubled average ranks
    (2·avg_rank = 2·cum_before + cnt + 1 — doubling keeps tied-rank
    halves integral); pass 2 looks ranks up via ``np.searchsorted`` and
    accumulates the six sufficient statistics as int64. Spearman ρ is
    one float division the consumer applies; keeping moments integral
    makes the result order-independent and hash-comparable (same
    convention as ``corr_moments``).

    int64 bound: rank2 ≤ 2n → Σ(x2·y2) ≤ 4n³; exact up to n ≈ 1.3e6
    rows per the assert (beyond that the moments move to the 2×int64
    digest-pair representation the exact dedup already uses)."""
    import ray

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def hist_partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy().astype(np.int64)
        d = _cents(t["l_discount"]).to_numpy()
        qs, qc = np.unique(q, return_counts=True)
        ds_, dc = np.unique(d, return_counts=True)
        return pa.table(
            {
                "col": pa.array(["q"] * len(qs) + ["d"] * len(ds_)),
                "value": np.concatenate([qs, ds_]),
                "cnt": np.concatenate([qc, dc]).astype(np.int64),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["col", "value"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # O(distinct values) — tiny by construction
    )

    def rank2_map(sub: pd.DataFrame):
        sub = sub.sort_values("value")
        vals = sub["value"].to_numpy()
        cnt = sub["cnt"].to_numpy()
        cum_before = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        return vals, (2 * cum_before + cnt + 1).astype(np.int64)

    qv, qr = rank2_map(hist[hist["col"] == "q"])
    dv, dr = rank2_map(hist[hist["col"] == "d"])
    n_total = int(hist.loc[hist["col"] == "q", "cnt"].sum())
    assert n_total < 1_300_000, "int64 moment bound — see docstring"
    maps_ref = ray.put((qv, qr, dv, dr))

    def moments(t: pa.Table) -> pa.Table:
        qv_, qr_, dv_, dr_ = ray.get(maps_ref)
        x = qr_[np.searchsorted(qv_, t["l_quantity"].to_numpy().astype(np.int64))]
        y = dr_[np.searchsorted(dv_, _cents(t["l_discount"]).to_numpy())]
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sum_x2": pa.array([int(x.sum())], pa.int64()),
                "sum_y2": pa.array([int(y.sum())], pa.int64()),
                "sum_x2x2": pa.array([int((x * x).sum())], pa.int64()),
                "sum_y2y2": pa.array([int((y * y).sum())], pa.int64()),
                "sum_x2y2": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(moments, batch_format="pyarrow").take_all()
    out = pd.DataFrame(parts).sum().to_frame().T.astype("int64")
    return out[["n", "sum_x2", "sum_y2", "sum_x2x2", "sum_y2y2", "sum_x2y2"]]


def _local_skyline(df: pd.DataFrame) -> pd.DataFrame:
    """2-D Pareto frontier of (minimize price_cents, maximize p_size),
    vectorized: within one price only the max-size rows can survive
    (equal price + strictly larger size dominates); across ascending
    distinct prices the surviving size must STRICTLY increase (equal
    size at a strictly smaller price dominates). Identical (price,
    size) rows never dominate each other — all are kept, matching the
    SQL NOT EXISTS semantics."""
    if df.empty:
        return df
    mx = df.groupby("price_cents")["p_size"].transform("max")
    df = df[df["p_size"] == mx]
    per = (
        df.drop_duplicates("price_cents")
        .sort_values("price_cents")[["price_cents", "p_size"]]
    )
    sizes = per["p_size"].to_numpy()
    before = np.maximum.accumulate(
        np.concatenate([[np.iinfo(np.int64).min], sizes[:-1]])
    )
    keep_prices = per["price_cents"].to_numpy()[sizes > before]
    return df[df["price_cents"].isin(keep_prices)]


def skyline_pareto(sf_dir: str) -> pd.DataFrame:
    """Pareto skyline over part: the parts no other part beats on BOTH
    price (lower-or-equal, integer cents) and size (higher-or-equal,
    strict somewhere).

    Distributed shape: the local skyline is a COMBINER — every global
    skyline point survives its own block's local skyline — so each
    batch reduces to its O(log B)-expected frontier, only those
    candidates leave the workers, and one identical pass over the
    union finishes the job. No shuffle of the fact table, no global
    sort; at 100 TB the candidate union stays frontier-sized."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def local(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "p_partkey": t["p_partkey"].to_numpy(),
                "p_size": t["p_size"].to_numpy().astype(np.int64),
                "price_cents": _cents(t["p_retailprice"]).to_numpy(),
            }
        )
        out = _local_skyline(df)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    # candidate union is frontier-sized (O(blocks · log batch)) — small
    out = _local_skyline(cand).sort_values("p_partkey").reset_index(drop=True)
    return out[["p_partkey", "p_size", "price_cents"]].astype(
        {"p_partkey": "int64", "p_size": "int64", "price_cents": "int64"}
    )


def zscore_outliers(sf_dir: str, z: int = 2) -> rd.Dataset:
    """Per-event-type z-score outlier screen with EXACT integer
    arithmetic (order-independent, hash-comparable): x is an outlier
    iff (x − μ)² > z²σ², which over integer values v = floor(value)
    clears denominators to (n·v − S)² > z²·(n·Q − S²) with S = Σv,
    Q = Σv² — no float mean/stddev on either side.

    Distributed shape: pass 1 computes per-batch (n, S, Q) partials →
    a groupby over the O(#event_types) keys; the tiny moment table is
    broadcast via ``ray.put`` and pass 2 flags rows vectorized inside
    map_batches. Two streaming passes, shuffle volume O(#types)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.floor(t["value"].to_numpy()).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "v": v}
        )
        df["q"] = df["v"] * df["v"]
        df["av"] = df["v"].abs()
        g = df.groupby("event_type", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), q=("q", "sum"), maxav=("av", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    mom = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("q", alias_name="q"),
            Max("maxav", alias_name="maxav"),
        )
        .to_pandas()  # O(#event_types) rows — tiny by construction
    )
    # exact int64 head-room guard: |n·v − S| ≤ 2·n·max|v| must square.
    lim = int(np.sqrt(np.iinfo(np.int64).max)) - 1
    keys, moments = [], []
    for r in mom.itertuples():
        n, s, q = int(r.n), int(r.s), int(r.q)
        rhs = z * z * (n * q - s * s)
        assert 2 * n * int(r.maxav) < lim and rhs < np.iinfo(np.int64).max, (
            "int64 moment bound exceeded — move to the 2×int64 digest form"
        )
        keys.append(r.event_type)
        moments.append((n, s, rhs))
    ref = ray.put((keys, np.array(moments, dtype=np.int64)))

    def flag(t: pa.Table) -> pa.Table:
        keys_, m = ray.get(ref)
        idx = {k: i for i, k in enumerate(keys_)}
        v = np.floor(t["value"].to_numpy()).astype(np.int64)
        et = pd.Series(t["event_type"].to_numpy(zero_copy_only=False))
        codes, uniq = pd.factorize(et)  # loop only over O(#types) uniques
        rowmap = np.array([idx[u] for u in uniq], dtype=np.int64)[codes]
        n, s, rhs = m[rowmap, 0], m[rowmap, 1], m[rowmap, 2]
        lhs = n * v - s
        keep = lhs * lhs > rhs
        return pa.table(
            {
                "event_id": pa.array(t["event_id"].to_numpy()[keep], pa.int64()),
                "event_type": pa.array(et.to_numpy()[keep], pa.string()),
                "value_floor": pa.array(v[keep], pa.int64()),
            }
        )

    from .dedup import pandas_with_schema

    # possibly-empty small screen result: pin the schema (all-empty
    # Dataset.to_pandas drops every column — CLAUDE.md pitfall)
    return pandas_with_schema(
        ds.map_batches(flag, batch_format="pyarrow"),
        {"event_id": "int64", "event_type": "object", "value_floor": "int64"},
    )


# --- data profiling: per-column quality report (SQL-checked) -------------

_PROFILE_SEP = "\x1f"


def data_profile(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """Deequ/Great-Expectations-style column profile of ``events`` in one
    pass: per column the row count, null count, exact distinct count and
    lexicographic min/max of a canonical string repr (ints as decimal
    strings, doubles as FLOOR(x*100) cents — float-free both sides).

    Scale shape: batches reduce to per-batch (col, repr) value_counts,
    the only shuffle is keyed by hash(col+repr) so each distinct repr
    lands on exactly one shard (distinct counts add up disjointly),
    and each shard folds to ≤ |cols| partial rows — the driver sees
    nshards×|cols| rows regardless of corpus size. The repr shuffle is
    bounded by total distinct values (the same bound count_distinct_exact
    pays), never by row count."""
    from ..hashing import hash64_np

    cols = ["event_type", "user_id", "value", "props"]
    ds = _read(sf_dir, "events", cols)

    def partial(t: pa.Table) -> pa.Table:
        outs = {"col": [], "repr": [], "cnt": [], "nulls": []}
        df = t.to_pandas()
        for c in cols:
            s = df[c]
            if c == "value":
                rep = pd.Series(
                    np.floor(s.to_numpy() * 100).astype(np.int64).astype(str),
                    dtype="object",
                ).where(s.notna(), None)
            elif c == "user_id":
                rep = s.astype("Int64").astype(str).where(s.notna(), None)
            else:
                rep = s.astype("object").where(s.notna(), None)
            vc = rep.value_counts(dropna=False)
            reprs = vc.index.to_numpy(dtype=object)
            isna = pd.isna(reprs)
            outs["col"].extend([c] * len(vc))
            outs["repr"].extend([None if m else r for r, m in zip(reprs, isna)])
            outs["cnt"].extend(vc.to_numpy().astype(np.int64))
            outs["nulls"].extend(np.where(isna, vc.to_numpy(), 0).astype(np.int64))
        key = [
            f"{c}{_PROFILE_SEP}{'' if r is None else r}"
            for c, r in zip(outs["col"], outs["repr"])
        ]
        shard = (hash64_np(key) % np.uint64(nshards)).astype(np.int64)
        return pa.table(
            {
                "col": pa.array(outs["col"], pa.string()),
                "repr": pa.array(outs["repr"], pa.string()),
                "cnt": pa.array(outs["cnt"], pa.int64()),
                "nulls": pa.array(outs["nulls"], pa.int64()),
                "_shard": pa.array(shard),
            }
        )

    def fold_shard(g: pd.DataFrame) -> pd.DataFrame:
        # each (col, repr) is wholly inside this shard → distinct counts
        # and null sums from different shards never overlap
        agg = (
            g.groupby(["col", "repr"], dropna=False, sort=False)
            .agg(cnt=("cnt", "sum"), nulls=("nulls", "sum"))
            .reset_index()
        )
        rows = []
        for c, sub in agg.groupby("col", sort=False):
            nn = sub[sub["repr"].notna()]
            rows.append(
                {
                    "col": c,
                    "n": int(sub["cnt"].sum()),
                    "n_null": int(sub["nulls"].sum()),
                    "n_distinct": int(len(nn)),
                    "min_repr": nn["repr"].min() if len(nn) else None,
                    "max_repr": nn["repr"].max() if len(nn) else None,
                }
            )
        out = pd.DataFrame(rows, columns=["col", "n", "n_null", "n_distinct",
                                          "min_repr", "max_repr"])
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(out.astype(
            {"col": "object", "n": "int64", "n_null": "int64",
             "n_distinct": "int64", "min_repr": "object", "max_repr": "object"}
        ))

    partials = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(fold_shard, batch_format="pandas")
    )
    from .dedup import pandas_with_schema

    df = pandas_with_schema(
        partials,
        {"col": "object", "n": "int64", "n_null": "int64",
         "n_distinct": "int64", "min_repr": "object", "max_repr": "object"},
    )
    out = (
        df.groupby("col", as_index=False)
        .agg(
            n=("n", "sum"), n_null=("n_null", "sum"),
            n_distinct=("n_distinct", "sum"),
            min_repr=("min_repr", "min"), max_repr=("max_repr", "max"),
        )
        .sort_values("col")
        .reset_index(drop=True)
    )
    return out.astype(
        {"col": "object", "n": "int64", "n_null": "int64", "n_distinct": "int64",
         "min_repr": "object", "max_repr": "object"}
    )


def skew_audit(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """Pre-shuffle KEY-SKEW audit of candidate partition columns: per key
    column the exact cardinality, row count, hottest-key count, and the
    Simpson concentration Σc² (expected collision mass — the quantity
    that predicts hash-shuffle imbalance; max_c/n_rows is the top-key
    share that decides whether a key needs salting, cf. the host_salt_cap
    / bucket_cap hatches elsewhere in this repo).

    Scale shape (same as data_profile): per-batch value_counts → the one
    shuffle is keyed by hash(col+repr) so every distinct key lands whole
    on one shard; each shard folds its complete per-key counts to ONE
    partial row per column (n_keys / n_rows / max_c / simpson are all
    mergeable: +, +, max, +). Driver sees ≤ nshards×|cols| rows. Σc² is
    exact in int64 up to a 3e9-row hottest key — beyond that this audit
    would be reporting 'salt it' regardless."""
    from ..hashing import hash64_np

    cols = ["user_id", "event_type"]
    ds = _read(sf_dir, "events", cols)
    out_types = {"key_col": "object", "n_keys": "int64", "n_rows": "int64",
                 "max_c": "int64", "simpson": "int64"}

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        outs = {"col": [], "repr": [], "cnt": []}
        for c in cols:
            s = df[c]
            rep = (s.astype("Int64").astype(str) if c == "user_id"
                   else s.astype("object")).where(s.notna(), "")
            vc = rep.value_counts(dropna=False)
            outs["col"].extend([c] * len(vc))
            outs["repr"].extend(vc.index.to_numpy(dtype=object))
            outs["cnt"].extend(vc.to_numpy().astype(np.int64))
        key = [f"{c}{_PROFILE_SEP}{r}" for c, r in zip(outs["col"], outs["repr"])]
        shard = (hash64_np(key) % np.uint64(nshards)).astype(np.int64)
        return pa.table(
            {
                "col": pa.array(outs["col"], pa.string()),
                "repr": pa.array(outs["repr"], pa.string()),
                "cnt": pa.array(outs["cnt"], pa.int64()),
                "_shard": pa.array(shard),
            }
        )

    def fold_shard(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        agg = (
            g.groupby(["col", "repr"], sort=False)["cnt"].sum().reset_index()
        )
        rows = [
            {
                "key_col": c,
                "n_keys": np.int64(len(sub)),
                "n_rows": sub["cnt"].sum(),
                "max_c": sub["cnt"].max(),
                "simpson": (sub["cnt"].to_numpy() ** 2).sum(),
            }
            for c, sub in agg.groupby("col", sort=False)
        ]
        return pandas_to_clean_arrow(
            pd.DataFrame(rows, columns=list(out_types)).astype(out_types)
        )

    from .dedup import pandas_with_schema

    partials = pandas_with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(fold_shard, batch_format="pandas"),
        out_types,
    )
    out = (
        partials.groupby("key_col", as_index=False)
        .agg(n_keys=("n_keys", "sum"), n_rows=("n_rows", "sum"),
             max_c=("max_c", "max"), simpson=("simpson", "sum"))
        .sort_values("key_col")
        .reset_index(drop=True)
    )
    return out.astype(out_types)


# --- q10-style star join: fact ⨝ fact ⨝ two broadcast dims ---------------


def q10_returned(sf_dir: str, k: int = 20, nshards: int = 32) -> pd.DataFrame:
    """TPC-H Q10 shape — revenue lost to returned items per customer,
    top-k with nation attached: the canonical star-schema composition
    (fact⨝fact join + broadcast dimensions).

    Plan, in 100-TB order: (1) filter the fact table AT THE READ
    (l_returnflag='R' row filter + pruned columns), (2) a UNION-SHARD
    MERGE JOIN — both fact sides are tagged into one slim union schema
    and hash-sharded by orderkey, so ONE shuffle co-locates a key's
    revenue partials and its order row; each shard then does the
    revenue sum + inner merge + custkey partial in one vectorized
    pandas pass (measured 2.5 s vs 4.0 s for pre-agg → Dataset.join at
    sf0.1/32 CPUs — j_shuffle_join keeps the Dataset.join
    demonstration), (3) custkey re-reduce (sharded — a customer's
    orders span orderkey shards), (4) per-block top-k prefilter +
    k-row sort, (5) customer and nation are DIMENSIONS: broadcast-
    merged into the k-row result, never shuffled. Revenue is
    FLOOR-cents per line item (float-free compare)."""
    from .. import pandas_to_clean_arrow, read_parquet_clean
    from .dedup import pandas_with_schema

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=pc.field("l_returnflag") == "R",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _shard_of(keys: np.ndarray) -> np.ndarray:
        k64 = keys.astype(np.uint64)
        with np.errstate(over="ignore"):
            return ((k64 * np.uint64(2654435761)) % np.uint64(nshards)).astype(
                np.int64
            )

    def rev_tag(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
                    ),
                    pa.scalar(100.0),
                )
            ),
            pa.int64(),
        )
        df = pa.table({"key": t["l_orderkey"], "a": cents}).to_pandas()
        g = df.groupby("key", as_index=False)["a"].sum()  # per-batch partial
        keys = g["key"].to_numpy()
        return pa.table(
            {
                "key": pa.array(keys),
                "a": pa.array(g["a"].to_numpy()),
                "b": pa.array(np.zeros(len(g), np.int64)),
                "side": pa.array(np.zeros(len(g), np.int8)),
                "_shard": pa.array(_shard_of(keys)),
            }
        )

    def ord_tag(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy()
        return pa.table(
            {
                "key": pa.array(keys),
                "a": pa.array(np.zeros(len(t), np.int64)),
                "b": t["o_custkey"],
                "side": pa.array(np.ones(len(t), np.int8)),
                "_shard": pa.array(_shard_of(keys)),
            }
        )

    both = li.map_batches(rev_tag, batch_format="pyarrow").union(
        orders.map_batches(ord_tag, batch_format="pyarrow")
    )

    def merge_shard(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == 0]
        rev = left.groupby("key", as_index=False)["a"].sum()  # finalize partials
        right = g[g["side"] == 1][["key", "b"]]
        m = rev.merge(right, on="key")
        agg = (
            pd.DataFrame({"o_custkey": m["b"], "revenue_cents": m["a"]})
            .groupby("o_custkey", as_index=False)["revenue_cents"].sum()
        )
        return pandas_to_clean_arrow(
            agg.astype({"o_custkey": "int64", "revenue_cents": "int64"})
        )

    cust_partials = both.groupby("_shard").map_groups(
        merge_shard, batch_format="pandas"
    )

    def cust_reduce_topk(g: pd.DataFrame) -> pa.Table:
        # finalize each customer's sum (a custkey's partials span
        # orderkey shards but land in ONE custkey shard here), then
        # keep only this shard's top-k — the driver sees ≤ nshards×k rows
        agg = g.drop(columns=["_shard"]).groupby("o_custkey", as_index=False)[
            "revenue_cents"
        ].sum()
        agg = agg.sort_values(
            ["revenue_cents", "o_custkey"], ascending=[False, True]
        ).head(k)
        return pandas_to_clean_arrow(
            agg.astype({"o_custkey": "int64", "revenue_cents": "int64"})
        )

    def add_cust_shard(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_shard", pa.array(_shard_of(t["o_custkey"].to_numpy()))
        )

    top_df = pandas_with_schema(
        cust_partials.map_batches(add_cust_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(cust_reduce_topk, batch_format="pandas"),
        {"o_custkey": "int64", "revenue_cents": "int64"},
    ).sort_values(
        ["revenue_cents", "o_custkey"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    # dimension lookups: k keys → FILTERED direct parquet reads (row-
    # group pruned; only the k matching rows reach the driver — never
    # the whole dimension, and no Dataset-executor round per dim)
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", top_df["o_custkey"].tolist())],
    ).to_pandas()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name"],
        filters=[("n_nationkey", "in", cust["c_nationkey"].unique().tolist())],
    ).to_pandas()
    out = (
        top_df.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    )[["o_custkey", "c_name", "n_name", "revenue_cents"]]
    out = out.sort_values(
        ["revenue_cents", "o_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    return out.astype(
        {"o_custkey": "int64", "c_name": "object", "n_name": "object",
         "revenue_cents": "int64"}
    )


def _lev_pairs_vec(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Unit-cost Levenshtein for P candidate pairs, VECTORIZED ACROSS
    PAIRS: the classic DP runs La×Lb rounds of elementwise minima over
    all P pairs at once (324 numpy ops for 18-char names — never a
    per-pair Python DP). A/B are zero-padded uint8 matrices; rows
    beyond a pair's true lengths are never read (result captured at
    row i == la)."""
    P = len(la)
    if P == 0:
        return np.empty(0, dtype=np.int64)
    Lb = B.shape[1]
    res = np.zeros(P, dtype=np.int64)
    prev = np.tile(np.arange(Lb + 1, dtype=np.int64), (P, 1))
    zero = la == 0
    res[zero] = lb[zero]
    for i in range(1, int(la.max()) + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (A[:, i - 1][:, None] != B).astype(np.int64)
        dele = prev[:, 1:] + 1
        for j in range(1, Lb + 1):
            cur[:, j] = np.minimum(
                np.minimum(sub[:, j - 1], dele[:, j - 1]), cur[:, j - 1] + 1
            )
        prev = cur
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
    return res


def fuzzy_blocking(
    sf_dir: str, tau: int = 1, group_cap: int = 20_000
) -> rd.Dataset:
    """Record linkage / entity resolution: customer pairs whose names are
    within Levenshtein distance ``tau``, under nation BLOCKING — the
    three-stage shape every production linker uses (block → cheap filter
    → exact verify), with the blocking predicate part of the operator's
    CONTRACT (the oracle applies the same one, so both sides agree
    exactly; unblocked cross-nation matches are out of scope by design,
    as in any blocked linker).

    Stages per block (one ``groupby(c_nationkey)`` shuffle of slim
    (key, name) rows; a block above ``group_cap`` is logged and skipped
    — the standard hot-key hatch): (1) names → padded byte matrix,
    (2) character-multiset L1 prefilter — ``lev ≥ ⌈L1/2⌉`` since a
    substitution moves two counts and an indel one, so only pairs with
    L1 ≤ 2τ reach the DP (alphabet projected to occurring bytes:
    O(n²·|Σ|) cheap ints), (3) pair-vectorized Levenshtein DP
    (``_lev_pairs_vec``) on the survivors. ASCII names assumed (byte ==
    char distance — holds for the fixture; a unicode corpus would
    decode to codepoints first). Oracle: DuckDB ``levenshtein`` under
    the identical blocking join."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    out_cols = {"custkey_a": "int64", "custkey_b": "int64", "dist": "int64"}

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "fuzzy_blocking: nation %s block %d > group_cap %d — skipped",
                g["c_nationkey"].iloc[0], len(g), group_cap,
            )
            return empty
        if len(g) < 2:
            return empty
        g = g.sort_values("c_custkey")
        keys = g["c_custkey"].to_numpy()
        names = g["c_name"].to_numpy(dtype=object)
        lens = g["c_name"].str.len().to_numpy().astype(np.int64)
        lmax = int(lens.max())
        M = np.array(names, dtype=f"S{lmax}").view(np.uint8).reshape(len(g), lmax)
        # char-multiset counts over true (unpadded) positions only
        rows_i, cols_i = np.nonzero(np.arange(lmax) < lens[:, None])
        counts = np.zeros((len(g), 256), dtype=np.int32)
        np.add.at(counts, (rows_i, M[rows_i, cols_i]), 1)
        C = counts[:, counts.sum(axis=0) > 0]
        # pair enumeration is O(n²) — the prefilter streams it in bounded
        # chunks (the group_cap bounds n; the chunking bounds peak memory)
        ii_all, jj_all = np.triu_indices(len(g), k=1)
        keep_i, keep_j = [], []
        chunk = 2_000_000
        for s in range(0, len(ii_all), chunk):
            ic, jc = ii_all[s : s + chunk], jj_all[s : s + chunk]
            l1 = np.abs(C[ic] - C[jc]).sum(axis=1)
            m = l1 <= 2 * tau
            keep_i.append(ic[m])
            keep_j.append(jc[m])
        ii = np.concatenate(keep_i) if keep_i else np.empty(0, np.int64)
        jj = np.concatenate(keep_j) if keep_j else np.empty(0, np.int64)
        d = _lev_pairs_vec(M[ii], lens[ii], M[jj], lens[jj])
        ok = d <= tau
        return pd.DataFrame(
            {"custkey_a": keys[ii[ok]], "custkey_b": keys[jj[ok]], "dist": d[ok]}
        ).astype(out_cols)

    return ds.groupby("c_nationkey").map_groups(block_pairs, batch_format="pandas")


def sort_partitioned(
    sf_dir: str,
    nparts: int = 8,
    sample_mod: int = 50,
    out_dir: str | None = None,
) -> pd.DataFrame:
    """TeraSort-style RANGE-PARTITIONED GLOBAL SORT of lineitem by price
    cents — the classic cluster sort: sample the key, cut ``nparts-1``
    quantile bounds, route every row to its range, sort each range
    independently. Partition p holds exactly the keys in
    (bound[p-1], bound[p]] so concatenating partitions in id order IS
    the globally sorted output — no merge step, and each partition is an
    independently writable/resumable unit.

    Determinism (what makes this SQL-checkable where production
    TeraSort samples randomly): the sample is the md5-coin subset
    ``md5(l_orderkey-l_linenumber) % sample_mod == 0`` (the split_assign
    coin family) and the bounds are DuckDB-``quantile_disc``-convention
    exact quantiles of that sample (idx = ceil(i·m/nparts)−1), so engine
    and oracle derive identical bounds. Returns the partition MANIFEST
    (part_id, n_rows, min_cents, max_cents) built from per-batch
    partials — the fact table itself is only shuffled when ``out_dir``
    is given (one groupby(part) → per-range sort → one parquet fragment
    per range; tests pin global order across fragments)."""
    from .dedup import _md5_lower64, pandas_with_schema

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
    out_types = {
        "part_id": "int64", "n_rows": "int64",
        "min_cents": "int64", "max_cents": "int64",
    }

    def key_of(t: pa.Table) -> np.ndarray:
        return _cents(t["l_extendedprice"]).to_numpy()

    def coin_rows(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        ln = t["l_linenumber"].to_numpy()
        coin = _md5_lower64(
            [f"{a}-{b}" for a, b in zip(ok.tolist(), ln.tolist())]
        ) % np.uint64(sample_mod)
        return pa.table({"key": key_of(t)[coin == 0]})

    sample = ds.map_batches(coin_rows, batch_format="pyarrow").to_pandas()["key"]
    s = np.sort(sample.to_numpy())
    m = len(s)
    bounds = (
        np.array([s[-(-(i * m) // nparts) - 1] for i in range(1, nparts)])
        if m
        else np.empty(0, np.int64)
    )

    def manifest_partial(t: pa.Table) -> pa.Table:
        k = key_of(t)
        part = np.searchsorted(bounds, k, side="left").astype(np.int64)
        df = pd.DataFrame({"part_id": part, "k": k})
        g = df.groupby("part_id", as_index=False).agg(
            n_rows=("k", "size"), min_cents=("k", "min"), max_cents=("k", "max")
        )
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(g.astype(out_types))

    manifest = pandas_with_schema(
        ds.map_batches(manifest_partial, batch_format="pyarrow")
        .groupby("part_id")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Min("min_cents", alias_name="min_cents"),
            Max("max_cents", alias_name="max_cents"),
        ),
        out_types,
    ).sort_values("part_id").reset_index(drop=True)

    if out_dir is not None:
        import os

        os.makedirs(out_dir, exist_ok=True)

        def write_range(g: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            p = int(g["part_id"].iloc[0])
            g = g.sort_values(["k", "l_orderkey", "l_linenumber"])
            pq.write_table(
                pa.Table.from_pandas(
                    g[["k", "l_orderkey", "l_linenumber"]], preserve_index=False
                ),
                f"{out_dir}/part_{p:05d}.parquet",
            )
            return pd.DataFrame({"part_id": pd.array([p], dtype="int64"),
                                 "written": pd.array([len(g)], dtype="int64")})

        def tag(t: pa.Table) -> pa.Table:
            k = key_of(t)
            part = np.searchsorted(bounds, k, side="left").astype(np.int64)
            return pa.table(
                {
                    "part_id": part,
                    "k": k,
                    "l_orderkey": t["l_orderkey"],
                    "l_linenumber": t["l_linenumber"],
                }
            )

        written = (
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby("part_id")
            .map_groups(write_range, batch_format="pandas")
            .to_pandas()
        )
        assert int(written["written"].sum()) == int(manifest["n_rows"].sum())

    return manifest


def zorder_layout(sf_dir: str, bits: int = 16, part_bits: int = 6) -> rd.Dataset:
    """Z-ORDER (Morton) LAYOUT CLUSTERING — the multi-dimensional
    data-layout operator (Delta/Iceberg ``OPTIMIZE ZORDER BY``): map
    each lineitem row's (l_partkey, l_suppkey) to one interleaved-bit
    curve position ``zcode`` and a coarse grid cell ``zpart`` (top
    ``part_bits`` bits). Writing the table partitioned by ``zpart``
    gives scans that filter on EITHER key a bounded set of cells to
    touch — the scan-locality lever at 100 TB, where re-clustering by a
    single sort key only helps one predicate column.

    Shape: ONE tiny max-aggregate (two int64s to the driver) to
    normalize each dimension into ``bits`` bits, then a pure vectorized
    map — the curve assignment itself needs no shuffle; only an actual
    rewrite would move rows, and each zpart cell is an independently
    writable/resumable unit (cf. sort_partitioned's range manifest).
    All-integer, so the DuckDB oracle reproduces the interleave bit for
    bit."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])
    mx = ds.aggregate(Max("l_partkey"), Max("l_suppkey"))
    mp, ms = int(mx["max(l_partkey)"]), int(mx["max(l_suppkey)"])
    scale = np.int64(1) << np.int64(bits)

    def fn(t: pa.Table) -> pa.Table:
        x = t["l_partkey"].to_numpy().astype(np.int64)
        y = t["l_suppkey"].to_numpy().astype(np.int64)
        xn = (x * scale) // np.int64(mp + 1)
        yn = (y * scale) // np.int64(ms + 1)
        z = np.zeros(len(x), np.int64)
        for i in range(bits):
            z |= ((xn >> np.int64(i)) & 1) << np.int64(2 * i + 1)
            z |= ((yn >> np.int64(i)) & 1) << np.int64(2 * i)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "zcode": pa.array(z),
                "zpart": pa.array(z >> np.int64(2 * bits - part_bits)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def s_except_all(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """Multiset EXCEPT ALL (bag difference): the user_id bag of 'click'
    events minus the user_id bag of 'view' events — each id survives
    max(n_click − n_view, 0) times. The multiplicity-aware sibling of
    the set-semantics ``s_except`` (SQL EXCEPT ALL; Arrow/Spark have no
    native kernel for it).

    Scale shape: the corpus never materializes rows — per-batch partial
    counts per (user, side) are the only thing shuffled (≤ 2·|users|
    slim rows), the per-shard reduce diffs the two counts vectorized,
    and the surviving multiplicities are expanded with one np.repeat
    INSIDE the shard (distributed, bounded by the answer size)."""
    ds = _read(
        sf_dir, "events", ["user_id", "event_type"],
        filter=pc.field("event_type").isin(["click", "view"]),
    )

    def partial_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([("user_id", "count")])
        shard = pc.cast(
            pc.bit_wise_and(g["user_id"], np.int64(nshards - 1)), pa.int64()
        )
        return pa.table(
            {"user_id": g["user_id"], "event_type": g["event_type"],
             "n": pc.cast(g["user_id_count"], pa.int64()), "_shard": shard}
        )

    def shard_diff(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["user_id", "event_type"])["n"].sum().unstack(fill_value=0)
        nc = agg.get("click", pd.Series(0, index=agg.index)).to_numpy()
        nv = agg.get("view", pd.Series(0, index=agg.index)).to_numpy()
        mult = np.maximum(nc - nv, 0).astype(np.int64)
        ids = agg.index.to_numpy().astype(np.int64)
        keep = mult > 0
        return pd.DataFrame({"user_id": np.repeat(ids[keep], mult[keep])})

    from .dedup import pandas_with_schema

    out = pandas_with_schema(
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_diff, batch_format="pandas"),
        {"user_id": "int64"},
    )
    return out.reset_index(drop=True)
