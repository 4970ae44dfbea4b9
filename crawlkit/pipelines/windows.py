"""Windowed / ordered / sketch operators (streaming-shaped workloads).

Ray Data has no event-time windows (SURVEY §2.10) — these implement the
standard shapes per the Ray-Data-first recipe: window ids computed
vectorized per batch + partial aggregation for tumbling/sliding;
``groupby(key).map_groups`` over ts-sorted groups for sessions and
rank-based ops (documented partitioning assumption: one key's history
fits one group); mergeable sketches for the approximate path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

US_PER_HALF_HOUR = 1_800_000_000
SESSION_GAP_US = 1_800_000_000


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    from .. import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col) -> np.ndarray:
    return np.floor(col.to_numpy() * 100).astype(np.int64)


def w_sliding(sf_dir: str) -> rd.Dataset:
    """Sliding windows: size 1h, slide 30min — each event lands in TWO
    half-hour-aligned windows. Explode (×2) vectorized per batch, then
    partial agg → groupby (the tumbling pipeline with a fan-out)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        h = us // US_PER_HALF_HOUR
        cents = _cents(t["value"])
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": np.concatenate([et, et]),
                "win": np.concatenate([h, h - 1]),
                "cents": np.concatenate([cents, cents]),
            }
        )
        g = df.groupby(["event_type", "win"], as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "win"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


def w_session(sf_dir: str, group_cap: int = 2_000_000) -> rd.Dataset:
    """Session windows per user (gap 30min): count + per-user session
    index. Hash-partition by user_id, per-group vectorized gap/cumsum
    over (ts, event_id)-sorted history. A user above ``group_cap`` rows
    is logged and skipped (hot-key hatch — round-2 VERDICT #7)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "w_session: user %s history %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=g["user_id"].dtype),
                    "session_idx": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = g["ts"].astype("int64").to_numpy()
        new = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new[1:] = (us[1:] - us[:-1] > SESSION_GAP_US).astype(np.int64)
        sess = np.cumsum(new)
        out = pd.DataFrame({"user_id": g["user_id"], "session_idx": sess})
        return (
            out.groupby(["user_id", "session_idx"], as_index=False)
            .size()
            .rename(columns={"size": "n_events"})
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def topk_per_group(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Top-k rows per key (the per-host frontier-budget shape): per-batch
    top-k prefilter then per-group exact top-k (cents desc, event_id)."""
    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def prefilter(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "event_id": t["event_id"].to_numpy(),
                "cents": _cents(t["value"]),
            }
        )
        df = df.sort_values(["cents", "event_id"], ascending=[False, True])
        return pa.Table.from_pandas(df.groupby("event_type").head(k), preserve_index=False).replace_schema_metadata(None)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "event_id"], ascending=[False, True]).head(k)
        return g[["event_type", "event_id", "cents"]]

    return (
        ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(final, batch_format="pandas")
    )


def median_disc(sf_dir: str) -> rd.Dataset:
    """Exact discrete median (quantile_disc 0.5 convention: element at
    index floor((n-1)/2) of the ascending sort) of cents per event_type.
    Exact quantiles need the full group — groupby + map_groups; the
    approximate scale path is a mergeable KLL/t-digest sketch."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": pa.array(_cents(t["value"])),
            }
        )

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["cents"].to_numpy())
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "median_cents": [int(v[(len(v) - 1) // 2])]}
        )

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(med, batch_format="pandas")
    )


def count_distinct_exact(sf_dir: str) -> rd.Dataset:
    """Exact COUNT(DISTINCT user) per event_type: per-batch pre-dedup →
    global pair-distinct → count (two small shuffles, never raw rows)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
    )


# --- HyperLogLog sketch (approximate distinct; mergeable) ---------------


class _HLL:
    """Classic HLL: m=2^p registers, register = max leading-zero rank."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.reg = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of remaining bits + 1 (cap at 64-p+1)
        rank = np.zeros(len(h), dtype=np.uint8)
        val = rest.copy()
        zeros = np.full(len(h), 64 - self.p, dtype=np.uint8)
        nz = val != 0
        # position of highest set bit via float log2 is imprecise for
        # 64-bit — use bit-length loop over bytes instead
        bl = np.zeros(len(h), dtype=np.uint8)
        v = val.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v >= (np.uint64(1) << np.uint64(shift))
            bl[mask] += shift
            v[mask] >>= np.uint64(shift)
        bl[val != 0] += 1  # bit length
        rank = np.where(val == 0, zeros + 1, 64 - bl + 1).astype(np.uint8)
        np.maximum.at(self.reg, idx, rank)

    def merge(self, other: "_HLL") -> None:
        np.maximum(self.reg, other.reg, out=self.reg)

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        s = np.sum(2.0 ** -self.reg.astype(np.float64))
        e = alpha * m * m / s
        if e <= 2.5 * m:
            zeros = int((self.reg == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)


def hll_count_distinct(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Approximate distinct users per event_type via mergeable HLL:
    one serialized sketch per (key, batch) emitted from map_batches,
    merged per key in a tiny map_groups — the SURVEY sketch recipe.
    Rows-only check (approximate); error bound asserted in tests."""
    from ..hashing import hash64_np

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "user_id": t["user_id"].to_numpy(),
            }
        )
        rows = []
        for et, g in df.groupby("event_type"):
            h = hash64_np([str(u) for u in g["user_id"].unique()])
            hll = _HLL(p)
            hll.add_hashes(h)
            rows.append({"event_type": et, "registers": hll.reg.tobytes()})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("event_type", pa.string()), ("registers", pa.binary())])
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hll = _HLL(p)
        for b in g["registers"]:
            o = _HLL(p)
            o.reg = np.frombuffer(b, dtype=np.uint8).copy()
            hll.merge(o)
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "approx_users": [int(round(hll.estimate()))]}
        )

    out = (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )
    return out.to_pandas().sort_values("event_type").reset_index(drop=True)


def approx_quantile(
    sf_dir: str, qs: tuple = (0.1, 0.5, 0.9, 0.99), npoints: int = 128
) -> pd.DataFrame:
    """Approximate quantiles per event_type via a MERGEABLE
    weighted-sample sketch (the scale path next to the exact
    ``median_disc``): each (key, batch) emits ``npoints`` equally-spaced
    order statistics of the batch, each weighted batch_n/npoints — a
    piecewise ECDF approximation whose per-batch rank error is ≤
    1/(2·npoints). Merging is a weighted quantile over the union of
    points (rank error ≤ 1/npoints after merge, independent of batch
    count). Shuffle volume: npoints × batches rows per key, never the
    raw column. Rows-only check (approximate); the rank-error bound is
    asserted in tests against the exact sort."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def sketch(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "cents": _cents(t["value"]),
            }
        )
        outs = []
        for et, g in df.groupby("event_type"):
            v = np.sort(g["cents"].to_numpy())
            n = len(v)
            take = min(npoints, n)
            # midpoints of `take` equal rank strata → unbiased ECDF steps
            idx = ((np.arange(take) + 0.5) * n / take).astype(np.int64).clip(0, n - 1)
            outs.append(
                pd.DataFrame(
                    {
                        "event_type": et,
                        "point": v[idx],
                        "weight": np.full(take, n / take),
                    }
                )
            )
        out = pd.concat(outs) if outs else pd.DataFrame(
            {"event_type": pd.Series([], dtype="object"),
             "point": pd.Series([], dtype="int64"),
             "weight": pd.Series([], dtype="float64")}
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("point")
        w = g["weight"].to_numpy()
        cum = np.cumsum(w)
        total = cum[-1]
        rows = []
        for q in qs:
            j = int(np.searchsorted(cum, q * total, side="left"))
            rows.append(
                {
                    "event_type": g["event_type"].iloc[0],
                    "q": q,
                    "approx_cents": int(g["point"].to_numpy()[min(j, len(g) - 1)]),
                }
            )
        return pd.DataFrame(rows)

    out = (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )
    return out.to_pandas().sort_values(["event_type", "q"]).reset_index(drop=True)


def heavy_hitters(sf_dir: str, k: int = 200) -> rd.Dataset:
    """EXACT heavy hitters (users with freq > n/k) via the classic
    2-pass candidate/verify shape:

    pass 1 — per-batch candidate generation: every user whose count in
    the batch exceeds ``n_batch/k`` (the Misra-Gries guarantee computed
    exactly since the batch is in memory — ≤ k candidates per batch).
    By averaging, any user with GLOBAL freq > n/k must exceed the local
    threshold in at least one batch, so the union of per-batch
    candidates is a superset of the true answer: ≤ k × n_batches ids on
    the driver, never a full groupby of the raw column.

    pass 2 — broadcast the candidate set (ray.put), exact partial
    counts of candidates only inside map_batches, tiny groupby sum,
    integer threshold ``cnt * k > n``. Output is EXACT (SQL-checked) —
    the sketch only prunes the shuffle from |distinct| to |candidates|.
    """
    import ray

    ds = _read(sf_dir, "events", ["user_id"])
    n = ds.count()  # metadata-only for parquet

    def candidates(t: pa.Table) -> pa.Table:
        vals = t["user_id"].to_numpy()
        uniq, cnt = np.unique(vals, return_counts=True)
        # strict local analogue of the global threshold: cnt*k > n_batch
        keep = cnt.astype(np.int64) * k > len(vals)
        return pa.table({"user_id": pa.array(uniq[keep])})

    cand = np.unique(
        ds.map_batches(candidates, batch_format="pyarrow")
        .to_pandas()["user_id"]
        .to_numpy()
    )
    ref = ray.put(cand)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vals = t["user_id"].to_numpy()
        vals = vals[np.isin(vals, c)]
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table(
            {"user_id": pa.array(uniq), "cnt": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def thresh(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("user_id", pa.int64()), ("cnt", pa.int64())]
            ).empty_table()
        return t.filter(pc.greater(pc.multiply(t["cnt"], pa.scalar(k, pa.int64())), pa.scalar(n, pa.int64())))

    return agg.map_batches(thresh, batch_format="pyarrow")


def mode_per_group(sf_dir: str) -> rd.Dataset:
    """Per-group mode: the most frequent user per event_type (ties →
    smallest user_id). Partial (event_type, user_id) counts per batch →
    groupby sum → per-type argmax in a tiny map_groups — the raw rows
    never shuffle, only (type, user, cnt) triples."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["event_type", "user_id"])
            .aggregate([("user_id", "count")])
            .rename_columns(["event_type", "user_id", "cnt"])
        )

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "user_id"], ascending=[False, True])
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "mode_user": [int(g["user_id"].iloc[0])],
                "cnt": [int(g["cnt"].iloc[0])],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("event_type")
        .map_groups(argmax, batch_format="pandas")
    )


def w_lag_delta(sf_dir: str, group_cap: int = 2_000_000) -> rd.Dataset:
    """LAG window op: per user (ordered by ts, event_id) the previous
    event's cents and the delta — the sessionize/feature-diff shape a
    training-data pipeline uses for per-entity sequence features.
    Hash-partition by user_id + per-group vectorized shift; rows without
    a predecessor are dropped (keeps every column non-null int64 so the
    SQL compare is dtype-exact). Same ``group_cap`` hot-key hatch as
    w_session."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "cents": pa.array(_cents(t["value"])),
            }
        )

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "w_lag_delta: user %s history %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            g = g.iloc[0:0]
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        c = g["cents"].to_numpy()
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[1:],
                "user_id": g["user_id"].to_numpy()[1:],
                "cents": c[1:],
                "prev_cents": c[:-1],
                "delta_cents": c[1:] - c[:-1],
            }
        )
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(out.astype(
            {"event_id": "int64", "user_id": "int64", "cents": "int64",
             "prev_cents": "int64", "delta_cents": "int64"}
        ))

    out = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(lag, batch_format="pandas")
    )
    from .dedup import pandas_with_schema

    return pandas_with_schema(
        out,
        {"event_id": "int64", "user_id": "int64", "cents": "int64",
         "prev_cents": "int64", "delta_cents": "int64"},
    )


def w_rolling_sum(sf_dir: str, window: int = 3, group_cap: int = 2_000_000) -> rd.Dataset:
    """Rolling ROW-window aggregate (completes the window family next to
    lag/tumbling/sliding/session): per user, ordered by (ts, event_id),
    the sum of cents over the current row and ``window-1`` preceding —
    the per-entity moving-feature shape. Hash-partition by user +
    per-group vectorized cumsum difference (no per-row loop); same
    ``group_cap`` hot-key hatch as w_session."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "cents": pa.array(_cents(t["value"])),
            }
        )

    def roll(g: pd.DataFrame) -> pa.Table:
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "w_rolling_sum: user %s history %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            g = g.iloc[0:0]
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        c = g["cents"].to_numpy()
        cs = np.concatenate([[0], np.cumsum(c)])
        lo = np.maximum(np.arange(len(c)) - (window - 1), 0)
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "cents": c,
                "roll_cents": cs[1:] - cs[lo],
            }
        )
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(out.astype(
            {"event_id": "int64", "user_id": "int64", "cents": "int64", "roll_cents": "int64"}
        ))

    out = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(roll, batch_format="pandas")
    )
    from .dedup import pandas_with_schema

    return pandas_with_schema(
        out,
        {"event_id": "int64", "user_id": "int64", "cents": "int64", "roll_cents": "int64"},
    )


def rank_dense(sf_dir: str) -> rd.Dataset:
    """DENSE_RANK per group: parts ranked within p_brand by retail price
    (cents desc). Hash-partition by brand + per-group vectorized rank —
    ties share a rank, so no tiebreak column is needed for determinism."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_brand": t["p_brand"],
                "cents": pa.array(_cents(t["p_retailprice"])),
            }
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["drank"] = g["cents"].rank(method="dense", ascending=False).astype("int64")
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(g[["p_partkey", "p_brand", "cents", "drank"]])

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(rank, batch_format="pandas")
    )


def ntile_bucket(sf_dir: str, k: int = 4) -> rd.Dataset:
    """NTILE(k) per group: orders bucketed into k equal-depth tiles
    within o_orderpriority, ordered by (totalprice cents, o_orderkey) —
    the equal-frequency binning step of feature pipelines. Exact SQL
    NTILE semantics: the first ``n % k`` buckets get ``ceil(n/k)`` rows."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderpriority": t["o_orderpriority"],
                "cents": pa.array(_cents(t["o_totalprice"])),
            }
        )

    def tile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "o_orderkey"]).reset_index(drop=True)
        n = len(g)
        q, r = divmod(n, k)
        i = np.arange(n, dtype=np.int64)
        big = (q + 1) * r  # rows covered by the r larger buckets
        bucket = np.where(
            i < big, i // max(q + 1, 1) + 1, r + (i - big) // max(q, 1) + 1
        )
        g["bucket"] = bucket.astype("int64")
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(g[["o_orderkey", "o_orderpriority", "cents", "bucket"]])

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(tile, batch_format="pandas")
    )


def j_keyed_range(sf_dir: str, days: int = 30) -> rd.Dataset:
    """Keyed range join: per order, count lineitems shipped within
    [o_orderdate, o_orderdate + days). Hash-join on the key, range
    predicate filtered vectorized post-join (the composition rule for
    range joins when a key exists; pure range joins sort+bucket)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    j = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def in_range(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        od = pc.cast(t["o_orderdate"], pa.int64())
        hi = pc.add(od, pa.scalar(days * 86_400_000_000, pa.int64()))
        keep = pc.and_(pc.greater_equal(ship, od), pc.less(ship, hi))
        out = t.filter(keep)
        return pa.table({"l_orderkey": out["l_orderkey"], "one": pa.array(np.ones(out.num_rows, dtype=np.int64))})

    from .relational import _sharded_agg

    return _sharded_agg(
        j.map_batches(in_range, batch_format="pyarrow"),
        "l_orderkey",
        {"n_shipped": ("one", "sum")},
    )


def w_percent_rank(sf_dir: str, group_cap: int = 4_000_000) -> rd.Dataset:
    """PERCENT_RANK / CUME_DIST as EXACT RATIONALS: per event_type
    (ordered by value-cents) each event's (rank−1, n−1, rows≤current) —
    the float percent_rank/cume_dist is one division away, but emitting
    the integer numerators/denominator keeps the distributed result
    order-independent and hash-comparable (float window outputs are not).
    Hash-partition by event_type + per-group vectorized pandas rank
    (method='min' ↔ RANK(), method='max' ↔ rows-≤-current). Same
    ``group_cap`` hot-key hatch as w_session (event_type groups are few
    and big — the cap here guards a degenerate single-type corpus)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "cents": pa.array(_cents(t["value"])),
            }
        )

    def prank(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "w_percent_rank: type %s history %d > group_cap %d — skipped",
                g["event_type"].iloc[0], len(g), group_cap,
            )
            g = g.iloc[0:0]
        c = g["cents"]
        out = pd.DataFrame(
            {
                "event_id": g["event_id"],
                "event_type": g["event_type"],
                "pr_num": c.rank(method="min").astype("int64") - 1,
                "pr_den": np.int64(max(len(g) - 1, 0)),
                "cd_num": c.rank(method="max").astype("int64"),
            }
        )
        return pandas_to_clean_arrow(out.astype({"event_id": "int64", "pr_den": "int64"}))

    out = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(prank, batch_format="pandas")
    )
    from .dedup import pandas_with_schema

    return pandas_with_schema(
        out,
        {"event_id": "int64", "event_type": "object", "pr_num": "int64",
         "pr_den": "int64", "cd_num": "int64"},
    )


def funnel_conversion(
    sf_dir: str, nshards: int = 32, step_window_hours: int = 24
) -> rd.Dataset:
    """Ordered-funnel analysis (view → click → purchase): how many users
    completed each prefix of the funnel IN TIMESTAMP ORDER (stage k
    counts users with a 'click' strictly after their first 'view' and
    within ``step_window_hours`` of it, etc. — the standard
    product-analytics sequence query; the window keeps the fixture
    check discriminating, 150/60/25 users at sf0.01).

    Shape: shard events by user-id hash (every user's history lands in
    ONE shard — same co-location contract as w_session), compute the
    per-shard funnel with three vectorized pandas merge+min passes (no
    per-user loop), then reduce the 3-row per-shard counts with a tiny
    groupby(stage) sum. Shuffle volume is the events table once; the
    reduce moves 3·nshards rows."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def add_shard(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            s = (u * np.uint64(2654435761)) % np.uint64(nshards)
        return t.append_column("_shard", pa.array(s.astype(np.int64)))

    def shard_funnel(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        win = pd.Timedelta(hours=step_window_hours)
        v = g.loc[g["event_type"] == "view"].groupby("user_id")["ts"].min().rename("t1")
        c = g.loc[g["event_type"] == "click"].merge(v, on="user_id")
        c = (
            c.loc[(c["ts"] > c["t1"]) & (c["ts"] <= c["t1"] + win)]
            .groupby("user_id")["ts"].min().rename("t2")
        )
        p = g.loc[g["event_type"] == "purchase"].merge(c, on="user_id")
        p = (
            p.loc[(p["ts"] > p["t2"]) & (p["ts"] <= p["t2"] + win)]
            .groupby("user_id")["ts"].min()
        )
        return pandas_to_clean_arrow(
            pd.DataFrame(
                {
                    "stage": ["view", "view>click", "view>click>purchase"],
                    "n_users": np.array([len(v), len(c), len(p)], dtype=np.int64),
                }
            )
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_funnel, batch_format="pandas")
        .groupby("stage")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def w_first_last(sf_dir: str, nshards: int = 32) -> rd.Dataset:
    """FIRST_VALUE / LAST_VALUE per user (ordered by ts, event_id): each
    user's first and last event id and value-cents — the
    session-boundary projection product analytics runs per entity.
    Shape: hash-shard by user (co-location contract), ONE vectorized
    pandas sort + groupby first/last per shard, no window materialized."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def add_shard(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            s = (u * np.uint64(2654435761)) % np.uint64(nshards)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "cents": pa.array(_cents(t["value"])),
                "_shard": pa.array(s.astype(np.int64)),
            }
        )

    def shard_first_last(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        g = g.sort_values(["user_id", "ts", "event_id"])
        agg = g.groupby("user_id", as_index=False).agg(
            first_event_id=("event_id", "first"),
            last_event_id=("event_id", "last"),
            first_cents=("cents", "first"),
            last_cents=("cents", "last"),
        )
        return pandas_to_clean_arrow(
            agg.astype(
                {"user_id": "int64", "first_event_id": "int64",
                 "last_event_id": "int64", "first_cents": "int64",
                 "last_cents": "int64"}
            )
        )

    from .dedup import ensure_schema

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("first_event_id", pa.int64()),
         ("last_event_id", pa.int64()), ("first_cents", pa.int64()),
         ("last_cents", pa.int64())]
    )
    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_first_last, batch_format="pandas")
        # empty shards emit 0-column blocks — normalize (CLAUDE.md)
        .map_batches(ensure_schema(out_schema), batch_format="pyarrow")
    )


def cohort_retention(sf_dir: str, nshards: int = 32) -> rd.Dataset:
    """Weekly cohort-retention matrix: cohort_week = the epoch-week of a
    user's FIRST event; for every (cohort_week, week_offset) the number
    of distinct cohort users active that week — the standard retention
    triangle.

    Shape: hash-shard by user so each user's whole history is in one
    shard; the per-shard pandas pass computes each user's cohort and
    DISTINCT (cohort, offset) memberships, so the per-shard counts are
    already distinct-user counts and the global reduce is a tiny
    groupby(cohort_week, week_offset) SUM — COUNT(DISTINCT) without
    shuffling user ids twice."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    US_PER_WEEK = 7 * 86_400_000_000

    def add_shard(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        wk = t["ts"].cast(pa.int64()).to_numpy() // US_PER_WEEK
        with np.errstate(over="ignore"):
            s = (u * np.uint64(2654435761)) % np.uint64(nshards)
        return pa.table(
            {
                "user_id": t["user_id"],
                "wk": wk.astype(np.int64),
                "_shard": pa.array(s.astype(np.int64)),
            }
        )

    def shard_counts(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        g = g.drop_duplicates(["user_id", "wk"])
        cohort = g.groupby("user_id")["wk"].transform("min")
        counts = (
            pd.DataFrame(
                {"cohort_week": cohort, "week_offset": g["wk"] - cohort}
            )
            .groupby(["cohort_week", "week_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return pandas_to_clean_arrow(
            counts.astype(
                {"cohort_week": "int64", "week_offset": "int64", "n_users": "int64"}
            )
        )

    from .dedup import ensure_schema

    mid_schema = pa.schema(
        [("cohort_week", pa.int64()), ("week_offset", pa.int64()),
         ("n_users", pa.int64())]
    )
    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_counts, batch_format="pandas")
        # empty shards emit 0-column blocks — normalize (CLAUDE.md)
        .map_batches(ensure_schema(mid_schema), batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def percentile_hist(sf_dir: str, q_pcts: tuple[int, ...] = (50, 95)) -> pd.DataFrame:
    """EXACT per-group percentiles WITHOUT materializing any group: the
    distributed-histogram trick (same as ``spearman_moments``' rank
    maps) — per-batch (event_type, cents) histogram partials → one
    groupby over O(|types|·|distinct cents|) rows (cardinality-sized,
    never row-count-sized) → the driver walks each type's cumulative
    counts to the quantile indices. Returns every requested percentile
    in ONE corpus pass; contrast ``median_disc``, which ships each
    group's full row set to one task (exactness via completeness) — this
    shape is exact via COUNTS and is the one that survives 100 TB.
    Index convention pinned to DuckDB ``quantile_disc``:
    idx = ceil(q·n) − 1 on the ascending sort."""
    from ray.data.aggregate import Sum as _Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "cents": _cents(t["value"]),
            }
        )
        g = df.groupby(["event_type", "cents"], as_index=False).size()
        g = g.rename(columns={"size": "cnt"})
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(
            g.astype({"event_type": "string", "cents": "int64", "cnt": "int64"})
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(_Sum("cnt", alias_name="cnt"))
        .to_pandas()  # O(|types| × |distinct cents|) — cardinality-sized
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cents")
        vals = g["cents"].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        row = {"event_type": et}
        for q in q_pcts:
            idx = -(-q * n // 100) - 1  # ceil(q·n/100) − 1, integer-exact
            row[f"p{q}_cents"] = int(vals[np.searchsorted(cum, idx + 1)])
        rows.append(row)
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    return out.astype({f"p{q}_cents": "int64" for q in q_pcts})


def winsorize(sf_dir: str, lo_pct: int = 5, hi_pct: int = 95) -> rd.Dataset:
    """Winsorization: clamp every value to the global EXACT [p05, p95]
    (quantile_disc convention, same ceil(q·n)−1 index as
    ``percentile_hist``). The aggregate→broadcast→row-transform shape:
    pass 1 reduces the corpus to a cardinality-sized cents histogram
    (never row-sized), the driver walks it to TWO ints, pass 2 is a
    stateless vectorized np.clip map — the cut points ride into tasks
    as closure ints (a large broadcast side would use ray.put; two
    int64s don't need the object store)."""
    from ray.data.aggregate import Sum as _Sum

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def hist_partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(_cents(t["value"])).value_counts()
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(
            pd.DataFrame(
                {"cents": vc.index.to_numpy(), "cnt": vc.to_numpy()}
            ).astype({"cents": "int64", "cnt": "int64"})
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(_Sum("cnt", alias_name="cnt"))
        .to_pandas()  # O(|distinct cents|) — cardinality-sized
        .sort_values("cents")
    )
    vals = hist["cents"].to_numpy()
    cum = hist["cnt"].to_numpy().cumsum()
    n = int(cum[-1])
    cuts = [
        int(vals[np.searchsorted(cum, -(-q * n // 100) - 1 + 1)])
        for q in (lo_pct, hi_pct)
    ]
    lo, hi = cuts

    def clamp(t: pa.Table) -> pa.Table:
        c = _cents(t["value"])
        return pa.table(
            {
                "event_id": t["event_id"],
                "cents": pa.array(c),
                "w_cents": pa.array(np.clip(c, lo, hi)),
            }
        )

    return ds.map_batches(clamp, batch_format="pyarrow")


# --- event-path mining: top-k event-type trigrams (SQL-checked) ----------


def path_trigrams(sf_dir: str, k: int = 10, nshards: int = 32) -> pd.DataFrame:
    """Top-k 3-step event-type sequences across per-user ordered
    streams (``view>click>purchase``-style path mining — the funnel
    generalization a product/training-data pipeline uses to discover
    behavior patterns rather than check a fixed one; cf.
    ``funnel_conversion``). Order contract per user: (ts, event_id) —
    the same tie-break every window op here uses. Scale shape: users
    are hash-sharded (user_id % nshards, one shuffle of slim rows),
    each shard forms trigrams with one vectorized sort + double-shift
    pass, and only (trigram, count) partials — at most |types|³ rows
    per shard — reach the tiny final reduce."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def add_shard(t: pa.Table) -> pa.Table:
        shard = pc.cast(
            pc.bit_wise_and(t["user_id"], np.int64(nshards - 1)), pa.int64()
        )
        return t.append_column("_shard", shard)

    def shard_trigrams(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(dtype=object)
        if len(g) < 3:
            return pd.DataFrame({"trigram": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        if not same.any():
            return pd.DataFrame({"trigram": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        tri = (
            pd.Series(et[:-2][same]).str.cat(pd.Series(et[1:-1][same]), sep=">")
            .str.cat(pd.Series(et[2:][same]), sep=">")
        )
        cnt = tri.value_counts()
        return pd.DataFrame(
            {"trigram": cnt.index.to_numpy(dtype=object),
             "n": cnt.to_numpy().astype(np.int64)}
        )

    partials = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_trigrams, batch_format="pandas")
    )
    from .dedup import pandas_with_schema

    df = pandas_with_schema(partials, {"trigram": "object", "n": "int64"})
    out = (
        df.groupby("trigram", as_index=False)["n"].sum()
        .sort_values(["n", "trigram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out.astype({"trigram": "object", "n": "int64"})


def event_bursts(sf_dir: str, min_events: int = 2, nshards: int = 32) -> rd.Dataset:
    """Per-entity burst screen: (user, UTC-hour-bucket) cells holding
    ≥ ``min_events`` events — the rate-limiting / scraper-detection
    pass a crawl operator runs over access logs (the per-host
    token-bucket's offline mirror; cf. politeness.py). Pure integers:
    hour bucket = epoch_µs // 3.6e9, same convention as w_tumbling.

    Scale shape: per-batch partial counts per (user, hour) — one slim
    row per active cell per batch — then the user-hash shard reduce and
    an in-shard threshold filter; the driver never sees unfiltered
    cells. 100 TB: cells are bounded by users×hours, and a single hot
    user's cells still fan out across hour values within one shard."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        hour = us // 3_600_000_000
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(), "hour": hour})
        g = df.groupby(["user_id", "hour"], as_index=False).size()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy()),
                "hour": pa.array(g["hour"].to_numpy()),
                "n": pa.array(g["size"].to_numpy().astype(np.int64)),
                "_shard": pa.array(
                    (g["user_id"].to_numpy().astype(np.uint64)
                     % np.uint64(nshards)).astype(np.int64)
                ),
            }
        )

    def reduce_filter(g: pd.DataFrame) -> pd.DataFrame:
        from .. import pandas_to_clean_arrow

        agg = g.groupby(["user_id", "hour"], as_index=False)["n"].sum()
        agg = agg[agg["n"] >= min_events].rename(columns={"n": "n_events"})
        return pandas_to_clean_arrow(agg.astype(
            {"user_id": "int64", "hour": "int64", "n_events": "int64"}
        ))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(reduce_filter, batch_format="pandas")
    )
    from .dedup import pandas_with_schema

    return pandas_with_schema(
        out, {"user_id": "int64", "hour": "int64", "n_events": "int64"}
    )


def mad_outliers(sf_dir: str) -> rd.Dataset:
    """Per-event-type ROBUST outlier screen: flag rows where
    ``|x − median| · 1000 > 1482 · MAD`` (the 1.4826-σ-consistent MAD
    rule with the float scale cleared to an integer cross-multiply —
    same trick as ``text_gopher_repetition``). Unlike
    ``zscore_outliers``, median/MAD don't move when the outliers
    themselves get bigger — the screen a production pipeline actually
    deploys against heavy-tailed telemetry.

    Distribution shape: ONE corpus pass builds the per-(type, cents)
    value histogram (the ``percentile_hist`` trick — cardinality-sized,
    never row-count-sized); the driver derives BOTH medians from it
    (the |x − med| histogram is a fold of the value histogram — no
    second corpus pass for MAD), broadcasts O(#types) (med, mad) pairs,
    and pass 2 flags rows vectorized. Median index convention pinned to
    DuckDB ``quantile_disc``: idx = ceil(n/2) − 1. Degenerate MAD = 0
    (over half a type's mass at the median) flags every row off the
    median — deterministic on both sides, the documented MAD caveat."""
    import ray

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "cents": _cents(t["value"]),
            }
        )
        g = df.groupby(["event_type", "cents"], as_index=False).size()
        g = g.rename(columns={"size": "cnt"})
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(
            g.astype({"event_type": "string", "cents": "int64", "cnt": "int64"})
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # O(|types| × |distinct cents|)
    )

    def _disc_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        order = np.argsort(vals, kind="mergesort")
        v, c = vals[order], cnts[order]
        cum = c.cumsum()
        n = int(cum[-1])
        idx = -(-n // 2) - 1  # ceil(n/2) − 1 (quantile_disc convention)
        return int(v[np.searchsorted(cum, idx + 1)])

    keys, params = [], []
    for et, g in hist.groupby("event_type"):
        vals = g["cents"].to_numpy()
        cnts = g["cnt"].to_numpy()
        med = _disc_median(vals, cnts)
        mad = _disc_median(np.abs(vals - med), cnts)  # fold, not a 2nd pass
        keys.append(et)
        params.append((med, mad))
    ref = ray.put((keys, np.array(params, dtype=np.int64).reshape(-1, 2)))

    def flag(t: pa.Table) -> pa.Table:
        keys_, m = ray.get(ref)
        idx = {k: i for i, k in enumerate(keys_)}
        v = _cents(t["value"])
        et = pd.Series(t["event_type"].to_numpy(zero_copy_only=False))
        codes, uniq = pd.factorize(et)
        rowmap = np.array([idx[u] for u in uniq], dtype=np.int64)[codes]
        med, mad = m[rowmap, 0], m[rowmap, 1]
        keep = np.abs(v - med) * 1000 > 1482 * mad
        return pa.table(
            {
                "event_id": pa.array(t["event_id"].to_numpy()[keep], pa.int64()),
                "event_type": pa.array(et.to_numpy()[keep], pa.string()),
                "cents": pa.array(v[keep], pa.int64()),
            }
        )

    from .dedup import pandas_with_schema

    return pandas_with_schema(
        ds.map_batches(flag, batch_format="pyarrow"),
        {"event_id": "int64", "event_type": "object", "cents": "int64"},
    )


def j_interval_overlap(
    sf_dir: str,
    promo_every: int = 3,
    group_cap: int = 2_000_000,
    expand_cap: int = 10_000_000,
) -> rd.Dataset:
    """INTERVAL-OVERLAP JOIN: per-user session intervals [first_ts,
    last_ts] (the ``w_session`` 30-min-gap contract, same tie-break)
    joined against the recurring promo windows [h, h+1) for every epoch
    hour h with ``h % promo_every == 0`` — one output row per
    (session, promo hour) whose time ranges intersect. The missing
    member of the join family: both sides are RANGES, not points
    (``j_keyed_range`` joins points into ranges; ``j_asof`` points to
    latest point).

    Shape: the right side is a RULE (h % k == 0), not a table — so the
    join is pure per-session arithmetic: overlap hours = [⌊start⌋_h ..
    ⌊end⌋_h] intersected with the rule, emitted by one vectorized
    repeat/arange expansion inside the same per-user ``map_groups``
    that sessionized — ZERO extra shuffles. (A table-valued right side
    would broadcast its sorted hour set and searchsorted into it — same
    cost.) Hatches: ``group_cap`` on user history (w_session's), and
    ``expand_cap`` on a group's total emitted hour rows — a single
    years-long session would otherwise explode the expansion (log +
    skip, the df_cap family)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    out_types = {"user_id": "int64", "session_idx": "int64", "promo_hour": "int64"}
    _HOUR_US = 3_600_000_000

    def overlap(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_types.items()})
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "j_interval_overlap: user %s history %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            return empty
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = g["ts"].astype("int64").to_numpy()
        new = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new[1:] = (us[1:] - us[:-1] > SESSION_GAP_US).astype(np.int64)
        sid = np.cumsum(new)
        df = pd.DataFrame({"sid": sid, "us": us})
        sess = df.groupby("sid", as_index=False).agg(lo=("us", "min"), hi=("us", "max"))
        h1 = sess["lo"].to_numpy() // _HOUR_US
        h2 = sess["hi"].to_numpy() // _HOUR_US
        n = h2 - h1 + 1
        if int(n.sum()) > expand_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "j_interval_overlap: user %s expansion %d > expand_cap %d — skipped",
                g["user_id"].iloc[0], int(n.sum()), expand_cap,
            )
            return empty
        reps = np.repeat(np.arange(len(sess)), n)
        hours = np.repeat(h1, n) + (
            np.arange(int(n.sum())) - np.repeat(np.cumsum(n) - n, n)
        )
        keep = hours % promo_every == 0
        return pd.DataFrame(
            {
                "user_id": np.full(int(keep.sum()), g["user_id"].iloc[0], np.int64),
                "session_idx": sess["sid"].to_numpy()[reps[keep]],
                "promo_hour": hours[keep],
            }
        ).astype(out_types)

    return ds.groupby("user_id").map_groups(overlap, batch_format="pandas")


def w_running_distinct(sf_dir: str, group_cap: int = 2_000_000) -> rd.Dataset:
    """RUNNING COUNT-DISTINCT window: per user, ordered by (ts,
    event_id), how many DISTINCT event_types the user has produced up
    to and including each event — the classic "behavioral breadth"
    sequence feature (and the window SQL cannot express directly:
    COUNT(DISTINCT) OVER is illegal in most engines, so the oracle uses
    the first-occurrence-flag + running-sum rewrite). Engine: one
    user-hash shuffle, then a vectorized per-group pandas pass —
    ``(~duplicated(event_type)).cumsum()`` on the contract-sorted
    history. Same ``group_cap`` hot-key hatch as w_session."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    out_types = {"event_id": "int64", "user_id": "int64", "n_types_seen": "int64"}

    def running(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "w_running_distinct: user %s history %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            g = g.iloc[0:0]
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "n_types_seen": (~g["event_type"].duplicated()).cumsum().to_numpy(),
            }
        )
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(out.astype(out_types))

    from .dedup import pandas_with_schema

    return pandas_with_schema(
        ds.groupby("user_id").map_groups(running, batch_format="pandas"), out_types
    )


def j_time_self(
    sf_dir: str, window_s: int = 300, group_cap: int = 4_000_000
) -> rd.Dataset:
    """TIME-WINDOW SELF-JOIN (count form): per user, how many ORDERED
    event pairs (a, b) with a before b (tie-break event_id) fall within
    ``window_s`` seconds — the burst/co-occurrence statistic whose
    naive form is the quadratic self-join ``events ⋈ events``. Engine:
    one user-hash shuffle, then per group a vectorized searchsorted on
    the contract-sorted timestamps — pair COUNTS are computed in
    O(n log n) without ever materializing the pair set (the reason this
    beats the SQL plan at scale: DuckDB builds the join). Only users
    with ≥1 pair appear (inner-join semantics). ``group_cap`` is the
    usual hot-key hatch."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    out_types = {"user_id": "int64", "n_pairs": "int64"}
    win_us = np.int64(window_s) * np.int64(1_000_000)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_types.items()})
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "j_time_self: user %s history %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            return empty
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].astype("int64").to_numpy()
        later = np.searchsorted(us, us + win_us, side="right")
        n = int((later - np.arange(1, len(us) + 1)).sum())
        if n == 0:
            return empty
        return pd.DataFrame(
            {"user_id": [int(g["user_id"].iloc[0])], "n_pairs": [n]}
        ).astype(out_types)

    from .dedup import pandas_with_schema

    return pandas_with_schema(
        ds.groupby("user_id").map_groups(pairs, batch_format="pandas"), out_types
    )


def w_rolling_max(
    sf_dir: str, window: int = 5, group_cap: int = 2_000_000
) -> rd.Dataset:
    """Rolling ROW-window MAX (the order-statistic sibling of
    w_rolling_sum — a cumsum trick can't compute it; pandas' rolling
    engine runs the monotonic-deque algorithm in C): per user, ordered
    by (ts, event_id), the max of cents over the current row and
    ``window-1`` preceding. Same shuffle shape and ``group_cap`` hatch
    as the rest of the window family."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    out_types = {
        "event_id": "int64", "user_id": "int64",
        "cents": "int64", "roll_max_cents": "int64",
    }

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "cents": pa.array(_cents(t["value"])),
            }
        )

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "w_rolling_max: user %s history %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            g = g.iloc[0:0]
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "cents": g["cents"].to_numpy(),
                "roll_max_cents": g["cents"]
                .rolling(window, min_periods=1)
                .max()
                .to_numpy(),
            }
        )
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(out.astype(out_types))

    from .dedup import pandas_with_schema

    return pandas_with_schema(
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(roll, batch_format="pandas"),
        out_types,
    )


def j_asof_nearest(sf_dir: str, group_cap: int = 4_000_000) -> rd.Dataset:
    """NEAREST-in-time join, BOTH directions (completes the temporal
    join family: j_asof = backward-only, j_keyed_range = point-in-range,
    j_interval_overlap = range×range, j_time_self = self-pairs): every
    'click' event joins its nearest 'purchase' by the SAME user,
    whichever side of it in time. Tie-breaks are total: smaller |Δt|,
    then earlier purchase ts, then smaller purchase event_id — so the
    result is deterministic under any shuffle. Engine: one user-hash
    shuffle, per group a vectorized double-searchsorted (predecessor +
    successor candidate per click, pick by the tie-break key; equal-ts
    purchase runs resolve to the first = minimal event_id via a
    left-searchsorted snap). Clicks of users with no purchases drop
    (inner semantics). ``group_cap`` is the usual hot-key hatch."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    out_types = {
        "event_id": "int64", "user_id": "int64",
        "nearest_id": "int64", "abs_us": "int64",
    }

    def nearest(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_types.items()})
        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "j_asof_nearest: user %s history %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            return empty
        c = g[g["event_type"] == "click"]
        p = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        if len(c) == 0 or len(p) == 0:
            return empty
        cus = c["ts"].astype("int64").to_numpy()
        cid = c["event_id"].to_numpy()
        pus = p["ts"].astype("int64").to_numpy()
        pid = p["event_id"].to_numpy()
        idx = np.searchsorted(pus, cus, side="right")
        lo = np.clip(idx - 1, 0, len(pus) - 1)   # predecessor (or clamp)
        hi = np.clip(idx, 0, len(pus) - 1)       # successor (or clamp)
        d_lo = np.abs(cus - pus[lo])
        d_hi = np.abs(cus - pus[hi])
        # pick side: smaller |Δt|; tie → earlier ts = predecessor.
        # (idx==0 / idx==len collapse lo==hi, either branch is correct)
        pick = np.where(d_hi < d_lo, hi, lo)
        best_d = np.minimum(d_lo, d_hi)
        # equal-ts purchase runs: snap to the FIRST row of the run, which
        # is the minimal event_id under the (ts, event_id) sort
        pick = np.searchsorted(pus, pus[pick], side="left")
        out = pd.DataFrame(
            {
                "event_id": cid,
                "user_id": c["user_id"].to_numpy(),
                "nearest_id": pid[pick],
                "abs_us": best_d,
            }
        )
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(out.astype(out_types))

    from .dedup import pandas_with_schema

    return pandas_with_schema(
        ds.groupby("user_id").map_groups(nearest, batch_format="pandas"), out_types
    )


def w_gaps_islands(sf_dir: str, group_cap: int = 4_000_000) -> rd.Dataset:
    """Gaps-and-islands: per-user CONSECUTIVE-HOUR activity streaks.
    Classic engagement/streak analytics (SQL: hour − ROW_NUMBER() island
    key). Engine: per-batch (user, hour) pre-dedup (shrinks the shuffle
    to at most |users|×|hours| pairs), one user-hash shuffle, then per
    group a vectorized np.unique + diff>1 boundary scan — no window
    function, no per-row loop. Output per island: 1-based index in
    start-hour order, bounds, and length; all int64 so the result is
    hash-comparable. ``group_cap`` is the usual hot-key hatch."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    out_types = {
        "user_id": "int64", "island_idx": "int64",
        "start_hr": "int64", "end_hr": "int64", "n_hours": "int64",
    }

    def to_hours(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        return pa.table(
            {"user_id": t["user_id"], "hr": pa.array(us // 3_600_000_000)}
        ).group_by(["user_id", "hr"]).aggregate([])

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        from .. import pandas_to_clean_arrow

        if len(g) > group_cap:
            import logging

            logging.getLogger("crawlkit").warning(
                "w_gaps_islands: user %s hours %d > group_cap %d — skipped",
                g["user_id"].iloc[0], len(g), group_cap,
            )
            g = g.iloc[0:0]
        hrs = np.unique(g["hr"].to_numpy())  # sorted, cross-batch dedup
        if len(hrs) == 0:
            return pandas_to_clean_arrow(
                pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_types.items()})
            )
        starts = np.flatnonzero(np.concatenate(([True], np.diff(hrs) > 1)))
        ends = np.concatenate((starts[1:], [len(hrs)])) - 1
        out = pd.DataFrame(
            {
                "user_id": np.int64(g["user_id"].iloc[0]),
                "island_idx": np.arange(1, len(starts) + 1, dtype=np.int64),
                "start_hr": hrs[starts],
                "end_hr": hrs[ends],
                "n_hours": hrs[ends] - hrs[starts] + 1,
            }
        )
        return pandas_to_clean_arrow(out.astype(out_types))

    from .dedup import pandas_with_schema

    return pandas_with_schema(
        ds.map_batches(to_hours, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(islands, batch_format="pandas"),
        out_types,
    )


def event_transitions(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """Markov TRANSITION MATRIX over per-user event streams: global
    counts of consecutive (from_type → to_type) steps under the shared
    (ts, event_id) order contract — the first-order behavior model a
    product pipeline fits before sequence mining (``path_trigrams`` is
    the order-3 generalization).

    Scale shape: users hash-sharded once (slim rows), each shard forms
    bigrams with one vectorized sort + shift pass and pre-aggregates to
    (from, to, n) partials — at most |types|² rows per shard — so the
    final reduce is tiny regardless of corpus size."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def add_shard(t: pa.Table) -> pa.Table:
        shard = pc.cast(
            pc.bit_wise_and(t["user_id"], np.int64(nshards - 1)), pa.int64()
        )
        return t.append_column("_shard", shard)

    def shard_bigrams(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"from_type": pd.Series([], dtype="object"),
             "to_type": pd.Series([], dtype="object"),
             "n": pd.Series([], dtype="int64")}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(dtype=object)
        same = u[:-1] == u[1:]
        if not same.any():
            return empty
        pairs = pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        cnt = pairs.groupby(["from_type", "to_type"], as_index=False).size()
        return pd.DataFrame(
            {"from_type": cnt["from_type"].to_numpy(dtype=object),
             "to_type": cnt["to_type"].to_numpy(dtype=object),
             "n": cnt["size"].to_numpy().astype(np.int64)}
        )

    from .dedup import pandas_with_schema

    df = pandas_with_schema(
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_bigrams, batch_format="pandas"),
        {"from_type": "object", "to_type": "object", "n": "int64"},
    )
    out = df.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    return out.astype({"from_type": "object", "to_type": "object", "n": "int64"})


def cooccurrence_pairs(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """Market-basket CO-OCCURRENCE: for every unordered pair of event
    types, the number of distinct users who did BOTH — the association
    signal behind "users who X also Y" (and, over token/label columns,
    the pair step of frequent-itemset mining).

    Scale shape: per-batch (user, type) pre-dedup shrinks the shuffle to
    ≤ |users|×|types| slim rows; per user-shard a vectorized combination
    expansion (types per user is tiny and bounded by the alphabet) emits
    (a, b, n) partials capped at |types|² per shard; final reduce tiny.
    No self-join of the corpus — the SQL formulation's d×d join never
    materializes."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def dedup_batch(t: pa.Table) -> pa.Table:
        t = t.group_by(["user_id", "event_type"]).aggregate([])
        shard = pc.cast(
            pc.bit_wise_and(t["user_id"], np.int64(nshards - 1)), pa.int64()
        )
        return t.append_column("_shard", shard)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"type_a": pd.Series([], dtype="object"),
             "type_b": pd.Series([], dtype="object"),
             "n_users": pd.Series([], dtype="int64")}
        )
        # cross-batch dedup (same pair may arrive from several batches)
        g = g.drop_duplicates(["user_id", "event_type"])
        g = g.sort_values(["user_id", "event_type"], kind="mergesort")
        u, inv = np.unique(g["user_id"].to_numpy(), return_inverse=True)
        if len(g) < 2:
            return empty
        et = g["event_type"].to_numpy(dtype=object)
        counts = np.bincount(inv)
        # vectorized within-user combination expansion: for a user with
        # k types (sorted), emit all k*(k-1)/2 ordered (a<b) pairs
        offs = np.concatenate(([0], np.cumsum(counts)))
        a_idx, b_idx = [], []
        for k in np.unique(counts):
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            for s in offs[:-1][counts == k]:
                a_idx.append(ii + s)
                b_idx.append(jj + s)
        if not a_idx:
            return empty
        ai = np.concatenate(a_idx)
        bi = np.concatenate(b_idx)
        pairs = pd.DataFrame({"type_a": et[ai], "type_b": et[bi]})
        cnt = pairs.groupby(["type_a", "type_b"], as_index=False).size()
        return pd.DataFrame(
            {"type_a": cnt["type_a"].to_numpy(dtype=object),
             "type_b": cnt["type_b"].to_numpy(dtype=object),
             "n_users": cnt["size"].to_numpy().astype(np.int64)}
        )

    from .dedup import pandas_with_schema

    df = pandas_with_schema(
        ds.map_batches(dedup_batch, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_pairs, batch_format="pandas"),
        {"type_a": "object", "type_b": "object", "n_users": "int64"},
    )
    out = df.groupby(["type_a", "type_b"], as_index=False)["n_users"].sum()
    return out.astype({"type_a": "object", "type_b": "object", "n_users": "int64"})


# the "no error in between" alternation: every event type in the synthetic
# alphabet EXCEPT 'error' starts with a letter other than 'e', so the
# RE2-safe (lookahead-free) encoding is a character-class alternation.
# Both the engine and the DuckDB oracle use THIS string — keep in sync.
SEQUENCE_MATCH_PATTERN = r"(?:^|>)view(?:>[a-df-z][a-z]*)*>purchase"


def sequence_match(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """Behavioral SEQUENCE MATCH: users whose ordered event-type stream
    contains a 'view' followed (not necessarily adjacently) by a
    'purchase' with NO 'error' in between — the regex-over-sessions
    operator (Splunk `transaction`, MATCH_RECOGNIZE's poor cousin).
    The pattern is a pure regular language (no lookahead) so the same
    string runs on RE2 (DuckDB) and Python `re` with identical
    semantics; order contract (ts, event_id) as everywhere.

    Scale shape: users hash-sharded once; per shard ONE vectorized sort,
    a per-user join to path strings (bounded by per-user history), and a
    compiled vectorized `.str.contains` — only matching user_ids leave
    the shard."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def add_shard(t: pa.Table) -> pa.Table:
        shard = pc.cast(
            pc.bit_wise_and(t["user_id"], np.int64(nshards - 1)), pa.int64()
        )
        return t.append_column("_shard", shard)

    def shard_match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        paths = g.groupby("user_id")["event_type"].agg(">".join)
        hit = paths.str.contains(SEQUENCE_MATCH_PATTERN, regex=True)
        return pd.DataFrame(
            {"user_id": paths.index.to_numpy()[hit.to_numpy()].astype(np.int64)}
        )

    from .dedup import pandas_with_schema

    df = pandas_with_schema(
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_match, batch_format="pandas"),
        {"user_id": "int64"},
    )
    return df.astype({"user_id": "int64"}).reset_index(drop=True)


def scd2_intervals(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """SCD-2 style RUN-LENGTH INTERVALS: collapse each user's ordered
    event stream into maximal runs of the same event_type, emitting one
    validity row per run (state, first/last epoch-µs, run length) — the
    change-data-capture compaction every warehouse applies to tracked
    attributes. SQL mirror: the two-ROW_NUMBER island key. All-int64
    timestamps (epoch µs) so the compare is dtype-exact.

    Scale shape: hash-shard by user (whole history co-located — same
    contract as every window op here), ONE vectorized sort + boundary
    scan per shard (change points = user or type differs from the
    previous row), and a segment-reduce via np.flatnonzero — no per-run
    Python loop, no window function, partial output is O(runs)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    out_types = {
        "user_id": "int64", "state": "object",
        "valid_from_us": "int64", "valid_to_us": "int64", "n_events": "int64",
    }

    def add_shard(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        shard = pc.cast(
            pc.bit_wise_and(t["user_id"], np.int64(nshards - 1)), pa.int64()
        )
        return pa.table(
            {"user_id": t["user_id"], "us": us, "event_id": t["event_id"],
             "event_type": t["event_type"], "_shard": shard}
        )

    def shard_runs(g: pd.DataFrame) -> pd.DataFrame:
        from .. import pandas_to_clean_arrow

        if len(g) == 0:
            return pandas_to_clean_arrow(
                pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_types.items()})
            )
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        us = g["us"].to_numpy()
        et = g["event_type"].to_numpy(dtype=object)
        brk = np.concatenate(([True], (u[1:] != u[:-1]) | (et[1:] != et[:-1])))
        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [len(g)])) - 1
        out = pd.DataFrame(
            {
                "user_id": u[starts],
                "state": et[starts],
                "valid_from_us": us[starts],
                "valid_to_us": us[ends],
                "n_events": (ends - starts + 1).astype(np.int64),
            }
        )
        return pandas_to_clean_arrow(out.astype(out_types))

    from .dedup import pandas_with_schema

    return pandas_with_schema(
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_runs, batch_format="pandas"),
        out_types,
    )


def attribution_last_touch(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """LAST-TOUCH ATTRIBUTION: for every purchase, the channel of the
    user's latest STRICTLY-earlier marketing touch ('view' or 'click';
    'direct' if none) — the standard marketing attribution join
    (SQL: LAST_VALUE(... IGNORE NULLS) over ROWS … 1 PRECEDING).
    Order contract (ts, event_id) as everywhere.

    Scale shape: users hash-sharded once; per shard ONE vectorized sort
    + a grouped forward-fill of the shifted touch column (cython ffill,
    no per-row Python); only purchase rows leave the shard."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def add_shard(t: pa.Table) -> pa.Table:
        shard = pc.cast(
            pc.bit_wise_and(t["user_id"], np.int64(nshards - 1)), pa.int64()
        )
        return t.append_column("_shard", shard)

    def shard_attr(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"purchase_id": pd.Series([], dtype="int64"),
             "channel": pd.Series([], dtype="object")}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy(dtype=object)
        touch = pd.Series(
            np.where(np.isin(et, ["view", "click"]), et, None), dtype=object
        )
        # strictly earlier: shift within user, then forward-fill within user
        grp = g["user_id"].to_numpy()
        shifted = touch.groupby(grp).shift(1)
        filled = shifted.groupby(grp).ffill()
        is_purch = et == "purchase"
        out = pd.DataFrame(
            {
                "purchase_id": g["event_id"].to_numpy()[is_purch],
                "channel": filled.to_numpy(dtype=object)[is_purch],
            }
        )
        out["channel"] = out["channel"].fillna("direct")
        return out.astype({"purchase_id": "int64", "channel": "object"})

    from .dedup import pandas_with_schema

    df = pandas_with_schema(
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_attr, batch_format="pandas"),
        {"purchase_id": "int64", "channel": "object"},
    )
    return df.reset_index(drop=True)


def active_users_rolling(sf_dir: str, window_hrs: int = 24, nshards: int = 32) -> pd.DataFrame:
    """ROLLING ACTIVE USERS: for every hour bucket, the number of
    DISTINCT users active in the trailing ``window_hrs`` window — the
    DAU-over-hours curve. COUNT(DISTINCT) OVER RANGE is illegal in SQL
    and quadratic done naively; the engine turns it into an interval
    SWEEP: each user's activity hours become covered intervals
    [hr, hr+W−1] (merged per user where gaps < W), intervals become
    ±1 boundary deltas, and the answer is one prefix sum.

    Scale shape: per-batch (user, hr) pre-dedup shrinks the shuffle to
    ≤ |users|×|hours| slim rows; the per-user interval merge is one
    vectorized boundary scan per user-shard; each shard pre-aggregates
    deltas by hour (≤ 2×|hours| rows per shard), so the driver only
    prefix-sums an O(|hours|) array. Rows with zero active users are
    omitted (matches the oracle's inner join)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    W = window_hrs

    def to_hours(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        tt = pa.table(
            {"user_id": t["user_id"], "hr": pa.array(us // 3_600_000_000)}
        ).group_by(["user_id", "hr"]).aggregate([])
        shard = pc.cast(
            pc.bit_wise_and(tt["user_id"], np.int64(nshards - 1)), pa.int64()
        )
        return tt.append_column("_shard", shard)

    def shard_deltas(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"hr": pd.Series([], dtype="int64"),
             "starts": pd.Series([], dtype="int64"),
             "ends": pd.Series([], dtype="int64"),
             "max_hr": pd.Series([], dtype="int64")}
        )
        g = g.drop_duplicates(["user_id", "hr"]).sort_values(
            ["user_id", "hr"], kind="mergesort"
        )
        if len(g) == 0:
            return empty
        u = g["user_id"].to_numpy()
        hr = g["hr"].to_numpy()
        # merged coverage intervals: a new segment starts at a user
        # boundary or where the gap exceeds the window width
        newseg = np.concatenate(([True], (u[1:] != u[:-1]) | (hr[1:] - hr[:-1] >= W)))
        starts = hr[newseg]                             # coverage begins
        seg_last = np.concatenate((np.flatnonzero(newseg)[1:], [len(hr)])) - 1
        ends = hr[seg_last] + W                         # first hour NOT covered
        s_hr, s_n = np.unique(starts, return_counts=True)
        e_hr, e_n = np.unique(ends, return_counts=True)
        out = pd.DataFrame({
            "hr": np.concatenate((s_hr, e_hr)),
            "starts": np.concatenate((s_n, np.zeros(len(e_hr), dtype=np.int64))),
            "ends": np.concatenate((np.zeros(len(s_hr), dtype=np.int64), e_n)),
        }).groupby("hr", as_index=False).sum()
        out["max_hr"] = np.int64(hr.max())              # true max ACTIVE hour
        return out.astype(
            {"hr": "int64", "starts": "int64", "ends": "int64", "max_hr": "int64"}
        )

    from .dedup import pandas_with_schema

    df = pandas_with_schema(
        ds.map_batches(to_hours, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_deltas, batch_format="pandas"),
        {"hr": "int64", "starts": "int64", "ends": "int64", "max_hr": "int64"},
    )
    if len(df) == 0:
        return pd.DataFrame({"hr": pd.Series([], dtype="int64"),
                             "n_active": pd.Series([], dtype="int64")})
    agg = df.groupby("hr", as_index=False)[["starts", "ends"]].sum().sort_values("hr")
    mn, mx = int(agg["hr"].min()), int(df["max_hr"].max())
    grid = np.arange(mn, mx + 1, dtype=np.int64)        # O(|hours|) — tiny
    deltas = np.zeros(len(grid), dtype=np.int64)
    d = agg[agg["hr"] <= mx]
    np.add.at(deltas, d["hr"].to_numpy() - mn, d["starts"].to_numpy())
    np.add.at(deltas, d["hr"].to_numpy() - mn, -d["ends"].to_numpy())
    cov = np.cumsum(deltas)
    keep = cov > 0
    return pd.DataFrame({"hr": grid[keep], "n_active": cov[keep].astype(np.int64)})
