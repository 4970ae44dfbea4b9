"""Graph analytics over document/link graphs — the crawl-adjacent
distributed ops (PageRank-style authority propagation).

``pagerank`` runs INTEGER power iteration: contributions are
``r // outdeg`` (exact integer division) and the damping step is
``150_000 + (Σcontrib · 85) // 100`` — every arithmetic step is closed
over int64, so the distributed sums are order-independent and the
result is bit-identical to the DuckDB oracle (float PageRank would
hash-differ by summation order). The graph is hash-derived from the
documents table with the same md5-lower64 rule on both sides
(``dedup._md5_lower64`` ↔ DuckDB ``md5_number_lower``), the standard
deterministic-fixture trick used across this repo.

Distribution shape (the 100-TB story): edges are built once by a
vectorized ``map_batches`` over the node table and materialized (reused
every iteration, exactly like ``dedup.dedup_clusters``' edge table);
each iteration is ONE shuffle — join ranks⨝edges on src, partial
per-batch contribution sums, then groupby(dst) — so K iterations cost
K shuffles of (node,int64) pairs, never the corpus. Orphan nodes (no
in-edges) hold exactly the teleport mass from iteration 1 on, so their
rows are computed once and unioned in per iteration — no per-iteration
backfill join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

TELEPORT = 150_000  # floor(0.15 · 1e6) — integer damping, scale 1e6
R0 = 1_000_000

# Dense fast-path cap: below this the per-node state vector (int64) is
# ≤16 MB — broadcast once per iteration (ray.put, zero-copy reads in
# every task) instead of paying a join + groupby shuffle round per
# iteration. Above it, the shuffle path below is the scale story.
_DENSE_MAX_NODES = 1 << 21


def _read_nodes(sf_dir: str) -> rd.Dataset:
    from .. import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])


def _derive_edges(v: np.ndarray, n_docs: int):
    """THE graph-defining hash rule — the single source of truth shared
    by every graph op here AND mirrored in the DuckDB oracle SQL
    (oracles.py md5_number_lower edge derivation): outdeg(x) =
    1 + md5(x∥'-d') % 3; the j-th edge of x points at
    md5(x∥'-e'∥j) % n_docs. Returns (src, dst, outdeg-per-node)."""
    from .dedup import _md5_lower64

    outdeg = (_md5_lower64([f"{x}-d" for x in v.tolist()]) % np.uint64(3)).astype(
        np.int64
    ) + 1
    src = np.repeat(v, outdeg)
    js = (
        np.concatenate([np.arange(d) for d in outdeg])
        if len(v)
        else np.empty(0, np.int64)
    )
    dst = (
        _md5_lower64([f"{s}-e{j}" for s, j in zip(src.tolist(), js.tolist())])
        % np.uint64(n_docs)
    ).astype(np.int64)
    return src, dst, outdeg


@ray.remote(num_cpus=1)
def _dense_edges_task(block: pa.Table, n_docs: int):
    """Edge triple (src, dst, outdeg-per-edge) for one node block — the
    tuple stays in the object store and is re-read by every iteration."""
    src, dst, outdeg = _derive_edges(block["doc_id"].to_numpy(), n_docs)
    return src, dst, np.repeat(outdeg, outdeg)


@ray.remote(num_cpus=1)
def _dense_contrib_task(edges, r: np.ndarray) -> np.ndarray:
    """One block's damped-contribution partial: int64-exact
    (np.add.at, not float bincount) so block order can't change sums."""
    src, dst, od = edges
    acc = np.zeros(len(r), np.int64)
    np.add.at(acc, dst, r[src] // od)
    return acc


@ray.remote(num_cpus=1)
def _dense_bfs_task(edges, mask: np.ndarray) -> np.ndarray:
    src, dst, _ = edges
    return np.unique(dst[mask[src]])


@ray.remote(num_cpus=1)
def _sum2_task(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def _tree_sum(refs: list) -> np.ndarray:
    """Pairwise remote reduce of dense int64 partials: the driver pulls
    ONE n_docs-length array instead of blocks × n_docs (at the 2²¹ cap
    with a many-block read, the difference is GBs per iteration)."""
    while len(refs) > 1:
        refs = [
            _sum2_task.remote(refs[i], refs[i + 1]) if i + 1 < len(refs) else refs[i]
            for i in range(0, len(refs), 2)
        ]
    return ray.get(refs[0])


def _dense_graph(sf_dir: str):
    """(nodes_dataset, n_docs, edge_tuple_refs | None). The dense path
    applies when node ids are exactly [0, n_docs) (the fixture contract
    — verified, not assumed) and the per-node vector fits the broadcast
    cap; the id pull is bounded at 16 MB by ``_DENSE_MAX_NODES``."""
    nodes = _read_nodes(sf_dir).materialize()
    n_docs = nodes.count()
    if n_docs == 0 or n_docs > _DENSE_MAX_NODES:
        return nodes, n_docs, None
    ids = nodes.to_pandas()["doc_id"].to_numpy()
    if not (
        ids.min() == 0 and ids.max() == n_docs - 1 and np.unique(ids).size == n_docs
    ):
        return nodes, n_docs, None
    refs = []
    for bundle in nodes.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if (meta.num_rows or 0) > 0:
                refs.append(_dense_edges_task.remote(block_ref, n_docs))
    return nodes, n_docs, refs


def pagerank(sf_dir: str, iters: int = 5) -> rd.Dataset:
    """Integer PageRank over the md5-derived doc link graph:
    outdeg(v) = 1 + md5(v ∥ '-d') % 3, the j-th edge of v points at
    md5(v ∥ '-e' ∥ j) % N. Returns (doc_id, rank) for every doc after
    ``iters`` damped iterations (rank scale 1e6)."""
    from .dedup import _nonempty_blocks

    nodes, n_docs, dense_refs = _dense_graph(sf_dir)
    if n_docs == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "rank": pd.Series([], dtype="int64")}
        )
    if dense_refs is not None:
        # Dense path: K iterations = K task waves over the materialized
        # edge blocks + an O(N) driver combine — no per-iteration
        # Dataset-executor startup, no join/groupby shuffles. Bit-
        # identical to the shuffle path (same int64 steps; orphans get
        # acc=0 → exactly TELEPORT, matching the one-time orphan union).
        r = np.full(n_docs, R0, np.int64)
        for _ in range(iters):
            r_ref = ray.put(r)
            acc = _tree_sum(
                [_dense_contrib_task.remote(e, r_ref) for e in dense_refs]
            )
            r = TELEPORT + (acc * 85) // 100
        return pd.DataFrame(
            {"doc_id": np.arange(n_docs, dtype=np.int64), "rank": r}
        ).astype({"doc_id": "int64", "rank": "int64"})

    edge_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("outdeg", pa.int64())]
    )
    rank_schema = pa.schema([("node", pa.int64()), ("r", pa.int64())])

    def build_edges(t: pa.Table) -> pa.Table:
        src, dst, outdeg = _derive_edges(t["doc_id"].to_numpy(), n_docs)
        return pa.table(
            {"src": src, "dst": dst, "outdeg": np.repeat(outdeg, outdeg)},
            schema=edge_schema,
        )

    edges = _nonempty_blocks(
        nodes.map_batches(build_edges, batch_format="pyarrow"), edge_schema
    )

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["doc_id"], "r": np.full(t.num_rows, R0, dtype=np.int64)},
            schema=rank_schema,
        )

    ranks = _nonempty_blocks(
        nodes.map_batches(init_ranks, batch_format="pyarrow"), rank_schema
    )

    def contrib(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return rank_schema.empty_table()
        # partial pre-aggregation per batch before the groupby shuffle
        df = pd.DataFrame(
            {
                "node": t["dst"].to_numpy(),
                "r": t["r"].to_numpy() // t["outdeg"].to_numpy(),
            }
        )
        g = df.groupby("node", as_index=False)["r"].sum()
        return pa.table(
            {"node": g["node"].to_numpy(), "r": g["r"].to_numpy().astype(np.int64)},
            schema=rank_schema,
        )

    # distinct column names for the one-time orphan join: Dataset.join
    # breaks on same-name keys on both sides (CLAUDE.md invariant)
    damp_schema = pa.schema([("sn", pa.int64()), ("sr", pa.int64())])

    def damp(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return rank_schema.empty_table()
        s = t["r"].to_numpy()
        return pa.table(
            {"node": t["node"], "r": TELEPORT + (s * 85) // 100}, schema=rank_schema
        )

    # Orphan nodes (no in-edges) hold EXACTLY the teleport mass from
    # iteration 1 onward, and the in-edge node set is fixed — so the
    # orphan rows are computed ONCE (one left-outer join) and unioned
    # into every iteration's ranks, instead of a per-iteration
    # node-table backfill join (iters+0 joins instead of 2·iters).
    def orphan_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return rank_schema.empty_table()
        import pyarrow.compute as pc

        keep = t.filter(pc.is_null(t["sr"]))
        return pa.table(
            {
                "node": pc.cast(keep["node"], pa.int64()),
                "r": np.full(keep.num_rows, TELEPORT, dtype=np.int64),
            },
            schema=rank_schema,
        )

    in_deg = _nonempty_blocks(
        edges.select_columns(["dst"])
        .groupby("dst")
        .aggregate(Sum("dst", alias_name="sr"))  # value unused; marks presence
        .map_batches(
            lambda t: pa.table(
                {"sn": pa.compute.cast(t["dst"], pa.int64()),
                 "sr": pa.compute.cast(t["sr"], pa.int64())}
            )
            if t.num_columns and t.num_rows
            else pa.schema([("sn", pa.int64()), ("sr", pa.int64())]).empty_table(),
            batch_format="pyarrow",
        ),
        damp_schema,
    )
    orphans = _nonempty_blocks(
        nodes.map_batches(init_ranks, batch_format="pyarrow")
        .select_columns(["node"])
        .join(in_deg, join_type="left_outer", num_partitions=4,
              on=("node",), right_on=("sn",))
        .map_batches(orphan_rows, batch_format="pyarrow"),
        rank_schema,
    )

    for _ in range(iters):
        summed = (
            edges.join(ranks, join_type="inner", num_partitions=2,
                       on=("src",), right_on=("node",))
            .map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("r", alias_name="r"))
            .map_batches(damp, batch_format="pyarrow")
        )
        ranks = _nonempty_blocks(summed.union(orphans), rank_schema)

    def rename(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()), ("rank", pa.int64())]).empty_table()
        return t.rename_columns(["doc_id", "rank"])

    from .dedup import pandas_with_schema

    return pandas_with_schema(
        ranks.map_batches(rename, batch_format="pyarrow"),
        {"doc_id": "int64", "rank": "int64"},
    )


def triangle_count(sf_dir: str) -> pd.DataFrame:
    """Distributed TRIANGLE COUNTING over the (undirected view of the)
    md5-derived doc graph — the standard wedge-check formulation
    (compact-forward / Cohen's MapReduce algorithm): canonicalize edges
    to u < v and dedupe; group by the LOWER endpoint and emit each
    neighbor pair as a wedge; close wedges with one genuine
    ``Dataset.join`` against the edge set; every matched wedge is
    exactly one triangle (each triangle's wedge is emitted only at its
    minimum vertex, so no multiple counting and no division by 3).

    Scale notes: wedge volume is Σ deg(u)²/2 — the md5 graph's outdeg is
    ≤3 so it stays linear here, and production graphs pre-split hot
    vertices (the same hot-key hatch family as ``bucket_cap``/``df_cap``
    elsewhere). Wedge/edge keys pack (v, w) into one int64 (v<<32|w);
    beyond 2³¹ nodes the key becomes the 2×int64 digest pair the exact
    dedup already uses. Oracle: three-way DuckDB self-join u<v<w."""
    from .dedup import _nonempty_blocks

    nodes = _read_nodes(sf_dir)
    n_docs = nodes.count()
    assert n_docs < (1 << 31), "int64 key packing — see docstring"

    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def build_undirected(t: pa.Table) -> pa.Table:
        s, d, _ = _derive_edges(t["doc_id"].to_numpy(), n_docs)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        keep = u != v  # drop self-loops
        return pa.table({"u": u[keep], "v": v[keep]}, schema=edge_schema)

    # ONE u-hash-shard shuffle co-locates every edge of u: the shard task
    # dedups (u,v) AND emits wedges per u with a vectorized segment sweep
    # — replaces a 2-int64-key distinct Aggregate (one sort boundary per
    # edge) plus a per-VERTEX map_groups (one Ray group per u), the same
    # measured pathologies fixed in the pair-engine / inverted_index.
    nshards = 32

    def add_shard(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("u", pa.int64()), ("v", pa.int64()), ("_shard", pa.int64())]
            ).empty_table()
        u = t["u"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            sh = ((u * np.uint64(2654435761)) % np.uint64(nshards)).astype(np.int64)
        return t.append_column("_shard", pa.array(sh))

    edges = _nonempty_blocks(
        nodes.map_batches(build_undirected, batch_format="pyarrow"), edge_schema
    ).map_batches(add_shard, batch_format="pyarrow")

    def shard_wedges_and_edges(g: pd.DataFrame) -> pa.Table:
        """Per u-shard: distinct (u,v) + wedge emit per u (segment sweep
        over the u-sorted edge list — no per-vertex task boundary)."""
        from .. import pandas_to_clean_arrow

        g = g.drop_duplicates(["u", "v"]).sort_values(["u", "v"])
        u = g["u"].to_numpy().astype(np.int64)
        v = g["v"].to_numpy().astype(np.int64)
        ekeys = (u << np.int64(32)) | v
        wkeys: list[np.ndarray] = []
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        for a, b in zip(starts, ends):
            if b - a >= 2:
                ns = v[a:b]  # sorted already
                i, j = np.triu_indices(b - a, k=1)
                wkeys.append((ns[i] << np.int64(32)) | ns[j])
        wk = np.concatenate(wkeys) if wkeys else np.empty(0, np.int64)
        # one table, two roles: kind 0 = distinct edge key, kind 1 = wedge
        return pandas_to_clean_arrow(pd.DataFrame(
            {"key": np.concatenate([ekeys, wk]),
             "kind": np.concatenate([np.zeros(len(ekeys), np.int64),
                                     np.ones(len(wk), np.int64)])}
        ).astype({"key": "int64", "kind": "int64"}))

    both = _nonempty_blocks(
        edges.groupby("_shard").map_groups(
            shard_wedges_and_edges, batch_format="pandas"
        ),
        pa.schema([("key", pa.int64()), ("kind", pa.int64())]),
    ).materialize()

    def split(kind: int, name: str):
        def fn(t: pa.Table) -> pa.Table:
            out = t.filter(pc.equal(t["kind"], kind))
            return pa.table({name: out["key"]})

        return fn

    wedge_ds = _nonempty_blocks(
        both.map_batches(split(1, "wkey"), batch_format="pyarrow"),
        pa.schema([("wkey", pa.int64())]),
    )
    ekey_ds = _nonempty_blocks(
        both.map_batches(split(0, "ekey"), batch_format="pyarrow"),
        pa.schema([("ekey", pa.int64())]),
    )
    closed = wedge_ds.join(
        ekey_ds, join_type="inner", num_partitions=4,
        on=("wkey",), right_on=("ekey",),
    )
    return pd.DataFrame({"n_triangles": [closed.count()]}).astype("int64")


def degree_hist(sf_dir: str, nshards: int = 32) -> pd.DataFrame:
    """IN-degree distribution of the md5-derived doc graph — the first
    diagnostic any graph pipeline runs (skew detection: the max
    in-degree bounds every per-vertex groupby downstream). Zero-in-degree
    nodes are counted (the part an edges-only scan misses).

    Shape: edges are derived per batch (never materialized as a global
    table), in-degree = sharded count keyed by dst-hash, and the
    histogram fold is a second tiny reduce over (degree → n_nodes)
    partials — O(max_degree) rows reach the driver. The zero-degree
    count is n_nodes − Σ n_nodes(deg>0): pure arithmetic, no anti-join."""
    from .dedup import _nonempty_blocks, pandas_with_schema
    from .relational import _sharded_agg

    nodes = _read_nodes(sf_dir)
    n_docs = nodes.count()
    if n_docs == 0:
        return pd.DataFrame(
            {"in_degree": pd.Series([], dtype="int64"),
             "n_nodes": pd.Series([], dtype="int64")}
        )

    def build_dst(t: pa.Table) -> pa.Table:
        _, dst, _ = _derive_edges(t["doc_id"].to_numpy(), n_docs)
        # per-batch partial: count per dst (final count needs the shuffle)
        u, c = np.unique(dst, return_counts=True)
        return pa.table({"dst": u.astype(np.int64), "c": c.astype(np.int64)})

    indeg = _sharded_agg(
        _nonempty_blocks(
            nodes.map_batches(build_dst, batch_format="pyarrow"),
            pa.schema([("dst", pa.int64()), ("c", pa.int64())]),
        ),
        "dst",
        {"in_degree": ("c", "sum")},
        nshards=nshards,
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["in_degree"].to_numpy(), return_counts=True)
        return pa.table(
            {"in_degree": u.astype(np.int64), "n_nodes": c.astype(np.int64)}
        )

    df = pandas_with_schema(
        indeg.map_batches(hist_partial, batch_format="pyarrow"),
        {"in_degree": "int64", "n_nodes": "int64"},
    )
    out = df.groupby("in_degree", as_index=False)["n_nodes"].sum()
    zero = n_docs - int(out["n_nodes"].sum())
    if zero > 0:
        out = pd.concat(
            [pd.DataFrame({"in_degree": [0], "n_nodes": [zero]}), out],
            ignore_index=True,
        )
    out = out.sort_values("in_degree").reset_index(drop=True)
    return out.astype({"in_degree": "int64", "n_nodes": "int64"})


def bfs_levels(
    sf_dir: str, max_depth: int = 4, seed_mod: int = 97, nshards: int = 32
) -> pd.DataFrame:
    """Multi-source BFS levels over the md5-derived doc graph: level(v)
    = min #hops from any seed (``doc_id % seed_mod == 0``) along the
    directed edges, bounded at ``max_depth``; unreached nodes are
    omitted. The third classic iterative graph primitive next to
    ``pagerank`` (fixed-point value propagation) and ``dedup_clusters``
    (min-label components) — BFS is min-PLUS propagation, the shape of
    reachability / crawl-depth / taint analyses.

    Distribution shape: FRONTIER-driven — each round joins the edge
    table against only the nodes first settled last round (frontier ≪
    reached), pre-distincts candidates per batch, and min-merges into
    the visited set with one hash-shard pandas reduce (the
    ``_sharded_agg`` shape; generic Aggregate pays a sort boundary per
    distinct node). Per round: 1 frontier-sized join + 1 reached-sized
    slim (int64,int64) shuffle; the visited set is materialized per
    round (O(reached) ints) because two consumers (merge + next
    frontier) would otherwise re-execute the chain. Early-exits when a
    frontier empties. Oracle: DuckDB recursive CTE bounded at
    ``max_depth`` with MIN(dist) — identical to Bellman-Ford truncated
    at ``max_depth`` rounds, which frontier BFS computes exactly."""
    from .dedup import _nonempty_blocks, pandas_with_schema
    from .relational import _sharded_agg

    nodes, n_docs, dense_refs = _dense_graph(sf_dir)
    out_types = {"doc_id": "int64", "level": "int64"}
    if n_docs == 0:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_types.items()})
    if dense_refs is not None:
        # Dense path (see pagerank): one task wave per depth, frontier
        # broadcast as an N-bool mask; BFS first-touch == min level, so
        # this matches the shuffle path's min-merge exactly.
        lvl = np.full(n_docs, -1, np.int64)
        seeds = np.flatnonzero(np.arange(n_docs, dtype=np.int64) % seed_mod == 0)
        lvl[seeds] = 0
        mask = np.zeros(n_docs, bool)
        mask[seeds] = True
        for depth in range(1, max_depth + 1):
            if not mask.any():
                break
            m_ref = ray.put(mask)
            hits = ray.get([_dense_bfs_task.remote(e, m_ref) for e in dense_refs])
            reached = np.unique(np.concatenate(hits)) if hits else np.empty(0, np.int64)
            newly = reached[lvl[reached] < 0]
            mask = np.zeros(n_docs, bool)
            if len(newly):
                lvl[newly] = depth
                mask[newly] = True
        keep = lvl >= 0
        return pd.DataFrame(
            {"doc_id": np.arange(n_docs, dtype=np.int64)[keep], "level": lvl[keep]}
        ).astype(out_types)

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    dist_schema = pa.schema([("node", pa.int64()), ("lvl", pa.int64())])

    def build_edges(t: pa.Table) -> pa.Table:
        src, dst, _ = _derive_edges(t["doc_id"].to_numpy(), n_docs)
        return pa.table({"src": src, "dst": dst}, schema=edge_schema)

    # materialized once, re-joined every round (pagerank's edge-reuse shape)
    edges = _nonempty_blocks(
        nodes.map_batches(build_edges, batch_format="pyarrow"), edge_schema
    ).materialize()

    def seed_rows(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy()
        s = v[v % seed_mod == 0]
        return pa.table(
            {"node": s, "lvl": np.zeros(len(s), np.int64)}, schema=dist_schema
        )

    visited = _nonempty_blocks(
        nodes.map_batches(seed_rows, batch_format="pyarrow"), dist_schema
    ).materialize()
    frontier = visited

    for depth in range(1, max_depth + 1):
        if frontier.count() == 0:
            break

        def to_cand(t: pa.Table, depth: int = depth) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return dist_schema.empty_table()
            d = np.unique(t["dst"].to_numpy())  # per-batch pre-distinct
            return pa.table(
                {"node": d, "lvl": np.full(len(d), depth, np.int64)},
                schema=dist_schema,
            )

        cand = _nonempty_blocks(
            edges.join(
                frontier.select_columns(["node"]),
                join_type="inner",
                num_partitions=2,
                on=("src",),
                right_on=("node",),
            ).map_batches(to_cand, batch_format="pyarrow"),
            dist_schema,
        )
        visited = _nonempty_blocks(
            _sharded_agg(
                _nonempty_blocks(visited.union(cand), dist_schema),
                "node",
                {"lvl": ("lvl", "min")},
                nshards=nshards,
            ),
            dist_schema,
        ).materialize()

        def newly(t: pa.Table, depth: int = depth) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return dist_schema.empty_table()
            return t.filter(pc.equal(t["lvl"], depth))

        frontier = _nonempty_blocks(
            visited.map_batches(newly, batch_format="pyarrow"), dist_schema
        ).materialize()

    def rename(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("level", pa.int64())]
            ).empty_table()
        return t.rename_columns(["doc_id", "level"])

    return pandas_with_schema(
        visited.map_batches(rename, batch_format="pyarrow"), out_types
    )
