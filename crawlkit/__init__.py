"""crawlkit — a Ray-Data-native crawl-scheduling / data-processing engine.

Built from scratch with the query/data-processing capabilities of the
reference (e8kor/crawler, an OpenFaaS Go crawler fleet) re-expressed as
idiomatic Ray Data: ``ray.data.Dataset`` pipelines, ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages (fetch sessions,
politeness token buckets, sharded URL-seen set), and explicit
groupby/sort/shuffle for the wide steps.

Layout (see SURVEY.md §7.0):
  canon.py       normalizers compatible with the reference's string UDFs
  hashing.py     deterministic stable hashing (no random / no time)
  imagecodec.py  real PNG codec + real baseline JPEG (jpegcodec.py), phash
  synthweb.py    deterministic seeded synthetic web (hosts/pages/images)
  refsim.py      single-threaded reference-semantics simulator (oracle)
  state/         seen-set shards (bloom+cuckoo+exact), lancelike tables,
                 checkpoint manifests
  stages/        fetch actors, parser plugin registry, politeness
  pipelines/     crawl round loop, text/dedup/ann/relational pipelines
"""

__version__ = "0.1.0"


def configure_data_context() -> None:
    """Set the Ray Data context defaults this engine is tuned for.

    The default HASH_SHUFFLE strategy in Ray 2.49 spawns per-partition
    aggregator ACTORS; on a single node with many CPU slots that churns
    hundreds of fresh worker processes (each paying full import cost) —
    measured 12-18× slower than the sort-based shuffle for our groupbys
    at num_cpus=32. Sort-shuffle runs in reusable task workers.
    """
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        ctx = DataContext.get_current()
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
        # fused operator names exceed 100 chars; keep full names instead
        # of the one-time truncation WARNING (progress bars are off in
        # bench/rehearsal anyway)
        ctx.DEFAULT_ENABLE_PROGRESS_BAR_NAME_TRUNCATION = False
    except Exception:
        pass  # older/newer Ray without this knob: keep defaults

    try:
        import logging

        class _EmptyBlockSchemaFilter(logging.Filter):
            """Drop the 'RefBundle with a different schema ... new
            schema: .' warning when the NEW schema is EMPTY: Ray's
            sort-shuffle emits ZERO-COLUMN blocks for empty partitions
            (more output partitions than distinct groups), map UDFs are
            skipped for them, and downstream collection logs this per
            empty block. Known-benign here — every small-result
            consumer goes through pandas_with_schema / ensure_schema
            (see CLAUDE.md). Mismatches between two NON-empty schemas
            still log."""

            def filter(self, record: logging.LogRecord) -> bool:
                msg = record.getMessage()
                return not (
                    "RefBundle with a different schema" in msg
                    and "new schema: ." in msg
                )

        logging.getLogger("ray.data._internal.execution.streaming_executor_state").addFilter(
            _EmptyBlockSchemaFilter()
        )

        class _ObjectStoreAdviceFilter(logging.Filter):
            """Drop the static 'object store is configured to use only
            N% of available memory' sizing advisory — the store size is
            fixed by the sandbox host, the advice is unactionable here,
            and it prints once per executed Dataset."""

            def filter(self, record: logging.LogRecord) -> bool:
                return "object store is configured to use only" not in record.getMessage()

        logging.getLogger("ray.data._internal.execution.resource_manager").addFilter(
            _ObjectStoreAdviceFilter()
        )
    except Exception:
        pass


configure_data_context()


def read_parquet_clean(paths, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's pandas metadata stripped.

    ``pyarrow.Schema.__hash__`` raises on dict-valued metadata, so every
    block read from a pandas-written parquet breaks Ray's block-schema
    dedup fast path and logs "Failed to hash the schemas (for
    deduplication)" from every worker. Passing an explicit metadata-free
    schema restores the early-exit (and silences the spam)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import glob
    import os

    first = paths if isinstance(paths, str) else paths[0]
    if os.path.isdir(first):  # directory dataset: probe any one file
        first = sorted(glob.glob(f"{first}/**/*.parquet", recursive=True))[0]
    s = pq.read_schema(first)
    names = columns if columns is not None else s.names
    # Ray applies `schema` to the column-pruned batches — project it
    s = pa.schema([s.field(n).remove_metadata() for n in names])
    return rd.read_parquet(paths, columns=columns, schema=s, **kwargs)


def pandas_to_clean_arrow(df):
    """pandas → Arrow WITHOUT pandas schema metadata. A map_groups /
    map_batches UDF that returns a DataFrame gets converted by Ray with
    pandas metadata attached, and any downstream shuffle then loses the
    schema-dedup fast path (Schema.__hash__ raises on the metadata
    dict). Group fns whose output feeds another groupby/join/union
    should return this instead of the raw frame."""
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def owned_table(t):
    """Compact an Arrow table into buffers it OWNS (IPC round-trip).

    A ``Table.slice``/``take``-derived table keeps references into its
    parent's buffers, and pickle (hence ``ray.put`` / Dataset block
    ingestion) serializes the WHOLE parent buffer for every slice —
    measured 55× amplification on the crawl's per-round host-block
    slices (590 rows pickled to 2.67 MB; owned: 48 KB). IPC framing
    truncates buffers to the slice, so a write/read round-trip is the
    cheap way to drop the parent reference (one memcpy each way).
    Use on any sliced table that is about to leave the process."""
    import pyarrow as pa

    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return pa.ipc.open_stream(sink.getvalue()).read_all()


def dataset_from_tables(tables):
    """``ray.data.from_arrow`` for tables the DRIVER already holds,
    without its one-remote-task-per-block metadata computation.

    Ray's ``from_arrow_refs`` ships every table to a worker task just
    to compute BlockMetadata (schema/row-count/bytes) — 56 task
    round-trips per crawl round here (~0.7 s each round, 42× slower
    than computing the same metadata in-process on tables we are
    holding anyway). Falls back to ``from_arrow`` if Ray's internals
    drift."""
    import ray
    import ray.data as rd

    try:
        from ray.data._internal.logical.interfaces import LogicalPlan
        from ray.data._internal.logical.operators.from_operators import FromArrow
        from ray.data._internal.plan import ExecutionPlan
        from ray.data._internal.stats import DatasetStats
        from ray.data.block import BlockExecStats, BlockMetadataWithSchema
        from ray.data.context import DataContext
        from ray.data.dataset import MaterializedDataset

        refs, metas = [], []
        for t in tables:
            stats = BlockExecStats.builder()
            metas.append(BlockMetadataWithSchema.from_block(t, stats=stats.build()))
            refs.append(ray.put(t))
        plan = ExecutionPlan(
            DatasetStats(metadata={"FromArrow": metas}, parent=None),
            DataContext.get_current().copy(),
        )
        return MaterializedDataset(
            plan, LogicalPlan(FromArrow(refs, metas), plan._context)
        )
    except (ImportError, AttributeError, TypeError):  # internal API drift
        return rd.from_arrow(tables)


def dataset_from_table_refs(refs, metas):
    """Build a Dataset from object refs to Arrow tables PLUS their
    already-computed ``BlockMetadataWithSchema`` (e.g. returned by the
    producing actor next to the table). Skips ``from_arrow_refs``'s
    one-metadata-task-per-ref round trip — the dist-crawl's per-round
    resolve path pays that for every seen shard otherwise. Falls back
    to ``from_arrow_refs`` on internal API drift (metas then unused)."""
    import ray.data as rd

    try:
        from ray.data._internal.logical.interfaces import LogicalPlan
        from ray.data._internal.logical.operators.from_operators import FromArrow
        from ray.data._internal.plan import ExecutionPlan
        from ray.data._internal.stats import DatasetStats
        from ray.data.context import DataContext
        from ray.data.dataset import MaterializedDataset

        plan = ExecutionPlan(
            DatasetStats(metadata={"FromArrow": list(metas)}, parent=None),
            DataContext.get_current().copy(),
        )
        return MaterializedDataset(
            plan, LogicalPlan(FromArrow(list(refs), list(metas)), plan._context)
        )
    except (ImportError, AttributeError, TypeError):
        return rd.from_arrow_refs(list(refs))
