"""Spark-4 Python DataSource over versioned tables: ``spark.read
.format("versioned_table")`` for batch time travel and
``spark.readStream.format("versioned_table")`` for an append-only
streaming tail -- the Delta ``spark.read.format("delta")`` /
``readStream`` surface, built on the public Python Data Source API
(pyspark.sql.datasource, Spark 4.x).

Why a DataSource when ``read_version`` exists: the function API needs
our Python package on the CALLER's path and a direct call; the
DataSource face plugs into everything that speaks ``format(...)`` --
SQL ``CREATE TABLE ... USING``, third-party tooling, and crucially
Structured Streaming, where the engine owns offset checkpointing so
a restart resumes the tail exactly where it stopped without the
consumer managing a cursor file (:func:`~..io.versioned
.consume_changes` is the batch-side alternative).

Throughput trade-off, measured (SCALE.md): rows cross a Python
worker as Arrow batches instead of staying in the JVM parquet
reader, costing ~3.7x on a raw 1.5M-row scan -- use
``read_version`` / ``read_current`` for bulk BATCH scans; this face
is for format() integration and the streaming tail, where
per-trigger deltas are small and the checkpointed offsets are the
point.

Batch (``DataSourceReader``): options ``path`` (table dir) and
optional ``version`` (time travel; default current).  Planning reads
only manifests (driver-side file I/O, no Spark jobs); one
InputPartition per data file; executors read their file through
pyarrow and emit Arrow RecordBatches aligned to the version's pinned
schema (pre-evolution files surface missing columns as NULLs, the
same name-based resolution the schema-pinned parquet read performs).

Streaming (``DataSourceStreamReader``): offsets are committed version
numbers; each micro-batch covers the versions in ``(start, end]``.
Append commits emit their ADDED files' rows; a commit that REWROTE
files (merge/delete/compaction) is not expressible as an append tail,
so it raises by default -- set ``skipChangeCommits true`` to skip
such commits entirely (rows arriving through them are never emitted),
exactly Delta's streaming-source contract.  Partition planning is
deterministic from the immutable manifests, so checkpoint replays
re-emit identical batches (exactly-once downstream with an
idempotent/txn sink).  Retention caveat (also Delta's): vacuum must
keep every version a lagging checkpoint may still need -- a reaped
manifest inside ``(start, end]`` raises rather than silently skipping
data.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _FilePart(InputPartition):
    def __init__(self, abs_path: str, arrow_schema_bytes: bytes):
        self.abs_path = abs_path
        self.arrow_schema_bytes = arrow_schema_bytes


def _read_aligned(abs_path: str, arrow_schema_bytes: bytes):
    """Executor-side: stream one parquet file as RecordBatches
    aligned to the pinned schema (missing columns -> NULL, extras
    dropped, order fixed)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    schema = ipc.read_schema(pa.BufferReader(arrow_schema_bytes))
    pf = pq.ParquetFile(abs_path)
    present = [f.name for f in schema if f.name in pf.schema_arrow.names]
    for batch in pf.iter_batches(columns=present):
        n = batch.num_rows
        cols = []
        for f in schema:
            if f.name in batch.schema.names:
                cols.append(batch.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(n, type=f.type))
        yield pa.RecordBatch.from_arrays(cols, schema=schema)


def _arrow_schema_bytes(spark_schema) -> bytes:
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema).serialize().to_pybytes()


def _pinned_schema(path: str, n: int):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import table_schema

    st = table_schema(path, n)
    if st is None:
        raise ValueError(
            f"{path} v_{n} has no pinned schema (legacy table): "
            f"read it with io.versioned.read_version instead")
    return st


def _table_path(options) -> str:
    path = options.get("path")
    if not path:
        raise ValueError(
            "versioned_table needs .option('path', <table dir>)")
    return path


class _BatchReader(DataSourceReader):
    def __init__(self, options, n: int):
        # ``n`` is resolved ONCE by the owning DataSource (schema()
        # and reader() share it): resolving current_version here as
        # well would let a commit landing between the two calls pin
        # the schema to one version and plan partitions from another
        # (r11 advisor).
        self.path = _table_path(options)
        self.n = n
        self.schema_bytes = _arrow_schema_bytes(
            _pinned_schema(self.path, self.n))

    def partitions(self) -> Sequence[InputPartition]:
        from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _data_files

        root = os.path.abspath(self.path)
        return [_FilePart(os.path.join(root, f), self.schema_bytes)
                for f in _data_files(self.path, self.n)]

    def read(self, partition: _FilePart) -> Iterator:
        yield from _read_aligned(partition.abs_path,
                                 partition.arrow_schema_bytes)


class _CDFStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = _table_path(options)
        skip = str(options.get("skipChangeCommits",
                               options.get("skipchangecommits",
                                           "false"))).lower()
        self.skip_change_commits = skip in ("true", "1", "yes")
        self._start_opt = options.get("startingVersion",
                                      options.get("startingversion"))

    def initialOffset(self) -> dict:
        from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import committed_versions

        if self._start_opt is not None:
            # exclusive base: changes AFTER this version are emitted
            return {"version": int(self._start_opt)}
        readable = [n for n in committed_versions(self.path)
                    if os.path.isdir(os.path.join(self.path,
                                                  f"v_{n:08d}"))]
        # first micro-batch = the whole readable table as an initial
        # snapshot (Delta's default), i.e. start BEFORE the first
        # readable version.  The snapshot marker tells partitions()
        # that an unreadable diff base here is EXPECTED (nothing was
        # ever emitted on this checkpoint), as opposed to a lagging
        # checkpoint whose base got vacuumed -- where assuming
        # "everything is new" would silently re-emit inherited files.
        return {"version": (readable[0] - 1) if readable else 0,
                "snapshot": True}

    def latestOffset(self) -> dict:
        from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import current_version

        cur = current_version(self.path)
        return {"version": cur if cur is not None else 0}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[InputPartition]:
        from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
            _data_files, committed_versions,
        )

        s, e = int(start["version"]), int(end["version"])
        if e <= s:
            return []
        committed = [n for n in committed_versions(self.path)
                     if s < n <= e]
        root = os.path.abspath(self.path)
        schema_bytes = _arrow_schema_bytes(_pinned_schema(self.path, e))
        parts: list[InputPartition] = []
        prev: set[str] | None = None
        for n in committed:
            if not os.path.isdir(os.path.join(self.path,
                                              f"v_{n:08d}")):
                raise ValueError(
                    f"stream needs v_{n} of {self.path} but it was "
                    f"vacuumed -- retention must outlive the "
                    f"checkpoint lag (restart from a fresh "
                    f"checkpoint/startingVersion)")
            if prev is None:
                base = n - 1
                if base >= 1 and os.path.isdir(os.path.join(
                        self.path, f"v_{base:08d}")):
                    prev = set(_data_files(self.path, base))
                elif base < 1 or start.get("snapshot"):
                    # genuine table start, or the fresh-checkpoint
                    # initial snapshot (nothing emitted yet): every
                    # file of this version is new by definition
                    prev = set()
                else:
                    # a LAGGING checkpoint whose diff base was
                    # vacuumed: without v_{base}'s manifest we cannot
                    # tell which files were already emitted --
                    # falling back to "everything is new" would
                    # silently re-emit inherited rows, so fail like
                    # the in-range vacuum case does
                    raise ValueError(
                        f"stream needs v_{base} of {self.path} as "
                        f"its diff base but it was vacuumed -- "
                        f"retention must outlive the checkpoint lag "
                        f"(restart from a fresh checkpoint/"
                        f"startingVersion, accepting re-emission)")
            cur = _data_files(self.path, n)
            cur_set = set(cur)
            if not prev <= cur_set:
                if self.skip_change_commits:
                    prev = cur_set
                    continue
                raise ValueError(
                    f"v_{n} of {self.path} rewrote data files "
                    f"(merge/delete/compaction): an append-only "
                    f"stream cannot express it -- set "
                    f".option('skipChangeCommits', 'true') to skip "
                    f"such commits, or consume the row-level feed "
                    f"with io.versioned.consume_changes")
            parts.extend(
                _FilePart(os.path.join(root, f), schema_bytes)
                for f in cur if f not in prev)
            prev = cur_set
        return parts

    def read(self, partition: _FilePart) -> Iterator:
        yield from _read_aligned(partition.abs_path,
                                 partition.arrow_schema_bytes)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine's checkpoint


class VersionedTableDataSource(DataSource):
    """``format("versioned_table")`` -- see the module docstring."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def _resolve_version(self) -> int:
        """The batch version this read is pinned to, resolved ONCE
        per DataSource instance: schema() and reader() must agree, or
        a commit landing between the engine's two calls would pin the
        schema to one version and plan partitions from another (r11
        advisor)."""
        n = getattr(self, "_resolved_n", None)
        if n is None:
            from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import current_version

            path = _table_path(self.options)
            v = self.options.get("version")
            n = int(v) if v is not None else current_version(path)
            if n is None:
                raise ValueError(f"{path} has no committed version")
            self._resolved_n = n
        return n

    def schema(self):
        return _pinned_schema(_table_path(self.options),
                              self._resolve_version())

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options, self._resolve_version())

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _CDFStreamReader(self.options)


def register(spark) -> None:
    """Register the format on a session:
    ``sources.versioned_source.register(spark)`` then
    ``spark.read.format("versioned_table")...``."""
    spark.dataSource.register(VersionedTableDataSource)
