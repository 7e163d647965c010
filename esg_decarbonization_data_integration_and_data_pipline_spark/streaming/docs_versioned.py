"""Streaming ingest into a manifest-committed versioned table: each
micro-batch commits ONE new version via :func:`io.versioned.
append_version` -- O(batch) per trigger, snapshot-isolated readers.

This is the serving-side twin of :mod:`docs_gate`'s ``replace_keys``
merge: the keyed merge gives convergent UPSERT semantics into a plain
parquet table (exclusive maintenance window required for readers);
the versioned append gives strict snapshot isolation -- a dashboard
or training job reading ``read_current`` mid-ingest sees a fully
committed corpus prefix, never a half-written batch -- at the cost of
append-only semantics between compactions.

Exactly-once: the version manifest carries a transaction marker
keyed on (checkpoint identity, micro-batch id).  Structured Streaming
replays a batch whose sink crashed mid-commit under the SAME batch
id, and ``append_version`` answers a replayed txn with the existing
version instead of double-appending.  The checkpoint identity is
hashed into the marker so a NEW checkpoint (fresh batch ids from 0)
cannot collide with a previous run's markers on the same table.

Compaction stays a batch-side concern: periodically
``compact_table(spark, t)`` snapshots the chain WHILE carrying the
txn-marker set forward (a bare ``write_version`` snapshot would drop
the markers, so a crash-replay of a micro-batch that interleaved with
compaction -- append committed, checkpoint not yet advanced,
compaction runs, restart -- would double-append; r8 advisor finding),
then ``vacuum`` reaps the superseded dirs (tested in
tests/test_versioned_append.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from esg_decarbonization_data_integration_and_data_pipline_spark.streaming import checkpoint_identity
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
)


def stream_versioned_append(sdf: DataFrame, table_dir: str,
                            checkpoint: str,
                            transform=None,
                            query_name: str = "docs_versioned_append",
                            merge_schema: bool = False,
                            refresh_views=None,
                            auto_compact_files: int | None = None):
    """documents stream -> one committed table version per non-empty
    micro-batch.

    ``transform``: optional DataFrame -> DataFrame applied per batch
    BEFORE the append (e.g. the stateless gate chain); it must be
    deterministic for the exactly-once guarantee to mean anything --
    a replayed batch re-runs it.

    ``refresh_views``: optional list of :mod:`io.matview` MV dirs
    whose source is ``table_dir``; each is incrementally refreshed
    AFTER the batch commits, so downstream aggregates track the
    stream at O(batch) per trigger instead of a nightly rebuild.
    Every crash point converges: append-committed/refresh-not-run
    replays as an append txn no-op and the refresh then catches up
    (it advances from ITS OWN last-applied marker to the source's
    current version, however many batches that spans); a double-run
    refresh sees source-current == last-applied and commits nothing.

    ``auto_compact_files``: when set, each batch ends with
    :func:`io.versioned.maybe_compact` at that threshold, so a
    long-lived append chain keeps a bounded file count (the
    metadata-only check is free until it fires; compaction carries
    the txn-marker set, so a replayed batch interleaving with it
    still refuses -- the r8 advisor crash point stays closed).

    Empty micro-batches commit nothing (no version churn; replaying
    an empty batch is trivially idempotent).

    Returns the started query; callers own awaitTermination."""
    ckpt_id = checkpoint_identity(checkpoint)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = transform(batch_df) if transform is not None else batch_df
        # schema enforcement ON by default: a drifting upstream
        # producer fails the query loudly instead of silently forking
        # the table; opt into merge_schema for a planned evolution
        append_version(batch, table_dir, txn=f"{ckpt_id}:{batch_id}",
                       merge_schema=merge_schema)
        if refresh_views:
            from esg_decarbonization_data_integration_and_data_pipline_spark.io.matview import (
                refresh_aggregate_view,
            )

            for mv in refresh_views:
                refresh_aggregate_view(batch_df.sparkSession, mv)
        if auto_compact_files is not None:
            from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
                maybe_compact,
            )

            maybe_compact(batch_df.sparkSession, table_dir,
                          max_files=auto_compact_files)

    return (sdf.writeStream.foreachBatch(sink)
               .option("checkpointLocation", checkpoint)
               .queryName(query_name)
               .trigger(availableNow=True)
               .start())
