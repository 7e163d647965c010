"""Streaming SCD2 maintenance: a CDC/snapshot stream folds into a
type-2 dimension table (io/scd) one micro-batch at a time.

This is the streaming face of :func:`~..io.scd.scd2_apply`: each
non-empty micro-batch is treated as a dimension DELTA (changed /
arrived members) and folded in ONE pinned-base merge commit --
new keys insert open rows, changed tracked attributes close + reopen,
unchanged rows are no-ops.  ``close_missing`` stays False by design:
a micro-batch is never a full snapshot, so absence from a batch must
not close a member (run a batch-side full-snapshot
:func:`~..io.scd.scd2_apply` for reconciliation sweeps).

Exactly-once: the commit carries a transaction marker keyed on
(checkpoint identity, micro-batch id) -- a crash between the merge
commit and the checkpoint advance replays the batch under the same
id, and scd2_apply answers the visible marker with the existing
version instead of double-folding (which matters doubly here,
because a replayed fold would otherwise CLOSE the rows it opened).

The ``effective`` stamp per batch:

- default (``effective_col=None``): the integer micro-batch id --
  deterministic and strictly increasing within a checkpoint lineage.
  Caveat: a FRESH checkpoint restarts ids at 0, so pointing a new
  checkpoint at an existing dimension fails the monotonicity guard
  loudly (by design -- decide whether that is a replay or a new era
  before overriding with ``effective_col``).
- ``effective_col``: max of that column over the batch (event-time
  stamping) -- deterministic given the batch, but the STREAM must
  deliver non-decreasing batch maxima or the guard fails the query.

Intra-batch conflation: a CDC batch can carry several updates for
one key; pass ``order_col`` (e.g. the event timestamp) to keep only
the latest per key deterministically.  Without it, duplicate keys
fail the batch loudly (scd2_apply's duplicate guard) rather than
fork history on an arbitrary winner.

Marker-column scope: ``order_col`` / ``effective_col`` are consumed
as stream markers and dropped before the fold, UNLESS the named
column is the key or a tracked attribute (then it stays in the
dimension -- a tracked event timestamp can double as the effective
stamp).  A PASSTHROUGH business column named as a marker is excluded
from the dimension; rename it upstream if it should persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.streaming import (
    checkpoint_identity, conflate_latest,
)


def stream_scd2_apply(sdf: DataFrame, table_dir: str, key: str,
                      tracked, checkpoint: str,
                      effective_col: str | None = None,
                      order_col: str | None = None,
                      query_name: str = "scd2_stream"):
    """dimension-delta stream -> one SCD2 fold per non-empty
    micro-batch (see module doc).  Returns the started query; callers
    own awaitTermination."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.scd import scd2_apply

    tracked = list(tracked)
    ckpt_id = checkpoint_identity(checkpoint)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # effective from the RAW batch, before conflation drops any
        # column (effective_col and order_col may be the same column)
        if effective_col is not None:
            eff = batch_df.agg(
                F.max(effective_col).alias("m")).collect()[0]["m"]
        else:
            eff = int(batch_id)
        batch = batch_df
        if order_col is not None:
            batch = conflate_latest(batch, key, order_col, tracked)
        # drop the stream-only marker columns before the fold -- but
        # never the key or a tracked attribute that doubles as the
        # marker (e.g. a tracked event timestamp used as
        # effective_col: dropping it would fail the fold's
        # missing-column guard, r11 advisor).  A PASSTHROUGH business
        # column named as order/effective is still consumed as a
        # marker and excluded from the dimension -- rename it
        # upstream if it should persist (documented in the module
        # doc).
        drops = {c for c in (order_col, effective_col)
                 if c is not None and c != key and c not in tracked}
        if drops:
            batch = batch.drop(*drops)
        scd2_apply(batch_df.sparkSession, table_dir, batch, key,
                   tracked, eff, close_missing=False,
                   txn=f"{ckpt_id}:{batch_id}")

    return (sdf.writeStream.foreachBatch(sink)
               .option("checkpointLocation", checkpoint)
               .queryName(query_name)
               .trigger(availableNow=True)
               .start())
