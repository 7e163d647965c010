"""Streaming CDC apply: a change stream folds into a versioned table
through conditional multi-clause MERGE (io/versioned.merge_clauses),
one micro-batch at a time.

This is the streaming face of the Delta ``MERGE INTO`` clause
surface, and the standard way a CDC feed (op-flagged upserts and
deletes) maintains a serving table: each non-empty micro-batch is the
merge SOURCE, the caller's ordered clauses decide row fates -- e.g.
``matched delete`` when ``s.op = 'D'``, ``matched update`` otherwise,
``not_matched insert`` when not a delete -- and the whole batch lands
as ONE pinned-base copy-on-write commit.

``not_matched_by_source`` clauses are REFUSED at call time (before
the query starts): a micro-batch is never a full snapshot, so "target
rows absent from this batch" is not evidence of staleness -- the same
reasoning that keeps ``close_missing`` off in the SCD2 stream.  Run a
batch-side :func:`~..io.versioned.merge_clauses` sync against a real
snapshot for reconciliation sweeps.

Exactly-once: the commit carries a transaction marker keyed on
(checkpoint identity, micro-batch id) -- a crash between the merge
commit and the checkpoint advance replays the batch under the same
id, and merge_clauses answers the visible marker with the existing
version instead of double-applying (an ``update set q = t.q + s.q``
accumulation would otherwise double-count).

Intra-batch conflation: a CDC batch can carry several changes for one
key, which the merge cardinality contract rejects loudly.  Pass
``order_col`` (e.g. the change LSN / event timestamp) to keep only
the latest change per key deterministically (ties broken by the
remaining columns, descending); without it duplicate matched keys
fail the batch rather than apply an arbitrary winner.  The marker
column stays IN the batch (clauses may reference ``s.<order_col>``).

The target table must exist (merge_clauses folds into a committed
version); create it with ``write_version`` / ``append_version``
before starting the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.streaming import (
    checkpoint_identity, conflate_latest,
)


def stream_merge_apply(sdf: DataFrame, table_dir: str, key: str,
                       clauses, checkpoint: str,
                       order_col: str | None = None,
                       query_name: str = "merge_stream"):
    """change stream -> one clause merge per non-empty micro-batch
    (see module doc).  Returns the started query; callers own
    awaitTermination."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import merge_clauses

    clauses = list(clauses)
    for i, c in enumerate(clauses):
        if c.get("when") == "not_matched_by_source":
            raise ValueError(
                f"clause {i}: not_matched_by_source is not meaningful "
                f"on a stream (a micro-batch is never a full "
                f"snapshot); run a batch-side merge_clauses sync "
                f"against a real snapshot instead")
    ckpt_id = checkpoint_identity(checkpoint)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df
        if order_col is not None:
            batch = conflate_latest(
                batch, key, order_col,
                [c for c in batch.columns if c not in (key, order_col)])
        merge_clauses(batch_df.sparkSession, table_dir, batch, key,
                      clauses, txn=f"{ckpt_id}:{batch_id}")

    return (sdf.writeStream.foreachBatch(sink)
               .option("checkpointLocation", checkpoint)
               .queryName(query_name)
               .trigger(availableNow=True)
               .start())
