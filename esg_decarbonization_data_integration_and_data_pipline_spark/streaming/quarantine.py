"""Streaming expectations with quarantine: route each micro-batch's
rows through the row-level checks (operators/expectations.
quarantine_split) -- clean rows commit to the main versioned table,
violating rows (with their ``failed_checks`` tags) to a quarantine
table for triage.  The keep-flowing alternative to a fail-stop
enforce() gate: one poisoned row stalls triage, not the feed.

Exactly-once across BOTH sinks: the two appends of a micro-batch
carry the SAME (checkpoint identity, batch id) transaction marker
(the :mod:`docs_versioned` discipline), so every crash point
converges on replay -- clean-committed/quarantine-not replays as a
txn no-op on the main table and then commits the quarantine side;
a full replay is a double no-op.  This requires the checks to be
deterministic, which every expectations kind is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.streaming import checkpoint_identity
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import append_version
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.expectations import (
    tag_violations,
)


def stream_quarantine(sdf: DataFrame, checks, table_dir: str,
                      quarantine_dir: str, checkpoint: str,
                      query_name: str = "stream_quarantine",
                      merge_schema: bool = False):
    """events/docs stream -> per micro-batch: clean rows append one
    version to ``table_dir``, tagged violators one to
    ``quarantine_dir``.  Empty splits commit nothing (no version
    churn).  Returns the started query; callers own
    awaitTermination."""
    ckpt_id = checkpoint_identity(checkpoint)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # one materialization of the batch + checks; the two splits
        # and two appends below are all actions over it (uncached,
        # each would re-read the batch source and re-run every check)
        tagged = tag_violations(batch_df, checks).persist()
        try:
            clean = (tagged.filter(F.size("failed_checks") == 0)
                           .drop("failed_checks"))
            bad = tagged.filter(F.size("failed_checks") > 0)
            txn = f"{ckpt_id}:{batch_id}"
            if not clean.isEmpty():
                append_version(clean, table_dir, txn=txn,
                               merge_schema=merge_schema)
            if not bad.isEmpty():
                append_version(bad, quarantine_dir, txn=txn,
                               merge_schema=merge_schema)
        finally:
            tagged.unpersist()

    return (sdf.writeStream.foreachBatch(sink)
               .option("checkpointLocation", checkpoint)
               .queryName(query_name)
               .trigger(availableNow=True)
               .start())
