"""Streaming quality-gate ingest: the stateless head of the curation
chain (PII scrub -> Gopher rules) applied per micro-batch.

Unlike dedup (which needs the persisted signature store) and the
corpus-statistics gates (boilerplate share, unigram NLL -- undefined
on a partial stream), the scrub and rule gates are pure per-document
maps, so they stream with NO state: every trigger is one narrow pass.
This is the standard split of a production feed -- stateless gates run
in-stream at crawl time, corpus-relative gates and dedup run in the
batch curation pass over the accumulated corpus
(pipelines/corpus_curation.curate).

Replay semantics: survivors merge into the corpus with the keyed
``replace_keys`` writer, so a re-run micro-batch converges instead of
duplicating; the reject audit table is at-least-once by design
(batch_id disambiguates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.writers import (
    replace_keys,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
    GOPHER_FLAG_COLS, GOPHER_METRIC_COLS, gopher_rules,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
    _scrub_expr,
)


def stream_gate_ingest(sdf: DataFrame, corpus_path: str, checkpoint: str,
                       gopher: dict | None = None, scrub: bool = True,
                       normalize: bool = False,
                       id_col: str = "doc_id", text_col: str = "text",
                       query_name: str = "docs_gate_ingest"):
    """documents stream -> gated corpus + reject audit table.

    Per micro-batch: (1) optional in-place normalization then PII
    scrub (the same expr chains the batch pipeline applies, in the
    same order, so stream- and batch-ingested docs hash/dedup
    identically later -- ``normalize`` must match the batch pass's
    setting); (2) :func:`gopher_rules` with
    ``gopher`` kwargs (``{}`` = published defaults; None disables and
    only the scrub runs); (3) passing docs merge into ``corpus_path``
    (idempotent keyed merge), failing docs append to
    ``<corpus_path>_rejects`` WITH their per-rule flags, so the feed
    owner sees which rule fired.

    Returns the started query; callers own awaitTermination."""
    rejects_path = corpus_path.rstrip("/") + "_rejects"

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df
        if normalize:
            from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import normalize_expr

            batch = batch.withColumn(text_col, normalize_expr(text_col))
        if scrub:
            batch = batch.withColumn(text_col, _scrub_expr(text_col))
        if gopher is None:
            replace_keys(batch, corpus_path, keys=[id_col])
            return
        kw = dict(gopher)
        kw.setdefault("text_col", text_col)
        flagged = gopher_rules(batch, **kw).localCheckpoint()
        keep = (flagged.filter(F.col("gopher_pass") == 1)
                       .drop(*GOPHER_METRIC_COLS, *GOPHER_FLAG_COLS))
        replace_keys(keep, corpus_path, keys=[id_col])
        (flagged.filter(F.col("gopher_pass") != 1)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append").parquet(rejects_path))

    return (sdf.writeStream.foreachBatch(ingest)
               .option("checkpointLocation", checkpoint)
               .queryName(query_name)
               .trigger(availableNow=True)
               .start())
