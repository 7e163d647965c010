"""Structured Streaming extension surface (SURVEY.md §2.11)."""

from __future__ import annotations

import hashlib


def checkpoint_identity(checkpoint: str) -> str:
    """The checkpoint-identity prefix of every versioned-sink
    transaction marker ("<identity>:<batch_id>" and variants).  ONE
    definition on purpose: the marker format is the cross-sink
    exactly-once contract -- a replayed micro-batch is refused
    because its marker matches -- and independently maintained
    copies of the hash recipe could drift apart and silently break
    replay refusal."""
    return hashlib.md5(checkpoint.encode()).hexdigest()[:12]


def conflate_latest(batch, key: str, order_col: str, tie_cols):
    """Keep the LATEST change per ``key`` in a CDC micro-batch:
    row_number over (key) ordered by ``order_col`` desc with
    ``tie_cols`` desc as the deterministic tie-break.  ONE definition
    on purpose (r14 review): the keep-latest rule is shared by the
    SCD2 and clause-merge sinks, and independently maintained copies
    of the ordering/tie-break would silently diverge."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(key).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in tie_cols])
    return (batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))
