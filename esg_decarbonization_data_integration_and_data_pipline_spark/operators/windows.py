"""Window-function operators (SURVEY.md §2.5 W1-W5, §2.4 A5/A7).

The signature computation of the reference warehouse is the
"YTM" partitioned running sum: sort by (year, keys, period_start)
then cumulative-sum amount within (year, keys) (reference:
jobs/raw_to_staging.py:172-178 and 7 more call sites). In Spark this
is a single window aggregate -- no global sort, one shuffle on the
partition keys, and the frame ``rowsBetween(unboundedPreceding,
currentRow)`` reproduces the cumsum exactly.

Scale note: windows shuffle once on ``partitionBy`` keys; all the
helpers below keep partition keys high-cardinality relative to data
volume (site x year, custkey x year, ...) so no single partition
explodes. None of them needs a global orderBy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def ytm_cumsum(df: DataFrame, partition_keys: Sequence[str], order_key: str,
               amount_col: str, out_col: str = "ytm_amount") -> DataFrame:
    """Partitioned running (year-to-month) sum -- W1.

    Reference semantics: ``groupby([year]+keys)[amount].cumsum()``
    after a multi-key sort (jobs/raw_to_staging.py:172-178).
    ``order_key`` must be unique within a partition (the reference
    pre-aggregates to one row per period before cumsum; do the same).
    """
    w = (Window.partitionBy(*partition_keys)
         .orderBy(order_key)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out_col, F.sum(amount_col).over(w))


def rank_in_group(df: DataFrame, partition_keys: Sequence[str],
                  order_by: Sequence[Column], out_col: str = "rank") -> DataFrame:
    """pandas ``rank('first')`` within group -- W2 (row_number semantics).

    Reference: greedy-allocation ordering by price within year
    (Model/RE_purpose_optimizer.py:190-191,280-281).
    """
    w = Window.partitionBy(*partition_keys).orderBy(*order_by)
    return df.withColumn(out_col, F.row_number().over(w))


def top1_per_group(df: DataFrame, partition_keys: Sequence[str],
                   order_by: Sequence[Column]) -> DataFrame:
    """Grouped argmax -- W3: keep the first row per group under ordering.

    Reference: per-area latest guideline pick via
    ``groupby('area').apply(idxmax)`` (jobs/staging_to_app.py:112-113).
    Include a unique tiebreak column in ``order_by`` for determinism.
    """
    w = Window.partitionBy(*partition_keys).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


def group_agg_as_column(df: DataFrame, partition_keys: Sequence[str],
                        agg: Column, out_col: str) -> DataFrame:
    """Group aggregate merged back as a column (no join) -- W4/A7.

    Reference idiom: ``groupby(keys).transform('sum')`` then per-row
    ratio (jobs/source_to_raw/fem_ratio.py:16-19), and group-max
    merged back (Model/Factory_elect_simulator_update.py:225-231).
    A window aggregate avoids the reference's groupby+merge
    round-trip and shuffles once.
    """
    return df.withColumn(out_col, agg.over(Window.partitionBy(*partition_keys)))


def share_of_total(df: DataFrame, partition_keys: Sequence[str], amount_col: str,
                   out_col: str = "ratio") -> DataFrame:
    """Per-row share of group total -- A7/W5 (ratio = amount / group sum).

    Null-safe: a zero group total yields null (reference divides and
    gets inf/NaN, then fillna -- we prefer null, callers coalesce).
    """
    df = group_agg_as_column(df, partition_keys, F.sum(amount_col), "__total")
    return (df.withColumn(out_col,
                          F.col(amount_col) / F.nullif(F.col("__total"), F.lit(0.0)))
              .drop("__total"))


def latest_version(df: DataFrame, partition_keys: Sequence[str],
                   version_order: Sequence[Column]) -> DataFrame:
    """Keep only rows carrying the max version per key -- A5.

    Reference: correlated scalar subquery ``WHERE version = (SELECT
    MAX(version) ... validate is true)`` (jobs/raw_to_staging.py:697,
    jobs/staging_to_app.py:967) and max-last_update_time variants
    (Model/Factory_elect_simulator_update.py:316-319). Expressed as a
    window max filter: one shuffle, no subquery, keeps ALL rows tied
    at the max (matching SQL semantics, unlike row_number).
    """
    w = Window.partitionBy(*partition_keys).orderBy(*version_order)
    return (df.withColumn("__rk", F.rank().over(w))
              .filter(F.col("__rk") == 1).drop("__rk"))
