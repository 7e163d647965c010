"""Type-2 slowly-changing-dimension (SCD2) maintenance over
versioned tables.

The reference rebuilds its dimension-like app tables from scratch on
every run and keeps no attribute history (truncate-and-reload, e.g.
jobs/csr_etl.py:157, jobs/staging_to_app.py:214-279) -- "what was
this supplier's segment when the 2019 numbers were filed?" is
unanswerable there.  SCD2 is the warehouse-standard fix: every
business key keeps a row PER ATTRIBUTE STATE, bracketed by
``valid_from`` / ``valid_to`` (NULL = open) with ``is_current``
marking the live row, so fact joins can resolve the dimension AS OF
any effective date.

:func:`scd2_apply` folds one dimension snapshot (or delta) into the
table:

- a NEW business key inserts an open row at ``effective``;
- an existing key whose TRACKED attributes all match the current row
  (null-safe) is a no-op -- untracked batch columns never open a
  version;
- a changed key CLOSES its current row (``valid_to = effective``,
  ``is_current = false``) and inserts the batch row as the new open
  one;
- with ``close_missing=True`` (full-snapshot semantics) keys absent
  from the batch close without a successor -- the member left the
  dimension.

Everything lands in ONE atomic :func:`~.versioned.merge_version`
commit pinned to the snapshot this apply read (``pinned_base``), so
a concurrent writer raises :class:`~.versioned.VersionConflictError`
instead of silently losing an update, a crash mid-apply leaves the
previous version intact, and ``txn`` gives crash-rerun exactly-once.

Scale shape (dimensions are small next to facts, but "small" at
100 TB can still be billions of rows): change detection is ONE
equi-join of the batch against only the ``is_current`` slice;
the merge's rewrite set is the full history OF TOUCHED KEYS ONLY
(merge matches on the business key, so every history row of a
touched key must ride along -- history per key is a handful of
rows), and file-level stats pruning on the key keeps the rewrite at
O(touched slice) on a key-clustered table
(``compact_table(sort_by=[key])``).  Unchanged keys cost nothing
beyond the detection join.  The update frame is persisted across the
merge's plan executions (touched-files probe + staged write) so the
detection join runs once.

``effective`` must be a caller-supplied primitive (ISO date string
or integer epoch -- NEVER ``current_timestamp()``), totally ordered
and strictly increasing across applies: determinism is what makes a
crash-rerun idempotent and the history auditable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    CommitBackend,
    append_version,
    current_version,
    merge_version,
    read_version,
)

_META = ("valid_from", "valid_to", "is_current")


def _null_like(lit_col):
    """NULL with the same type as ``lit_col`` (an impossible WHEN)."""
    return F.when(F.lit(False), lit_col)


def scd2_apply(spark: SparkSession, table_dir: str, batch: DataFrame,
               key: str, tracked, effective,
               close_missing: bool = False, txn: str | None = None,
               backend: CommitBackend | None = None) -> int:
    """Fold one snapshot into the SCD2 table (see module doc);
    returns the committed version.  ``batch`` carries BUSINESS
    columns only (the key, the tracked attributes, any passthrough
    columns) -- exactly one row per key.  Composite business keys:
    pre-concatenate into one column; the merge keys on one column by
    design (that is what file-stats pruning prunes on)."""
    tracked = list(tracked)
    if not tracked:
        raise ValueError("scd2_apply needs at least one tracked column")
    cols = set(batch.columns)
    missing = [c for c in [key, *tracked] if c not in cols]
    if missing:
        raise ValueError(
            f"batch lacks columns {missing} (has {sorted(cols)})")
    clash = sorted(cols & set(_META))
    if clash:
        raise ValueError(
            f"batch must not carry SCD metadata columns {clash}; "
            f"they are managed by scd2_apply")
    if effective is None or not isinstance(effective, (str, int)):
        raise ValueError(
            "effective must be an ISO date string or integer epoch "
            "(a deterministic caller-supplied value, never "
            "current_timestamp)")
    vf = F.lit(effective)

    cur_n = current_version(table_dir, backend=backend)
    if cur_n is None:
        init = (batch
                .withColumn("valid_from", vf)
                .withColumn("valid_to", _null_like(vf))
                .withColumn("is_current", F.lit(True)))
        return append_version(init, table_dir, txn=txn,
                              stats_columns=[key], backend=backend)

    if txn is not None:
        from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _txns

        if txn in _txns(table_dir, cur_n):
            # crash-rerun of an applied load: the marker is already
            # visible, so this replay must no-op BEFORE the
            # monotonicity guard (the re-supplied effective equals
            # the applied one by definition)
            return cur_n
    cur_tbl = read_version(spark, table_dir, cur_n, backend=backend)
    if (batch.groupBy(key).count().filter(F.col("count") > 1)
            .limit(1).count()):
        raise ValueError(
            f"batch has duplicate {key} values -- SCD2 history would "
            f"fork; de-duplicate upstream")
    # the last applied effective is the max over BOTH brackets of the
    # WHOLE table: inserts stamp valid_from, closes stamp valid_to,
    # and a close-only apply (full departure) stamps only the latter
    # -- checking open rows' valid_from alone would let an
    # out-of-order effective overlap a closed interval (r11 review
    # pass #1)
    mrow = cur_tbl.agg(F.max("valid_from").alias("f"),
                       F.max("valid_to").alias("t")).collect()[0]
    last = max((v for v in (mrow["f"], mrow["t"]) if v is not None),
               default=None)
    if last is not None and not (type(last) is type(effective)
                                 and effective > last):
        raise ValueError(
            f"effective {effective!r} must be the same type as and "
            f"strictly after the last applied {last!r} -- equal or "
            f"out-of-order applies would create overlapping validity "
            f"intervals")

    cur_rows = cur_tbl.filter(F.col("is_current"))
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"b.{t}").eqNullSafe(F.col(f"c.{t}")) for t in tracked])
    j = (batch.alias("b")
         .join(cur_rows.alias("c"),
               F.col(f"b.{key}") == F.col(f"c.{key}"), "left"))
    # changed keys = new (no current row) or any tracked attr differs
    delta_keys = (j.filter(F.col(f"c.{key}").isNull() | ~same)
                   .select(F.col(f"b.{key}").alias(key)))
    touch_keys = delta_keys
    if close_missing:
        gone = (cur_rows.join(batch.select(key), key, "left_anti")
                .select(key))
        touch_keys = delta_keys.unionByName(gone)
    # full history of every touched EXISTING key rides the merge
    # (merge matches on the business key, so partial history would
    # be dropped); only the current row actually changes
    hist = cur_tbl.join(touch_keys, key, "left_semi")
    closed = (hist
              .withColumn("valid_to",
                          F.when(F.col("is_current"), vf)
                           .otherwise(F.col("valid_to")))
              .withColumn("is_current", F.lit(False)))
    inserts = (batch.join(delta_keys, key, "left_semi")
               .withColumn("valid_from", vf)
               .withColumn("valid_to", _null_like(vf))
               .withColumn("is_current", F.lit(True)))
    updates = closed.unionByName(inserts).persist()
    try:
        return merge_version(spark, table_dir, updates, key, txn=txn,
                             backend=backend, pinned_base=cur_n)
    finally:
        updates.unpersist()


def scd2_current(spark: SparkSession, table_dir: str,
                 backend: CommitBackend | None = None) -> DataFrame:
    """The live dimension: one open row per surviving business key."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_current

    return (read_current(spark, table_dir, backend=backend)
            .filter(F.col("is_current")))


def scd2_enrich(facts: DataFrame, history: DataFrame, key: str,
                asof_col: str, how: str = "left") -> DataFrame:
    """Point-in-time fact enrichment: join each fact row to the
    dimension row whose validity interval covers the fact's own
    ``asof_col`` -- the join that makes SCD2 history USABLE ("the
    customer's segment when this order was placed", not its segment
    today).  ``history`` is the full SCD2 frame
    (:func:`~.versioned.read_current` of the dimension table); at
    most one dimension row matches per fact by the non-overlap
    invariant, and a fact dated before the member existed (or after
    it departed) keeps NULL dimension columns under the default left
    join.

    Plan shape at scale: Catalyst executes this as an EQUI-join on
    ``key`` with the interval bounds as residual predicates -- one
    shuffle on the key (or zero with a broadcast dimension), never a
    range-explode: history rows per key are few (one per attribute
    state), so the residual filter touches a handful of candidates
    per fact.  Dimension histories small enough to broadcast join
    shuffle-free against any fact volume."""
    if key not in facts.columns or asof_col not in facts.columns:
        raise ValueError(
            f"facts need columns {key!r} and {asof_col!r} "
            f"(has {facts.columns})")
    f, h = facts.alias("f"), history.alias("h")
    ts = F.col(f"f.{asof_col}")
    cond = ((F.col(f"f.{key}") == F.col(f"h.{key}"))
            & (F.col("h.valid_from") <= ts)
            & (F.col("h.valid_to").isNull()
               | (ts < F.col("h.valid_to"))))
    return f.join(h, cond, how).drop(F.col(f"h.{key}"))


def scd2_as_of(spark: SparkSession, table_dir: str, effective,
               backend: CommitBackend | None = None) -> DataFrame:
    """Point-in-time dimension view: the row whose validity interval
    covers ``effective`` (``valid_from <= effective < valid_to``,
    open rows unbounded) -- at most one per business key by the
    non-overlap invariant scd2_apply maintains.  This is ATTRIBUTE
    time travel (what was true of the member), orthogonal to the
    versioned table's COMMIT time travel (what the table contained
    when we loaded it); both work here."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_current

    eff = F.lit(effective)
    df = read_current(spark, table_dir, backend=backend)
    return df.filter((F.col("valid_from") <= eff)
                     & (F.col("valid_to").isNull()
                        | (F.col("valid_to") > eff)))
