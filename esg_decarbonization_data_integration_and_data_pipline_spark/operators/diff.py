"""Dataset snapshot diff -- the data-versioning primitive of a
continuously-rebuilt corpus: given two snapshots of the same table,
classify every key as added / removed / changed / unchanged by
content hash.

Scale shape: each side is one narrow projection (id + md5 of the
compared columns -- the full row never travels), then ONE full outer
join keyed by id.  On a real cluster both snapshots of a table are
typically partitioned/bucketed the same way, so the join is
co-located; here it is a plain hash equi-join either way.  Output is
id + status + both hashes, so a 100 TB diff moves O(rows * 40 bytes),
not O(corpus bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

def _w_all() -> "Window":
    """Whole-frame window for the O(buckets/categories) summary
    frames -- single-task by construction, which is exactly right
    for control-plane-sized inputs.  Built lazily: F.lit needs an
    active SparkContext, which module import must not assume."""
    return (Window.orderBy(F.lit(1))
                  .rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing))


def dataset_diff(old: DataFrame, new: DataFrame,
                 id_col: str = "doc_id",
                 compare_cols: list[str] | None = None) -> DataFrame:
    """Classify every id across two snapshots.

    - ``added``      id only in ``new``
    - ``removed``    id only in ``old``
    - ``changed``    id in both, content hash differs
    - ``unchanged``  id in both, content hash equal

    ``compare_cols`` defaults to all shared non-id columns (sorted by
    name, so the hash is schema-order-independent).  The row hash is
    md5 over FIXED-WIDTH per-column digests (a null/value flag char +
    md5 of the value), so it is unambiguous no matter what bytes the
    values contain -- a separator-join scheme misclassifies a changed
    row as ``unchanged`` whenever values shift across the separator
    (or a value equals the null sentinel), silently skipping its
    reprocessing in incremental curation.  NULL is distinct from
    every real value including the empty string.
    Output: (id_col, status, old_hash, new_hash).
    """
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns) - {id_col}
        compare_cols = sorted(shared)
    if not compare_cols:
        raise ValueError("no columns to compare")

    def content_hash(df: DataFrame, out: str) -> DataFrame:
        parts = [F.concat(F.when(F.col(c).isNull(), F.lit("N"))
                           .otherwise(F.lit("V")),
                          F.md5(F.coalesce(F.col(c).cast("string"),
                                           F.lit(""))))
                 for c in compare_cols]
        return df.select(F.col(id_col),
                         F.md5(F.concat(*parts)).alias(out))

    o = content_hash(old, "old_hash")
    n = content_hash(new, "new_hash")
    status = (F.when(F.col("old_hash").isNull(), F.lit("added"))
               .when(F.col("new_hash").isNull(), F.lit("removed"))
               .when(F.col("old_hash") == F.col("new_hash"),
                     F.lit("unchanged"))
               .otherwise(F.lit("changed")))
    return (o.join(n, id_col, "full_outer")
             .select(id_col, status.alias("status"),
                     "old_hash", "new_hash"))


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Schema-level drift between two snapshots -- the third leg of
    the drift triad (:func:`dataset_diff` = rows, :func:`psi_drift`
    = value distributions, this = structure).  Pure metadata: reads
    both frames' schemas, touches no data.

    One dict per differing column, sorted by name:
    ``{"column", "status" ("added"|"removed"|"type_changed"),
    "old_type", "new_type"}`` (types as simpleString; None on the
    absent side).  Unchanged columns are omitted -- an empty list
    means the schemas agree (nullability is ignored: parquet
    round-trips routinely flip it without any producer change).
    """
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out: list[dict] = []
    for col in sorted(set(o) | set(n)):
        if col not in n:
            out.append({"column": col, "status": "removed",
                        "old_type": o[col], "new_type": None})
        elif col not in o:
            out.append({"column": col, "status": "added",
                        "old_type": None, "new_type": n[col]})
        elif o[col] != n[col]:
            out.append({"column": col, "status": "type_changed",
                        "old_type": o[col], "new_type": n[col]})
    return out


_LOCAL_COUNTS_CAP = 100_000


def _merged_counts(o_counts: DataFrame, n_counts: DataFrame,
                   cap: int | None = None):
    """Compute both sides' per-key counts with ONE Spark job and
    full-outer-merge them on the driver.

    The r15 shape eagerly ``localCheckpoint``-ed each side (two jobs)
    so the corpus-sized bucket scans would not re-run once per
    consumer (the r15 plans held up to 40 scans of the input without
    truncation).  That kept the 0-rescan property but charged a fixed
    two-job materialization even on tiny inputs, and the downstream
    full-outer join + total aggregates + crossJoins still planned ~12
    exchanges over the checkpointed control-plane rows (the r15
    verdict's drift watch item).  Both sides now union into a single
    side-tagged aggregate action -- one job, each snapshot scanned
    once -- and the merge/total bookkeeping happens on the collected
    rows (control-plane-sized: O(buckets) or O(categories); exact
    integer arithmetic, so nothing float-sensitive moves here).  The
    PSI scoring itself stays in Spark expressions over one local
    frame (:func:`_psi_score_rows`), which keeps results
    bit-identical while the final plan collapses to a projection.

    ``cap`` bounds the driver transfer for callers whose key domain
    is not bounded by construction: when the union exceeds it, the
    caller falls back to the executor-resident checkpoint path.
    Returns (merged, tot_old, tot_new) where ``merged`` is
    [(key, n_old, n_new)] sorted by key -- or None when over cap.
    """
    o_cnt = [c for c in o_counts.columns if c != "__bkey"][0]
    n_cnt = [c for c in n_counts.columns if c != "__bkey"][0]
    u = (o_counts.select(F.lit("o").alias("__side"), "__bkey",
                         F.col(o_cnt).alias("__n"))
         .unionByName(
             n_counts.select(F.lit("n").alias("__side"), "__bkey",
                             F.col(n_cnt).alias("__n"))))
    rows = u.take(cap + 1) if cap is not None else u.collect()
    if cap is not None and len(rows) > cap:
        return None
    by_key: dict = {}
    for r in rows:
        slot = by_key.setdefault(r["__bkey"], [0, 0])
        slot[0 if r["__side"] == "o" else 1] = r["__n"]
    merged = [(k, v[0], v[1]) for k, v in sorted(by_key.items())]
    tot_o = sum(v[0] for v in by_key.values())
    tot_n = sum(v[1] for v in by_key.values())
    return merged, tot_o, tot_n


def _psi_score_rows(spark, merged, tot_o: int, tot_n: int,
                    k_smooth: float, key_field) -> DataFrame:
    """:func:`_psi_score` over driver-merged counts: one local frame,
    one projection -- no join, no aggregate, no exchange.  The
    smoothing arithmetic is the SAME Spark expression tree evaluated
    over the same values (totals/k enter as literals exactly where
    the aggregate/count columns did), so p/q/psi_term are
    bit-identical to the distributed scorer's."""
    from pyspark.sql.types import LongType, StructField, StructType

    st = StructType([key_field,
                     StructField("n_old", LongType(), False),
                     StructField("n_new", LongType(), False)])
    df = spark.createDataFrame(merged, schema=st)
    key = key_field.name
    k = F.lit(float(k_smooth))
    p = (F.col("n_old") + 1.0) / (F.lit(tot_o) + k)
    q = (F.col("n_new") + 1.0) / (F.lit(tot_n) + k)
    return df.select(
        key, "n_old", "n_new",
        F.round(p, 6).alias("p_old"),
        F.round(q, 6).alias("p_new"),
        F.round((q - p) * F.log(q / p), 6).alias("psi_term"))


def _psi_score(o_counts: DataFrame, n_counts: DataFrame,
               k_smooth) -> DataFrame:
    """Join per-bucket counts of the two snapshots and score each
    bucket's PSI term with Laplace smoothing over ``k_smooth``
    pseudo-buckets (an int, or a 1-row DataFrame with column
    ``__k`` for a data-dependent domain): p = (n_old + 1) /
    (total_old + k), q likewise; term = (q - p) * ln(q / p) --
    always >= 0, 0 iff p == q.  The total is defined over OBSERVED
    buckets only: a bucket absent from both sides would smooth to
    p = 1/(total_old + k) vs q = 1/(total_new + k), which differ
    whenever the side totals do, so such buckets are deliberately
    excluded rather than claimed to contribute 0 (the DuckDB oracle
    scores the same observed-bucket domain).  Both inputs are
    O(#buckets) rows; everything from here is control-plane-sized."""
    tot_o = o_counts.agg(F.sum("n_old").alias("__to"))
    tot_n = n_counts.agg(F.sum("n_new").alias("__tn"))
    j = (o_counts.join(n_counts, "__bkey", "full_outer")
                 .crossJoin(F.broadcast(tot_o))
                 .crossJoin(F.broadcast(tot_n)))
    if isinstance(k_smooth, DataFrame):
        j = j.crossJoin(F.broadcast(k_smooth))
        k = F.col("__k").cast("double")
    else:
        k = F.lit(float(k_smooth))
    p = ((F.coalesce(F.col("n_old"), F.lit(0)) + 1.0)
         / (F.coalesce(F.col("__to"), F.lit(0)) + k))
    q = ((F.coalesce(F.col("n_new"), F.lit(0)) + 1.0)
         / (F.coalesce(F.col("__tn"), F.lit(0)) + k))
    return j.select(
        "__bkey",
        F.coalesce(F.col("n_old"), F.lit(0)).alias("n_old"),
        F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        F.round(p, 6).alias("p_old"),
        F.round(q, 6).alias("p_new"),
        F.round((q - p) * F.log(q / p), 6).alias("psi_term"))


def psi_drift(old: DataFrame, new: DataFrame, column: str,
              n_buckets: int = 10) -> DataFrame:
    """Population-stability-index drift of a numeric column between
    two snapshots -- the distribution-level complement of
    :func:`dataset_diff` (same rows can carry a drifted value mix;
    a retrained model cares about the latter).  Sum ``psi_term`` for
    the headline PSI (rule of thumb: < 0.1 stable, > 0.25 shifted).

    Buckets are ``n_buckets`` equal-width slices of the OLD
    snapshot's [min, max] (the reference distribution); new values
    outside clamp into the end buckets, NULLs form their own bucket
    ``-1``, and a degenerate old range (min == max) puts everything
    in bucket 0.  An old snapshot with NO non-null values raises --
    PSI against an undefined reference would otherwise clamp every
    new value into bucket 0 and score a plausible-looking number.
    Smoothing uses k = n_buckets + 1 (the null bucket) so empty
    buckets never divide by zero.

    Scale shape: the reference min/max is ONE 1-row aggregate over
    ``old``, collected (a control-plane scalar -- embedding it as a
    literal also keeps the bounds subplan from re-executing once per
    side), then one partial-agg count scan per side keyed by the
    O(n_buckets) bucket id and an O(n_buckets) join -- nothing
    corpus-sized ever shuffles.

    Output: (bucket, n_old, n_new, p_old, p_new, psi_term), one row
    per bucket observed in either snapshot.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    lo, hi = old.agg(F.min(column), F.max(column)).first()
    if lo is None:
        raise ValueError(
            f"reference snapshot has no non-null {column!r} values "
            f"-- the PSI reference distribution is undefined")

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        col = F.col(column)
        if hi == lo:
            clamped = F.lit(0)
        else:
            raw = F.floor(((col - F.lit(lo)) * n_buckets)
                          / (F.lit(hi) - F.lit(lo)))
            clamped = F.least(F.lit(n_buckets - 1),
                              F.greatest(F.lit(0), raw))
        b = F.when(col.isNull(), F.lit(-1)).otherwise(clamped)
        return (df.groupBy(b.cast("int").alias("__bkey"))
                  .agg(F.count(F.lit(1)).alias(out)))

    # materialize the O(n_buckets) count frames ONCE: the scorer
    # reuses each side in the join AND its own total-aggregate
    # subtree, and the DataFrame API has no common-subexpression
    # reuse across those, so without truncation every reuse re-runs
    # the corpus-sized bucket scan (measured: drift_ks_summary's
    # single plan held 84 Exchanges / ~10 scans of the input; r15,
    # guide section 7.2).  Both sides collect through ONE union job
    # and the scoring runs as a projection over one local frame
    # (r16; bounded at n_buckets + 1 rows per side by construction,
    # so no cap is needed) -- see _merged_counts for why this beats
    # the r15 per-side eager localCheckpoint pair.
    from pyspark.sql.types import IntegerType, StructField

    merged, tot_o, tot_n = _merged_counts(bucketed(old, "n_old"),
                                          bucketed(new, "n_new"))
    return _psi_score_rows(old.sparkSession, merged, tot_o, tot_n,
                           n_buckets + 1,
                           StructField("bucket", IntegerType(), False))


def drift_summary(drift: DataFrame) -> DataFrame:
    """One-row summary of a :func:`psi_drift` frame: ``psi_total``
    (sum of the smoothed terms, null bucket included) and
    ``ks_approx`` (the Kolmogorov-Smirnov statistic at bucket
    resolution: max |CDF_old - CDF_new| over the ordered value
    buckets, from RAW counts conditioned on non-null -- a lower
    bound on the true KS, tightening as n_buckets grows).  NULL
    ``ks_approx`` when either side has no non-null rows.  Input is
    O(buckets) rows, so everything here is control-plane-sized.

    Output: (psi_total, ks_approx).
    """
    from pyspark.sql import Window

    vals = drift.filter(F.col("bucket") >= 0)
    w_all = (Window.orderBy("bucket")
                   .rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing))
    w_cum = (Window.orderBy("bucket")
                   .rowsBetween(Window.unboundedPreceding, 0))
    # try_divide: a side with zero non-null rows has no CDF -- the
    # gap (and so ks_approx) is NULL, not a divide-by-zero (ANSI)
    gap = F.abs(F.try_divide(F.sum("n_old").over(w_cum),
                             F.sum("n_old").over(w_all))
                - F.try_divide(F.sum("n_new").over(w_cum),
                               F.sum("n_new").over(w_all)))
    ks = vals.select(gap.alias("__g")).agg(
        F.round(F.max("__g"), 6).alias("ks_approx"))
    psi = drift.agg(F.round(F.sum("psi_term"), 6).alias("psi_total"))
    return psi.crossJoin(ks)


def category_drift_summary(drift: DataFrame) -> DataFrame:
    """One-row summary of a :func:`category_drift` frame:
    ``psi_total`` (smoothed) and ``tvd`` -- total variation distance
    0.5 * sum |p - q| over RAW category proportions (KS needs an
    ordering; TVD is its unordered-category counterpart, in [0, 1]).
    NULL ``tvd`` when either side is empty.

    Output: (psi_total, tvd).
    """
    w = _w_all()
    tot_o = F.sum("n_old").over(w)
    tot_n = F.sum("n_new").over(w)
    term = F.abs(F.try_divide(F.col("n_old"), tot_o)
                 - F.try_divide(F.col("n_new"), tot_n))
    psi = drift.agg(F.round(F.sum("psi_term"), 6).alias("psi_total"))
    tvd = drift.select(term.alias("__t")).agg(
        F.round(F.sum("__t") / 2, 6).alias("tvd"))
    return psi.crossJoin(tvd)


def category_drift(old: DataFrame, new: DataFrame,
                   column: str) -> DataFrame:
    """:func:`psi_drift` for a categorical column: buckets are the
    values themselves (NULL is its own bucket, kept distinct from
    every string via a flag-prefixed join key, the
    :func:`dataset_diff` discipline).  Smoothing k is the number of
    distinct buckets observed across BOTH snapshots, computed
    in-plan (a 1-row count over the O(#categories) joined frame), so
    the score needs no caller-supplied domain.

    Output: (category, n_old, n_new, p_old, p_new, psi_term);
    ``category`` is NULL for the null bucket.
    """
    def counts(df: DataFrame, out: str) -> DataFrame:
        key = F.concat(
            F.when(F.col(column).isNull(), F.lit("N"))
             .otherwise(F.lit("V")),
            F.coalesce(F.col(column).cast("string"), F.lit("")))
        return (df.groupBy(key.alias("__bkey"))
                  .agg(F.count(F.lit(1)).alias(out)))

    # materialize the O(#categories) count frames once (the
    # psi_drift rationale): each side feeds the scored join, its own
    # total subtree AND the k-frame -- four corpus scans per side
    # otherwise.  One union job merges both sides on the driver and
    # the smoothing k (= observed-category count) is exact integer
    # bookkeeping over the merged rows; a column whose category
    # domain is NOT control-plane-sized (cardinality above the cap
    # -- misuse of a categorical-drift operator, but it must stay
    # safe) falls back to the executor-resident r15 checkpoint path
    # instead of shipping an unbounded frame to the driver.
    both = _merged_counts(counts(old, "n_old"),
                          counts(new, "n_new"),
                          cap=_LOCAL_COUNTS_CAP)
    if both is not None:
        from pyspark.sql.types import StringType, StructField

        merged, tot_o, tot_n = both
        scored = _psi_score_rows(old.sparkSession, merged, tot_o,
                                 tot_n, len(merged),
                                 StructField("__bkey", StringType(),
                                             False))
    else:
        o = counts(old, "n_old").localCheckpoint()
        n = counts(new, "n_new").localCheckpoint()
        # k is data-dependent; thread it through the smoothing as a
        # broadcast 1-row frame instead of a Python int (no collect)
        k = (o.join(n, "__bkey", "full_outer")
              .agg(F.count(F.lit(1)).alias("__k")))
        scored = _psi_score(o, n, k)
    category = F.when(F.col("__bkey").startswith("V"),
                      F.expr("substring(__bkey, 2)"))
    return (scored
            .select(category.alias("category"),
                    "n_old", "n_new", "p_old", "p_new", "psi_term"))
