"""Join operators beyond plain equi-joins (SURVEY.md §2.3 J4-J11).

Equi-joins (J1/J2/J3/J5) need no helper -- ``df.join`` with Catalyst
choosing broadcast-hash for small dims is the whole story. The
helpers here cover the patterns the reference builds by hand:

- interval (range) join: tariff summer-period lookup
  (reference: jobs/staging_to_app.py:129-140)
- as-of (nearest <=) join: latest guideline_date per area
  (reference: jobs/staging_to_app.py:104-116)
- coalescing outer join: source-priority merge CSR-over-ESGI
  (reference: jobs/fix_data.py:351-359 -- a row loop there; a single
  ``coalesce`` projection here)
- anti/semi joins via key-set difference / isin
  (reference: jobs/fix_data.py:65,137; jobs/staging_to_app.py:449)
- cross-join scalar broadcast (reference: jobs/staging_cal.py:17-18)

Scale notes: the as-of join is expressed as equi-join on the keys +
range filter + window top-1 -- one shuffle on the join keys, and when
the right side (tariff/guideline dims) is small Catalyst broadcasts
it so only the window shuffles. Skewed left keys are handled by AQE
skew-join splitting (on by default in session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.scale import (
    plan_size_bytes,
)


def interval_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column,
                  point_col: str, lo_col: str, hi_col: str,
                  how: str = "inner") -> DataFrame:
    """Equi-join + BETWEEN range predicate in one join condition (J6).

    Catalyst evaluates the band predicate inside the hash join, so no
    post-join filter blowup; with a broadcast right side this is a
    broadcast-nested-band probe, the plan you want for tariff lookups
    at any scale.
    """
    if isinstance(on, Column):
        cond = on
    else:
        cond = None
        for k in on:
            c = left[k] == right[k]
            cond = c if cond is None else (cond & c)
    band = left[point_col].between(right[lo_col], right[hi_col])
    cond = band if cond is None else (cond & band)
    return left.join(right, cond, how)


def _asof_candidates(left: DataFrame, right: DataFrame, on: Sequence[str],
                     left_time: str, right_time: str, lid: str):
    """Shared front half of both as-of strategies: surrogate-id'd left,
    fully-renamed right, and the candidate left-join (equi keys + time
    range in one join condition)."""
    left = left.withColumn(lid, F.monotonically_increasing_id())
    # rename EVERY right column so nothing is ambiguous in the join
    # or the pick ordering (left and right may share the time name)
    right_cols = right.columns
    r = right
    for c in right_cols:
        r = r.withColumnRenamed(c, f"__r_{c}")
    cond = None
    for k in on:
        c = left[k] == r[f"__r_{k}"]
        cond = c if cond is None else (cond & c)
    time_ok = r[f"__r_{right_time}"] <= left[left_time]
    cond = time_ok if cond is None else (cond & time_ok)
    joined = left.join(r, cond, "left").drop(*[f"__r_{k}" for k in on])
    return left, joined, right_cols


def _restore_right_names(picked: DataFrame, left: DataFrame,
                         on: Sequence[str], right_cols: Sequence[str],
                         lid: str) -> DataFrame:
    """Restore right-column names; collisions with left keep a _right
    suffix (pandas merge_asof convention)."""
    left_names = set(left.columns) - {lid}
    for c in right_cols:
        if c in on:
            continue
        new = c if c not in left_names else f"{c}_right"
        picked = picked.withColumnRenamed(f"__r_{c}", new)
    return picked


# single source of truth in operators/scale.py (shared with the
# kernel-parallelism rescue); the private alias keeps this module's
# callers and tests stable
_plan_size_bytes = plan_size_bytes


# right/left ESTIMATED-ROW ratio above which the agg strategy is
# chosen: many more right rows than left rows predicts high fan-in
# (many candidates per left row), where max_by's map-side partial
# collapse saves the most shuffle bytes (the window strategy ships
# every candidate).
_ASOF_AGG_RATIO = 8

# Approximate per-column widths (bytes) mirroring Catalyst's
# DataType.defaultSize, used to turn plan sizeInBytes into a row
# estimate. A raw byte ratio is a poor fan-in proxy when the two
# sides have very different row widths (a wide left side would
# suppress 'agg' even at high fan-in) -- normalizing by schema width
# makes the ratio a row-count proxy instead.
_TYPE_WIDTHS = {
    "boolean": 1, "tinyint": 1, "smallint": 2, "int": 4, "date": 4,
    "float": 4, "bigint": 8, "double": 8, "timestamp": 8,
    "timestamp_ntz": 8, "string": 20, "binary": 40,
}


def _est_row_width(df: DataFrame) -> int:
    return max(1, sum(_TYPE_WIDTHS.get(f.dataType.simpleString(), 24)
                      for f in df.schema.fields))


def _pick_asof_strategy(left: DataFrame, right: DataFrame) -> str:
    lb, rb = _plan_size_bytes(left), _plan_size_bytes(right)
    if lb is None or rb is None or lb == 0:
        return "window"
    lrows = lb / _est_row_width(left)
    rrows = rb / _est_row_width(right)
    if lrows <= 0:
        return "window"
    return "agg" if rrows >= _ASOF_AGG_RATIO * lrows else "window"


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_time: str, right_time: str,
              tiebreak: Sequence[str] | None = None,
              strategy: str = "auto") -> DataFrame:
    """As-of join: for each left row, the single right row with the
    greatest ``right_time`` <= ``left_time`` within equal ``on`` keys
    (J7). Left rows with no match are kept (nulls on right columns).
    Right columns colliding with left names come back with a
    ``_right`` suffix (pandas merge_asof convention).

    ``tiebreak``: RIGHT-side column names ordered DESCENDING after
    the time, making the pick deterministic when several right rows
    share the max ``right_time``.

    Two strategies (identical results, property-tested against brute
    force; measured on the registered sf0.1 query, noop sink):

    - ``window``: equi-join + range filter + row_number top-1 per
      surrogate id. One exchange of the candidate set, ONE sort.
      Wins at moderate fan-in (~1.2 s vs ~2.1 s at sf0.1,
      ~15 candidates/row) because max_by's struct buffer is not
      hash-aggregable, so the agg strategy compiles to SortAggregate
      -- two sorts (partial + final) instead of one.
    - ``agg``: max_by(struct(right cols), struct(time, tiebreaks))
      per surrogate id. The PARTIAL aggregate collapses candidates
      map-side, so only ~|left| small structs cross the exchange
      instead of every candidate row. The choice for real-cluster
      (network-shuffle) deployments with high fan-in, where shuffle
      bytes dominate the extra sort.
    - ``auto`` (default): picks from the optimizer's size estimates
      (``_pick_asof_strategy``): >= 8x more ESTIMATED RIGHT ROWS than
      left (plan sizeInBytes normalized by schema row width, so a
      wide left side can't mask high fan-in) predicts where the agg's
      map-side collapse pays for its extra sort; otherwise window.
      COST NOTE: ``auto`` eagerly runs analysis + optimization of
      both inputs at call time to read the stats (the same statistic
      broadcast planning reads -- metadata-only, no Spark job, but
      not free on very deep plans; milliseconds typically). Callers
      that know their shape, or that build very deep plans, keep the
      explicit ``window``/``agg`` override.
    """
    if strategy == "auto":
        strategy = _pick_asof_strategy(left, right)
    if strategy == "agg":
        return _asof_join_agg(left, right, on, left_time, right_time, tiebreak)
    if strategy != "window":
        raise ValueError(f"unknown asof strategy: {strategy!r}")
    lid = "__asof_lid"
    left, joined, right_cols = _asof_candidates(
        left, right, on, left_time, right_time, lid)
    order = [F.col(f"__r_{right_time}").desc_nulls_last()]
    if tiebreak:
        order += [F.col(f"__r_{c}").desc() for c in tiebreak]
    w = Window.partitionBy(lid).orderBy(*order)
    picked = (joined.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn", lid))
    return _restore_right_names(picked, left, on, right_cols, lid)


def _asof_join_agg(left: DataFrame, right: DataFrame, on: Sequence[str],
                   left_time: str, right_time: str,
                   tiebreak: Sequence[str] | None = None) -> DataFrame:
    """max_by-aggregation as-of strategy (see asof_join docstring for
    the measured trade-off). Groups on the 8-byte surrogate id only
    (wide left columns carried via first(), identical within a group);
    struct ordering is lexicographic with nulls smallest, so the
    all-null no-match row never beats a real candidate and an all-null
    group yields null right columns, preserving left-join semantics."""
    lid = "__asof_lid"
    left, joined, right_cols = _asof_candidates(
        left, right, on, left_time, right_time, lid)
    payload = [f"__r_{c}" for c in right_cols if c not in on]
    ord_cols = [F.col(f"__r_{right_time}")]
    if tiebreak:
        ord_cols += [F.col(f"__r_{c}") for c in tiebreak]
    left_cols = [c for c in left.columns if c != lid]
    picked = (joined.groupBy(lid)
                    .agg(*[F.first(c).alias(c) for c in left_cols],
                         F.max_by(F.struct(*payload), F.struct(*ord_cols))
                          .alias("__mb")))
    for c in payload:
        picked = picked.withColumn(c, F.col("__mb").getField(c))
    picked = picked.drop("__mb", lid)
    return _restore_right_names(picked, left, on, right_cols, lid)


def coalescing_outer_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                          coalesce_cols: Sequence[str],
                          how: str = "full_outer") -> DataFrame:
    """Outer join where shared value columns merge with left priority
    (J11). Replaces the reference's per-row ``if isna(x): x = y``
    loop with a single vectorized ``coalesce`` projection.
    """
    on = list(on)
    lsel = left.select(*on, *[F.col(c).alias(f"__l_{c}") for c in coalesce_cols])
    rsel = right.select(*on, *[F.col(c).alias(f"__r_{c}") for c in coalesce_cols])
    out = lsel.join(rsel, on, how)
    for c in coalesce_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__l_{c}"), F.col(f"__r_{c}")))
    return out.drop(*[f"__l_{c}" for c in coalesce_cols],
                    *[f"__r_{c}" for c in coalesce_cols])


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of left whose keys do not appear in right (J9/U2)."""
    return left.join(right, list(on), "left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of left whose keys appear in right (J10/U3); no right columns."""
    return left.join(right, list(on), "left_semi")


def attach_scalar(df: DataFrame, scalar_df: DataFrame) -> DataFrame:
    """Cross-join a 1-row aggregate onto every row (J4).

    The reference uses ``merge(how='cross')`` to attach base-year
    totals (jobs/staging_cal.py:17-18,177). Broadcast makes this a
    map-side literal attach -- zero shuffle.
    """
    return df.crossJoin(F.broadcast(scalar_df))
