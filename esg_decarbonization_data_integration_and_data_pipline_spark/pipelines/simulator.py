"""Electricity-simulation pipeline: the reference's heaviest query
(SURVEY.md §3.3, reference: Model/Factory_elect_simulator_update.py:
672-1048), re-expressed as pure DataFrame algebra.

Reference stages -> Spark shapes:
1. pivot budget/actual MOH long->wide (R2)        -> groupBy().pivot()
2. per-(site, plant) trend rate via CAGR (A8)     -> min_by/max_by agg
3. future-year synthesis loop 'for x in 1..H'     -> cross join with
   sequence(1, H) + pow(1+rate, x) + add_months(date, 12x); the
   reference's Python year loop disappears into one plan
4. month-share allocation of yearly forecasts     -> window share of
   historical month totals (W5)
5. version bump 'V'+(max+1) (F14)                 -> parse/max/concat
The external scoring API stage (reference :652-669) is the stubbed
mapInPandas in plans/queries_misc.external_model_scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.finance import cagr_agg
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.windows import (
    share_of_total,
)


def trend_rates(history: DataFrame) -> DataFrame:
    """history(site, plant, year, month, amount) -> per-(site, plant)
    growth rate from yearly totals; clamped to [-0.5, 0.5] like the
    reference's growth-rate clamps (reference: :574-649)."""
    yearly = (history.groupBy("site", "plant", "year")
                     .agg(F.sum("amount").alias("total")))
    rates = (yearly.groupBy("site", "plant")
                   .agg(cagr_agg("total", "year").alias("rate"),
                        F.expr("max_by(total, year)").alias("last_total"),
                        F.max("year").alias("last_year")))
    return rates.withColumn(
        "rate",
        F.least(F.greatest(F.coalesce("rate", F.lit(0.0)), F.lit(-0.5)),
                F.lit(0.5)))


def month_shares(history: DataFrame) -> DataFrame:
    """Historical share of each calendar month within (site, plant) --
    the allocation key for spreading yearly forecasts (reference
    month-share allocation: :424-541)."""
    m = (history.groupBy("site", "plant", "month")
                .agg(F.sum("amount").alias("m_amount")))
    return (share_of_total(m, ["site", "plant"], "m_amount", out_col="share")
            .select("site", "plant", "month", "share"))


def simulate_future(history: DataFrame, horizon: int) -> DataFrame:
    """Synthesize monthly forecasts for the next ``horizon`` years:
    yearly = last_total * (1+rate)^x, spread by month share.

    Output: (site, plant, year, month, amount, kind='forecast').
    """
    rates = trend_rates(history)
    shares = month_shares(history)
    offsets = F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("x")
    future_years = (rates.select("site", "plant", "rate", "last_total",
                                 "last_year", offsets)
                         .withColumn("year", F.col("last_year") + F.col("x"))
                         .withColumn("y_amount",
                                     F.col("last_total")
                                     * F.pow(1 + F.col("rate"), F.col("x"))))
    # Final amounts are cents (2 decimals) via the shared floor idiom
    # (ROUNDLOG rule): forecast values are ~1e6 so their double ulp is
    # ~1e-10; summation-order noise between engines makes a 6-decimal
    # boundary a coin-flip (~1e-3/row -- observed once at sf0.01),
    # while 2 decimals puts boundaries 1e4x further from the noise,
    # and floor(x*100+0.5) ties identically on both engines.
    monthly = (future_years.join(shares, ["site", "plant"])
               .withColumn("amount",
                           F.floor(F.col("y_amount") * F.col("share")
                                   * 100 + 0.5) / 100)
               .select("site", "plant", "year", "month", "amount")
               .withColumn("kind", F.lit("forecast")))
    return monthly


def bump_version(versions: DataFrame,
                 version_col: str = "version") -> str:
    """'V'+(max numeric suffix + 1) -- the reference's read-modify-
    write version bump (reference: :938-947; single-writer assumption
    documented in SURVEY §7.3). Collects ONE scalar."""
    row = versions.select(
        F.max(F.substring(F.col(version_col), 2, 10).cast("int")).alias("n")
    ).collect()[0]
    return f"V{(row.n or 0) + 1}"


def quantile_floor_rates(rates: DataFrame,
                         rate_col: str = "rate",
                         q: float = 0.25) -> DataFrame:
    """Replace NEGATIVE trend rates with the q-quantile of the
    POSITIVE rates (reference:
    Model/Factory_elect_simulator_update.py:214-237
    trend_rate_generator -- its cagr/yoy branches substitute
    np.quantile(positive_rates, 0.25) for any negative rate, so a
    shrinking plant is assumed to rebound at the conservative end of
    the growing plants' distribution).

    The quantile is EXACT percentile() with linear interpolation
    (numpy's default), computed once and attached as a broadcast
    scalar; no positive rates at all leaves negatives unchanged
    (coalesce), mirroring the reference's empty-slice behavior.
    """
    floor = (rates.filter(F.col(rate_col) > 0)
                  .agg(F.expr(f"percentile({rate_col}, {q})")
                        .alias("__floor")))
    return (rates.crossJoin(F.broadcast(floor))
                 .withColumn(rate_col,
                             F.when(F.col(rate_col) < 0,
                                    F.coalesce("__floor", F.col(rate_col)))
                              .otherwise(F.col(rate_col)))
                 .drop("__floor"))


def point_fix_copy_month(df: DataFrame, plant: str, src_month: str,
                         dst_month: str, plant_col: str = "plant",
                         date_col: str = "datetime") -> DataFrame:
    """History point-fix: overwrite one plant-month with a copy of
    another month's rows (reference:
    Model/Factory_elect_simulator_update.py:238-248
    ``history_data_fixer`` -- WOK's broken 2022-12 readings are
    replaced by its 2022-11 rows re-dated to December, on both the
    modeling frame and the raw-history frame).

    Pure relational form: drop the (plant, dst) slice, union the
    (plant, src) slice re-dated to dst. Narrow except for the one
    union; no driver-side mutation, idempotent under re-run.
    """
    dtype = df.schema[date_col].dataType
    is_plant = F.col(plant_col) == plant
    src = (df.filter(is_plant & (F.col(date_col) == F.lit(src_month).cast(dtype)))
             .withColumn(date_col, F.lit(dst_month).cast(dtype)))
    kept = df.filter(~(is_plant & (F.col(date_col) == F.lit(dst_month).cast(dtype))))
    return kept.unionByName(src)


def attach_observed_max(df: DataFrame, keys: list[str],
                        measures: list[str],
                        date_col: str = "datetime") -> DataFrame:
    """Attach per-key ``<date_col>_max`` = latest date at which ALL
    ``measures`` are observed (reference:
    Model/Factory_elect_simulator_update.py:259-263 -- the simulator
    trims each (plant, bo) series at its last fully-observed month
    before fitting trends, so half-reported months never skew rates).

    The per-key max is a tiny dimension (one row per plant x bo):
    broadcast back, no shuffle of the fact side."""
    complete = df
    for m in measures:
        complete = complete.filter(F.col(m).isNotNull())
    mx = complete.groupBy(*keys).agg(
        F.max(date_col).alias(f"{date_col}_max"))
    return df.join(F.broadcast(mx), keys, "left")


def actuals_over_forecast(forecast: DataFrame, actuals: DataFrame,
                          workspace_sites: list[str], target_year: int,
                          base_year: int) -> DataFrame:
    """Merge actual meter readings over model forecasts, extending
    short actual series by the rolling two-year month mean
    (reference: Model/Factory_elect_simulator_update.py:387-422
    ``mfg_workspace_elec_generator``).

    Inputs (site grain, monthly):
      forecast(site, year, month, amount) -- the predict category of
        the latest elect_target_month version;
      actuals(site, year, month, amount)  -- metered workspace rows.

    Semantics, stage by stage:
      1. non-workspace sites keep their forecast rows untouched;
      2. workspace sites start from their actual rows (reference
         :402-412 aggregates meters to site grain first -- callers
         pass site-grain rows); forecast rows for workspace sites
         fill only the (site, year, month) slots with NO actual --
         an actual ALWAYS wins on conflict, keeping the output at
         one row per (site, year, month);
      3. every workspace year AFTER the last actual year is filled
         with mean(amount of the previous TWO years, positive rows
         only) per (site, month) -- applied iteratively so year N+2
         averages over N+1's synthesized values (reference :415-420);
      4. of the workspace side, only years >= ``base_year`` survive
         into the output (reference :421).

    The year loop is a driver-side PLAN loop (no collect): each round
    is one groupBy over <= 2 years of site-grain rows; horizon is
    target_year - max actual year (single digits), matching the
    dup_clusters iterate-the-plan pattern.
    """
    in_ws = F.col("site").isin(list(workspace_sites))
    fixed = forecast.filter(~in_ws)
    ws = actuals.filter(in_ws).select("site", "year", "month", "amount")
    ws_forecast = (forecast.filter(in_ws)
                   .select("site", "year", "month", "amount")
                   .join(ws.select("site", "year", "month"),
                         ["site", "year", "month"], "left_anti"))
    ws = ws.unionByName(ws_forecast)
    max_year_row = ws.agg(F.max("year").alias("y")).collect()[0]
    if max_year_row.y is None:
        # no workspace rows at all: forecast-only passthrough
        return fixed.select("site", "year", "month", "amount")
    ws_max_year = int(max_year_row.y)
    for step in range(1, target_year - ws_max_year + 1):
        new_year = ws_max_year + step
        prev = ws.filter((F.col("year") >= new_year - 2)
                         & (F.col("year") < new_year)
                         & (F.col("amount") > 0))
        synth = (prev.groupBy("site", "month")
                     .agg(F.avg("amount").alias("amount"))
                     .withColumn("year", F.lit(new_year))
                     .select("site", "year", "month", "amount"))
        ws = ws.unionByName(synth)
    return (fixed.select("site", "year", "month", "amount")
                 .unionByName(ws.filter(F.col("year") >= base_year)))


def ten_month_real_power(power: DataFrame) -> DataFrame:
    """Ten-month real power totals with annualized dormitory load
    (reference: Model/Factory_elect_simulator_update.py:172-192
    real_power_computer): months January-October only, summed per
    (plant, site, year); dorm power is scaled by 12/month_count; only
    complete ten-month groups survive.

    power(plant, site, period_start, factory_kwh, dorm_kwh).
    Duplicate uploads for one month sum FIRST (per-month
    pre-aggregation), so month_count counts distinct months -- a
    re-uploaded row can neither fake completeness nor disqualify a
    complete year (the reference's row-count 'size' would do both).
    """
    ten = power.filter(F.month("period_start") < 11)
    monthly = (ten.groupBy("plant", "site",
                           F.year("period_start").alias("year"),
                           F.month("period_start").alias("month"))
                  .agg(F.sum("factory_kwh").alias("factory_kwh"),
                       F.sum("dorm_kwh").alias("dorm_kwh")))
    agg = (monthly.groupBy("plant", "site", "year")
                  .agg(F.sum("factory_kwh").alias("factory_kwh"),
                       F.sum("dorm_kwh").alias("dorm_kwh"),
                       F.count(F.lit(1)).alias("month_count")))
    return (agg.withColumn("ten_month_real",
                           F.col("factory_kwh")
                           + 12 * F.col("dorm_kwh") / F.col("month_count"))
               .filter(F.col("month_count") == 10))
