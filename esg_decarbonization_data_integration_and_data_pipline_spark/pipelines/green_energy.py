"""Quarterly green-energy demand overview (app.green_energy_amount).

Semantics (reference: jobs/renew_green_energy.py:21-350):

- ``cal_renew_total`` (:21-57): per site,
    target_renew         = total_elect x renewable target rate,
    grey_elect           = total_elect - solar - green_elect,
    green_energy_request = max(0, target_renew - solar - green_elect
                                  - green_energy);
- the ``summarize_all_data`` quarter run (:193-344): YTM site totals
  at the quarter-end period first SUBTRACT the customer-reserved
  slices already stored for the quarter (:220-262), feed
  cal_renew_total, join the quarter's base unit price
  (customer '-' / NULL rows of green_purchase) to derive
  predict_price = unit_price x green_energy_request and
  ratio = green_energy / total_elect x 100 (:268-283), attach areas
  (missing -> '其他') (:285-296);
- customer rows are appended back, then an area-level rollup sums the
  measures per (year, quarter, area) and is emitted with
  site='ALL', customer='ALL' and a recomputed ratio (:298-316) --
  the hand-built grouping-set pattern (A6) again;
- existing remarks for the slice are re-attached by
  (year, quarter, area, site, customer) (:322-326).

Spark shape: broadcast joins against small per-site frames, one
rollup aggregation, no quarter loop (the caller prunes one quarter's
partitions). max(0, x) is ``greatest``; zero denominators are NULL
(engine-wide choice; the reference emits inf and filters later).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MEASURES = ["total_elect", "grey_elect", "target_renew", "solar",
            "green_elect", "green_energy", "green_energy_request",
            "unit_price", "predict_price", "actual_amount"]


def renew_total(tables: dict[str, DataFrame]) -> DataFrame:
    """cal_renew_total (reference :21-57). tables:
    elect(site, year, total_elect), solar(site, solar),
    green_elect(site, green_elect), green_energy(site, green_energy),
    renew_target(year, target_rate).
    """
    elect = tables["elect"]
    out = (elect
           .join(F.broadcast(tables["renew_target"]), "year", "left")
           .join(F.broadcast(tables["solar"]), "site", "left")
           .join(F.broadcast(tables["green_elect"]), "site", "left")
           .join(F.broadcast(tables["green_energy"]), "site", "left")
           .na.fill({"target_rate": 0.0, "solar": 0.0, "green_elect": 0.0,
                     "green_energy": 0.0}))
    target = F.col("total_elect") * F.col("target_rate")
    return (out
            .withColumn("target_renew", target)
            .withColumn("grey_elect", F.col("total_elect") - F.col("solar")
                        - F.col("green_elect"))
            .withColumn("green_energy_request",
                        F.greatest(target - F.col("solar")
                                   - F.col("green_elect")
                                   - F.col("green_energy"), F.lit(0.0)))
            .select("site", "year", "total_elect", "grey_elect",
                    "target_renew", "solar", "green_elect", "green_energy",
                    "green_energy_request")
            .dropDuplicates())


def customer_green_energy(tables: dict[str, DataFrame], year: int,
                          quarter_num: int) -> DataFrame:
    """The ``add_customer_data`` branch (reference
    jobs/renew_green_energy.py:100-190): recompute the renew totals
    for the CUSTOMER-reserved slices of app.green_energy_amount and
    re-price them with the per-customer unit price.

    tables:
    customer_rows(year, quarter, area, site, customer, total_elect,
                  solar, green_elect)   -- the quarter's customer slice,
    renew_target(year, target_rate),
    unit_price(site, year, customer, unit_price, actual_amount)
                                        -- customer rows of
                                           app.green_purchase (:141),
    remarks(year, quarter, area, site, customer, remark).

    green_energy is forced to 0 for customer rows (:126-128) before
    the renew-total formulas, so green_energy_request = max(0,
    target - solar - green_elect). The per-customer unit-price merge
    keys on (site, year, customer) (:143-144); predict_price and
    ratio follow the site-row formulas (:147-152). The caller
    upserts the result with replace_keys(year, quarter, area,
    customer) -- the reference's row-count-dependent DELETE branches
    (:171-191) collapse into one idempotent merge.

    Divergence, on purpose: the reference feeds the customer slice
    through cal_renew_total's site-keyed merges, which cross-product
    measures as soon as one site holds two customers (and its
    (site, year) re-attach then multiplies the keys again). Here the
    renew formulas run PER CUSTOMER ROW -- identical output for the
    reference's effective one-customer-per-site slices, still keyed
    correctly by (site, customer) beyond them. The year/quarter
    arguments slice the input to the requested quarter, mirroring
    the reference's WHERE clauses (:115-141).
    """
    cust = (tables["customer_rows"]
            .filter((F.col("year") == year)
                    & (F.col("quarter") == quarter_num)))
    target = F.col("total_elect") * F.col("target_rate")
    base = (cust
            .join(F.broadcast(tables["renew_target"]), "year", "left")
            .na.fill({"target_rate": 0.0, "solar": 0.0,
                      "green_elect": 0.0})
            .withColumn("green_energy", F.lit(0.0))
            .withColumn("target_renew", target)
            .withColumn("grey_elect", F.col("total_elect")
                        - F.col("solar") - F.col("green_elect"))
            .withColumn("green_energy_request",
                        F.greatest(target - F.col("solar")
                                   - F.col("green_elect")
                                   - F.col("green_energy"), F.lit(0.0)))
            .drop("target_rate"))
    out = (base.join(F.broadcast(tables["unit_price"]),
                     ["site", "year", "customer"], "left")
               .na.fill({"unit_price": 0.0})
               .withColumn("predict_price", F.col("unit_price")
                           * F.col("green_energy_request"))
               .withColumn("ratio", F.col("green_energy")
                           / F.nullif(F.col("total_elect"), F.lit(0.0))
                           * 100))
    return out.join(F.broadcast(tables["remarks"]),
                    ["year", "quarter", "area", "site", "customer"],
                    "left")


def _minus_customer(src: DataFrame, add: DataFrame, col: str) -> DataFrame:
    reserved = add.groupBy("site").agg(F.sum(col).alias("__r"))
    return (src.join(F.broadcast(reserved), "site", "left")
            .na.fill({"__r": 0.0})
            .withColumn(col, F.col(col) - F.col("__r"))
            .drop("__r"))


def green_energy_amount(tables: dict[str, DataFrame], year: int,
                        quarter_num: int) -> DataFrame:
    """The summarize_all_data assembly (reference :193-344). tables:
    elect_src(site, total_elect)            -- YTM at quarter end,
    solar_src(site, solar), green_elect_src(site, green_elect),
    green_energy_src(site, green_energy)    -- window sum,
    customer_rows(year, quarter, area, site, customer, total_elect,
                  target_renew, solar, green_elect, grey_elect,
                  green_energy, predict_price, green_energy_request,
                  actual_amount)            -- reserved slices,
    renew_target(year, target_rate),
    unit_price(site, unit_price, actual_amount)  -- base rows only,
    area_mapping(site, area),
    remarks(year, quarter, area, site, customer, remark).
    """
    cust = tables["customer_rows"]
    elect = (_minus_customer(tables["elect_src"], cust, "total_elect")
             .withColumn("year", F.lit(year)))
    solar = _minus_customer(tables["solar_src"], cust, "solar")
    grelect = _minus_customer(tables["green_elect_src"], cust, "green_elect")

    base = renew_total({"elect": elect, "solar": solar,
                        "green_elect": grelect,
                        "green_energy": tables["green_energy_src"],
                        "renew_target": tables["renew_target"]})

    site_rows = (base
                 .join(F.broadcast(tables["unit_price"]), "site", "left")
                 .na.fill({"unit_price": 0.0, "actual_amount": 0.0})
                 .withColumn("predict_price", F.col("unit_price")
                             * F.col("green_energy_request"))
                 .withColumn("ratio", F.col("green_energy")
                             / F.nullif(F.col("total_elect"), F.lit(0.0))
                             * 100)
                 .join(F.broadcast(tables["area_mapping"].dropDuplicates()),
                       "site", "left")
                 .na.fill({"area": "其他"})
                 .withColumn("quarter", F.lit(quarter_num))
                 .withColumn("customer", F.lit("")))

    with_cust = (site_rows
                 .unionByName(cust.withColumn("unit_price", F.lit(0.0))
                                  .withColumn("ratio", F.lit(None)
                                              .cast("double")),
                              allowMissingColumns=False)
                 .na.fill({c: 0.0 for c in MEASURES}))

    rollup = (with_cust
              .groupBy("year", "quarter", "area")
              .agg(*[F.sum(c).alias(c) for c in MEASURES])
              .withColumn("site", F.lit("ALL"))
              .withColumn("customer", F.lit("ALL"))
              .withColumn("ratio", F.col("green_energy")
                          / F.nullif(F.col("total_elect"), F.lit(0.0))
                          * 100))

    cols = ["year", "quarter", "area", "site", "customer", "ratio",
            *MEASURES]
    final = rollup.select(*cols).unionByName(with_cust.select(*cols))
    return final.join(F.broadcast(tables["remarks"]),
                      ["year", "quarter", "area", "site", "customer"],
                      "left")


def target_adjust(target_all: DataFrame,
                  target_filter: DataFrame) -> DataFrame:
    """Green-energy target adjustment (reference:
    jobs/staging_cal.py:14-26 green_energy_target_adjust): the YTM
    becomes the amount, minus the filtered slice's amount attached
    to every row.

    The reference cross-joins the (one-row) filter slice and skips
    the subtraction when it is empty; a one-row sum aggregate gives
    both behaviors in one plan -- empty sums to null, coalesced to
    zero -- and stays deterministic if the slice ever holds several
    rows (they sum instead of fanning out the cross join).
    """
    f = target_filter.agg(F.sum("amount").alias("__f_amount"))
    return (target_all
            .crossJoin(F.broadcast(f))
            .select("period_start", "ytm_amount",
                    (F.col("ytm_amount")
                     - F.coalesce("__f_amount", F.lit(0.0))).alias("amount")))
