"""Green-power transfer reconciliation (meter-group packaging).

Semantics (reference: jobs/staging_to_app.py:282-385
green_elec_transfer_account): transferred green power arrives at
meter granularity; meters belong to provider groups
(decarb_ww_meter_group + decarb_ww_meter_group_mapping); the account
view aggregates transfers to (group, provider, month), attaches the
contracted volume, and reports fulfillment and remainder.

Spark shape: two broadcast dim joins (groups are small), one
aggregate, one left join to contracts -- the reference's chained
multi-key merges (J5) with no month loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def transfer_account(tables: dict[str, DataFrame]) -> DataFrame:
    """tables:
    transfers(meter_code, provider_name, amount, period_start),
    meter_group(meter_code, provider_name, group_id),
    group_mapping(group_id, group_name),
    contracts(group_id, provider_name, period_start, contract_amount).

    Output per (group_id, group_name, provider_name, period_start):
    transferred, contract_amount, fulfillment_rate, remaining.
    """
    transfers = tables["transfers"]
    groups = tables["meter_group"]
    names = tables["group_mapping"]
    contracts = tables["contracts"]

    grouped = (transfers
               .join(F.broadcast(groups), ["meter_code", "provider_name"])
               .groupBy("group_id", "provider_name", "period_start")
               .agg(F.sum("amount").alias("transferred")))
    with_contract = (grouped
                     .join(contracts,
                           ["group_id", "provider_name", "period_start"],
                           "full_outer")
                     .na.fill({"transferred": 0.0}))
    return (with_contract
            .join(F.broadcast(names), "group_id", "left")
            .withColumn("fulfillment_rate",
                        F.round(F.col("transferred")
                                / F.nullif(F.col("contract_amount"),
                                           F.lit(0.0)), 6))
            .withColumn("remaining",
                        F.greatest(F.coalesce(F.col("contract_amount"),
                                              F.lit(0.0))
                                   - F.col("transferred"), F.lit(0.0)))
            .select("group_id", "group_name", "provider_name", "period_start",
                    "transferred", "contract_amount", "fulfillment_rate",
                    "remaining"))
