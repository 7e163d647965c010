"""Approximate-aggregate contract: sketches must land within their
error bounds of the exact answers, and the query-time HLL must agree
bit-for-bit with the io/ndv scalar recipe."""

from __future__ import annotations

from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY
from esg_decarbonization_data_integration_and_data_pipline_spark.tables import table


def test_sketches_within_error_bounds(spark, sf_dir):
    """p=12 HLL standard error is ~1.6%; allow 10% (plus a floor for
    tiny groups) against the exact anchors the query itself emits."""
    for a in REGISTRY["approx_sketches"].fn(spark, sf_dir).collect():
        assert abs(a.hll_parts - a.exact_parts) <= max(
            3, 0.1 * a.exact_parts)
        assert abs(a.hll_orders - a.exact_orders) <= max(
            3, 0.1 * a.exact_orders)
        assert a.median_price is not None and a.p90_price is not None
        assert a.median_price <= a.p90_price


def test_query_time_hll_matches_sidecar_recipe(spark, sf_dir):
    """hll_group_ndv's distributed estimate must equal folding the
    scalar io/ndv recipe over the same value set -- same registers,
    same estimator, same rounding (the bit-determinism contract that
    makes the DuckDB oracle exact)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.ndv import (
        HLL_M, _register, hll_estimate,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        hll_group_ndv,
    )

    li = table(spark, sf_dir, "lineitem").limit(5000)
    got = {r.l_returnflag: (r.l_partkey, r.l_orderkey)
           for r in hll_group_ndv(li, "l_returnflag",
                                  ["l_partkey", "l_orderkey"])
           .collect()}
    rows = li.select("l_returnflag", "l_partkey",
                     "l_orderkey").collect()
    for col in ("l_partkey", "l_orderkey"):
        by_flag: dict[str, bytearray] = {}
        for r in rows:
            v = r[col]
            if v is None:
                continue
            regs = by_flag.setdefault(r.l_returnflag,
                                      bytearray(HLL_M))
            i, rk = _register(v)
            if rk > regs[i]:
                regs[i] = rk
        for flag, regs in by_flag.items():
            want = hll_estimate(regs)
            gi = 0 if col == "l_partkey" else 1
            assert got[flag][gi] == want, (flag, col)
