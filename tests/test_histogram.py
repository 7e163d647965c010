"""Metadata-answered histograms (io/histogram): per-file bucket-count
sidecars, layout-independent merges, the deterministic quantize/grid/
quantile recipes, coverage and mixed-grid refusals, clamped-edge
conservatism, and purge interplay."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.histogram import (
    HIST_NB,
    build_histogram_index,
    column_hist_quantile,
    column_hist_range_count,
    column_histogram,
    quantize,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    read_current,
)


def _amt(spark, n, parts=2, offset=0):
    """n rows, amt = (id + offset) * 0.25 (exact quarters -- the
    cents quantize at scale 2 is exact), k = id + offset."""
    return (spark.range(n)
            .selectExpr(f"id + {offset} AS k",
                        f"CAST((id + {offset}) * 0.25 AS DOUBLE) AS amt")
            .coalesce(parts))


def test_quantile_within_one_bucket_width(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_amt(spark, 10000, parts=3), t)
    assert build_histogram_index(spark, t, "amt", scale=2) == 3
    h = column_histogram(t, "amt")
    assert h["total"] == 10000 and h["n_null"] == 0
    for q, true_raw in ((0.5, 0.25 * 5000), (0.9, 0.25 * 9000),
                        (0.25, 0.25 * 2500)):
        est = column_hist_quantile(t, "amt", q)
        assert abs(est - true_raw * 100) <= h["width"], (q, est)


def test_integer_column_scale0_is_exact_arithmetic(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_amt(spark, 2048, parts=2), t)
    build_histogram_index(spark, t, "k", scale=0)
    h = column_histogram(t, "k")
    # 2048 values over 512 buckets, width (2047-0)//512+1 = 4
    assert (h["lo"], h["width"], h["nb"]) == (0, 4, HIST_NB)
    assert all(c == 4 for c in h["counts"])
    # the quantile walk answers the bucket lower bound exactly
    assert column_hist_quantile(t, "k", 0.5) == \
        (math.ceil(0.5 * 2048) - 1) // 4 * 4


def test_merge_is_layout_independent(spark, tmp_path):
    one, many = str(tmp_path / "one"), str(tmp_path / "many")
    append_version(_amt(spark, 3000, parts=1), one)
    append_version(_amt(spark, 3000, parts=7), many)
    build_histogram_index(spark, one, "amt", scale=2)
    build_histogram_index(spark, many, "amt", scale=2)
    assert column_histogram(one, "amt") == column_histogram(many, "amt")


def test_range_count_brackets_exact(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_amt(spark, 5000, parts=3), t)
    build_histogram_index(spark, t, "amt", scale=2)
    df = read_current(spark, t)
    for lo, hi in ((100.0, 700.25), (0.0, 10.0), (1200.0, 99999.0),
                   (-50.0, 3.0), (1250.0, 1250.0)):
        lb, ub = column_hist_range_count(t, "amt", lo, hi)
        exact = df.filter(
            (F.floor(F.col("amt") * 100 + 0.5) >= quantize(lo, 2))
            & (F.floor(F.col("amt") * 100 + 0.5) <= quantize(hi, 2))
        ).count()
        assert lb <= exact <= ub, (lo, hi, lb, exact, ub)
    # a probe entirely outside the grid: lb 0, ub only the edge
    lb, ub = column_hist_range_count(t, "amt", 10**6, 10**7)
    assert lb == 0 and ub == column_histogram(t, "amt")["counts"][-1]
    lb, ub = column_hist_range_count(t, "amt", -10**7, -10**6)
    assert lb == 0 and ub == column_histogram(t, "amt")["counts"][0]
    # inverted bounds answer (0, 0)
    assert column_hist_range_count(t, "amt", 9.0, 1.0) == (0, 0)


def test_grid_reuse_and_edge_clamping(spark, tmp_path):
    """A later build REUSES the first grid; out-of-span values clamp
    into the edge buckets, keeping merges well-defined and bounds
    conservative."""
    t = str(tmp_path / "t")
    append_version(_amt(spark, 1000, parts=1), t)
    build_histogram_index(spark, t, "amt", scale=2)
    g1 = column_histogram(t, "amt")
    # append values far ABOVE the first span, then extend coverage
    append_version(_amt(spark, 100, parts=1, offset=10_000), t)
    assert build_histogram_index(spark, t, "amt", scale=2) == 1
    h = column_histogram(t, "amt")
    assert (h["lo"], h["width"]) == (g1["lo"], g1["width"])
    assert h["total"] == 1100
    assert h["counts"][-1] >= 100  # clamped into the top edge bucket
    # the clamped range keeps lb <= exact <= ub: a probe over the
    # clamped values' true range must not overcount its lower bound
    lb, ub = column_hist_range_count(t, "amt", 2500.0, 2525.0)
    assert lb == 0 and ub >= 100


def test_coverage_and_mixed_grid_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_amt(spark, 500, parts=1), t)
    build_histogram_index(spark, t, "amt", scale=2)
    append_version(_amt(spark, 500, parts=1, offset=500), t)
    with pytest.raises(FileNotFoundError, match="no sidecar"):
        column_histogram(t, "amt")
    assert build_histogram_index(spark, t, "amt", scale=2) == 1
    assert build_histogram_index(spark, t, "amt", scale=2) == 0
    column_histogram(t, "amt")  # full coverage now
    # a re-scale demand refuses instead of silently mixing
    with pytest.raises(ValueError, match="scale"):
        build_histogram_index(spark, t, "amt", scale=3)
    # tamper one sidecar's grid -> mixed-grid refusal on read
    import json

    scs = [os.path.join(r, e) for r, _d, es in os.walk(t)
           for e in es if e.startswith(".hist-amt")]
    with open(scs[0], encoding="ascii") as fh:
        payload = json.load(fh)
    payload["width"] += 1
    with open(scs[0], "w", encoding="ascii") as fh:
        json.dump(payload, fh)
    with pytest.raises(ValueError, match="grid"):
        column_histogram(t, "amt")
    with pytest.raises(ValueError, match="different sidecar grids"):
        build_histogram_index(spark, t, "amt", scale=2)


def test_type_and_column_guards(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(
        spark.range(10).selectExpr("id AS k", "concat('s', id) AS s")
        .coalesce(1), t)
    with pytest.raises(ValueError, match="not a column"):
        build_histogram_index(spark, t, "nope")
    with pytest.raises(TypeError, match="numeric"):
        build_histogram_index(spark, t, "s")
    with pytest.raises(ValueError, match="scale"):
        build_histogram_index(spark, t, "k", scale=-1)
    with pytest.raises(ValueError, match="not a column"):
        column_histogram(t, "nope")


def test_empty_column_quantile_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(
        spark.range(5).selectExpr(
            "id AS k", "CAST(NULL AS DOUBLE) AS amt").coalesce(1), t)
    build_histogram_index(spark, t, "amt", scale=2)
    h = column_histogram(t, "amt")
    assert h["total"] == 0 and h["n_null"] == 5
    with pytest.raises(ValueError, match="no ..?n-null values"):
        column_hist_quantile(t, "amt", 0.5)


def test_purge_drops_histogram_sidecars_of_rewritten_files(
        spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.purge import (
        purge_keys_history,
    )

    t = str(tmp_path / "t")
    append_version(_amt(spark, 200, parts=1), t,
                   stats_columns=["k"])
    build_histogram_index(spark, t, "amt", scale=2)
    scs = [os.path.join(r, e) for r, _d, es in os.walk(t)
           for e in es if e.startswith(".hist-amt")]
    assert scs
    purge_keys_history(spark, t, "k", [7])
    # bucket counts retain distribution evidence of the erased row
    assert not any(os.path.exists(p) for p in scs)
    with pytest.raises(FileNotFoundError):
        column_histogram(t, "amt")
    build_histogram_index(spark, t, "amt", scale=2)
    assert column_histogram(t, "amt")["total"] == 199


def test_quantize_recipe_edges():
    assert quantize(1.005, 2) in (100, 101)  # float repr decides...
    assert quantize(1.0, 2) == 100           # ...but exacts are exact
    assert quantize(-1.25, 2) == -125
    assert quantize(3, 0) == 3               # int path: no float trip
    assert quantize(2 ** 60 + 1, 0) == 2 ** 60 + 1


def test_grid_survives_full_copy_on_write_rewrite(spark, tmp_path):
    """A spread-out COW delete can rewrite EVERY file; the next build
    must still reuse the table's existing grid (scanning beyond the
    version's own files), else cross-version merges silently diverge
    (the r15 histogram_quantile_audit first-contact bug)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        delete_keys_version,
    )

    t = str(tmp_path / "t")
    append_version(_amt(spark, 1000, parts=3), t,
                   stats_columns=["k"])
    build_histogram_index(spark, t, "amt", scale=2)
    g1 = column_histogram(t, "amt")
    delete_keys_version(
        spark, t,
        spark.range(1000).filter("id % 7 = 0")
        .selectExpr("id AS k"), "k")
    assert build_histogram_index(spark, t, "amt", scale=2) > 0
    g2 = column_histogram(t, "amt", n=2)
    assert (g2["lo"], g2["width"]) == (g1["lo"], g1["width"])
    assert g2["total"] == 1000 - len(range(0, 1000, 7))
