"""Metadata-answered NDV (io/ndv): per-file HLL register sidecars,
layout-independent merges, coverage refusal, type guards, rename and
purge interplay."""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.ndv import (
    HLL_M, _register, build_ndv_index, column_ndv, hll_estimate,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version, current_version, read_current,
)


def _kv(spark, n, parts=2):
    return (spark.range(n)
            .selectExpr("id AS k", "concat('v', id % 97) AS tag")
            .coalesce(parts))


def test_estimate_within_two_percent_at_5k(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, 5000, parts=3), t)
    assert build_ndv_index(spark, t, "k") == 3
    est = column_ndv(t, "k")
    assert abs(est - 5000) / 5000 < 0.02
    build_ndv_index(spark, t, "tag")
    est_tag = column_ndv(t, "tag")
    assert est_tag == 97  # linear-counting branch: tiny NDV is exact


def test_estimate_is_layout_independent(spark, tmp_path):
    one, many = str(tmp_path / "one"), str(tmp_path / "many")
    append_version(_kv(spark, 3000, parts=1), one)
    append_version(_kv(spark, 3000, parts=6), many)
    build_ndv_index(spark, one, "k")
    build_ndv_index(spark, many, "k")
    # registers merge by max -> identical whatever the file split
    assert column_ndv(one, "k") == column_ndv(many, "k")


def test_missing_sidecars_refused_unless_partial(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, 100, parts=1), t)
    build_ndv_index(spark, t, "k")
    append_version(_kv(spark, 100, parts=1), t)  # new file, no sidecar
    with pytest.raises(FileNotFoundError, match="no sidecar"):
        column_ndv(t, "k")
    assert column_ndv(t, "k", allow_partial=True) == \
        column_ndv(t, "k", n=1)
    assert build_ndv_index(spark, t, "k") == 1  # only the new file
    assert build_ndv_index(spark, t, "k") == 0  # idempotent
    column_ndv(t, "k")  # full coverage now


def test_pre_evolution_files_contribute_nothing(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, 50, parts=1), t)
    evolved = (_kv(spark, 50, parts=1)
               .selectExpr("k", "tag", "concat('x', k % 7) AS extra"))
    append_version(evolved, t, merge_schema=True)
    build_ndv_index(spark, t, "extra")
    # only the evolved file carries values; the old file is all-NULL
    assert column_ndv(t, "extra") == 7


def test_type_and_column_guards(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(spark.createDataFrame([(1, 2.5)],
                                         "k bigint, x double"), t)
    with pytest.raises(TypeError, match="only integer and string"):
        build_ndv_index(spark, t, "x")
    with pytest.raises(ValueError, match="not a column"):
        build_ndv_index(spark, t, "nope")


def test_rename_keeps_sidecars_valid(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        rename_column,
    )

    t = str(tmp_path / "t")
    append_version(_kv(spark, 500, parts=2), t)
    build_ndv_index(spark, t, "k")
    before = column_ndv(t, "k")
    rename_column(spark, t, "k", "key_id")
    # physical-name keying: the rename invalidates nothing and the
    # new logical name resolves the same sidecars
    assert column_ndv(t, "key_id") == before
    assert build_ndv_index(spark, t, "key_id") == 0


def test_purge_drops_ndv_sidecars_of_rewritten_files(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.purge import (
        purge_keys_history,
    )

    t = str(tmp_path / "t")
    append_version(_kv(spark, 200, parts=1), t,
                   stats_columns=["k"])
    build_ndv_index(spark, t, "k")
    sidecars = [os.path.join(dp, f)
                for dp, _dn, fs in os.walk(t) for f in fs
                if f.startswith(".ndv-")]
    assert sidecars
    purge_keys_history(spark, t, "k", [7])
    # the rewritten file's register sidecar retained hashed evidence
    # of the erased key -- purge must have deleted it
    assert not any(os.path.exists(p) for p in sidecars)
    with pytest.raises(FileNotFoundError):
        column_ndv(t, "k")
    build_ndv_index(spark, t, "k")
    assert abs(column_ndv(t, "k") - 199) <= 199 * 0.05


def test_recipe_edges():
    # empty registers -> 0; one value -> 1 (linear counting)
    assert hll_estimate(bytearray(HLL_M)) == 0
    regs = bytearray(HLL_M)
    i, r = _register("solo")
    regs[i] = r
    assert hll_estimate(regs) == 1
    # int and its string form share the canonical encoding
    assert _register(42) == _register("42")


def test_vectorized_registers_match_scalar_recipe():
    """The numpy batch build (r15: md5-digest prefix + integer
    bit-length binary search + maximum.at) must be bit-identical to
    folding the scalar _register recipe, across sign, width, empty,
    unicode (incl. NBSP and astral) and long-string inputs."""
    import random

    from esg_decarbonization_data_integration_and_data_pipline_spark.io.ndv import (
        _registers_from_values,
    )

    rng = random.Random(7)
    vals = [str(rng.randint(-(10 ** 12), 10 ** 12))
            for _ in range(2000)]
    vals += ["", "héllo", "naïve nbsp",
             "日本語", "\U0001f600", "a" * 500, "0", "-0"]
    expect = bytearray(HLL_M)
    for v in vals:
        i, r = _register(v)
        if r > expect[i]:
            expect[i] = r
    assert bytes(_registers_from_values(vals)) == bytes(expect)
    assert bytes(_registers_from_values([])) == bytes(HLL_M)


def test_estimator_rounding_is_half_up_not_bankers():
    """floor(est + 0.5) both engines -- a synthetic register array
    whose linear-counting estimate lands just above a .5 boundary
    must round UP (Python round() would banker's-round an exact .5
    and the two engines would disagree near the boundary)."""
    import math

    # pick zeros so est = m * ln(m/zeros) straddles k + 0.5 upward
    for zeros in (4095, 4000, 3000, 100, 1):
        est = HLL_M * math.log(HLL_M / zeros)
        regs = bytearray(HLL_M)
        n_filled = HLL_M - zeros
        for i in range(n_filled):
            regs[i] = 1
        assert hll_estimate(regs) == int(math.floor(est + 0.5))


def test_stale_precision_sidecar_refused(spark, tmp_path):
    """A sidecar built under a different p (or truncated) must raise
    a rebuild demand, never merge into a skewed estimate."""
    import json

    t = str(tmp_path / "t")
    append_version(_kv(spark, 100, parts=1), t)
    build_ndv_index(spark, t, "k")
    sc = [os.path.join(dp, f)
          for dp, _dn, fs in os.walk(t) for f in fs
          if f.startswith(".ndv-")][0]
    payload = json.load(open(sc))
    payload["p"] = 11
    json.dump(payload, open(sc, "w"))
    with pytest.raises(ValueError, match="precision"):
        column_ndv(t, "k")


def test_typoed_column_raises_even_with_allow_partial(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, 10, parts=1), t)
    with pytest.raises(ValueError, match="not a column"):
        column_ndv(t, "kk", allow_partial=True)
