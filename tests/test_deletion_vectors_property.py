"""Model-based property sweep over the FULL mutation surface
including deletion vectors: random interleavings of appends, upserts,
copy-on-write deletes, merge-on-read (DV) deletes, range DV deletes,
compactions, restores and column renames must leave every committed
version equal to a plain dict model -- then a history purge under
the final column names must erase the victims from every era (DV
positions remapping underneath), and the table plus a shallow clone
must pass deep fsck.  Derandomized seeds."""

from __future__ import annotations

import random

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.purge import (
    assert_keys_absent,
    purge_keys_history,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    committed_versions,
    compact_table,
    current_version,
    delete_keys_dv,
    delete_keys_version,
    delete_where_dv,
    merge_version,
    read_current,
    read_version,
    rename_column,
    restore_table,
    table_rowcount,
)


# long-tail suite: skipped by the default run (pytest.ini addopts -m "not slow");
# select with `-m slow`
pytestmark = pytest.mark.slow

KEYS = list(range(40))
NAMES = ["v", "val", "amount"]


def _df(spark, rows, col):
    return spark.createDataFrame(rows, f"k bigint, {col} string")


@pytest.mark.parametrize("seed", [5, 17, 29])
def test_random_dv_sequence_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = str(tmp_path / f"t{seed}")
    states: dict[int, tuple[str, dict[int, str]]] = {}
    name = "v"
    model: dict[int, str] = {}

    init = {k: f"s{k}" for k in rng.sample(KEYS, 16)}
    append_version(_df(spark, sorted(init.items()), name).coalesce(2),
                   t, stats_columns=["k"])
    model.update(init)
    states[current_version(t)] = (name, dict(model))

    for step in range(12):
        op = rng.choice(["append", "upsert", "delete_cow",
                         "delete_dv", "delete_dv", "delete_range_dv",
                         "compact", "rename", "restore"])
        if op == "append":
            rows = {k: f"a{step}_{k}" for k in rng.sample(KEYS, 5)
                    if k not in model}
            if not rows:
                continue
            append_version(
                _df(spark, sorted(rows.items()), name).coalesce(1),
                t, stats_columns=["k"])
            model.update(rows)
        elif op == "upsert":
            rows = {k: f"u{step}_{k}"
                    for k in rng.sample(KEYS, rng.randint(1, 5))}
            merge_version(spark, t,
                          _df(spark, sorted(rows.items()), name), "k")
            model.update(rows)
        elif op == "delete_cow":
            ks = rng.sample(sorted(model) or [0],
                            min(2, max(1, len(model))))
            delete_keys_version(
                spark, t,
                spark.createDataFrame([(k,) for k in ks], "k bigint"),
                "k")
            for k in ks:
                model.pop(k, None)
        elif op == "delete_dv":
            ks = rng.sample(KEYS, rng.randint(1, 4))
            got = delete_keys_dv(
                spark, t,
                spark.createDataFrame([(k,) for k in ks], "k bigint"),
                "k")
            hit = [k for k in ks if k in model]
            assert (got is not None) == bool(hit), (ks, hit)
            for k in hit:
                model.pop(k)
            if got is None:
                continue  # no commit happened
        elif op == "delete_range_dv":
            lo = rng.randint(0, 30)
            got = delete_where_dv(spark, t, "k", lo=lo, hi=lo + 4)
            hit = [k for k in model if lo <= k <= lo + 4]
            assert (got is not None) == bool(hit)
            for k in hit:
                model.pop(k)
            if got is None:
                continue
        elif op == "compact":
            compact_table(spark, t, sort_by=["k"])
        elif op == "rename":
            target = rng.choice([n2 for n2 in NAMES if n2 != name])
            rename_column(spark, t, name, target)
            name = target
        else:  # restore
            target = rng.choice(sorted(states))
            restore_table(spark, t, target)
            name, model = states[target][0], dict(states[target][1])
        states[current_version(t)] = (name, dict(model))
        df = read_current(spark, t)
        assert df.columns == ["k", name], f"seed {seed} step {step}"
        got_state = {r["k"]: r[name] for r in df.collect()}
        assert got_state == model, f"seed {seed} step {step} op {op}"
        assert table_rowcount(t, current_version(t)) == len(model)

    victims = rng.sample(KEYS, 4)
    purge_keys_history(spark, t, "k", victims)
    assert_keys_absent(spark, t, "k", victims)
    for v in committed_versions(t):
        v_name, v_state = states[v]
        expect = {k: x for k, x in v_state.items()
                  if k not in victims}
        df = read_version(spark, t, v)
        got_state = {r["k"]: r[v_name] for r in df.collect()}
        assert got_state == expect, f"seed {seed} post-purge v{v}"
        assert table_rowcount(t, v) == len(expect)

    from esg_decarbonization_data_integration_and_data_pipline_spark.io.clone import shallow_clone
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.fsck import verify_table

    rep = verify_table(spark, t, deep=True)
    assert rep["ok"], (seed, rep)
    c = str(tmp_path / f"c{seed}")
    shallow_clone(spark, t, c)
    fin_name, fin_state = states[current_version(t)]
    expect = {k: x for k, x in fin_state.items()
              if k not in victims}
    got_state = {r["k"]: r[fin_name]
                 for r in read_current(spark, c).collect()}
    assert got_state == expect, f"seed {seed} clone divergence"
    assert verify_table(spark, c)["ok"]
