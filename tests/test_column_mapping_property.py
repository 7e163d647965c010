"""Model-based property test of column mapping: a random
interleaving of appends, upserts, keyed deletes, compactions,
restores and zero-copy RENAMES must leave every committed version
equal to a plain Python model of the same sequence -- read under
THAT version's own column name -- and a terminal history purge under
the FINAL name must erase the victims from every era, including
files written before any rename (the compliance invariant that
gates the feature).  Derandomized seeds; closes with deep fsck and
a shallow-clone read, like the r10 DDL sweep."""

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
    delete_keys_version,
    merge_version,
    read_current,
    read_version,
    rename_column,
    restore_table,
    table_rowcount,
    table_schema,
)


# long-tail suite: skipped by the default run (pytest.ini addopts -m "not slow");
# select with `-m slow`
pytestmark = pytest.mark.slow

KEYS = list(range(40))
NAMES = ["v", "val", "value", "amount"]


def _df(spark, rows, col):
    return spark.createDataFrame(rows, f"k bigint, {col} string")


@pytest.mark.parametrize("seed", [3, 19, 31])
def test_random_rename_sequence_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = str(tmp_path / f"t{seed}")
    # model: per committed version, (value-column name, dict state)
    states: dict[int, tuple[str, dict[int, str]]] = {}
    name = "v"
    model: dict[int, str] = {}

    init = {k: f"s{k}" for k in rng.sample(KEYS, 14)}
    append_version(_df(spark, sorted(init.items()), name).coalesce(2),
                   t, stats_columns=["k"])
    model.update(init)
    states[current_version(t)] = (name, dict(model))

    for step in range(10):
        op = rng.choice(["append", "upsert", "delete", "compact",
                         "rename", "rename", "restore"])
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
                    for k in rng.sample(KEYS, rng.randint(1, 6))}
            merge_version(spark, t,
                          _df(spark, sorted(rows.items()), name), "k")
            model.update(rows)
        elif op == "delete":
            ks = rng.sample(sorted(model) or [0],
                            min(2, max(1, len(model))))
            delete_keys_version(
                spark, t,
                spark.createDataFrame([(k,) for k in ks], "k bigint"),
                "k")
            for k in ks:
                model.pop(k, None)
        elif op == "compact":
            compact_table(spark, t, sort_by=["k"])
        elif op == "rename":
            target = rng.choice([n for n in NAMES if n != name])
            rename_column(spark, t, name, target)
            name = target
        else:  # restore
            target = rng.choice(sorted(states))
            restore_table(spark, t, target)
            name, model = states[target][0], dict(states[target][1])
        states[current_version(t)] = (name, dict(model))
        df = read_current(spark, t)
        assert df.columns == ["k", name], f"seed {seed} step {step}"
        got = {r["k"]: r[name] for r in df.collect()}
        assert got == model, f"seed {seed} step {step} op {op}"
        assert table_rowcount(t, current_version(t)) == len(model)
        # the pinned mapping always points at a physical column the
        # files actually carry: original name or a fresh __p suffix
        st = table_schema(t, current_version(t))
        phys = (st[name].metadata or {}).get("physical", name)
        assert phys == "v" or phys == name or "__p" in phys

    # purge under the FINAL name: victims must leave EVERY era,
    # including files written under earlier names
    victims = rng.sample(KEYS, 4)
    purge_keys_history(spark, t, "k", victims)
    assert_keys_absent(spark, t, "k", victims)
    for v in committed_versions(t):
        v_name, v_state = states[v]
        expect = {k: x for k, x in v_state.items()
                  if k not in victims}
        df = read_version(spark, t, v)
        assert df.columns == ["k", v_name], f"seed {seed} travel v{v}"
        got = {r["k"]: r[v_name] for r in df.collect()}
        assert got == expect, f"seed {seed} post-purge travel v{v}"
        assert table_rowcount(t, v) == len(expect)

    # no operation sequence may produce a table that fails its own
    # fsck, and a zero-copy fork must read the final state exactly
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.clone import shallow_clone
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.fsck import verify_table

    rep = verify_table(spark, t, deep=True)
    assert rep["ok"], (seed, rep)
    c = str(tmp_path / f"c{seed}")
    shallow_clone(spark, t, c)
    fin_name, fin_state = states[current_version(t)]
    expect = {k: x for k, x in fin_state.items() if k not in victims}
    got = {r["k"]: r[fin_name]
           for r in read_current(spark, c).collect()}
    assert got == expect, f"seed {seed} clone divergence"
    assert verify_table(spark, c)["ok"]
