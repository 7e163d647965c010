"""Model-based property test across the FULL round-10 surface: a
random interleaving of appends, upserts, keyed deletes, partial and
full compactions, zero-copy restores and history purges must leave
every committed version equal to a plain Python model of the same
sequence -- whatever the file layout, inheritance chains, stats
pruning, row-identical links or in-place rewrites did underneath.
Derandomized seeds; every version is re-read at the end (time travel
over the whole history, post-purge)."""

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
    compact_where,
    current_version,
    delete_keys_version,
    merge_version,
    read_current,
    read_version,
    restore_table,
    table_rowcount,
)


# long-tail suite: skipped by the default run (pytest.ini addopts -m "not slow");
# select with `-m slow`
pytestmark = pytest.mark.slow

KEYS = list(range(40))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


@pytest.mark.parametrize("seed", [7, 11, 23])
def test_random_ddl_sequence_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = str(tmp_path / f"t{seed}")
    # model: per committed version, the dict state visible there
    states: dict[int, dict[int, str]] = {}
    model: dict[int, str] = {}

    init = {k: f"s{k}" for k in rng.sample(KEYS, 14)}
    append_version(_df(spark, sorted(init.items())).coalesce(2), t,
                   stats_columns=["k"])
    model.update(init)
    states[current_version(t)] = dict(model)

    purged: set[int] = set()
    for step in range(8):
        op = rng.choice(["append", "upsert", "delete",
                         "compact", "compact_where", "restore"])
        if op == "append":
            rows = {k: f"a{step}_{k}" for k in rng.sample(KEYS, 5)
                    if k not in model}
            if not rows:
                continue
            append_version(
                _df(spark, sorted(rows.items())).coalesce(1), t,
                stats_columns=["k"])
            model.update(rows)
        elif op == "upsert":
            rows = {k: f"u{step}_{k}"
                    for k in rng.sample(KEYS, rng.randint(1, 6))}
            merge_version(spark, t,
                          _df(spark, sorted(rows.items())), "k")
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
        elif op == "compact_where":
            lo = rng.randint(0, 20)
            compact_where(spark, t, "k", lo=lo, hi=lo + 15)
            # may be None (no overlap): rows unchanged either way
            if current_version(t) in states:
                continue  # no commit happened
        else:  # restore
            vs = sorted(states)
            target = rng.choice(vs)
            restore_table(spark, t, target)
            model = dict(states[target])
        states[current_version(t)] = dict(model)
        got = {r.k: r.v for r in read_current(spark, t).collect()}
        assert got == model, f"seed {seed} step {step} op {op}"
        assert table_rowcount(t, current_version(t)) == len(model)

    # purge a random subset OUT OF HISTORY, then every committed
    # version must read as its model state minus the victims
    victims = rng.sample(KEYS, 4)
    purge_keys_history(spark, t, "k", victims)
    purged.update(victims)
    assert_keys_absent(spark, t, "k", victims)
    for v in committed_versions(t):
        expect = {k: x for k, x in states[v].items()
                  if k not in purged}
        got = {r.k: r.v for r in read_version(spark, t, v).collect()}
        assert got == expect, f"seed {seed} post-purge travel v{v}"
        # metadata counts stay exact through every rewrite tier
        assert table_rowcount(t, v) == len(expect)

    # r11 closing invariants: NO operation sequence may produce a
    # table that fails its own fsck -- every manifest record must
    # agree with footer truth through appends, merges, compactions,
    # restores and in-place purges (deep mode re-reads every body)
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.clone import shallow_clone
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.fsck import verify_table

    rep = verify_table(spark, t, deep=True)
    assert rep["ok"], (seed, rep)
    # and a zero-copy fork of the final state must read it exactly
    # and fsck clean through its external references
    c = str(tmp_path / f"c{seed}")
    shallow_clone(spark, t, c)
    expect = {k: x for k, x in states[current_version(t)].items()
              if k not in purged}
    got = {r.k: r.v for r in read_current(spark, c).collect()}
    assert got == expect, f"seed {seed} clone divergence"
    crep = verify_table(spark, c)
    assert crep["ok"], (seed, crep)
    assert crep["versions"][1]["external_refs"] == \
        crep["versions"][1]["n_files"]
