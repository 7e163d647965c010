"""Model-based property test for the write face: a RANDOM
interleaving of format() batch appends, format() overwrites,
function-API appends, keyed merges and deletes -- two different
stagers committing through one protocol -- must leave read_current
equal to a plain dict model, keep every mid-history version
time-travelable, and keep the change feed folding to the final
state.  Derandomized seeds, same discipline as the merge/DDL/CDF
sweeps."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    committed_versions,
    delete_keys_version,
    merge_version,
    read_changes,
    read_current,
    read_version,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
    register,
)


# long-tail suite: skipped by the default run (pytest.ini addopts -m "not slow");
# select with `-m slow`
pytestmark = pytest.mark.slow

KEYS = list(range(30))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mixed_writers_match_model(spark, tmp_path, seed):
    register(spark)
    rng = random.Random(seed)
    t = str(tmp_path / f"t{seed}")
    model: dict[int, str] = {}
    snapshots: list[tuple[int, dict[int, str]]] = []

    def fmt_write(rows, mode):
        (_df(spark, sorted(rows.items()))
         .write.format("versioned_table").option("path", t)
         .option("statsColumns", "k").mode(mode).save())

    init = {k: f"s{k}" for k in rng.sample(KEYS, 8)}
    fmt_write(init, "append")
    model.update(init)

    for step in range(7):
        op = rng.choice(["fmt_append", "fmt_overwrite", "fn_append",
                         "merge", "delete"])
        if op == "fmt_append":
            rows = {k: f"fa{step}_{k}" for k in rng.sample(KEYS, 4)
                    if k not in model}
            if not rows:
                continue
            fmt_write(rows, "append")
            model.update(rows)
        elif op == "fmt_overwrite":
            rows = {k: f"fo{step}_{k}" for k in rng.sample(KEYS, 5)}
            fmt_write(rows, "overwrite")
            model = dict(rows)
        elif op == "fn_append":
            rows = {k: f"na{step}_{k}" for k in rng.sample(KEYS, 4)
                    if k not in model}
            if not rows:
                continue
            append_version(_df(spark, sorted(rows.items()))
                           .coalesce(1), t, stats_columns=["k"])
            model.update(rows)
        elif op == "merge":
            rows = {k: f"m{step}_{k}"
                    for k in rng.sample(KEYS, rng.randint(1, 5))}
            merge_version(spark, t, _df(spark, sorted(rows.items())),
                          "k")
            model.update(rows)
        else:
            ks = rng.sample(sorted(model) or [0],
                            min(2, max(1, len(model))))
            delete_keys_version(
                spark, t, spark.createDataFrame([(k,) for k in ks],
                                                "k bigint"), "k")
            for k in ks:
                model.pop(k, None)
        got = {r.k: r.v for r in read_current(spark, t).collect()}
        assert got == model, f"seed {seed} step {step} op {op}"
        snapshots.append((committed_versions(t)[-1], dict(model)))

    # time travel through the mixed-writer history
    v, snap = snapshots[len(snapshots) // 2]
    got = {r.k: r.v for r in read_version(spark, t, v).collect()}
    assert got == snap, f"seed {seed} travel to v{v}"

    # the change feed folds to the final state across BOTH stagers'
    # commits (overwrites surface as full-snapshot rewrites): first
    # readable version's content as inserts + the delta to current
    first = committed_versions(t)[0]
    folded: Counter = Counter()
    for r in read_version(spark, t, first).collect():
        folded[(r.k, r.v)] += 1
    for r in read_changes(spark, t, first).collect():
        folded[(r.k, r.v)] += (1 if r._change_type == "insert"
                               else -1)
    assert {kv for kv, n in folded.items() if n} == set(
        model.items()), f"seed {seed} CDF fold"
