"""Model-based property test for the versioned-table mutation tier:
a random interleaving of appends, upserts, and keyed deletes must
leave read_current equal to a plain Python dict model, whatever the
file layout, stats coverage, or pruning decisions did underneath.
Derandomized seeds; each sequence also checks a mid-history time
travel."""

from __future__ import annotations

import random

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version, committed_versions, delete_keys_version, merge_version,
    read_current, read_version,
)


# long-tail suite: skipped by the default run (pytest.ini addopts -m "not slow");
# select with `-m slow`
pytestmark = pytest.mark.slow

KEYS = list(range(40))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_mutation_sequence_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = str(tmp_path / f"t{seed}")
    model: dict[int, str] = {}
    snapshots: list[tuple[int, dict[int, str]]] = []

    # seed version: stats on k for half the sequences, none for the
    # other half (exercises both the pruned and conservative paths)
    init = {k: f"s{seed}v{k}" for k in rng.sample(KEYS, 12)}
    stats = ["k"] if seed % 2 == 0 else []
    append_version(_df(spark, sorted(init.items())).coalesce(2), t,
                   stats_columns=stats)
    model.update(init)

    for step in range(6):
        op = rng.choice(["append", "upsert", "delete"])
        if op == "append":
            new_keys = [k for k in rng.sample(KEYS, 6)
                        if k not in model]
            rows = {k: f"a{step}_{k}" for k in new_keys}
            if not rows:
                continue
            append_version(_df(spark, sorted(rows.items())).coalesce(1),
                           t, stats_columns=stats)
            model.update(rows)
        elif op == "upsert":
            ks = rng.sample(KEYS, rng.randint(1, 8))
            rows = {k: f"u{step}_{k}" for k in ks}
            merge_version(spark, t,
                          _df(spark, sorted(rows.items())), "k")
            model.update(rows)
        else:
            ks = rng.sample(sorted(model) or [0],
                            min(3, max(1, len(model))))
            keys_df = spark.createDataFrame([(k,) for k in ks],
                                            "k bigint")
            delete_keys_version(spark, t, keys_df, "k")
            for k in ks:
                model.pop(k, None)
        snapshots.append((committed_versions(t)[-1], dict(model)))
        got = {r.k: r.v for r in read_current(spark, t).collect()}
        assert got == model, f"seed {seed} step {step} op {op}"

    # time travel: a mid-history version still reads as its model
    v, snap = snapshots[len(snapshots) // 2]
    got = {r.k: r.v for r in read_version(spark, t, v).collect()}
    assert got == snap, f"seed {seed} travel to v{v}"
