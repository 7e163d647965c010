"""Property-based SCD2 invariants (hypothesis): random sequences of
dimension snapshots folded through io/scd.scd2_apply must agree
row-for-row with a brute-force pure-Python SCD2 model, and the
structural invariants (interval non-overlap, at-most-one current row
per key, closed rows never mutate again) must hold at every step.
Same dict-model discipline as the versioned-table property suite.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

from esg_decarbonization_data_integration_and_data_pipline_spark.io.scd import scd2_apply
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_current


# long-tail suite: skipped by the default run (pytest.ini addopts -m "not slow");
# select with `-m slow`
pytestmark = pytest.mark.slow

KEYS = [1, 2, 3]
SEGS = ["A", "B", None]

# one snapshot: a subset of keys, each with a segment value
snapshot = st.dictionaries(st.sampled_from(KEYS), st.sampled_from(SEGS),
                           min_size=0, max_size=3)
scenario = st.lists(st.tuples(snapshot, st.booleans()),
                    min_size=1, max_size=5)

SETTINGS = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])


class _Model:
    """Reference SCD2: list of [key, seg, valid_from, valid_to,
    is_current] rows maintained by brute force."""

    def __init__(self):
        self.rows: list[list] = []

    def current(self, k):
        for r in self.rows:
            if r[0] == k and r[4]:
                return r
        return None

    def apply(self, snap: dict, eff: int, close_missing: bool):
        for k, seg in sorted(snap.items()):
            cur = self.current(k)
            if cur is None:
                self.rows.append([k, seg, eff, None, True])
            elif cur[1] != seg:
                cur[3], cur[4] = eff, False
                self.rows.append([k, seg, eff, None, True])
        if close_missing:
            for r in self.rows:
                if r[4] and r[0] not in snap:
                    r[3], r[4] = eff, False


@SETTINGS
@given(scenario=scenario)
def test_scd2_matches_bruteforce_model(spark, tmp_path_factory,
                                       scenario):
    td = str(tmp_path_factory.mktemp("scdprop") / "dim")
    model = _Model()
    for i, (snap, close_missing) in enumerate(scenario):
        eff = 100 + i
        batch = spark.createDataFrame(
            [(k, seg) for k, seg in sorted(snap.items())],
            "k bigint, seg string")
        if not snap and model.current(1) is None and not model.rows:
            # empty very first snapshot: nothing to init; the model
            # skips too (scd2_apply would create an empty v1, which
            # is legal but uninteresting -- keep parity simple)
            continue
        scd2_apply(spark, td, batch, "k", ["seg"], eff,
                   close_missing=close_missing)
        model.apply(snap, eff, close_missing)

        got = sorted(
            ((r.k, r.seg, r.valid_from, r.valid_to, bool(r.is_current))
             for r in read_current(spark, td).collect()),
            key=lambda t: (t[0], t[2]))
        want = sorted(
            ((k, seg, vf, vt, cur)
             for k, seg, vf, vt, cur in map(tuple, model.rows)),
            key=lambda t: (t[0], t[2]))
        assert got == want, (scenario[:i + 1], got, want)

        # structural invariants, independent of the model
        by_key: dict = {}
        for k, _seg, vf, vt, cur in got:
            by_key.setdefault(k, []).append((vf, vt, cur))
        for k, rows in by_key.items():
            rows.sort()
            assert sum(1 for _vf, _vt, c in rows if c) <= 1
            for (vf, vt, _c), (vf2, _vt2, _c2) in zip(rows, rows[1:]):
                assert vt is not None and vt <= vf2, (k, rows)
            # every non-last row is closed; only the last may be open
            assert all(vt is not None for _vf, vt, _c in rows[:-1])
