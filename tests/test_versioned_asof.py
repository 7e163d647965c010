"""Timestamp time travel (io/versioned.version_as_of / read_as_of):
commit times ride the pointer-log lines; a reader's wall-clock
instant resolves to the version visible then; pre-timestamp (legacy)
lines stay readable by number but refuse timestamp resolution for
the span their times are unknown.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    history,
    read_as_of,
    version_as_of,
)


def _df(spark, xs):
    return spark.createDataFrame([(int(x),) for x in xs], "x bigint")


def test_as_of_resolves_between_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    stamps = []
    for i in range(3):
        append_version(_df(spark, [i]), t)
        stamps.append(time.time())
        time.sleep(0.02)
    # at each recorded instant the table held versions 1..i+1
    for i, ts in enumerate(stamps):
        assert version_as_of(t, ts) == i + 1
        got = sorted(r.x for r in read_as_of(spark, t, ts).collect())
        assert got == list(range(i + 1))
    # far future resolves to current; history carries the times
    assert version_as_of(t, time.time() + 3600) == 3
    h = history(t)
    assert [e["version"] for e in h] == [1, 2, 3]
    assert all(isinstance(e["committed_at"], float) for e in h)
    assert [e["committed_at"] for e in h] == sorted(
        e["committed_at"] for e in h)


def test_as_of_before_first_commit_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_df(spark, [1]), t)
    with pytest.raises(ValueError, match="predates the table"):
        version_as_of(t, 0.0)
    with pytest.raises(FileNotFoundError):
        version_as_of(str(tmp_path / "missing"), time.time())


def test_legacy_untimestamped_span_refuses_guessing(spark, tmp_path):
    """Strip the timestamp from v1's line (pre-upgrade table): a ts
    inside the unknown span raises with guidance, a ts after the
    first timestamped commit resolves normally, and history reports
    committed_at=None for the legacy line."""
    t = str(tmp_path / "t")
    append_version(_df(spark, [1]), t)
    ptr = os.path.join(t, "_CURRENT")
    with open(ptr, encoding="ascii") as fh:
        first = fh.read().split()[0]
    with open(ptr, "w", encoding="ascii") as fh:
        fh.write(first + "\n")
    time.sleep(0.02)
    append_version(_df(spark, [2]), t)
    t2 = time.time()
    with pytest.raises(ValueError, match="pre-timestamp"):
        version_as_of(t, 1.0)
    assert version_as_of(t, t2) == 2
    h = history(t)
    assert h[0]["committed_at"] is None
    assert h[1]["committed_at"] is not None


def test_maybe_compact_fires_only_past_threshold(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        _data_files, current_version, maybe_compact, read_current,
    )

    t = str(tmp_path / "t")
    for i in range(4):
        append_version(_df(spark, [i]).coalesce(1), t)
    n = current_version(t)
    files = len(_data_files(t, n))
    assert maybe_compact(spark, t, max_files=files) is None  # at, not past
    assert current_version(t) == n
    new = maybe_compact(spark, t, max_files=files - 1)
    assert new == n + 1
    assert len(_data_files(t, new)) < files
    assert sorted(r.x for r in read_current(spark, t).collect()) \
        == [0, 1, 2, 3]
    # post-compaction the count is small: a rerun is a no-op
    assert maybe_compact(spark, t, max_files=files - 1) is None
    with pytest.raises(ValueError):
        maybe_compact(spark, t, max_files=0)
    assert maybe_compact(spark, str(tmp_path / "none")) is None
