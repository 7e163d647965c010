"""Hidden (generated) partitioning -- Iceberg-style partition
transforms for the versioned-table tier.

``partition_by`` entries on :func:`io.versioned.write_version` /
``append_version`` may be TRANSFORMS of a source column instead of
bare column names::

    write_version(df, td, partition_by=("year(o_orderdate)",))
    append_version(df, td, partition_by=("bucket(16, doc_id)",))

The derived value exists ONLY in the directory layout (Iceberg's
hidden partitioning): the table's logical schema never gains a
``yr`` column, writers derive the layout value per row at write
time, and readers prune directories from predicates on the SOURCE
column -- ``read_where(spark, td, "o_orderdate", lo, hi)`` maps the
range through the transform and skips whole partitions, then
re-applies the predicate row-level (pruning is an optimization,
never a filter).  This is what the reference's hand-maintained month
columns (jobs/csr_etl.py month slicing) become when the engine owns
the derivation: callers can never write a row into the wrong slice,
and repartitioning the table is a spec change, not a backfill of a
materialized column.

Transforms (the Iceberg v2 set minus void):

==============  =====================  ==========================
spec            directory value        prunes
==============  =====================  ==========================
``col``         identity (existing)    eq / range / null checks
``year(c)``     int year               range on ``c`` (monotonic)
``month(c)``    ``yyyy-MM`` string     range on ``c`` (monotonic,
                                       zero-padded lexicographic)
``day(c)``      ``yyyy-MM-dd`` string  range on ``c``
``hour(c)``     int hours since epoch  range on ``c`` (monotonic)
``bucket(N,c)`` ``md5(c) % N`` int     equality on ``c`` only
``truncate(N,c)``  ``c[:N]`` (string)  range on ``c`` (prefix /
                   or ``c - c % N``    floor monotonic)
==============  =====================  ==========================

``hour(c)`` (Iceberg v2 parity; the layout a streaming events table
wants) is INSTANT-based like Iceberg's: the directory value is the
exact floor of microseconds-since-epoch / 3600e6 -- a property of
the UTC instant, so the committed layout is identical whatever the
write session's timezone (DST-free by construction; no wall-clock
rendering anywhere).  It therefore accepts only TIMESTAMP (instant)
sources: a TIMESTAMP_NTZ's hour index would depend on the session
zone used to reinterpret the wall time, and is refused loudly.

The bucket hash is the engine's OWN deterministic md5 recipe
(first 8 hex digits mod N), implemented identically in Spark SQL
(write side) and pure Python (spark-free pruning side) -- NOT
Iceberg's murmur3, which pyspark has no stable Python twin for.
NULL source values land in the ``__HIVE_DEFAULT_PARTITION__``
directory for every transform, exactly like identity partitioning.

The spec is committed as ``_PARTSPEC.json`` inside the version dir
(next to ``_SCHEMA.json``): per-version, inherited nowhere --
readers consult the spec of the version they read, so a table may
evolve its layout across commits without rewriting history.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import re
from typing import Any

_PARTSPEC_FILE = "_PARTSPEC.json"

_TRANSFORM_RE = re.compile(
    r"^\s*(year|month|day|hour)\s*\(\s*([A-Za-z0-9_.]+)\s*\)\s*$")
_PARAM_RE = re.compile(
    r"^\s*(bucket|truncate)\s*\(\s*(\d+)\s*,\s*([A-Za-z0-9_.]+)\s*\)\s*$")


_TRANSFORM_SRC_TYPES = {
    # year/month/day need a temporal source; bucket and truncate are
    # restricted to types whose Spark string cast equals Python's
    # str() (the md5 twin's contract) / whose ordering the prune
    # mapping understands
    "year": ("date", "timestamp", "timestamp_ntz"),
    "month": ("date", "timestamp", "timestamp_ntz"),
    "day": ("date", "timestamp", "timestamp_ntz"),
    # hour is instant-based (hours since epoch): only a TIMESTAMP
    # carries an instant; an NTZ's hour index would depend on the
    # session zone reinterpreting the wall time
    "hour": ("timestamp",),
    "bucket": ("integer", "long", "short", "byte", "string"),
    "truncate": ("integer", "long", "short", "byte", "string"),
}


def parse_partition_spec(entries, schema) -> list[dict]:
    """``partition_by`` entries -> ordered spec dicts
    ``{"dir", "transform", "src", "param"}``.  Bare names are
    identity entries (dir == src).  Derived directory names are
    ``<src>_<transform>`` and must not collide with schema columns
    (a collision would make the discovered partition column shadow
    a real one).  Source TYPES are enforced per transform: a bucket
    over a double would hash Spark's string cast on the write side
    but Python's str() on the prune side, and the two disagree on
    edge renderings -- refuse at declaration instead of mis-pruning
    at read time."""
    names = set(schema.fieldNames()) if schema is not None else set()
    types = {f.name: f.dataType.typeName()
             for f in schema.fields} if schema is not None else {}
    out: list[dict] = []
    for e in entries:
        e = str(e)
        m = _TRANSFORM_RE.match(e)
        p = _PARAM_RE.match(e) if m is None else None
        if m is not None:
            tf, src = m.group(1), m.group(2)
            param = None
        elif p is not None:
            tf, param, src = p.group(1), int(p.group(2)), p.group(3)
            if param <= 0:
                raise ValueError(
                    f"partition transform {e!r}: N must be positive")
        else:
            if "(" in e or ")" in e:
                raise ValueError(
                    f"unrecognized partition transform {e!r}; "
                    f"supported: col, year(col), month(col), "
                    f"day(col), bucket(N, col), truncate(N, col)")
            out.append({"dir": e.strip(), "transform": "identity",
                        "src": e.strip(), "param": None})
            continue
        if names and src not in names:
            raise ValueError(
                f"partition transform {e!r}: column {src!r} is not "
                f"in the schema")
        want = _TRANSFORM_SRC_TYPES[tf]
        if src in types and types[src] not in want:
            raise ValueError(
                f"partition transform {e!r}: column {src!r} is "
                f"{types[src]}, but {tf}() needs one of "
                f"{sorted(want)}")
        dir_name = f"{src}_{tf}"
        if dir_name in names:
            raise ValueError(
                f"partition transform {e!r}: derived directory "
                f"column {dir_name!r} collides with a schema column "
                f"-- rename the column or partition by it directly")
        # src_type rides into the committed spec: the prune mapping
        # widens temporal probes for TIMESTAMP sources (the directory
        # value was rendered in the WRITE session's timezone; a
        # reader in another zone could otherwise wrongly prune a
        # boundary file -- review pass 2)
        out.append({"dir": dir_name, "transform": tf, "src": src,
                    "param": param, "src_type": types.get(src)})
    dirs = [s["dir"] for s in out]
    if len(set(dirs)) != len(dirs):
        raise ValueError(
            f"duplicate partition directories in {list(entries)!r}")
    return out


def has_transforms(spec: list[dict]) -> bool:
    return any(s["transform"] != "identity" for s in spec)


def derive_columns(df, spec: list[dict], physical: dict | None = None):
    """(df with derived layout columns attached, list of dir names
    to partitionBy).  Identity entries pass through (mapped to their
    physical name when the table is column-mapped); derived entries
    compute the transform in Spark (JVM expressions, no UDF)."""
    from pyspark.sql import functions as F

    physical = physical or {}
    part_cols: list[str] = []
    for s in spec:
        if s["transform"] == "identity":
            part_cols.append(physical.get(s["src"], s["src"]))
            continue
        src, n = s["src"], s["param"]
        phys_src = physical.get(src, src)
        if s["transform"] == "year":
            col = F.year(F.col(phys_src)).cast("int")
        elif s["transform"] == "month":
            col = F.date_format(F.col(phys_src), "yyyy-MM")
        elif s["transform"] == "day":
            col = F.date_format(F.col(phys_src), "yyyy-MM-dd")
        elif s["transform"] == "hour":
            # exact integer floor-div of epoch micros (pmod keeps
            # negatives floored; the / result is an exact small
            # integer in double) -- instant-based, so no session-zone
            # rendering anywhere
            col = F.expr(
                f"cast((unix_micros(`{phys_src}`) - "
                f"pmod(unix_micros(`{phys_src}`), 3600000000)) "
                f"/ 3600000000 as int)")
        elif s["transform"] == "bucket":
            col = (F.when(F.col(phys_src).isNull(), F.lit(None))
                    .otherwise(F.expr(
                        f"cast(conv(substring(md5(cast("
                        f"`{phys_src}` as string)), 1, 8), 16, 10) "
                        f"as bigint) % {n}").cast("int")))
        elif s["transform"] == "truncate":
            dt = dict((f.name, f.dataType.typeName())
                      for f in df.schema.fields).get(phys_src)
            if dt == "string":
                col = F.expr(f"substring(`{phys_src}`, 1, {n})")
            elif dt in ("integer", "long", "short", "byte"):
                col = F.expr(
                    f"`{phys_src}` - pmod(`{phys_src}`, {n})")
            else:
                raise ValueError(
                    f"truncate({n}, {src}) needs a string or "
                    f"integer column, got {dt}")
        else:  # pragma: no cover -- parse_partition_spec gates
            raise ValueError(s["transform"])
        df = df.withColumn(s["dir"], col)
        part_cols.append(s["dir"])
    return df, part_cols


def derive_arrow(tbl, spec: list[dict], physical: dict | None = None):
    """The pyarrow twin of :func:`derive_columns` for the Python
    DataSource WRITE face: returns ``(table with derived layout
    columns appended, partitionBy column list)``.  Temporal
    transforms are restricted to DATE sources on this face (the
    writer validates): an Arrow timestamp's wall rendering would
    depend on the session timezone and could lay the same row out
    differently from the JVM face.  year/month/day run as pyarrow
    kernels; bucket/truncate-int fall back to a per-value Python
    pass over the (single, narrow) partition column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    physical = physical or {}
    part_cols: list[str] = []
    for s in spec:
        if s["transform"] == "identity":
            part_cols.append(physical.get(s["src"], s["src"]))
            continue
        src = physical.get(s["src"], s["src"])
        col = tbl.column(src)
        t, n = s["transform"], s["param"]
        if t == "year":
            vals = pc.year(col)
        elif t in ("month", "day"):
            fmt = "%Y-%m" if t == "month" else "%Y-%m-%d"
            ts = col if pa.types.is_timestamp(col.type) \
                else col.cast(pa.timestamp("us"))
            vals = pc.strftime(ts, format=fmt)
        elif t == "hour":
            if not (pa.types.is_timestamp(col.type)
                    and col.type.tz is not None):
                raise ValueError(
                    "hour() on the Arrow write face needs an "
                    "instant-typed (tz-aware) timestamp column -- a "
                    "zone-less Arrow timestamp is a wall time whose "
                    "hour index would depend on the session zone")
            micros = col.cast(pa.timestamp("us", tz="UTC")) \
                        .cast(pa.int64()).to_pylist()
            vals = pa.array(
                [None if v is None else v // 3_600_000_000
                 for v in micros], type=pa.int32())
        elif t == "bucket":
            vals = pa.array(
                [None if v is None else bucket_value(v, n)
                 for v in col.to_pylist()], type=pa.int32())
        elif t == "truncate":
            if pa.types.is_string(col.type) \
                    or pa.types.is_large_string(col.type):
                vals = pc.utf8_slice_codeunits(col, 0, n)
            else:
                vals = pa.array(
                    [None if v is None else v - (v % n)
                     for v in col.to_pylist()], type=col.type)
        else:  # pragma: no cover -- parse_partition_spec gates
            raise ValueError(t)
        tbl = tbl.append_column(s["dir"], vals)
        part_cols.append(s["dir"])
    return tbl, part_cols


def bucket_value(v: Any, n: int) -> int:
    """The Python twin of the Spark-side bucket expression: first 8
    hex digits of md5(str(v)) mod n.  ``str`` of ints/strings
    matches Spark's string cast for those types; bucket sources are
    restricted to them by contract."""
    return int(hashlib.md5(str(v).encode("utf-8"))
               .hexdigest()[:8], 16) % n


def _as_date(v) -> datetime.date | None:
    if isinstance(v, datetime.datetime):
        return v.date()
    if isinstance(v, datetime.date):
        return v
    try:
        return datetime.datetime.fromisoformat(str(v)).date()
    except ValueError:
        return None


def _as_dt(v) -> datetime.datetime | None:
    """Probe value -> datetime KEEPING time-of-day (the hour
    transform needs sub-day precision where _as_date truncates)."""
    if isinstance(v, datetime.datetime):
        return v
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day)
    try:
        return datetime.datetime.fromisoformat(str(v))
    except ValueError:
        return None


def keep_file(raw: str | None, transform: str, param, lo, hi,
              src_type: str | None = "date") -> bool:
    """May a file whose directory value is ``raw`` contain rows with
    ``lo <= src <= hi``?  Conservative: unparseable inputs keep the
    file (pruning is never a filter).  ``raw`` None means the file
    carries no such directory (mixed layouts) -- kept.  The
    null-marker directory is excluded by ANY bound (no null row can
    satisfy a range), mirroring identity pruning.

    ``src_type``: the SOURCE column type recorded in the spec.  For
    temporal transforms over anything but a plain ``date`` (i.e. a
    timestamp, or an unknown type from a pre-src_type spec), the
    probe window widens by one day on each side before mapping: the
    directory value was rendered in the WRITE session's timezone,
    and a reader probing from a different zone could otherwise
    wrongly prune a boundary file -- |offset| < 24 h worldwide, so
    one day is conservative and exact (the row-level predicate still
    re-applies after the prune)."""
    import datetime

    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _NULL_PARTITION

    if raw is None:
        return True
    if raw == _NULL_PARTITION:
        return lo is None and hi is None
    if transform == "bucket":
        # only an equality probe prunes buckets
        if lo is None or hi is None or lo != hi:
            return True
        try:
            return int(raw) == bucket_value(lo, param)
        except ValueError:
            return True
    if transform == "hour":
        import math

        try:
            h = int(raw)
        except ValueError:
            return True
        tlo = _as_dt(lo) if lo is not None else None
        thi = _as_dt(hi) if hi is not None else None
        if lo is not None and tlo is None:
            return True
        if hi is not None and thi is None:
            return True
        epoch = datetime.datetime(1970, 1, 1,
                                  tzinfo=datetime.timezone.utc)

        def _hours(t: datetime.datetime, pad: float) -> int:
            if t.tzinfo is None:
                # a naive probe's zone is unknown (the reader's
                # row-level predicate will bind it to the READ
                # session zone while the directory index is
                # instant-exact): widen one day (|offset| < 24 h
                # worldwide), the day()-transform doctrine --
                # pruning stays an optimization, never a filter
                t = t.replace(tzinfo=datetime.timezone.utc)
            else:
                pad = 0.0
            return math.floor(
                ((t - epoch).total_seconds() + pad) / 3600.0)

        if tlo is not None and h < _hours(tlo, -86400.0):
            return False
        if thi is not None and h > _hours(thi, 86400.0):
            return False
        return True
    if transform in ("year", "month", "day"):
        dlo = _as_date(lo) if lo is not None else None
        dhi = _as_date(hi) if hi is not None else None
        if lo is not None and dlo is None:
            return True
        if hi is not None and dhi is None:
            return True
        if src_type != "date":
            one = datetime.timedelta(days=1)
            dlo = dlo - one if dlo is not None else None
            dhi = dhi + one if dhi is not None else None
        if transform == "year":
            try:
                y = int(raw)
            except ValueError:
                return True
            return ((dlo is None or y >= dlo.year)
                    and (dhi is None or y <= dhi.year))
        fmt = "%Y-%m" if transform == "month" else "%Y-%m-%d"
        return ((dlo is None or raw >= dlo.strftime(fmt))
                and (dhi is None or raw <= dhi.strftime(fmt)))
    if transform == "truncate":
        try:
            int_dir = int(raw)
        except ValueError:
            int_dir = None
        if int_dir is not None and (
                isinstance(lo, (int,)) or isinstance(hi, (int,))):
            return ((lo is None or int_dir >= lo - (lo % param))
                    and (hi is None or int_dir <= hi - (hi % param)))
        slo = str(lo)[:param] if lo is not None else None
        shi = str(hi)[:param] if hi is not None else None
        return ((slo is None or raw >= slo)
                and (shi is None or raw <= shi))
    return True


def write_partspec(dir_path: str, spec: list[dict]) -> None:
    tmp = os.path.join(dir_path, f".{_PARTSPEC_FILE}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(spec, fh, sort_keys=True)
    os.replace(tmp, os.path.join(dir_path, _PARTSPEC_FILE))


def read_partspec(table_dir: str, n: int) -> list[dict]:
    """The partition spec committed with version ``n`` (empty for
    identity-only / pre-transform versions)."""
    p = os.path.join(table_dir, f"v_{n:08d}", _PARTSPEC_FILE)
    try:
        with open(p, encoding="utf-8") as fh:
            return json.load(fh)
    except OSError:
        return []
