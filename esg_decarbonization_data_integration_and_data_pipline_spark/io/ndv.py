"""Per-file HyperLogLog sketches -> metadata-answered distinct counts.

``SELECT COUNT(DISTINCT col)`` on a high-cardinality column is a
full-table shuffle; the optimizer question behind it ("roughly how
many distinct join keys does this table carry?") only needs an
estimate.  This module prices that estimate at METADATA: each data
file gets a tiny HLL register sidecar (one pyarrow pass per file,
executor-parallel, built once -- the Iceberg puffin-file /
``ndv`` theta-sketch shape), and :func:`column_ndv` merges registers
(per-register max -- associative, so the answer is independent of
file layout) and evaluates the standard estimator with ZERO Spark
jobs.  At 100 TB this is the difference between a cluster-wide
shuffle and a driver-side merge of ``files x 4 KiB`` sidecars.

The sketch is deliberately ENGINE-INDEPENDENT and deterministic:
values hash with md5 over the canonical ``str(value)`` utf-8 bytes
(the operators/bloom.py discipline), the register index is the top
12 bits of a 60-bit hex prefix and the rank is the leading-zero
count of the remaining 48 bits -- all reproducible in ANSI SQL, so
the DuckDB oracle can re-derive the EXACT estimate (not just an
error band) and the driver gate hash-compares it.

Precision: p = 12 -> m = 4096 registers, ~1.04/sqrt(m) = 1.6%
standard error; the estimator applies linear counting below 2.5 m
(the classic Flajolet small-range correction).  48 rank bits
saturate above ~2^48 distincts per register -- unreachable.

Caveats (documented, matching the bloom index):
- New files (append/merge/compact) have no sidecar until the next
  :func:`build_ndv_index`; :func:`column_ndv` refuses partial
  coverage loudly (an estimate silently missing files would
  under-count) unless ``allow_partial=True``.
- Deletion vectors subtract rows the sidecar still counts: the
  estimate is an UPPER BOUND on a DV-carrying version (exact again
  after compaction materializes the deletes).
- Purge deletes rewritten files' sketch sidecars together with the
  blooms (registers retain hashed evidence of erased values);
  rebuild afterwards.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

from pyspark.sql import SparkSession

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    _DEFAULT_BACKEND,
    CommitBackend,
    _data_files,
    _physical_name,
    current_version,
    table_schema,
)

HLL_P = 12
HLL_M = 1 << HLL_P          # 4096 registers
_REST_BITS = 48             # 60-bit hex prefix minus the 12 index bits
# bias constant for m >= 128 (Flajolet et al. 2007)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

_SUPPORTED_PA_PREFIXES = ("int", "uint", "string", "large_string")


def _register(value) -> tuple[int, int]:
    """(register index, rank) of one value -- the canonical recipe
    shared verbatim with the SQL oracle: 15 hex chars of md5 = 60
    bits (stays positive in a signed 64-bit SQL integer), top 12 =
    index, rank = leading-zero count of the low 48 + 1."""
    h = int(hashlib.md5(str(value).encode("utf-8")).hexdigest()[:15],
            16)
    idx = h >> _REST_BITS
    rest = h & ((1 << _REST_BITS) - 1)
    rank = _REST_BITS - rest.bit_length() + 1
    return idx, rank


def _sidecar_path(abs_data_path: str, col: str) -> str:
    d, base = os.path.split(abs_data_path)
    return os.path.join(d, f".ndv-{col}-{base}.json")


def _build_sidecar(abs_path: str, col: str) -> None:
    """One file's register sidecar (executor task).  A file whose
    physical schema lacks the column (pre-evolution) is all-NULL
    there and contributes nothing: zeroed registers."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(abs_path)
    regs = bytearray(HLL_M)
    if col in pf.schema_arrow.names:
        pa_type = str(pf.schema_arrow.field(col).type)
        if not pa_type.startswith(_SUPPORTED_PA_PREFIXES):
            raise TypeError(
                f"ndv sketch on {col!r} ({pa_type}): only integer "
                f"and string columns are supported -- the canonical "
                f"str() hash encoding is unstable for other types")
        t = pq.read_table(abs_path, columns=[col])
        for v in t.column(col).to_pylist():
            if v is None:
                continue
            idx, rank = _register(v)
            if rank > regs[idx]:
                regs[idx] = rank
    payload = {"p": HLL_P,
               "regs": base64.b64encode(bytes(regs)).decode()}
    tmp = _sidecar_path(abs_path, col) + ".tmp"
    with open(tmp, "w", encoding="ascii") as fh:
        json.dump(payload, fh)
    os.replace(tmp, _sidecar_path(abs_path, col))


def build_ndv_index(spark: SparkSession, table_dir: str, col: str,
                    n: int | None = None,
                    backend: CommitBackend | None = None) -> int:
    """Build the missing register sidecars for version ``n``'s
    (default: current) data files -- one executor task per file,
    each streaming one parquet column; existing sidecars are skipped
    (data files are immutable).  Returns how many were built."""
    backend = backend or _DEFAULT_BACKEND
    if n is None:
        n = current_version(table_dir, backend=backend)
        if n is None:
            raise FileNotFoundError(
                f"{table_dir} has no committed version")
    st = table_schema(table_dir, n)
    if st is not None and col not in st.fieldNames():
        raise ValueError(
            f"ndv sketch on {col!r}: not a column of {table_dir} "
            f"v_{n:08d} (schema: {st.fieldNames()})")
    if st is not None and st[col].dataType.typeName() not in (
            "byte", "short", "integer", "long", "string"):
        raise TypeError(
            f"ndv sketch on {col!r} ({st[col].dataType.typeName()}): "
            f"only integer and string columns are supported -- the "
            f"canonical str() hash encoding is unstable for other "
            f"types")
    # sidecars key on the stable PHYSICAL name, so rename_column
    # invalidates nothing (the bloom-index discipline)
    phys = _physical_name(st, col)
    root = os.path.abspath(table_dir)
    todo = [f for f in _data_files(table_dir, n)
            if not os.path.exists(
                _sidecar_path(os.path.join(root, f), phys))]
    if not todo:
        return 0
    spark.sparkContext.parallelize(todo, len(todo)).foreach(
        lambda rel: _build_sidecar(os.path.join(root, rel), phys))
    return len(todo)


def hll_estimate(regs) -> int:
    """The deterministic estimator over one merged register array:
    bias-corrected harmonic mean, linear counting below 2.5 m.
    Rounds to int (both engines round identically: the raw estimate
    is a double built from the same integer register multiset)."""
    zeros = sum(1 for r in regs if r == 0)
    total = sum(2.0 ** -r for r in regs)
    est = HLL_ALPHA * HLL_M * HLL_M / total
    if est <= 2.5 * HLL_M and zeros:
        import math

        est = HLL_M * math.log(HLL_M / zeros)
    return int(round(est))


def column_ndv(table_dir: str, col: str, n: int | None = None,
               allow_partial: bool = False,
               backend: CommitBackend | None = None) -> int:
    """Approximate COUNT(DISTINCT col) for version ``n`` (default:
    current) from sidecar registers alone -- no SparkSession, no
    data I/O.  Registers merge by per-index max, so the estimate is
    independent of how rows are spread across files.  Raises
    ``FileNotFoundError`` listing uncovered files when sidecars are
    missing (run :func:`build_ndv_index`), unless ``allow_partial``
    (then the estimate covers the sketched files only)."""
    backend = backend or _DEFAULT_BACKEND
    if n is None:
        n = current_version(table_dir, backend=backend)
        if n is None:
            raise FileNotFoundError(
                f"{table_dir} has no committed version")
    st = table_schema(table_dir, n)
    if st is not None and col not in st.fieldNames():
        # a typo'd column would otherwise read as "every sidecar
        # missing" -- a misleading FileNotFoundError, or with
        # allow_partial a silently wrong 0 (r14 review finding)
        raise ValueError(
            f"ndv sketch on {col!r}: not a column of {table_dir} "
            f"v_{n:08d} (schema: {st.fieldNames()})")
    phys = _physical_name(st, col) if st is not None else col
    root = os.path.abspath(table_dir)
    merged = bytearray(HLL_M)
    missing = []
    for rel in _data_files(table_dir, n):
        sp = _sidecar_path(os.path.join(root, rel), phys)
        try:
            with open(sp, encoding="ascii") as fh:
                payload = json.load(fh)
        except OSError:
            missing.append(rel)
            continue
        regs = base64.b64decode(payload["regs"])
        # the 'p' field exists to catch precision drift: merging a
        # different-m register array would silently skew the
        # estimate instead of demanding a rebuild
        if payload.get("p") != HLL_P or len(regs) != HLL_M:
            raise ValueError(
                f"ndv sidecar {sp} has precision p="
                f"{payload.get('p')} / {len(regs)} registers but "
                f"this build expects p={HLL_P} / {HLL_M}; delete "
                f"the stale sidecars and re-run build_ndv_index")
        for i, r in enumerate(regs):
            if r > merged[i]:
                merged[i] = r
    if missing and not allow_partial:
        raise FileNotFoundError(
            f"ndv sketch on {col!r}: {len(missing)} data file(s) of "
            f"{table_dir} v_{n:08d} have no sidecar (first: "
            f"{missing[0]}); run build_ndv_index(spark, table_dir, "
            f"{col!r}, n={n}) or pass allow_partial=True")
    return hll_estimate(merged)
