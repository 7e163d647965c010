"""Deterministic sampling / splitting for training-data pipelines.

Hash-based assignment so the split is (a) stable across runs and
engines -- md5 is bit-identical everywhere, unlike engine-private
hash()/xxhash64 -- and (b) a narrow projection: no shuffle, no
sort, no sampling state. The standard way to carve train/eval/test
out of a 100 TB corpus without materializing a permutation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_bucket(col: str, n_buckets: int = 100) -> Column:
    """Stable bucket 0..n_buckets-1 from the md5 of a column (first
    12 hex digits -> int, engine-reproducible)."""
    return (F.conv(F.substring(F.md5(F.col(col)), 1, 12), 16, 10)
             .cast("bigint") % n_buckets)


def stratified_sample(df: DataFrame, group_cols: list[str],
                      n_per_group: int, key_col: str,
                      tiebreak: str | None = None,
                      out_col: str = "sample_rank") -> DataFrame:
    """Deterministic top-N rows per group, ordered by the md5 of
    ``key_col`` -- the stratified-sampling step of a corpus pipeline
    (N docs per language/source for eval sets, annotation batches,
    per-class balancing) with no RNG state: the same corpus always
    yields the same sample, on any engine.

    ``tiebreak`` should be a UNIQUE column (doc id): exact-duplicate
    keys share an md5, and row_number without a total order is
    nondeterministic. Null keys are dropped (engines disagree on
    null ordering, and sampling a null payload is meaningless).

    One window shuffle keyed by the strata (partial ordering only
    within groups -- no global sort); ``out_col`` carries the 1..N
    rank so callers can take nested prefixes (N=1000 contains the
    N=100 sample)."""
    from pyspark.sql import Window

    order = [F.md5(F.col(key_col)), F.col(key_col)]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.filter(F.col(key_col).isNotNull())
              .withColumn(out_col, F.row_number().over(w))
              .filter(F.col(out_col) <= n_per_group))


def deterministic_split(df: DataFrame, col: str,
                        fractions: dict[str, float],
                        out_col: str = "split") -> DataFrame:
    """Assign every row to a named split by hash bucket; fractions
    must sum to <= 1 (any remainder becomes 'holdout'). Content-keyed
    (e.g. on text) the split is also dedup-safe: identical payloads
    always land in the same split, so near-identical train/eval
    leakage can't enter through exact dups."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = hash_bucket(col, 10000)
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * 10000))
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(out_col, expr.otherwise("holdout"))


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   source_col: str = "source", key_col: str = "text",
                   id_col: str = "doc_id",
                   out_col: str = "sample_rank",
                   counts: dict[str, int] | None = None) -> DataFrame:
    """Deterministic mixture sampling: the LARGEST sample whose
    per-source composition matches the target ``weights`` ratios --
    the data-mixing step of corpus assembly (web/books/code at fixed
    proportions), with no RNG state: the same corpus always yields
    the same sample on any engine.

    With n_s docs per source and weight w_s, the mixture-feasible
    size is N = min_s floor(n_s / w_s); each source contributes its
    k_s = floor(N * w_s) docs ranked by md5(key) (the
    ``stratified_sample`` ordering, so nested prefixes of a source's
    sample are stable as targets change). Sources absent from
    ``weights`` are excluded; a weighted source with no rows makes
    the sample empty (the mixture is infeasible). Weights are ratios
    -- they need not sum to 1.

    Plan: one bounded groupBy-collect for the per-source counts
    (O(#sources) driver rows -- scalar control flow, not a data
    collect), then ONE window shuffle keyed by source and a broadcast
    limits join. Null keys drop (engines disagree on null md5
    ordering). ``counts`` lets a caller that already aggregated the
    per-source row counts (non-null keys only!) pass them in and skip
    this scan -- temperature_mixture_sample uses it to avoid paying
    the corpus aggregation twice.
    """
    import math

    from pyspark.sql import Window

    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive ratios: {weights}")
    valid = df.filter(F.col(key_col).isNotNull()
                      & F.col(source_col).isin(list(weights)))
    if counts is None:
        counts = {r["src"]: r["n"] for r in
                  (valid.groupBy(F.col(source_col).alias("src"))
                        .agg(F.count(F.lit(1)).alias("n")).collect())}
    cap = min(math.floor(counts.get(s, 0) / w) for s, w in weights.items())
    limits = [(s, math.floor(cap * w)) for s, w in weights.items()]
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.scale import (
        local_literal_df,
    )

    lim_df = local_literal_df(valid.sparkSession, limits,
                              f"`{source_col}` string, __k bigint")
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(key_col)), F.col(key_col), F.col(id_col))
    return (valid.withColumn(out_col, F.row_number().over(w))
                 .join(F.broadcast(lim_df), source_col)
                 .filter(F.col(out_col) <= F.col("__k"))
                 .drop("__k"))


def temperature_mixture_sample(df: DataFrame, alpha: float = 0.5,
                               source_col: str = "source",
                               key_col: str = "text",
                               id_col: str = "doc_id",
                               out_col: str = "sample_rank") -> DataFrame:
    """Temperature-scaled mixture sampling: source s gets weight
    n_s^alpha -- the multilingual/multi-domain up/down-sampling rule
    (alpha=1 keeps natural proportions, alpha=0 forces uniform,
    alpha~0.3-0.7 boosts small sources without flattening large
    ones).  Weights derive from the corpus itself, so no hand-tuned
    ratio table; the rest (largest feasible sample, md5 ranking,
    single window shuffle) is :func:`mixture_sample`.

    Determinism across engines: ``n**alpha`` is IEEE-double pow on
    every engine (exact for alpha=0.5 via sqrt); a 1-ulp difference
    could only flip a floor() at an exact-integer boundary, which
    irrational weights never hit.  One extra bounded collect for the
    per-source counts (O(#sources) rows, scalar control flow)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0: {alpha}")
    rows = (df.filter(F.col(key_col).isNotNull())
              .groupBy(F.col(source_col).alias("src"))
              .agg(F.count(F.lit(1)).alias("n")).collect())
    counts = {r["src"]: r["n"] for r in rows
              if r["src"] is not None and r["n"] > 0}
    weights = {s: float(n) ** alpha for s, n in counts.items()}
    if not weights:
        raise ValueError("no non-null sources to sample from")
    return mixture_sample(df, weights, source_col=source_col,
                          key_col=key_col, id_col=id_col, out_col=out_col,
                          counts=counts)


def token_budget_by_source(df: DataFrame, budgets: dict[str, int],
                           source_col: str = "source",
                           key_col: str = "text", id_col: str = "doc_id",
                           text_col: str = "text",
                           bucket_hex: int = 3) -> DataFrame:
    """Per-source token budgets -- the form a training mix is
    actually specified in ("300B web, 50B code, 20B books"): within
    each source, take the largest deterministic md5-ranked prefix
    whose cumulative token count fits that source's budget.  Sources
    absent from ``budgets`` are excluded.

    Same distributed prefix-sum as :func:`token_budget_sample`, keyed
    one level deeper: bucket offsets come from a window over the
    (source, bucket) aggregate (tiny -- #sources x 16^bucket_hex
    rows, partitioned by source so not even that is single-partition)
    and the in-bucket cumsum windows on (source, bucket).  A source
    with 100 TB never serializes into one per-source window.

    Output: input columns + n_tokens + cum_tokens (within-source) +
    budget_tokens, filtered to cum_tokens <= budget_tokens."""
    if not budgets:
        raise ValueError("budgets is empty")
    if any(b < 0 for b in budgets.values()):
        raise ValueError(f"budgets must be >= 0: {budgets}")
    scoped = df.filter(F.col(source_col).isin(list(budgets)))
    cum = _bucketed_token_cumsum(scoped, [source_col], key_col, id_col,
                                 text_col, bucket_hex)
    # the broadcast budget frame's key takes the CALLER's source
    # column type (int domain ids are as legitimate as strings) --
    # hardcoding string would force a cast into the equi-join
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.scale import (
        local_literal_df,
    )

    key_t = df.schema[source_col].dataType.simpleString()
    bdf = local_literal_df(
        df.sparkSession, list(budgets.items()),
        f"`{source_col}` {key_t}, budget_tokens bigint")
    return (cum.join(F.broadcast(bdf), source_col)
               .filter(F.col("cum_tokens") <= F.col("budget_tokens")))


def top_fraction_by_score(df: DataFrame, score_col: str,
                          keep_frac: float,
                          out_col: str = "score_cutoff") -> DataFrame:
    """Keep the best ``keep_frac`` of rows by ``score_col`` -- the
    "drop the bottom X% by quality" gate, EXACT and deterministic
    (no approxQuantile sketch, no RNG).  Keeps every row with
    score >= s*, where s* is the largest score value whose
    top-cumulative row count reaches ceil(keep_frac * N); ties at the
    cutoff are all kept, so the result is the smallest score-closed
    set with at least the target size.  NULL scores never pass.

    Scale shape: one partial-agg groupBy on the score value, then
    windows over THAT (distinct score values only -- for a metric
    rounded to d decimals this is bounded by the rounding grid, e.g.
    <= 1e6 + 1 rows for a [0,1] score at 6 decimals, NOT by corpus
    size), and a 1-row broadcast threshold join back.  N comes from
    ``sum(__n)`` over the same distinct-score aggregate, NOT a
    separate ``count()`` action, so the corpus is scanned exactly
    twice in ONE job (once into the aggregate, once for the output
    rows) and never sorted or shuffled on anything wider than the
    score value.

    Output: input columns + ``out_col`` (the s* threshold, constant
    across rows) -- callers audit what the gate resolved to.
    ``keep_frac == 0`` (or an empty/all-null input) resolves the
    threshold to NULL, which no score satisfies -> empty result."""
    if not 0.0 <= keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in [0, 1]: {keep_frac}")
    scored = df.filter(F.col(score_col).isNotNull())
    counts = (scored.groupBy(F.col(score_col).alias("__s"))
                    .agg(F.count(F.lit(1)).alias("__n")))
    w_cum = (Window.orderBy(F.col("__s").desc())
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    # k = ceil(N * keep_frac); the double multiply matches Python's
    # math.ceil(n * frac) bit-for-bit (same IEEE754 op).  k == 0
    # keeps nothing: the filter drops every value row, max() over the
    # empty set yields a NULL threshold, and `score >= NULL` passes
    # no row -- keep_frac=0 / empty-input fall out of the same plan.
    k = F.ceil(F.sum("__n").over(w_all).cast("double") * F.lit(keep_frac))
    thr = (counts.select("__s", F.sum("__n").over(w_cum).alias("__cum"),
                         k.alias("__k"))
                 .filter((F.col("__k") > 0) & (F.col("__cum") >= F.col("__k")))
                 .agg(F.max("__s").alias(out_col)))
    return (scored.crossJoin(F.broadcast(thr))
                  .filter(F.col(score_col) >= F.col(out_col)))


def token_budget_sample(df: DataFrame, budget_tokens: int,
                        key_col: str = "text", id_col: str = "doc_id",
                        text_col: str = "text",
                        bucket_hex: int = 3) -> DataFrame:
    """The largest deterministic prefix of the md5-ranked corpus whose
    cumulative whitespace-token count fits ``budget_tokens`` -- the
    "give me exactly 10B tokens of this" cut of corpus assembly, with
    no RNG state: the same corpus always yields the same subset.

    A naive global running sum is a single serial window.  This is
    the distributed prefix-sum instead: docs bucket by the first
    ``bucket_hex`` md5 hex chars (16^bucket_hex ordered buckets);
    per-bucket token totals turn into exclusive bucket offsets via
    one window over the TINY bucket aggregate (<= 4096 rows -- the
    only single-partition step, and it's O(buckets) not O(corpus));
    each doc's global cumulative count is its bucket offset plus an
    in-bucket window cumsum.  Because the bucket key is a PREFIX of
    the in-bucket sort key, (bucket, in-bucket order) equals the
    global md5 order, so the result is bit-identical to the serial
    window at any parallelism.  Corpus-side plan: one narrow token
    count, one partial-agg shuffle on bucket, one window shuffle on
    bucket, a broadcast offsets join -- no global sort at any scale.

    Output: input columns + ``n_tokens`` and ``cum_tokens``
    (inclusive), filtered to ``cum_tokens <= budget_tokens``.  Null
    keys/text drop; zero-token docs survive while budget remains
    (they cost nothing)."""
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0: {budget_tokens}")
    return (_bucketed_token_cumsum(df, [], key_col, id_col, text_col,
                                   bucket_hex)
            .filter(F.col("cum_tokens") <= budget_tokens))


def _bucketed_token_cumsum(df: DataFrame, group_cols: list[str],
                           key_col: str, id_col: str, text_col: str,
                           bucket_hex: int) -> DataFrame:
    """THE distributed prefix-sum shared by the global and the
    per-source token cuts: within each group (or globally when
    ``group_cols`` is empty), every row gets its exact cumulative
    token count in md5(key) order.  Bucket offsets come from a window
    over the tiny (group x bucket) aggregate; in-bucket cumsums
    window on (group, bucket); because the bucket is a PREFIX of the
    sort key, the result is bit-identical to a serial window."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import tokens

    clash = [c for c in ("n_tokens", "cum_tokens") if c in df.columns]
    if clash:
        raise ValueError(
            f"input already has columns {clash}; rename them first -- "
            f"the token-budget cut appends these and will not "
            f"silently overwrite caller data")
    ordc = F.md5(F.col(key_col))
    valid = (df.filter(F.col(key_col).isNotNull()
                       & F.col(text_col).isNotNull())
               .withColumn("n_tokens",
                           F.size(tokens(text_col)).cast("bigint"))
               .withColumn("__bkt", F.substring(ordc, 1, bucket_hex)))
    totals = (valid.groupBy(*group_cols, "__bkt")
                   .agg(F.sum("n_tokens").alias("__tot")))
    w_off = (Window.partitionBy(*group_cols).orderBy("__bkt")
                   .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        *group_cols, "__bkt",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"))
    w_in = (Window.partitionBy(*group_cols, "__bkt")
                  .orderBy(ordc, F.col(key_col), F.col(id_col))
                  .rowsBetween(Window.unboundedPreceding,
                               Window.currentRow))
    return (valid.join(F.broadcast(offsets), [*group_cols, "__bkt"])
                 .withColumn("cum_tokens",
                             (F.col("__off")
                              + F.sum("n_tokens").over(w_in))
                             .cast("bigint"))
                 .drop("__bkt", "__off"))


def hll_group_ndv(df: DataFrame, group_col: str,
                  value_cols: list[str]) -> DataFrame:
    """Approximate ``COUNT(DISTINCT c)`` per group for several
    columns in ONE scan and one register-sized shuffle, using the
    engine-independent md5 HyperLogLog recipe of io/ndv (p=12) --
    the SAME registers a sidecar build would produce, so the
    estimate agrees bit-for-bit with the metadata tier AND with a
    DuckDB oracle that re-derives it (unlike
    ``approx_count_distinct``, whose HLL++ internals are
    engine-private and only band-checkable).

    Plan shape, 100 TB-first: project (group, column-name, canonical
    string value) via ``stack``, derive (register index, rank) as
    codegen'd JVM expressions (md5/conv/bin -- no Python anywhere),
    then two hash aggregations: ``max(rank)`` keyed by (group, col,
    register) -- map-side partial agg caps each task's shuffle
    output at |groups| x |cols| x 4096 rows regardless of input
    size -- and the deterministic estimator fold keyed by (group,
    col).  Shuffle bytes are independent of row count: this is the
    distinct-count sketch a cluster actually wants.

    Returns one row per group with one BIGINT estimate column per
    entry of ``value_cols`` (same names).  A (group, column) slice
    whose values are all NULL yields NULL (no evidence), matching
    SQL's empty-over-group semantics.
    """
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.ndv import (
        HLL_ALPHA, HLL_M, _REST_BITS, _SCALE_BITS,
    )

    pairs = ", ".join(f"'{c}', CAST({c} AS STRING)"
                      for c in value_cols)
    stacked = (df.selectExpr(
                   group_col,
                   f"stack({len(value_cols)}, {pairs}) "
                   f"AS (__col, __s)")
                 .filter(F.col("__s").isNotNull()))
    # small-input parallelism rescue (r16, guide section 2.5): a
    # single-file input plans 1-3 scan partitions and the whole
    # md5/conv/bin register chain runs near-serial (measured at
    # sf0.1: the HLL half floored at 1.89 s on 3 partitions vs
    # 0.84 s redistributed -- results identical).  ensure_parallelism
    # is metadata-gated: multi-file or > SMALL_INPUT_BYTES inputs
    # skip the extra shuffle entirely, so 100 TB behavior is
    # unchanged.
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.scale import (
        ensure_parallelism,
    )
    stacked = ensure_parallelism(stacked, F.col("__s"))
    h60 = (F.conv(F.substring(F.md5(F.col("__s")), 1, 15), 16, 10)
            .cast("long"))
    rest = h60.bitwiseAND(F.lit((1 << _REST_BITS) - 1))
    # Spark bin() prints no leading zeros, so its length IS the
    # integer bit_length (the DuckDB twin ltrims a fixed-width bin)
    rank = (F.when(rest == 0, F.lit(_SCALE_BITS))
             .otherwise(F.lit(_SCALE_BITS) - F.length(F.bin(rest))))
    regs = (stacked.select(group_col, "__col",
                           F.shiftright(h60, _REST_BITS).alias("__idx"),
                           rank.alias("__rk"))
                   .groupBy(group_col, "__col", "__idx")
                   .agg(F.max("__rk").alias("__r")))
    # the io/ndv.hll_estimate twin, expression-for-expression: exact
    # 2^49-scaled integer register sum (order-insensitive), one
    # int->double conversion, exact power-of-two division, then the
    # bias-corrected harmonic mean with the linear-counting branch
    # and half-up floor(est + 0.5) rounding
    agg = (regs.groupBy(group_col, "__col")
               .agg(F.count(F.lit(1)).alias("__np"),
                    F.sum(F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), "
                        f"{_SCALE_BITS} - __r)")).alias("__psum")))
    zeros = F.lit(HLL_M) - F.col("__np")
    ts = ((F.lit(HLL_M) - F.col("__np")) * F.lit(1 << _SCALE_BITS)
          + F.col("__psum"))
    total = ts.cast("double") / F.lit(float(1 << _SCALE_BITS))
    raw = F.lit(HLL_ALPHA) * F.lit(HLL_M) * F.lit(HLL_M) / total
    est = (F.when((raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
                  F.lit(HLL_M) * F.log(F.lit(HLL_M) / zeros))
            .otherwise(raw))
    ndv = agg.select(group_col, "__col",
                     F.floor(est + F.lit(0.5)).cast("long")
                      .alias("__ndv"))
    return (ndv.groupBy(group_col)
               .pivot("__col", value_cols)
               .agg(F.first("__ndv")))
