"""Sequence packing + sharded export -- the last mile of a training-
data pipeline: turn a curated document corpus into fixed-length token
sequences laid out in balanced shards.

Concat-and-chunk packing (the standard GPT-style layout): documents
are concatenated in a deterministic pseudo-random order and the token
stream is cut every ``seq_len`` tokens; a document may span a sequence
boundary.  At 100 TB a single global concatenation order would mean a
global sort, so packing is SHARDED: every document hash-routes to one
of ``n_shards`` independent streams and order/offsets are per-shard.
Each shard is one writer task downstream; choose ``n_shards`` so a
shard is a few GB (e.g. 100 TB / 4 GB => ~25k shards).  The only
shuffle is the window keyed by shard; ordering is md5(doc_id) -- a
deterministic shuffle, so the same corpus always packs identically on
any engine (no RNG state, resumable, diffable across runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import tokens


def _md5_shard(id_str, n_shards: int):
    """THE shard-routing expression (48-bit md5 prefix mod n_shards),
    shared by packing and the JSONL export so the two can never route
    the same corpus differently."""
    return (F.conv(F.substring(F.md5(id_str), 1, 12), 16, 10)
             .cast("bigint") % n_shards).cast("int")


def pack_sequences(df: DataFrame, seq_len: int = 2048, n_shards: int = 16,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Assign every document a (shard, token-offset) slot in the
    packed layout.  Adds columns:

    - ``shard``      int, md5-bucket of the id (0..n_shards-1)
    - ``n_tokens``   bigint, whitespace-token count of the doc
    - ``start_off``/``end_off``  bigint, the doc's token span in its
      shard's concatenated stream ([start_off, end_off))
    - ``first_seq``/``last_seq`` bigint, the packed sequences the doc
      touches (floor(start_off/seq_len) .. floor((end_off-1)/seq_len))
    - ``split_across`` int 1 when the doc crosses a sequence boundary

    Null-text and zero-token docs are dropped (they carry no training
    tokens).  Plan shape: narrow token count -> ONE window shuffle
    keyed by shard (sort only within shard) -> narrow arithmetic.
    floor() on doubles is exact below 2^53 tokens (~9e15; a 100 TB
    corpus is ~2.5e13), so offsets never lose precision.
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError(f"seq_len/n_shards must be positive: "
                         f"{seq_len}/{n_shards}")
    id_str = F.col(id_col).cast("string")
    shard = _md5_shard(id_str, n_shards)
    with_counts = (
        df.filter(F.col(text_col).isNotNull())
          .withColumn("n_tokens", F.size(tokens(text_col)).cast("bigint"))
          .filter(F.col("n_tokens") > 0)
          .withColumn("shard", shard))
    # md5(text) + text tiebreaks: duplicate doc_ids (re-uploads) would
    # otherwise tie on every sort key, making per-row offsets
    # nondeterministic; rows identical in BOTH id and text are
    # interchangeable, so this total preorder fixes the output multiset
    w = (Window.partitionBy("shard")
               .orderBy(F.md5(id_str), F.col(id_col),
                        F.md5(F.col(text_col)), F.col(text_col))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    first_seq = F.floor(F.col("start_off") / seq_len).cast("bigint")
    last_seq = F.floor((F.col("end_off") - 1) / seq_len).cast("bigint")
    return (with_counts
            .withColumn("end_off", F.sum("n_tokens").over(w))
            .withColumn("start_off",
                        (F.col("end_off") - F.col("n_tokens")).cast("bigint"))
            .withColumn("first_seq", first_seq)
            .withColumn("last_seq", last_seq)
            .withColumn("split_across",
                        (F.col("first_seq") != F.col("last_seq"))
                        .cast("int")))


def pack_manifest(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-shard manifest of a :func:`pack_sequences` result: doc and
    token totals, full ``seq_len`` sequences produced, leftover tail
    tokens (dropped or padded by the trainer), and how many docs were
    split across a boundary.  One partial-agg shuffle on ~n_shards
    groups."""
    return (packed.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.sum("split_across").alias("n_split_docs"))
            .withColumn("n_full_seqs",
                        F.floor(F.col("total_tokens") / seq_len)
                         .cast("bigint"))
            .withColumn("tail_tokens",
                        (F.col("total_tokens") % seq_len).cast("bigint")))


def export_packed_shards(df: DataFrame, out_dir: str,
                         seq_len: int = 2048, n_shards: int = 16,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Write the packed corpus as shard-partitioned parquet plus a
    ``_manifest`` dataset, and return the manifest.

    Layout: ``out_dir/docs/shard=K/*.parquet`` with rows physically
    sorted in pack order (start_off) so a trainer streams each shard
    file front-to-back and reconstructs the token stream without a
    sort; ``out_dir/_manifest`` holds the per-shard totals.

    Write shape: hash repartition on shard routes every shard wholly
    into one task, so each shard is exactly one file (no small-file
    explosion). Hash collisions follow balls-in-bins, so tasks are
    oversubscribed 4x to keep the max shards-per-task (and hence the
    straggler task's bytes) at 1-2 instead of ~ln n/ln ln n. The
    within-partition sort leads with shard: the V1 write path needs
    rows clustered by the partitionBy column, and sorting on
    (shard, start_off) satisfies that requirement directly -- sorting
    on start_off alone would rely on the writer's injected
    sort-by-shard being STABLE, which the spill-merge path is not."""
    packed = pack_sequences(df, seq_len=seq_len, n_shards=n_shards,
                            id_col=id_col, text_col=text_col)
    (packed.repartition(4 * n_shards, "shard")
           .sortWithinPartitions("shard", "start_off")
           .write.mode("overwrite").partitionBy("shard")
           .parquet(f"{out_dir}/docs"))
    spark = df.sparkSession
    # explicit schemas on the read-backs: an empty curated corpus
    # writes no parquet footers, and schema inference would throw
    # UNABLE_TO_INFER_SCHEMA instead of yielding an empty manifest
    docs_back = spark.read.schema(packed.schema).parquet(f"{out_dir}/docs")
    manifest = pack_manifest(docs_back, seq_len)
    manifest.write.mode("overwrite").parquet(f"{out_dir}/_manifest")
    return (spark.read.schema(manifest.schema)
                 .parquet(f"{out_dir}/_manifest"))


def export_jsonl_shards(df: DataFrame, out_dir: str, n_shards: int = 16,
                        id_col: str = "doc_id", text_col: str = "text",
                        compression: str = "gzip") -> DataFrame:
    """Write a document corpus as sharded JSONL (the de-facto
    LLM-corpus interchange format: one JSON object per line) plus a
    ``_manifest`` dataset, and return the manifest -- the sink twin
    of ``sources.corpus_files.read_jsonl_corpus``.

    Layout: ``out_dir/docs/shard=K/part-*.txt[.gz]``, every document
    md5-routed to one of ``n_shards`` streams and md5-ordered within
    its shard -- the same deterministic no-RNG routing as
    :func:`pack_sequences`, so the same corpus always exports
    byte-identically (diffable across runs; re-ingest via
    ``read_jsonl_corpus`` round-trips).  ALL input columns serialize
    into the JSON object (``to_json`` of the row struct, null fields
    omitted per JSON-lines convention).

    Write shape mirrors :func:`export_packed_shards`: hash
    repartition with 4x task oversubscription -> one file per shard
    (no small-file explosion), projection after the within-partition
    sort (narrow, order-preserving).  Gzip output is not splittable
    -- a shard is the unit a trainer streams front-to-back anyway;
    pick ``n_shards`` so shards land at a few GB.

    Manifest: (shard, n_docs, total_chars).  Null-text docs are
    dropped (no trainable content).
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive: {n_shards}")
    id_str = F.col(id_col).cast("string")
    # tiebreak chain (md5(id), id, value): duplicate ids (re-uploads)
    # tie on the id keys, and their relative order must not depend on
    # task scheduling or the "byte-identical re-export" contract
    # breaks.  The final key is the serialized LINE itself -- a
    # superset of every column, so even rows identical in (id, text)
    # but differing elsewhere order deterministically, and no extra
    # text copy rides the shuffle (ids stay strings: a cast to long
    # would null out non-numeric id domains)
    lines = (df.filter(F.col(text_col).isNotNull())
               .withColumn("__shard", _md5_shard(id_str, n_shards))
               .select("__shard",
                       F.md5(id_str).alias("__ord"),
                       id_str.alias("__id"),
                       F.length(text_col).cast("bigint").alias("__chars"),
                       F.to_json(F.struct(*df.columns)).alias("value"))
               # one computation feeds BOTH actions (the shard write
               # and the manifest aggregate): without it the full
               # upstream lineage -- possibly an entire curation
               # pipeline -- runs twice, and a nondeterministic
               # upstream could yield a manifest describing data that
               # was never written; MEMORY_AND_DISK, freed below
               .persist())
    try:
        (lines.repartition(4 * n_shards, "__shard")
              .sortWithinPartitions("__shard", "__ord", "__id", "value")
              .select(F.col("__shard").alias("shard"), "value")
              .write.mode("overwrite").partitionBy("shard")
              .option("compression", compression)
              .text(f"{out_dir}/docs"))
        manifest = (lines.groupBy(F.col("__shard").alias("shard"))
                         .agg(F.count(F.lit(1)).alias("n_docs"),
                              F.sum("__chars").alias("total_chars")))
        manifest.write.mode("overwrite").parquet(f"{out_dir}/_manifest")
    finally:
        lines.unpersist()
    spark = df.sparkSession
    return (spark.read.schema(manifest.schema)
                 .parquet(f"{out_dir}/_manifest"))
