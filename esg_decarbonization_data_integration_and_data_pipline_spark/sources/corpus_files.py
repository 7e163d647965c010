"""Document-corpus file sources: JSONL (the de-facto LLM-corpus
interchange format) and raw text trees, with malformed-input
quarantine instead of silent row loss.

Web-scale corpora arrive as line-delimited JSON shards (one document
object per line).  ``spark.read.json`` already distributes the parse
(one task per file split), but its default PERMISSIVE mode silently
nulls malformed lines -- at 100 TB "0.3% of docs are null" is a
debugging nightmare.  These readers make the failure path explicit:
good rows come back typed, bad LINES come back verbatim in a
quarantine frame the pipeline can count, sample, and alert on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl_corpus(spark: SparkSession, path: str,
                      schema: str | StructType =
                      "doc_id bigint, text string, lang string, "
                      "source string",
                      corrupt_col: str = "_corrupt_record",
                      ) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document corpus -> ``(docs, quarantine)``.

    ``docs`` has exactly ``schema``'s columns (missing fields null,
    extra fields dropped -- additive schema evolution reads fine);
    ``quarantine`` holds the raw text of every rejected line: invalid
    JSON, a field type clash, or valid JSON that binds ZERO schema
    fields (a renamed-field shard would otherwise flood docs with
    silent all-null rows -- the exact failure mode this reader exists
    to surface; a literal all-null object carries no data either way).

    One contract divergence from ``spark.read.json``: a line holding
    a top-level JSON ARRAY is quarantined, not exploded into rows --
    the format here is strictly one document object per line.

    Plan shape: each frame is ONE distributed single-pass scan of the
    files AS TEXT (splittable by lines) with ``from_json`` doing the
    typed parse -- deliberately NOT the native JSON scan: Spark
    refuses any query whose pruned column set is only the corrupt
    record column (``docs.count()`` prunes to exactly that), and the
    documented ``cache()`` workaround would pin a corpus-sized parse
    in memory.  Blank lines are skipped (matching the native scan).
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not isinstance(schema, StructType):
        raise ValueError(f"schema must be a struct, got {schema}")
    with_corrupt = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType())])
    j = F.from_json(F.col("value"), with_corrupt,
                    {"mode": "PERMISSIVE",
                     "columnNameOfCorruptRecord": corrupt_col})
    parsed = (spark.read.text(path)
              .filter(F.length(F.trim(F.col("value"))) > 0)
              .select(F.col("value").alias("raw_line"), j.alias("__j")))
    bound = None
    for f in schema.fields:
        nn = F.col(f"__j.{f.name}").isNotNull()
        bound = nn if bound is None else (bound | nn)
    bad = F.col(f"__j.{corrupt_col}").isNotNull() | ~bound
    docs = (parsed.filter(~bad)
                  .select(*[F.col(f"__j.{f.name}").alias(f.name)
                            for f in schema.fields]))
    quarantine = parsed.filter(bad).select("raw_line")
    return docs, quarantine


def read_text_corpus(spark: SparkSession, path: str,
                     id_from_path: bool = True) -> DataFrame:
    """Read a tree of plain-text files as one-document-per-file:
    (doc_path, text[, doc_id]).  ``wholetext`` keeps each file one
    row (a document is a unit, not its lines); ``doc_id`` is the
    first 15 md5 hex digits of the path as a bigint (60 bits, always
    positive) -- stable across runs, so downstream splits/dedup key
    consistently.  Collision math for an IDENTITY key: 60 bits keeps
    the any-collision probability under ~1% up to ~150M files (the
    12-hex/48-bit prefix the shard routers use would cross 1% at
    ~2.4M -- fine for routing, not for identity).

    Scale note: one task per FILE in wholetext mode -- right for
    document trees (many files); a single giant file should be JSONL
    instead."""
    df = (spark.read.text(path, wholetext=True,
                          recursiveFileLookup=True)
               .select(F.input_file_name().alias("doc_path"),
                       F.col("value").alias("text")))
    if id_from_path:
        df = df.withColumn(
            "doc_id",
            F.conv(F.substring(F.md5("doc_path"), 1, 15), 16, 10)
             .cast("bigint"))
    return df
