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
    ``quarantine`` holds the raw text of every unparseable line.  A
    line whose fields ALL fail to bind (or whose JSON is invalid)
    lands in quarantine and NOT in docs.

    Plan shape: each frame is ONE distributed single-pass scan of the
    files AS TEXT (splittable by lines) with ``from_json`` doing the
    typed parse -- deliberately NOT the native JSON scan: Spark
    refuses any query whose pruned column set is only the corrupt
    record column (``docs.count()`` prunes to exactly that), and the
    documented ``cache()`` workaround would pin a corpus-sized parse
    in memory.  The text+from_json route has the same parser and the
    same PERMISSIVE corrupt-record semantics with no such
    restriction.  Blank lines are skipped (matching what the native
    JSON scan would do).
    """
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
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
    bad = F.col(f"__j.{corrupt_col}").isNotNull()
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
    first 12 md5 hex digits of the path as a bigint -- stable across
    runs and engines, so downstream splits/dedup key consistently.

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
            F.conv(F.substring(F.md5("doc_path"), 1, 12), 16, 10)
             .cast("bigint"))
    return df
