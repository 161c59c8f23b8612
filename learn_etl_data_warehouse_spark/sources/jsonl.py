"""JSONL (newline-delimited JSON) source/sink — the interchange format
every LLM corpus pipeline speaks (one document object per line).

Spark's native JSON source already IS line-delimited when
``multiLine=False`` (the default), so both directions are thin wrappers
whose value is the CONTRACT they pin:

- reads take an explicit schema (SURVEY §1.2: no inference — a schema
  inference pass over 100 TB is a full extra scan, and sampled inference
  silently drops fields absent from the sample);
- reads are PERMISSIVE with a ``_corrupt`` column so one malformed line
  quarantines instead of failing a 1000-executor job (corrupt rows are
  routed, not dropped — the same quarantine semantics as the multimodal
  decode kernels);
- writes shard to one file per partition (a directory of .jsonl part
  files), which is what downstream tokenizer jobs expect to glob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-first permissive JSONL scan. Malformed lines land in the
    ``_corrupt`` column (raw line text, every data column null); callers
    split good/bad with :func:`split_corrupt`.

    Implemented as a TEXT scan + ``from_json`` expression rather than the
    native JSON source: parsing-as-expression sidesteps Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction (the native source
    refuses plans whose pruned read schema is only the corrupt column,
    which is exactly what a quarantine-audit query wants to do), while
    keeping the same Jackson parse cost and line-splittable parallelism.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    raw = spark.read.text(path)
    return raw.select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_d")
    ).select("_d.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_raw_lines)."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as a directory of JSONL part files (one per partition —
    writers stay parallel; no single-file coalesce bottleneck)."""
    df.write.mode(mode).json(path)
