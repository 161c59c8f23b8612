"""Fixed-width text source — the third flat-file dialect next to the
reference's semicolon/decimal-comma CSV (`csv_dialect.py`) and JSONL
(`jsonl.py`). Mainframe extracts and legacy feeds still arrive as
column-aligned text; the scan is one `spark.read.text` (splittable,
predicate-pushdown on the derived columns after projection) plus
per-field substring/trim/cast expressions — all codegen'd, no Python.

ANSI-mode note: casts THROW on malformed content (the repo's standing
Spark 4 posture). Fields are trimmed before casting; pass
``permissive=True`` to route uncastable fields through try_cast (NULL
instead of failure) when the feed is known-dirty — the jsonl corrupt-
split pattern, per-field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FieldSpec = tuple[str, int, int, str]  # (name, start_1_based, length, type)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    spec: list[FieldSpec],
    skip_blank: bool = True,
    permissive: bool = False,
) -> DataFrame:
    """Parse a fixed-width file per ``spec``.

    Each field is ``substring(line, start, length)`` (1-based, the COBOL
    copybook convention), trimmed, cast to its declared type. Overlaps
    and gaps in the spec are allowed (gaps are simply never read).
    """
    if not spec:
        raise ValueError("read_fixed_width: spec must be non-empty")
    lines = spark.read.text(path)
    if skip_blank:
        lines = lines.filter(F.length(F.trim(F.col("value"))) > 0)
    cast_fn = "try_cast" if permissive else "cast"
    cols = []
    for name, start, length, dtype in spec:
        raw = f"trim(substring(value, {int(start)}, {int(length)}))"
        cols.append(
            F.expr(f"{cast_fn}({raw} AS {dtype})").alias(name)
        )
    return lines.select(*cols)
