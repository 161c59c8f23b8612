"""Python UDTF escape hatch (Spark 4 user-defined TABLE functions).

Completes the engine's declared UDF surface (SURVEY §2.7): scalar
``pandas_udf`` (cleaning twins), per-batch ``mapInPandas`` (multimodal
codecs), per-group ``applyInPandas`` (grouped stats), stateful
``applyInPandasWithState`` / ``transformWithStateInPandas`` (streaming)
— and now the 1→N relational form: a UDTF consumes one row and emits a
variable number of rows, invoked laterally per input row
(``SELECT ... FROM t, LATERAL fn(t.col)``).

Same contract as every other escape hatch here: the example op exists
in BOTH forms — native (``split`` + ``posexplode``, JVM-side, the hot
path) and UDTF — and they are conformance-tested row-for-row equal.
Use the native form unless the per-row expansion logic genuinely needs
Python (a real tokenizer, a parser); the UDTF exists to pin the API
shape and its cost model.

Scale note: a UDTF runs row-at-a-time Python — strictly slower than the
vectorized forms; its niche is 1→N logic with per-row state that
``explode(transform(...))`` can't express. Keep it off hot paths.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

# One pattern, compiled identically on both sides (Java and Python regex
# agree on this subset: a simple character class + quantifier).
SENTENCE_SPLIT = r"[.!?]+\s+"


@udtf(returnType="sent_id int, sentence string")
class SplitSentencesUDTF:
    """Emit one row per sentence of the input text (trimmed, empties
    dropped), with its 0-based position."""

    def eval(self, text: str):  # noqa: D102 — contract method
        if text is None:
            return
        sent_id = 0
        for seg in re.split(SENTENCE_SPLIT, text):
            seg = seg.strip()
            if seg:
                yield (sent_id, seg)
                sent_id += 1


def split_sentences_udtf(
    spark: SparkSession, df: DataFrame, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """UDTF form: register + LATERAL join, one UDTF call per input row."""
    spark.udtf.register("split_sentences", SplitSentencesUDTF)
    df.select(id_col, text_col).createOrReplaceTempView("_udtf_in")
    return spark.sql(
        f"SELECT i.{id_col}, s.sent_id, s.sentence "
        f"FROM _udtf_in i, LATERAL split_sentences(i.{text_col}) s"
    )


def split_sentences_native(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Native twin: same semantics fully JVM-side — ``split`` on the
    identical pattern, trim, drop empties, position via posexplode over
    the filtered array. This is the form for the hot path."""
    segs = F.filter(
        F.transform(
            F.split(F.col(text_col), SENTENCE_SPLIT), lambda s: F.trim(s)
        ),
        lambda s: s != "",
    )
    return (
        df.select(F.col(id_col), F.posexplode(segs).alias("sent_id", "sentence"))
        .select(id_col, "sent_id", "sentence")
    )
