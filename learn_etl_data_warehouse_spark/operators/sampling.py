"""Dataset split / sampling / packing operators for training-data prep.

- deterministic hash split: md5-bucket on the id — stable across runs,
  engines, cluster sizes, and data order (the property that matters for
  a train/val/test split: a document never migrates between splits when
  the corpus grows).
- stratified sampling: per-stratum Bernoulli fractions (Spark sampleBy;
  seeded, executor-deterministic).
- sequence packing: concat-then-chunk token packing — documents are laid
  end-to-end in a deterministic order within each shard and sliced into
  fixed-size token windows; each document records its first/last pack.
  Window-sum formulation → one shuffle per shard key, oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def hash_bucket(col, buckets: int = 100):
    """Stable [0, buckets) bucket from the md5 of the value's string form
    (portable: any engine with md5 + hex→int reproduces it)."""
    hex8 = F.substring(F.md5(col.cast("string").cast("binary")), 1, 8)
    return F.conv(hex8, 16, 10).cast("long") % buckets


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Attach a ``split`` column: train/val/test by deterministic hash
    bucket of the id."""
    b = hash_bucket(F.col(id_col))
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. downsample over-represented
    languages). Seeded and reproducible for a fixed partitioning."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def hash_ranked_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum k-sample: rank rows inside each stratum
    by the md5 of their id (a uniform-ish, engine-portable pseudo-random
    order — the same construction as :func:`hash_bucket`) and keep the
    first ``k``. Unlike Bernoulli sampling this is (a) exactly-k per
    stratum, (b) RNG-free and reproducible on any engine, and (c)
    GROWTH-STABLE in the membership-ranking sense: a document's sort key
    never changes, so re-running on a grown corpus only evicts documents
    out-ranked by new arrivals — it never reshuffles the survivors'
    order. One shuffle on the stratum key; ties on the (astronomically
    unlikely) equal digest break on the id."""
    key = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """Concat-then-chunk packing: within each shard, documents are laid
    end-to-end (ordered by id for determinism) and cut into
    ``max_tokens``-sized packs. Emits per-document placement:
    (id, shard, n_tokens, token_offset, pack_first, pack_last).

    One shuffle on the shard key; the running offset is a window prefix
    sum of exact integers. At 100 TB the shard column bounds both the
    window state and the pack id space per task."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tc = token_count(text_col)
    offset = F.coalesce(F.sum(tc).over(w), F.lit(0)).cast("long")
    out = docs.select(
        F.col(id_col),
        F.col(shard_col),
        tc.alias("n_tokens"),
        offset.alias("token_offset"),
    )
    first = F.floor(F.col("token_offset") / max_tokens).cast("long")
    last = F.floor(
        (F.col("token_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
        / max_tokens
    ).cast("long")
    return out.withColumn("pack_first", first).withColumn("pack_last", last)
