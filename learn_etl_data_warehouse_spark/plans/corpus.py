"""Corpus-cleaning pipeline: the composed flow a training-data prep job
runs over a document collection — the end-to-end counterpart of the
individual operators in ``operators/dedup.py`` / ``operators/text.py``.

Stages (all shuffle-bounded, SCALE.md):
1. exact dedup on the normalized fingerprint (1 shuffle);
2. near-dup removal: MinHash-LSH pairs → connected components → keep
   the minimum id of each duplicate component (exactly one survivor
   per cluster, even when the pair set is incomplete);
3. quality gate: language detected, quality score above threshold;
4. feature attachment for downstream sampling/packing.

Returns (clean_corpus, stats). With ``compute_stats=True`` the stages
are persisted and counted (three extra actions); pass False when only
the final corpus matters — the plan then executes once, lazily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..operators import dedup, text


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    minhash_threshold: float = 0.7,
    quality_threshold: float = 0.5,
    compute_stats: bool = True,
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """``max_bucket_size`` threads through to the MinHash-LSH banding
    (mega-cluster guard). Safe default here is None because stage 1's
    exact dedup has ALREADY collapsed identical documents — the guard
    matters when near-identical (not byte-identical) boilerplate
    families survive the fingerprint pass; set it at web scale."""
    # 1. exact dedup
    exact = dedup.dedup_exact(docs, text_col, id_col)
    if compute_stats:
        # persist the reused stages so the counting actions don't re-run
        # the sketch pipeline once per stage
        exact = exact.persist(StorageLevel.MEMORY_AND_DISK)
        n_input = docs.count()
        n_exact = exact.count()

    # 2. near-dup removal: one survivor (min id) per CONNECTED COMPONENT
    # of the near-dup graph — pairwise loser-dropping would over-keep on
    # incomplete pair sets (see dedup.connected_components docstring)
    pairs = dedup.minhash_lsh_pairs(
        exact,
        text_col,
        id_col,
        num_hashes=64,
        bands=16,
        threshold=minhash_threshold,
        max_bucket_size=max_bucket_size,
    )
    comp = dedup.connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    neardup_free = exact.join(losers, id_col, "left_anti")
    if compute_stats:
        neardup_free = neardup_free.persist(StorageLevel.MEMORY_AND_DISK)
        n_neardup = neardup_free.count()

    # 3. quality gate
    featured = text.add_text_features(neardup_free, text_col)
    clean = featured.filter(
        (F.col("quality") >= quality_threshold) & (F.col("lang_pred") != "und")
    )
    if not compute_stats:
        return clean, None
    n_clean = clean.count()
    stats = docs.sparkSession.createDataFrame(
        [(n_input, n_exact, n_neardup, n_clean)],
        "n_input long, n_after_exact long, n_after_neardup long, n_clean long",
    )
    return clean, stats
