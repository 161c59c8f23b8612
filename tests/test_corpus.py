"""Composed corpus-cleaning pipeline: stage monotonicity + survivor rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from learn_etl_data_warehouse_spark.operators import dedup
from learn_etl_data_warehouse_spark.plans.corpus import clean_corpus
from learn_etl_data_warehouse_spark.sources.parquet import load_table


def test_clean_corpus_stages(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    clean, stats = clean_corpus(docs, minhash_threshold=0.7, quality_threshold=0.3)
    s = stats.collect()[0]
    # monotone shrink through the stages
    assert s["n_input"] >= s["n_after_exact"] >= s["n_after_neardup"] >= s["n_clean"]
    assert s["n_input"] == 500
    # near-dup stage actually removed something (fixture has near-dups)
    assert s["n_after_neardup"] < s["n_after_exact"]
    assert clean.count() == s["n_clean"] > 0
    # survivor rule: for every dropped near-dup pair the LOWER id survives
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.7)
    survivors = {r["doc_id"] for r in clean.select("doc_id").collect()}
    for r in pairs.collect():
        assert r["id_b"] not in survivors or r["id_a"] in survivors
    # output schema carries the features downstream jobs need
    assert {"doc_id", "lang_pred", "quality", "token_count"} <= set(clean.columns)
