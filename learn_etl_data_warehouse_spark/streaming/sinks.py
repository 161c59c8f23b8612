"""Streaming sinks with exactly-once semantics via ``foreachBatch``.

File/JDBC-style sinks are at-least-once by default: a failed micro-batch
retries and re-writes its output. The standard fix is idempotent writes
keyed by the (deterministic) batch id — replaying batch N overwrites
batch N's own output instead of appending a duplicate.

Here: each micro-batch lands in ``<out>/batch_id=N`` with
``mode("overwrite")`` on that partition directory only. Readers see the
union of batch directories; a replayed batch replaces itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def idempotent_parquet_sink(out_dir: str):
    """Returns a ``foreachBatch`` function writing each micro-batch to
    its own batch_id partition, overwrite-on-replay."""

    def write_batch(df, batch_id: int) -> None:
        (
            df.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}"
            )
        )

    return write_batch


def start_idempotent_stream(stream_df, out_dir: str, checkpoint_dir: str):
    """Attach the idempotent sink with a checkpoint (the pair that gives
    end-to-end exactly-once for replayable sources)."""
    return (
        stream_df.writeStream.foreachBatch(idempotent_parquet_sink(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_ingest_sink(
    catalog_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
):
    """foreachBatch handler for the STREAMING corpus-ingest path: each
    micro-batch is near-dup-deduped against the persisted MinHash-LSH
    index (corpus text is never re-read — the index IS the dedup
    state), then the survivors and the index growth commit as ONE
    catalog transaction, so `docs`, `sigs` and `buckets` flip together:
    a reader can never see a document the index doesn't know about, or
    index rows for documents that aren't published.

    Each batch lands as its own ``ingest_batch=<id>`` partition in all
    three member tables (`catalog_commit(replace=False)` upserts only
    the arriving partition — append economics, no table rewrite), so at
    100 TB per-batch cost follows the BATCH, not the corpus.

    Exactly-once comes from the dedup semantics themselves, not from
    txn bookkeeping: a replayed batch's documents are exact duplicates
    of their already-indexed selves (est_jaccard = 1 ≥ threshold), so
    every one is dropped, the survivor set is empty, and the batch
    commits nothing — the pipeline is idempotent by CONTENT. A crash
    before the catalog swap publishes nothing (all-or-nothing catalog
    commit) and the replay then applies normally.
    """
    from learn_etl_data_warehouse_spark.operators import dedup
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    mh = dict(
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if {"sigs", "buckets"} <= tables:
            sigs = cat.catalog_read(spark, catalog_dir, "sigs").drop(
                "ingest_batch"
            )
            buckets = cat.catalog_read(spark, catalog_dir, "buckets").drop(
                "ingest_batch"
            )
        else:  # bootstrap: empty index degrades to within-batch dedup
            sigs, buckets = dedup.minhash_index(batch_df.limit(0), **mh)
        survivors, new_sigs, new_buckets = dedup.minhash_dedup_against(
            batch_df, sigs, buckets, threshold=threshold, **mh
        )
        b = F.lit(int(batch_id))
        writes = {
            "docs": (survivors.withColumn("ingest_batch", b), ["ingest_batch"]),
            "sigs": (new_sigs.withColumn("ingest_batch", b), ["ingest_batch"]),
            "buckets": (
                new_buckets.withColumn("ingest_batch", b),
                ["ingest_batch"],
            ),
        }
        if survivors.isEmpty():
            return  # fully-duplicate (or replayed) batch: nothing to publish
        cat.catalog_commit(spark, catalog_dir, writes, replace=False)

    return handle


def lm_stats_ingest_sink(catalog_dir: str, text_col: str = "text"):
    """foreachBatch handler maintaining bigram-LM statistics
    incrementally: each micro-batch's pair counts merge additively into
    the stored (w1, w2, n2) state (`maintain_bigram_counts` — the
    corpus is never re-tokenized) and publish as ONE catalog
    transaction together with a batch ledger.

    Exactly-once here is LEDGER-derived, the complement of
    `dedup_ingest_sink`'s content-derived idempotence: counts are NOT
    idempotent under replay (re-adding a batch doubles it), so the
    commit includes an `lm_applied` row keyed by batch id and the
    handler skips batches already in the ledger. Ledger + counts flip
    in one catalog swap, so a crash between them is impossible — a
    crash before the swap publishes neither, and the replay then
    applies exactly once.

    The counts table lands under a single `state=live` partition
    (upsert replaces exactly that partition — the merged state IS the
    new table); the ledger appends one `ingest_batch=<id>` partition
    per batch. The ledger read is one row per batch — bounded
    metadata, not data.
    """
    from learn_etl_data_warehouse_spark.operators.text import (
        bigram_counts_table,
        maintain_bigram_counts,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "lm_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "lm_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        if "lm_counts" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "lm_counts").select(
                "w1", "w2", "n2"
            )
            merged = maintain_bigram_counts(prev, batch_df, text_col)
        else:
            merged = bigram_counts_table(batch_df, text_col)
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "lm_counts": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "lm_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def hll_ingest_sink(
    catalog_dir: str,
    key_col: str = "o_custkey",
    group_col: str = "o_orderpriority",
):
    """foreachBatch handler maintaining the deterministic md5-HLL NDV
    sketch (sk01) incrementally: each micro-batch's register table
    folds into the stored (grp, reg, rho_max) state by per-register
    MAX, and the derived integer estimate publishes alongside it in ONE
    catalog transaction (`hll_registers` + `hll_ndv` flip together).

    Exactly-once here is MAX-MERGE-derived — a third idempotence
    posture next to `dedup_ingest_sink` (content-derived) and the
    counted sinks (ledger-derived): max is idempotent and associative,
    so a REPLAYED batch folds to the byte-identical register state and
    the re-publish is a semantic no-op. No ledger table, no batch
    bookkeeping — the algebra of the state is the recovery story.

    State is ≤ m registers per group — alphabet-bounded metadata,
    never data-sized; the estimate re-derivation per batch is a
    group-grain agg over that bounded state.
    """
    from learn_etl_data_warehouse_spark.operators.sketches import (
        md5_hll_estimate,
        md5_hll_merge,
        md5_hll_registers,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        regs = md5_hll_registers(batch_df, key_col, group_col)
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "hll_registers" in tables:
            prev = cat.catalog_read(
                spark, catalog_dir, "hll_registers"
            ).select("grp", "reg", "rho_max")
            regs = md5_hll_merge(prev, regs)
        est = md5_hll_estimate(regs)
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "hll_registers": (
                    regs.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "hll_ndv": (
                    est.withColumn("state", F.lit("live")),
                    ["state"],
                ),
            },
            replace=False,
        )

    return handle


def substring_index_ingest_sink(
    catalog_dir: str,
    level: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch handler maintaining the exact-substring dedup INDEX
    (r9, the d34/d35 family's streaming member): each micro-batch's
    ``level``-gram counts merge additively into the stored (g, n)
    state (`dedup.py::maintain_gram_counts` — the corpus is never
    re-tokenized) and the batch's documents land in a ``docs`` table,
    all in ONE catalog transaction with a batch ledger.

    The scrub itself stays an on-demand READ
    (`dedup.py::scrub_against_index` over any doc subset + the live
    counts) — publishing a full-corpus scrub per batch would re-scan
    history, which is exactly what the maintained state exists to
    avoid; the retroactive-flip semantics (a new copycat changes how
    its victims scrub) follow from reading the CURRENT state.

    Exactly-once is LEDGER-derived (the `lm_stats_ingest_sink`
    posture): counts are not replay-idempotent, so a batch already in
    `substring_applied` is skipped; ledger + counts + docs flip in one
    catalog swap.
    """
    from learn_etl_data_warehouse_spark.operators.dedup import (
        gram_counts_table,
        maintain_gram_counts,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "substring_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(
                    spark, catalog_dir, "substring_applied"
                )
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        if "substring_counts" in tables:
            prev = cat.catalog_read(
                spark, catalog_dir, "substring_counts"
            ).select("g", "n")
            merged = maintain_gram_counts(
                prev, batch_df, level, text_col, id_col
            )
        else:
            merged = gram_counts_table(batch_df, level, text_col, id_col)
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "substring_counts": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "substring_docs": (
                    batch_df.select(id_col, text_col).withColumn(
                        "ingest_batch", F.lit(int(batch_id))
                    ),
                    ["ingest_batch"],
                ),
                "substring_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def anomaly_alert_sink(
    catalog_dir: str,
    key: str = "event_type",
    ts: str = "ts",
    trailing: int = 24,
    min_prev: int = 6,
    sigmas: int = 3,
):
    """foreachBatch handler for streaming spike detection: each
    micro-batch's hourly counts merge ADDITIVELY into the stored
    (key, hr, x) state, the trailing-window anomaly derivation
    (`operators/timeseries.py::anomalies_from_hourly`) re-runs over
    the maintained state — state-sized cost, the event history is
    never re-scanned — and the flagged hours publish as the
    `spike_alerts` table. Counts, alerts, and the batch ledger flip in
    ONE catalog transaction.

    Exactly-once is LEDGER-derived (the `lm_stats_ingest_sink`
    posture): counts are not replay-idempotent, so a batch already in
    `anomaly_applied` is skipped; ledger and state commit atomically,
    so no crash point can double-apply.

    Alert semantics: alerts are derived from the CURRENT state, so a
    late-arriving batch can retroactively flag (or unflag) an earlier
    hour — the published table is always the full, consistent
    diagnosis of the data seen so far, not an append-only alert log
    (readers wanting history can time-travel the catalog).
    """
    from learn_etl_data_warehouse_spark.operators.timeseries import (
        anomalies_from_hourly,
        hourly_counts,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "anomaly_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(
                    spark, catalog_dir, "anomaly_applied"
                )
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        delta = hourly_counts(batch_df, key, ts)
        if "hourly_counts" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "hourly_counts").select(
                key, "hr", "x"
            )
            merged = (
                prev.withColumnRenamed("x", "_px")
                .join(
                    delta.withColumnRenamed("x", "_dx"),
                    [key, "hr"],
                    "full_outer",
                )
                .select(
                    key,
                    "hr",
                    (
                        F.coalesce(F.col("_px"), F.lit(0))
                        + F.coalesce(F.col("_dx"), F.lit(0))
                    ).alias("x"),
                )
            )
        else:
            merged = delta
        alerts = anomalies_from_hourly(
            merged, key, trailing, min_prev, sigmas
        ).filter(F.col("is_spike"))
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "hourly_counts": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "spike_alerts": (
                    alerts.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "anomaly_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def forecast_refresh_sink(
    catalog_dir: str,
    key: str = "event_type",
    ts: str = "ts",
    horizon: int = 24,
):
    """foreachBatch handler maintaining the FORECASTING surface (r8
    verdict item 6, fc01's streaming twin): each micro-batch's hourly
    counts merge ADDITIVELY into the stored (key, hr, x) state — the
    same state grain `anomaly_alert_sink` keeps — and the full
    hour-of-day-profile + Theil–Sen forecast
    (`operators/timeseries.py::forecast_hourly`) re-derives from the
    maintained state, never re-scanning the event history. Counts,
    the published `hourly_forecast` table, and the batch ledger flip
    in ONE catalog transaction.

    State-sized cost is the whole point: the profile/trend derivation
    runs on the hourly grid (calendar-bounded — a year is 8,760 rows
    per key regardless of corpus size), so each micro-batch pays
    O(batch) for the delta agg plus O(state) for the refresh,
    independent of total events ingested.

    Exactly-once is LEDGER-derived (the `lm_stats_ingest_sink`
    posture): counts are not replay-idempotent, so a batch already in
    `forecast_applied` is skipped; ledger and state commit atomically,
    so no crash point can double-apply.

    Forecast semantics: the published table is always the forecast
    from ALL data seen so far (anchor = max observed hour per key) —
    a late batch can move both the profile and the anchor, exactly as
    a batch re-run over the full history would.
    """
    from learn_etl_data_warehouse_spark.operators.timeseries import (
        forecast_hourly,
        hourly_counts,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "forecast_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(
                    spark, catalog_dir, "forecast_applied"
                )
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        delta = hourly_counts(batch_df, key, ts)
        if "hourly_counts" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "hourly_counts").select(
                key, "hr", "x"
            )
            merged = (
                prev.withColumnRenamed("x", "_px")
                .join(
                    delta.withColumnRenamed("x", "_dx"),
                    [key, "hr"],
                    "full_outer",
                )
                .select(
                    key,
                    "hr",
                    (
                        F.coalesce(F.col("_px"), F.lit(0))
                        + F.coalesce(F.col("_dx"), F.lit(0))
                    ).alias("x"),
                )
            )
        else:
            merged = delta
        forecast = forecast_hourly(merged, key, horizon)
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "hourly_counts": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "hourly_forecast": (
                    forecast.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "forecast_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def join_view_sink(
    catalog_dir: str,
    dim_table_dir: str,
    key: str | list[str],
):
    """foreachBatch handler maintaining a MATERIALIZED JOIN VIEW of a
    streaming fact feed against a warehouse dimension: each
    micro-batch is an all-insert CDF, so the join-view IVM delta
    (`operators/rollups.py::maintain_join_view`) collapses to
    Δbatch ⋈ dim, merged additively into the stored counted view —
    change-volume cost, the fact history is never re-joined.

    The dimension is read as a fresh manifest SNAPSHOT per batch (the
    `enriched_stream_sink` lesson: a path-static join pins its file
    listing and dies on dim overwrite). Semantics follow from that:
    a fact row is enriched with the dim version CURRENT AT INGEST —
    earlier view rows are not retroactively re-enriched (that's the
    SCD-at-ingest behavior a serving view wants; re-enrichment is a
    batch maintain_join_view run with the dim's own CDF).

    Exactly-once is LEDGER-derived (the `lm_stats_ingest_sink`
    posture): counted multiplicities are not replay-idempotent, so a
    batch already in `join_view_applied` is skipped; view + ledger
    flip in ONE catalog transaction.
    """
    from learn_etl_data_warehouse_spark.operators.rollups import (
        maintain_join_view,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat
    from learn_etl_data_warehouse_spark.plans import manifest_warehouse as mw

    keys = [key] if isinstance(key, str) else list(key)

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "join_view_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(
                    spark, catalog_dir, "join_view_applied"
                )
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already in the view
        dim = mw.read_snapshot(spark, dim_table_dir)
        view_cols = (
            keys
            + [c for c in batch_df.columns if c not in keys]
            + [c for c in dim.columns if c not in keys]
        )
        if "join_view" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "join_view").select(
                *view_cols, "cnt"
            )
        else:
            prev = (
                batch_df.join(dim, keys)
                .select(*view_cols)
                .limit(0)
                .withColumn("cnt", F.lit(0).cast("long"))
            )
        diff_a = batch_df.withColumn("_change_type", F.lit("insert"))
        empty_diff_b = dim.withColumn(
            "_change_type", F.lit("insert")
        ).limit(0)
        new_view = maintain_join_view(
            prev, batch_df, dim, diff_a, empty_diff_b, keys
        )
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "join_view": (
                    new_view.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "join_view_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def sla_percentile_sink(catalog_dir: str):
    """foreachBatch handler for streaming SLA percentiles: each
    micro-batch's (key, day, dc, fd, n) log-bucket histogram counts
    (operators/sketches.py::value_histogram_state) merge ADDITIVELY
    into the stored state — bucket counts are the mergeable reduction
    of percentiles, which themselves aren't — and the served
    p50/p95/p99 table (histogram_percentiles) republishes from the
    maintained state, state-sized cost, the event history never
    re-scanned. State, served percentiles, and the batch ledger flip
    in ONE catalog transaction.

    Exactly-once is LEDGER-derived (the lm_stats/anomaly posture —
    counts are not replay-idempotent): a batch already in
    ``sla_applied`` is skipped; a crash before the swap publishes
    nothing and the replay then applies exactly once.
    """
    from learn_etl_data_warehouse_spark.operators.sketches import (
        histogram_percentiles,
        value_histogram_state,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "sla_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "sla_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return
        delta = value_histogram_state(batch_df)
        if "sla_state" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "sla_state").select(
                "key", "day", "dc", "fd", "n"
            )
            merged = (
                prev.unionByName(delta)
                .groupBy("key", "day", "dc", "fd")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        else:
            merged = delta
        served = histogram_percentiles(merged)
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "sla_state": (
                    merged.withColumn("state", F.lit("live")), ["state"]
                ),
                "sla_percentiles": (
                    served.withColumn("state", F.lit("live")), ["state"]
                ),
                "sla_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def cdc_apply_sink(
    table: str,
    key_cols: list[str],
    seq_col: str = "_seq",
    op_col: str = "_op",
):
    """foreachBatch handler applying a CHANGE-DATA-CAPTURE feed to a
    manifest-warehouse table — the "apply the OLTP binlog to the lake"
    pattern (Delta's ``MERGE``-from-CDC recipe). Each micro-batch of
    ``(key..., full row..., seq, op)`` change events is reduced to
    last-write-wins per key by ``seq_col`` (the CDC log sequence
    number: within one key, later LSN wins; ties are broken by
    preferring the delete so a same-LSN D/U pair can't resurrect), then
    applied with ``plans/manifest_warehouse.py::merge_apply`` —
    deletes, updates and inserts land in ONE atomic manifest swap per
    batch.

    Exactly-once is CONTENT-derived, like ``dedup_ingest_sink``: a
    replayed batch re-reduces to the same finalized per-key outcomes,
    whose re-application is a no-op (upserting the rows the table
    already holds, deleting keys already gone). No ledger table to
    maintain; a crash between apply and the stream checkpoint replays
    harmlessly."""
    from pyspark.sql import Window

    from learn_etl_data_warehouse_spark.plans.manifest_warehouse import (
        merge_apply,
    )

    def handle(batch_df, batch_id: int) -> None:
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(),
            (F.col(op_col) == "D").desc(),
        )
        final = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", seq_col)
        )
        merge_apply(
            batch_df.sparkSession, table, final, key_cols, op_col=op_col
        )

    return handle


def geo_enrich_sink(
    ref_table_dir: str,
    out_dir: str,
    radius: int,
    id_col: str = "pid",
    x_col: str = "x",
    y_col: str = "y",
):
    """foreachBatch GEO-ATTACH enrichment: each micro-batch of point
    events gets its nearest reference point within ``radius`` attached
    ("which depot serves this event") — the streaming twin of the batch
    r09 join (operators/spatial.py::grid_nearest_join), the r6 verdict's
    item 5.

    Composition of two proven postures:

    - the reference points are re-read per batch as a manifest-warehouse
      SNAPSHOT (the ``enriched_stream_sink`` lesson — a path-static join
      pins its file listing at plan time and dies FILE_NOT_EXIST when
      the dim is overwritten; snapshot re-resolution gives each batch
      the latest atomically-published depot set, SCD-at-ingest);
    - output lands in ``<out>/batch_id=N`` with per-partition overwrite
      (the ``idempotent_parquet_sink`` posture): enrichment is a pure
      per-row function of (point, current refs), so a replayed batch
      rewrites itself byte-for-byte — exactly-once without a ledger.

    Points with no in-range reference keep their row with NULL
    ref_id/dist_sq (left join — the batch twin's semantics for "no
    depot in range" are an absent row, so the conformance test compares
    the attached pairs). Per batch the plan is the same bounded
    grid-blocked join as r09: cell == radius, 3×3 neighborhood, one
    hash join on the cell key, per-point (dist², ref id) argmin —
    candidates bounded by local depot density, never all-pairs.
    """
    from ..operators.spatial import grid_nearest_join
    from ..plans.manifest_warehouse import read_snapshot

    def handle(batch_df, batch_id: int) -> None:
        refs = read_snapshot(batch_df.sparkSession, ref_table_dir)
        nearest = grid_nearest_join(
            batch_df, refs, radius, id_col=id_col, x_col=x_col, y_col=y_col
        )
        (
            batch_df.join(nearest, id_col, "left")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    return handle


def card_ingest_sink(catalog_dir: str):
    """foreachBatch handler maintaining the DATASET CARD incrementally
    (r7): each micro-batch of documents folds into the three
    card-state tables (plans/corpus.py::card_state_tables — additive
    per-source moments, counted fingerprint pairs, counted language
    pairs) and publishes as ONE catalog transaction with a batch
    ledger. Refreshing the card after an ingest costs change-volume,
    never a corpus rescan; ``plans.corpus.card_from_state`` over the
    committed state equals the full :func:`dataset_card` rebuild
    (conformance-tested), and two committed states diff directly via
    ``dataset_card_diff``'s card grain.

    Exactly-once is LEDGER-derived (the ``lm_stats_ingest_sink``
    posture): counts double under replay, so a batch already in
    ``card_applied`` is skipped; the three state tables + ledger flip
    in one atomic catalog swap.
    """
    from learn_etl_data_warehouse_spark.plans import catalog as cat
    from learn_etl_data_warehouse_spark.plans.corpus import (
        card_state_tables,
        merge_card_state,
    )

    STATE = {
        "card_moments": "moments",
        "card_fp_counts": "fp_counts",
        "card_lang_counts": "lang_counts",
    }

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "card_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "card_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the card
        batch_state = card_state_tables(batch_df)
        if "card_moments" in tables:
            prev = {
                key: cat.catalog_read(spark, catalog_dir, tbl).drop("state")
                for tbl, key in STATE.items()
            }
            merged = merge_card_state(prev, batch_state)
        else:
            merged = batch_state
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        commit = {
            tbl: (
                merged[key].withColumn("state", F.lit("live")),
                ["state"],
            )
            for tbl, key in STATE.items()
        }
        commit["card_applied"] = (ledger, ["ingest_batch"])
        cat.catalog_commit(spark, catalog_dir, commit, replace=False)

    return handle


def classifier_train_sink(catalog_dir: str):
    """foreachBatch ONLINE TRAINING of the quality classifier (r7):
    each micro-batch of documents runs ONE perceptron round warm-started
    from the stored weight vector (operators/classifier.py::
    perceptron_train(init=...)) — sequential mini-batch training, the
    way a production quality model keeps learning as the corpus grows —
    and commits weights + a batch ledger in one catalog transaction.

    Exactly-once is LEDGER-derived (the lm_stats posture): a weight
    update is not replay-idempotent (re-applying a batch moves the
    vector again), so a batch already in ``clf_applied`` is skipped;
    weights + ledger flip atomically. The stored table is 6 rows
    (feature, weight) plus a monotone ``trained_rounds`` counter —
    bounded metadata. The conformance test pins the streamed result
    against a plain-Python sequential reference over the same batch
    sequence.
    """
    from learn_etl_data_warehouse_spark.operators.classifier import (
        FEATURE_NAMES,
        perceptron_train,
        quality_features,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "clf_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "clf_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: weights already moved
        init = None
        rounds_done = 0
        if "clf_weights" in tables:
            rows = cat.catalog_read(
                spark, catalog_dir, "clf_weights"
            ).collect()
            init = {r["feature"]: int(r["weight"]) for r in rows}
            rounds_done = int(rows[0]["trained_rounds"]) if rows else 0
        feats = quality_features(batch_df)
        traj = perceptron_train(feats, rounds=1, init=init)
        new_w = traj.filter(F.col("rnd") == 1).select(
            "feature", "weight"
        ).withColumn(
            "trained_rounds", F.lit(int(rounds_done) + 1).cast("long")
        )
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "clf_weights": (
                    new_w.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "clf_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def tokenizer_stats_ingest_sink(
    catalog_dir: str, text_col: str = "text", max_len: int = 4
):
    """foreachBatch handler maintaining unigram-LM tokenizer SEED
    statistics incrementally: each micro-batch's substring counts merge
    additively into the stored (piece, n) state
    (``maintain_unigram_seed_counts`` — the corpus is never
    re-tokenized) and publish as ONE catalog transaction with a batch
    ledger. Re-seeding a tokenizer after ingest (``select_vocab`` +
    ``costs_from_counts`` over the maintained table) costs a
    vocab-bounded read instead of a 100 TB re-scan.

    Exactly-once is LEDGER-derived (the lm_stats_ingest_sink posture):
    substring counts are NOT replay-idempotent, so the commit includes
    a ``tok_applied`` row keyed by batch id in the same catalog swap —
    a crash between ledger and counts is impossible, and a replayed
    batch is skipped by the ledger read (one row per batch, bounded
    metadata)."""
    from learn_etl_data_warehouse_spark.operators.unigram import (
        maintain_unigram_seed_counts,
        unigram_seed_counts,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "tok_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "tok_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        if "tok_counts" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "tok_counts").select(
                "piece", "n"
            )
            merged = maintain_unigram_seed_counts(
                prev, batch_df, text_col, max_len
            )
        else:
            merged = unigram_seed_counts(batch_df, text_col, max_len)
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "tok_counts": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "tok_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def dfg_ingest_sink(
    catalog_dir: str,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
):
    """foreachBatch handler maintaining pm02's performance-annotated
    directly-follows graph incrementally — the process-mining monitor a
    deployment keeps live over an event stream.

    State design: edge aggregates are NOT additive at edge grain
    (n_actors is a COUNT DISTINCT), so the maintained state is the
    (a, b, actor) grain — ``dfg_edge_actors`` (n, sum_gap, min_gap,
    max_gap per actor per edge; all four merge under add/least/
    greatest) — plus ``dfg_tails``: each actor's LAST event (ts, id,
    type), the boundary state that stitches consecutive batches. Each
    micro-batch unions the arriving events with the stored tails, takes
    consecutive pairs per actor under the total (ts, id) order (the
    tail contributes exactly the one boundary hop; hops among earlier
    events are already in state), folds them into the actor-grain
    state, refreshes the tails, and re-derives the published
    ``dfg_edges`` (n_traversals, n_actors, min/mean/max gap — pm02's
    exact schema) from the state. All four tables + the ``dfg_applied``
    ledger flip in ONE catalog transaction.

    Ordering contract: per-actor IN-ORDER arrival across batches (an
    actor's batch-N events are all later than its stored tail) — the
    ``stateful.py`` sessionizer's documented assumption; within a batch
    the total (ts, id) order needs no such care. Exactly-once is
    LEDGER-derived (hop counts are not replay-idempotent).

    Cost per batch: O(batch) for the hop window + O(state) for the
    edge re-agg — the state is bounded by |alphabet|² · actors, never
    by ingested history. Conformance: published dfg_edges ==
    ``direct_follows_graph`` over all events seen, after EVERY batch
    (tests/test_streaming.py)."""
    from pyspark.sql import Window

    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "dfg_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "dfg_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        ev = batch_df.select(
            F.col(actor_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            F.col(type_col).alias("_t"),
        )
        if "dfg_tails" in tables:
            tails = cat.catalog_read(spark, catalog_dir, "dfg_tails").select(
                "_u", "_ts", "_id", "_t"
            )
            ev_all = ev.unionByName(tails)
        else:
            ev_all = ev
        trace = Window.partitionBy("_u").orderBy("_ts", "_id")
        hops = (
            ev_all.withColumn("_nxt", F.lead("_t").over(trace))
            .withColumn("_nts", F.lead("_ts").over(trace))
            .filter(F.col("_nxt").isNotNull())
            .select(
                F.col("_t").alias("a"),
                F.col("_nxt").alias("b"),
                "_u",
                F.expr("unix_micros(_nts) - unix_micros(_ts)").alias("_gap"),
            )
        )
        delta = hops.groupBy("a", "b", "_u").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_gap").cast("long").alias("sum_gap"),
            F.min("_gap").cast("long").alias("min_gap"),
            F.max("_gap").cast("long").alias("max_gap"),
        )
        if "dfg_edge_actors" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "dfg_edge_actors").select(
                "a", "b", "_u", "n", "sum_gap", "min_gap", "max_gap"
            )
            merged = (
                prev.select(
                    "a", "b", "_u",
                    F.col("n").alias("_pn"),
                    F.col("sum_gap").alias("_ps"),
                    F.col("min_gap").alias("_pmn"),
                    F.col("max_gap").alias("_pmx"),
                )
                .join(
                    delta.select(
                        "a", "b", "_u",
                        F.col("n").alias("_dn"),
                        F.col("sum_gap").alias("_ds"),
                        F.col("min_gap").alias("_dmn"),
                        F.col("max_gap").alias("_dmx"),
                    ),
                    ["a", "b", "_u"],
                    "full_outer",
                )
                .select(
                    "a", "b", "_u",
                    (
                        F.coalesce(F.col("_pn"), F.lit(0))
                        + F.coalesce(F.col("_dn"), F.lit(0))
                    ).cast("long").alias("n"),
                    (
                        F.coalesce(F.col("_ps"), F.lit(0))
                        + F.coalesce(F.col("_ds"), F.lit(0))
                    ).cast("long").alias("sum_gap"),
                    F.least(
                        F.coalesce(F.col("_pmn"), F.col("_dmn")),
                        F.coalesce(F.col("_dmn"), F.col("_pmn")),
                    ).cast("long").alias("min_gap"),
                    F.greatest(
                        F.coalesce(F.col("_pmx"), F.col("_dmx")),
                        F.coalesce(F.col("_dmx"), F.col("_pmx")),
                    ).cast("long").alias("max_gap"),
                )
            )
        else:
            merged = delta
        last = Window.partitionBy("_u").orderBy(
            F.desc("_ts"), F.desc("_id")
        )
        batch_tails = (
            ev.withColumn("_rn", F.row_number().over(last))
            .filter(F.col("_rn") == 1)
            .select("_u", "_ts", "_id", "_t")
        )
        if "dfg_tails" in tables:
            kept = tails.join(
                batch_tails.select(F.col("_u").alias("_bu")),
                tails["_u"] == F.col("_bu"),
                "left_anti",
            )
            new_tails = kept.unionByName(batch_tails)
        else:
            new_tails = batch_tails
        edges = merged.groupBy("a", "b").agg(
            F.sum("n").cast("long").alias("n_traversals"),
            F.count(F.lit(1)).cast("long").alias("n_actors"),
            F.min("min_gap").cast("long").alias("min_gap_us"),
            F.expr("sum(sum_gap) div sum(n)").cast("long").alias("mean_gap_us"),
            F.max("max_gap").cast("long").alias("max_gap_us"),
        )
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "dfg_edge_actors": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "dfg_tails": (
                    new_tails.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "dfg_edges": (
                    edges.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "dfg_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def conformance_ingest_sink(
    catalog_dir: str,
    allowed_pairs: list[tuple[str, str]],
    actor_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
):
    """foreachBatch handler maintaining pm04's conformance fitness
    incrementally — the live compliance monitor over an event stream
    (the dfg_ingest_sink posture applied to the VALIDATION half of
    process mining).

    State design: per-actor (n_moves, n_allowed) IS additive once the
    cross-batch boundary hop is stitched, so the state is simpler than
    the DFG's — ``conf_actor_state`` (additive counters per actor) +
    ``conf_tails`` (each actor's last event, contributing exactly the
    one boundary move per batch). Each micro-batch unions arriving
    events with stored tails, takes consecutive moves per actor under
    the total (ts, id) order, scores them against the broadcast
    normative model, folds the per-actor deltas in, refreshes tails,
    and re-derives the published ``conf_fitness`` (pm04's exact
    schema) from state. All tables + the ``conf_applied`` ledger flip
    in ONE catalog transaction; exactly-once is LEDGER-derived (move
    counts are not replay-idempotent).

    Ordering contract: per-actor in-order arrival across batches (the
    stateful.py posture). Cost per batch: O(batch) for the move window
    + O(actors) for the state merge — never history-sized. Conformance:
    published conf_fitness == ``conformance_fitness`` over all events
    seen, after EVERY batch (tests/test_streaming.py)."""
    from pyspark.sql import Window

    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "conf_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "conf_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return
        ev = batch_df.select(
            F.col(actor_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            F.col(type_col).alias("_t"),
        )
        if "conf_tails" in tables:
            tails = cat.catalog_read(spark, catalog_dir, "conf_tails").select(
                "_u", "_ts", "_id", "_t"
            )
            ev_all = ev.unionByName(tails)
        else:
            tails = None
            ev_all = ev
        trace = Window.partitionBy("_u").orderBy("_ts", "_id")
        moves = ev_all.withColumn("_nxt", F.lead("_t").over(trace)).filter(
            F.col("_nxt").isNotNull()
        )
        model = spark.createDataFrame(
            [(a, b) for a, b in allowed_pairs], "_t string, _nxt string"
        ).withColumn("_ok", F.lit(1))
        delta = (
            moves.join(F.broadcast(model), ["_t", "_nxt"], "left")
            .groupBy("_u")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_moves"),
                F.sum(F.coalesce(F.col("_ok"), F.lit(0)))
                .cast("long")
                .alias("n_allowed"),
            )
        )
        if "conf_actor_state" in tables:
            prev = cat.catalog_read(
                spark, catalog_dir, "conf_actor_state"
            ).select("_u", "n_moves", "n_allowed")
            merged = (
                prev.select(
                    "_u",
                    F.col("n_moves").alias("_pm"),
                    F.col("n_allowed").alias("_pa"),
                )
                .join(
                    delta.select(
                        "_u",
                        F.col("n_moves").alias("_dm"),
                        F.col("n_allowed").alias("_da"),
                    ),
                    "_u",
                    "full_outer",
                )
                .select(
                    "_u",
                    (
                        F.coalesce(F.col("_pm"), F.lit(0))
                        + F.coalesce(F.col("_dm"), F.lit(0))
                    ).cast("long").alias("n_moves"),
                    (
                        F.coalesce(F.col("_pa"), F.lit(0))
                        + F.coalesce(F.col("_da"), F.lit(0))
                    ).cast("long").alias("n_allowed"),
                )
            )
        else:
            merged = delta
        last = Window.partitionBy("_u").orderBy(F.desc("_ts"), F.desc("_id"))
        batch_tails = (
            ev.withColumn("_rn", F.row_number().over(last))
            .filter(F.col("_rn") == 1)
            .select("_u", "_ts", "_id", "_t")
        )
        if tails is not None:
            kept = tails.join(
                batch_tails.select(F.col("_u").alias("_bu")),
                tails["_u"] == F.col("_bu"),
                "left_anti",
            )
            new_tails = kept.unionByName(batch_tails)
        else:
            new_tails = batch_tails
        fitness = merged.select(
            F.col("_u").alias("actor"),
            "n_moves",
            "n_allowed",
            (F.col("n_moves") - F.col("n_allowed"))
            .cast("long")
            .alias("n_violations"),
            F.expr("(1000000 * n_allowed) div n_moves")
            .cast("long")
            .alias("fitness_ppm"),
        )
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "conf_actor_state": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "conf_tails": (
                    new_tails.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "conf_fitness": (
                    fitness.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "conf_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def hw_refresh_sink(
    catalog_dir: str,
    key: str = "event_type",
    ts: str = "ts",
    period: int = 24,
):
    """foreachBatch handler maintaining the HOLT–WINTERS surface (r11
    verdict item 6, fc06's streaming twin): hourly counts merge
    additively into the stored (key, hr, x) state, and the adaptive
    (level, trend, period-slot seasonal) recursion state plus the
    one-step forecast re-derive per micro-batch. Counts, ``hw_state``,
    ``hw_forecast``, and the batch ledger flip in ONE catalog
    transaction; exactly-once is LEDGER-derived (the
    ``forecast_refresh_sink`` posture — an HW fold is not
    replay-idempotent).

    Cost discipline — the recursion is sequential, so the sink routes
    PER KEY:

    - a key whose new hours all land PAST its carried ``last_hr``
      resumes the fold from the stored (l, b, s[]) via
      :func:`holt_winters_continue` — O(new hours), the true
      incremental path;
    - a key with back-filled hours (<= last_hr) or no carried state
      rebuilds from the merged counts via
      :func:`holt_winters_smooth` — O(its calendar grid), the
      correct-by-construction fallback (a backfill invalidates the
      recursion from that point; there is no honest cheaper repair).

    Either way the published state equals the batch twin — the full
    recursion over all data seen so far — exactly (conformance-tested
    after every batch, both paths).

    Published tables: ``hw_hourly_counts`` (the additive grain),
    ``hw_state`` (key, last_hr, level_micro, trend_micro, season),
    ``hw_forecast`` (key, hr = last_hr + 1, forecast_micro =
    level + trend + season[(last_hr + 1) mod period])."""
    from learn_etl_data_warehouse_spark.operators.timeseries import (
        holt_winters_continue,
        holt_winters_smooth,
        hourly_counts,
        hw_final_state,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    p = int(period)

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "hw_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "hw_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        delta = hourly_counts(batch_df, key, ts)
        if "hw_hourly_counts" in tables:
            prev = cat.catalog_read(
                spark, catalog_dir, "hw_hourly_counts"
            ).select(key, "hr", "x")
            merged = (
                prev.withColumnRenamed("x", "_px")
                .join(
                    delta.withColumnRenamed("x", "_dx"),
                    [key, "hr"],
                    "full_outer",
                )
                .select(
                    key,
                    "hr",
                    (
                        F.coalesce(F.col("_px"), F.lit(0))
                        + F.coalesce(F.col("_dx"), F.lit(0))
                    ).cast("long").alias("x"),
                )
            )
        else:
            merged = delta
        if "hw_state" in tables:
            state = cat.catalog_read(spark, catalog_dir, "hw_state").select(
                key, "last_hr", "level_micro", "trend_micro", "season"
            )
        else:
            state = None
        if state is not None:
            # per-key routing: tail-append keys continue; back-filled or
            # unseen keys rebuild from the merged counts
            dmin = delta.groupBy(key).agg(F.min("hr").alias("_dmn"))
            routed = dmin.join(
                state.select(key, "last_hr"), key, "left"
            ).select(
                key,
                F.when(
                    F.col("last_hr").isNotNull()
                    & (F.col("_dmn") > F.col("last_hr")),
                    F.lit("continue"),
                ).otherwise(F.lit("rebuild")).alias("_route"),
            )
            cont_keys = routed.filter(
                F.col("_route") == "continue"
            ).select(key)
            reb_keys = routed.filter(F.col("_route") == "rebuild").select(
                key
            )
            new_cont = holt_winters_continue(
                merged.join(cont_keys, key, "left_semi"),
                state.join(cont_keys, key, "left_semi"),
                key,
                p,
            )
            # carried-state merge: last_hr/level/trend come from the
            # newest folded row; a seasonal slot keeps its CARRIED
            # value unless a new row updated it (hw_final_state's
            # zero-fill would clobber carried slots — 0 is a legal
            # seasonal value, so updates are merged as map entries,
            # never sentinel-tested)
            from pyspark.sql import Window as _W

            w_last = _W.partitionBy(key).orderBy(F.desc("hr"))
            head = (
                new_cont.withColumn("_rn", F.row_number().over(w_last))
                .filter(F.col("_rn") == 1)
                .select(key, F.col("hr").alias("last_hr"),
                        "level_micro", "trend_micro")
            )
            w_slot = _W.partitionBy(
                key, F.pmod(F.col("hr"), F.lit(p))
            ).orderBy(F.desc("hr"))
            upd = (
                new_cont.withColumn("_rn", F.row_number().over(w_slot))
                .filter(F.col("_rn") == 1)
                .groupBy(key)
                .agg(
                    F.map_from_entries(
                        F.collect_list(
                            F.struct(
                                F.pmod(F.col("hr"), F.lit(p))
                                .cast("int")
                                .alias("k"),
                                F.col("season_micro").alias("v"),
                            )
                        )
                    ).alias("_upd")
                )
            )
            carried = state.join(cont_keys, key, "left_semi").select(
                key, F.col("season").alias("_s_old")
            )
            cont_state = (
                head.join(upd, key)
                .join(carried, key)
                .select(
                    key,
                    "last_hr",
                    "level_micro",
                    "trend_micro",
                    F.expr(
                        f"transform(sequence(0, {p - 1}),"
                        " i -> coalesce(element_at(_upd, i),"
                        "   element_at(_s_old, i + 1)))"
                    ).alias("season"),
                )
            )
            reb_state = hw_final_state(
                holt_winters_smooth(
                    merged.join(reb_keys, key, "left_semi"), key, p
                ),
                key,
                p,
            )
            untouched = state.join(
                delta.select(key).distinct(), key, "left_anti"
            )
            new_state = cont_state.unionByName(reb_state).unionByName(
                untouched
            )
        else:
            new_state = hw_final_state(
                holt_winters_smooth(merged, key, p), key, p
            )
        forecast = new_state.select(
            key,
            (F.col("last_hr") + 1).cast("long").alias("hr"),
            (
                F.col("level_micro")
                + F.col("trend_micro")
                + F.element_at(
                    F.col("season"),
                    (F.pmod(F.col("last_hr") + 1, F.lit(p)) + 1).cast(
                        "int"
                    ),
                )
            ).cast("long").alias("forecast_micro"),
        )
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "hw_hourly_counts": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "hw_state": (
                    new_state.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "hw_forecast": (
                    forecast.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "hw_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def topk_view_sink(
    catalog_dir: str,
    group_cols,
    entity_cols,
    val_col: str,
    k: int = 3,
):
    """foreachBatch handler maintaining a TOP-K RANKING VIEW (ivm04's
    streaming twin — the ranking case now has batch/incremental/
    streaming parity like the HW forecast family): each micro-batch is
    an all-insert CDF, its entity-grain sums merge ADDITIVELY into the
    stored state (`operators/rollups.py::maintain_topk_sums` semantics
    inlined for the insert-only case), and the published ``topk_view``
    re-ranks ONLY from state — change-volume cost for the merge,
    state-volume for the rank, never a fact-history rescan.

    Positive-measure contract inherited from the batch operator: zero
    sums drop exactly. Exactly-once is LEDGER-derived (sums are not
    replay-idempotent); state + view + ledger flip in ONE catalog
    transaction. Published tables: ``topk_sums`` (entity grain),
    ``topk_view`` (group, entity, val, rnk <= k)."""
    from learn_etl_data_warehouse_spark.operators.rollups import (
        topk_from_sums,
        topk_sums_state,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    g = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    e = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "topk_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "topk_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        delta = topk_sums_state(batch_df, g, e, val_col)
        if "topk_sums" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "topk_sums").select(
                *(g + e), "val"
            )
            merged = (
                prev.withColumnRenamed("val", "_pv")
                .join(
                    delta.withColumnRenamed("val", "_dv"),
                    g + e,
                    "full_outer",
                )
                .select(
                    *(g + e),
                    (
                        F.coalesce(F.col("_pv"), F.lit(0))
                        + F.coalesce(F.col("_dv"), F.lit(0))
                    ).cast("long").alias("val"),
                )
                .filter(F.col("val") != 0)
            )
        else:
            merged = delta
        view = topk_from_sums(merged, g, e, k)
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "topk_sums": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "topk_view": (
                    view.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "topk_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle

def correlation_ingest_sink(
    catalog_dir: str,
    key: str = "event_type",
    ts: str = "ts",
    user: str = "user_id",
):
    """foreachBatch handler maintaining the CORRELATION diagnostics
    (st10 Kendall pair classes + st11 Spearman rank moments) over a
    stream — the correlation family's streaming twin, completing its
    batch/incremental/streaming parity like the HW-forecast and LM
    families.

    The published metrics need the per-hour DISTINCT-user audience,
    which is not additive at hour grain — so the maintained state is
    the (key, hr, user, n) grain (the dfg-sink posture: keep the grain
    that IS additive, derive the non-additive number at read time):
    per-batch deltas merge by addition, the hourly (x, y) pair is
    x = Σn, y = row count per (key, hr) — exactly the distinct-user
    count, since user is the grain — and st10/st11 re-derive from the
    maintained pair table at state-sized cost (hours², never a
    re-scan of event history).

    Exactly-once is LEDGER-derived (the anomaly/lm_stats posture):
    counts are not replay-idempotent, so the batch ledger commits WITH
    the merged state in ONE catalog transaction; a ledgered batch is a
    no-op. Batches may split arbitrarily — nothing here needs
    per-actor in-order delivery."""
    from learn_etl_data_warehouse_spark.operators.timeseries import (
        kendall_tau,
        spearman_rho,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    us_per_hour = 3_600_000_000

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "corr_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "corr_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        delta = batch_df.groupBy(
            F.col(key),
            F.expr(f"unix_micros({ts}) div {us_per_hour}").alias("hr"),
            F.col(user).alias("u"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        if "corr_user_hours" in tables:
            prev = cat.catalog_read(
                spark, catalog_dir, "corr_user_hours"
            ).select(key, "hr", "u", "n")
            merged = (
                prev.withColumnRenamed("n", "_pn")
                .join(
                    delta.withColumnRenamed("n", "_dn"),
                    [key, "hr", "u"],
                    "full_outer",
                )
                .select(
                    key,
                    "hr",
                    "u",
                    (
                        F.coalesce(F.col("_pn"), F.lit(0))
                        + F.coalesce(F.col("_dn"), F.lit(0))
                    ).cast("long").alias("n"),
                )
            )
        else:
            merged = delta
        pair = merged.groupBy(key, "hr").agg(
            F.sum("n").cast("long").alias("x"),
            F.count(F.lit(1)).cast("long").alias("y"),
        )
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "corr_user_hours": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "corr_kendall": (
                    kendall_tau(pair, key).withColumn(
                        "state", F.lit("live")
                    ),
                    ["state"],
                ),
                "corr_spearman": (
                    spearman_rho(pair, key).withColumn(
                        "state", F.lit("live")
                    ),
                    ["state"],
                ),
                "corr_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle

def lttb_dashboard_sink(
    catalog_dir: str,
    k: int = 12,
    key: str = "event_type",
    ts: str = "ts",
):
    """foreachBatch handler maintaining a DASHBOARD-READY downsampled
    series per key (e38's streaming twin): hourly counts merge
    ADDITIVELY into the stored (key, hr, x) state — the anomaly-sink
    state exactly — and the k-point LTTB selection re-derives from the
    maintained state per micro-batch (state-sized cost: hours per key,
    never event history). The downsample family joins HW-forecast /
    LM / novelty / top-k / correlation in batch/streaming parity; a
    dashboard reads k points per key from `lttb_points`, whatever the
    stream volume.

    Keys with fewer than k observed hours pass through RAW (bucket =
    hour rank — a dashboard plots them as-is; LTTB's bucketing needs
    n >= k), switching to the LTTB selection once enough hours exist.
    Exactly-once is LEDGER-derived (the anomaly posture): counts are
    not replay-idempotent; ledger + state + view flip in ONE catalog
    transaction."""
    from pyspark.sql import Window

    from learn_etl_data_warehouse_spark.operators.timeseries import (
        hourly_counts,
        lttb_downsample,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "lttb_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "lttb_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        delta = hourly_counts(batch_df, key, ts)
        if "lttb_hourly" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "lttb_hourly").select(
                key, "hr", "x"
            )
            merged = (
                prev.withColumnRenamed("x", "_px")
                .join(
                    delta.withColumnRenamed("x", "_dx"),
                    [key, "hr"],
                    "full_outer",
                )
                .select(
                    key,
                    "hr",
                    (
                        F.coalesce(F.col("_px"), F.lit(0))
                        + F.coalesce(F.col("_dx"), F.lit(0))
                    ).cast("long").alias("x"),
                )
            )
        else:
            merged = delta
        counts = merged.groupBy(key).agg(
            F.count(F.lit(1)).alias("_n")
        )
        big = merged.join(
            counts.filter(F.col("_n") >= k).select(key), key, "left_semi"
        )
        small = merged.join(
            counts.filter(F.col("_n") < k).select(key), key, "left_semi"
        )
        parts = []
        if big.limit(1).count() > 0:
            parts.append(lttb_downsample(big, k=k, key=key))
        raw = small.select(
            F.col(key),
            (
                F.row_number().over(
                    Window.partitionBy(key).orderBy(F.asc("hr"))
                )
                - 1
            ).cast("long").alias("bucket"),
            F.col("hr").cast("long").alias("hr"),
            F.col("x").cast("long").alias("x"),
        )
        parts.append(raw)
        view = parts[0]
        for p in parts[1:]:
            view = view.unionByName(p)
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "lttb_hourly": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "lttb_points": (
                    view.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "lttb_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle


def ohlc_ingest_sink(
    catalog_dir: str,
    key: str = "event_type",
):
    """foreachBatch handler maintaining daily OHLC bars per key (e37's
    streaming twin): the per-batch :func:`~learn_etl_data_warehouse_spark.
    operators.timeseries.ohlc_state` delta folds into the stored state
    via :func:`ohlc_merge_state` — counted parts ADD, extrema min/max-
    merge, and the open/close witness ticks compare as (ts, id, cents)
    structs, so disjoint batches fold to the full build's state
    regardless of arrival order (a later batch carrying an EARLIER
    tick retroactively takes the open — witness merging, not
    first-batch-wins). The published `ohlc_bars` view re-derives from
    state per micro-batch at state-size cost.

    Exactly-once is LEDGER-derived (the counted posture: n/volume are
    not replay-idempotent even though the witness merges are); ledger
    + state + view flip in ONE catalog transaction. The OHLC family
    joins HW-forecast / LM / novelty / top-k / correlation / LTTB in
    batch/streaming parity."""
    from learn_etl_data_warehouse_spark.operators.timeseries import (
        ohlc_from_state,
        ohlc_merge_state,
        ohlc_state,
    )
    from learn_etl_data_warehouse_spark.plans import catalog as cat

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = set(cat.read_catalog(catalog_dir)["tables"])
        if "ohlc_applied" in tables:
            applied = {
                r.batch_id
                for r in cat.catalog_read(spark, catalog_dir, "ohlc_applied")
                .select("batch_id")
                .collect()
            }
            if int(batch_id) in applied:
                return  # replayed batch: already folded into the state
        delta = ohlc_state(batch_df, key)
        if "ohlc_state" in tables:
            prev = cat.catalog_read(spark, catalog_dir, "ohlc_state").select(
                *delta.columns
            )
            merged = ohlc_merge_state(prev, delta, key)
        else:
            merged = delta
        view = ohlc_from_state(merged, key)
        ledger = spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        cat.catalog_commit(
            spark,
            catalog_dir,
            {
                "ohlc_state": (
                    merged.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "ohlc_bars": (
                    view.withColumn("state", F.lit("live")),
                    ["state"],
                ),
                "ohlc_applied": (ledger, ["ingest_batch"]),
            },
            replace=False,
        )

    return handle
