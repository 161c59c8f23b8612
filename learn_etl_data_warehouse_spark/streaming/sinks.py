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
