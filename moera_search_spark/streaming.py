"""Streaming ingest — Structured Streaming over a change-log of
transcript updates, applied as exactly-once delta batches.

The Spark restatement of the reference's push-notification ingest: a
node POSTs typed updates (posting/comment added / updated / deleted),
the processor routes them into the persistent update queue, and the
queue applies them to the index in order with dependency gating and
restart survival (reference:
rest/notification/processor/SearchProcessor.java:59-117;
scanner/UpdateQueue.java:53-137 — reloaded at boot :71-77, dispatched
in ticks :98-137).

Here the change-log is a directory of parquet files in the transcripts
schema plus an ``op`` column (``upsert`` | ``delete``) and an optional
``seq`` sequence column, consumed with ``readStream`` +
``foreachBatch`` → ``incremental.apply_updates``:

* **per-key collapse** — ``apply_updates`` resolves upserts and
  deletes independently against the pre-batch snapshot, so a
  micro-batch is first reduced to ONE final op per (conv_id,
  turn_idx): the op with the highest ``seq`` (falling back to ``ts``
  when the micro-batch carries no seq values; mixed presence fails
  loudly) wins; at equal sequence a delete wins (conservative
  tie-break).  This makes ordered changelog
  sequences like [delete k, upsert k] and [upsert k, delete k] net to
  the correct final state, and collapses duplicate upserts of one key
  to a single revision.  Revision dedup inside ``apply_updates`` then
  applies to that one surviving op — e.g. [delete k, re-upsert k with
  unchanged text] correctly nets to "no change".

* **ordering / exactly-once** — Structured Streaming's checkpoint
  gives monotone ``batch_id``s and at-least-once ``foreachBatch``
  delivery; ``apply_updates`` deduplicates by batch id, so a replayed
  micro-batch after a crash is a no-op (the queue's restart-survival
  analogue, doubled by our manifest lineage).
* **late updates** — an upsert for a turn that already exists is a
  revision; unchanged revisions are skipped (revision dedup), older
  files arriving later simply form later batches.  The reference's
  ``waitJobKeys`` dependency gating has no analogue to wait for: a
  delta batch is self-contained.
* **Trigger.AvailableNow** drains the backlog and stops — the batch
  "tick" mode; leave ``available_now=False`` for a continuous stream.
"""

from __future__ import annotations

from .incremental import KEYS, apply_updates

CHANGELOG_DDL = ("conv_id string, turn_idx int, role string, text string, "
                 "tool string, ts timestamp, op string, seq long")


def stream_updates(spark, index_dir: str, changelog_dir: str, *,
                   checkpoint_dir: str, batch_prefix: str = "stream",
                   available_now: bool = True, n_buckets: int = 8,
                   timeout_sec: float | None = None):
    """Consume a change-log directory into the index.

    Returns the (terminated, when ``available_now``) StreamingQuery.
    """
    from pyspark.sql import functions as F

    stream = (spark.readStream.schema(CHANGELOG_DDL)
              .parquet(changelog_dir))

    def handle(batch_df, batch_id: int) -> None:
        from pyspark.sql import Window

        # Collapse to the final op per key (see module docstring).
        # The ordering key is seq when the micro-batch carries it, ts
        # otherwise — decided PER BATCH, never per row: a per-row
        # coalesce(seq, ts) would compare small sequence numbers
        # against epoch seconds whenever seq is only partially
        # populated, letting any ts-fallback row outrank every
        # seq-bearing row.  Mixed presence within one batch has no
        # well-defined order, so it fails loudly (ADVICE round 2).
        counts = batch_df.agg(F.count("*").alias("n"),
                              F.count("seq").alias("n_seq")).collect()[0]
        n, n_seq = int(counts["n"]), int(counts["n_seq"])
        if 0 < n_seq < n:
            raise ValueError(
                f"changelog micro-batch {batch_id} mixes rows with and "
                f"without seq ({n_seq}/{n} populated) — sequence "
                "numbers must be all-or-nothing per batch")
        seq = (F.col("seq").cast("double") if n_seq
               else F.col("ts").cast("double"))
        w = Window.partitionBy(*KEYS).orderBy(
            seq.desc_nulls_last(), F.asc("op"))
        last = (batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
        upserts = last.filter(F.col("op") == "upsert").drop("op", "seq")
        deletes = last.filter(F.col("op") == "delete") \
            .select(*KEYS)
        apply_updates(spark, index_dir, upserts=upserts, deletes=deletes,
                      batch_id=f"{batch_prefix}-{batch_id}",
                      n_buckets=n_buckets)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination(timeout_sec)
    return query
