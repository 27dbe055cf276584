"""Streaming ingest: change-log files → micro-batches → exactly-once
delta application (the analogue of the reference's notification
processor feeding the persistent update queue, reference:
rest/notification/processor/SearchProcessor.java:59-117,
scanner/UpdateQueue.java:53-137)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from moera_search_spark import manifest as mf
from moera_search_spark.build import build_index
from moera_search_spark.query import FTSIndex
from moera_search_spark.streaming import stream_updates

SPLIT = "conv-00000050"
NEW_TEXT = "glockenspiel nebula cartography"


def _as_changelog(df, op):
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts",
                     F.lit(op).alias("op"))


@pytest.fixture(scope="module")
def env(spark, corpus_df, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    idx_dir = str(root / "index")
    changelog = str(root / "changelog")
    checkpoint = str(root / "checkpoint")

    build_index(spark, corpus_df.filter(F.col("conv_id") < SPLIT),
                idx_dir, n_buckets=4)

    # batch 1: the rest of the corpus arrives as upserts
    _as_changelog(corpus_df.filter(F.col("conv_id") >= SPLIT), "upsert") \
        .write.mode("append").parquet(changelog)
    stream_updates(spark, idx_dir, changelog, checkpoint_dir=checkpoint,
                   n_buckets=2, timeout_sec=300)

    # batch 2: one revision + one delete arrive later
    upd = corpus_df.filter((F.col("conv_id") == "conv-00000000")
                           & (F.col("turn_idx") == 0)) \
        .withColumn("text", F.lit(NEW_TEXT))
    dele = corpus_df.filter((F.col("conv_id") == "conv-00000002")
                            & (F.col("turn_idx") == 0))
    _as_changelog(upd, "upsert").unionByName(_as_changelog(dele, "delete")) \
        .write.mode("append").parquet(changelog)
    stream_updates(spark, idx_dir, changelog, checkpoint_dir=checkpoint,
                   n_buckets=2, timeout_sec=300)

    return {"idx_dir": idx_dir, "changelog": changelog,
            "checkpoint": checkpoint}


class TestStreaming:
    def test_upserts_searchable(self, spark, env, corpus_df):
        idx = FTSIndex(spark, env["idx_dir"])
        total_turns = corpus_df.count()
        assert idx.n_docs == total_turns - 1   # one delete
        assert idx.live_docs.filter(
            F.col("conv_id") >= SPLIT).count() > 0

    def test_revision_applied(self, spark, env):
        idx = FTSIndex(spark, env["idx_dir"])
        hits = idx.search("glockenspiel nebula", k=5).collect()
        assert len(hits) == 1
        doc = idx.docs.filter(
            F.col("doc_id") == hits[0]["doc_id"]).collect()[0]
        assert doc["conv_id"] == "conv-00000000"

    def test_delete_applied(self, spark, env):
        idx = FTSIndex(spark, env["idx_dir"])
        assert idx.live_docs.filter(
            (F.col("conv_id") == "conv-00000002")
            & (F.col("turn_idx") == 0)).count() == 0

    def test_drained_stream_is_noop(self, spark, env):
        before = mf.load_config(env["idx_dir"])["delta_batches"]
        stream_updates(spark, env["idx_dir"], env["changelog"],
                       checkpoint_dir=env["checkpoint"], timeout_sec=300)
        after = mf.load_config(env["idx_dir"])["delta_batches"]
        # no new files → either no new micro-batch, or a replayed one
        # that apply_updates dedup'd; indexed/tombstone totals unchanged
        def totals(batches):
            return (sum(b["upserts_indexed"] for b in batches),
                    sum(b["tombstoned"] for b in batches))
        assert totals(after) == totals(before)
