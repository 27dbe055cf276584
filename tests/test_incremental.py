"""Incremental maintenance: delta segments, revision dedup, tombstoned
deletes, exactly-once batches, block-max admissibility under drifted
stats, and compaction equivalence (the analogues of the reference's
update queue + Index.index/update/delete + revision dedup, reference:
scanner/UpdateQueue.java:53-137, index/Index.java:131-224,
scanner/ingest/PostingIngest.java:140-146)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from moera_search_spark.build import build_index
from moera_search_spark.incremental import apply_updates, compact
from moera_search_spark.query import FTSIndex

QUERIES = ["spark shuffle partition", "the system", "runs", "term1847"]
SPLIT = "conv-00000100"
NEW_TEXT = "xylophone quantum zebra stability"
UPDATE_KEY = ("conv-00000000", 0)
DELETE_KEY = ("conv-00000001", 0)


def topk(idx, q, method="exhaustive", k=10):
    return [(int(r["doc_id"]), float(r["score"]))
            for r in idx.search(q, k=k, method=method).collect()]


def fingerprint(spark, idx_dir):
    postings = (spark.read.parquet(os.path.join(idx_dir, "postings"))
                .orderBy("term", "first_doc_id").toPandas())
    docs = (spark.read.parquet(os.path.join(idx_dir, "docs"))
            .orderBy("doc_id").toPandas())
    return postings, docs


@pytest.fixture(scope="module")
def env(spark, corpus_df, tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    idx_dir = str(root / "index")
    base = corpus_df.filter(F.col("conv_id") < SPLIT)
    inserts = corpus_df.filter(F.col("conv_id") >= SPLIT)

    build_index(spark, base, idx_dir, n_buckets=4)
    r_insert = apply_updates(spark, idx_dir, upserts=inserts,
                             batch_id="b-insert", n_buckets=2)
    idx = FTSIndex(spark, idx_dir)
    after_insert = {
        (q, m): topk(idx, q, m)
        for q in QUERIES for m in ("exhaustive", "pruned")}

    fresh_dir = str(root / "fresh")
    build_index(spark, corpus_df, fresh_dir, n_buckets=4)
    fresh = {q: topk(FTSIndex(spark, fresh_dir), q) for q in QUERIES}

    r_dedup = apply_updates(spark, idx_dir, upserts=inserts,
                            batch_id="b-dedup", n_buckets=2)
    r_replay = apply_updates(spark, idx_dir, upserts=inserts,
                             batch_id="b-insert", n_buckets=2)

    # term df of the to-be-deleted doc's first term, before the delete
    del_doc = (idx.docs
               .filter((F.col("conv_id") == DELETE_KEY[0])
                       & (F.col("turn_idx") == DELETE_KEY[1]))
               .collect()[0])
    from moera_search_spark.analyzer import analyze
    probe_term = analyze(del_doc["text"])[0]

    def df_of(term):
        return int(idx.term_stats.filter(F.col("term") == term)
                   .agg(F.sum("df")).collect()[0][0])

    df_before = df_of(probe_term)
    n_before = FTSIndex(spark, idx_dir).n_docs

    upd = spark.createDataFrame(
        [(UPDATE_KEY[0], UPDATE_KEY[1], "user", NEW_TEXT, None,
          pd.Timestamp("2026-02-01").to_pydatetime())],
        corpus_df.schema)
    dels = spark.createDataFrame([DELETE_KEY],
                                 "conv_id string, turn_idx int")
    r_mut = apply_updates(spark, idx_dir, upserts=upd, deletes=dels,
                          batch_id="b-mutate", n_buckets=2)
    idx2 = FTSIndex(spark, idx_dir)

    return {
        "spark": spark, "idx_dir": idx_dir, "root": root,
        "corpus_df": corpus_df,
        "r_insert": r_insert, "r_dedup": r_dedup, "r_replay": r_replay,
        "r_mut": r_mut, "after_insert": after_insert, "fresh": fresh,
        "probe_term": probe_term, "df_before": df_before,
        "df_after": df_of(probe_term), "n_before": n_before,
        "idx2": idx2, "del_doc_id": int(del_doc["doc_id"]),
    }


class TestInsertOnly:
    def test_counts(self, env):
        assert env["r_insert"]["docs_indexed"] > 0
        assert env["r_insert"]["tombstoned"] == 0

    def test_rank_identical_to_fresh_rebuild(self, env):
        """Insert-only deltas leave N/avgdl/df identical to a from-
        scratch build, so top-k must match it exactly."""
        for q in QUERIES:
            got = env["after_insert"][(q, "exhaustive")]
            exp = env["fresh"][q]
            assert [d for d, _ in got] == [d for d, _ in exp], q
            for (_, a), (_, b) in zip(got, exp):
                assert a == pytest.approx(b, abs=1e-9), q

    def test_pruned_matches_exhaustive(self, env):
        for q in QUERIES:
            assert env["after_insert"][(q, "pruned")] == \
                env["after_insert"][(q, "exhaustive")], q


class TestExactlyOnce:
    def test_unchanged_revisions_skipped(self, env):
        assert env["r_dedup"]["docs_indexed"] == 0
        assert env["r_dedup"]["tombstoned"] == 0

    def test_replayed_batch_is_noop(self, env):
        assert env["r_replay"]["skipped"] is True


class TestUpdateDelete:
    def test_update_finds_new_content(self, env):
        hits = topk(env["idx2"], "xylophone quantum zebra")
        assert len(hits) == 1
        doc = env["idx2"].docs.filter(
            F.col("doc_id") == hits[0][0]).collect()[0]
        assert (doc["conv_id"], doc["turn_idx"]) == UPDATE_KEY
        assert doc["text"] == NEW_TEXT

    def test_old_revision_and_deleted_doc_never_surface(self, env):
        idx2 = env["idx2"]
        banned = {env["del_doc_id"]}
        # the replaced doc kept its old doc_id only in tombstones
        tomb = {int(r["doc_id"]) for r in idx2.tombstones.collect()}
        assert env["del_doc_id"] in tomb
        for q in QUERIES + [env["probe_term"]]:
            for d, _ in topk(idx2, q, k=50):
                assert d not in tomb and d not in banned

    def test_lucene_delete_semantics(self, env):
        """N drops immediately; df stays until compact (Lucene keeps
        deleted docs' postings until segment merge)."""
        # update is net-zero on live count (new doc replaces the
        # tombstoned old revision); the delete removes one
        assert env["idx2"].n_docs == env["n_before"] - 1
        assert env["df_after"] == env["df_before"]

    def test_pruned_admissible_after_mutations(self, env):
        idx2 = env["idx2"]
        for q in QUERIES + ["xylophone quantum"]:
            assert topk(idx2, q, "pruned") == topk(idx2, q, "exhaustive")


class TestCompact:
    def test_compact_equals_fresh_build_on_live_corpus(self, env):
        spark = env["spark"]
        idx_dir = env["idx_dir"]
        live_expected = (
            env["corpus_df"]
            .filter(~((F.col("conv_id") == DELETE_KEY[0])
                      & (F.col("turn_idx") == DELETE_KEY[1])))
            .withColumn(
                "text",
                F.when((F.col("conv_id") == UPDATE_KEY[0])
                       & (F.col("turn_idx") == UPDATE_KEY[1]),
                       F.lit(NEW_TEXT)).otherwise(F.col("text")))
            .withColumn(
                "role",
                F.when((F.col("conv_id") == UPDATE_KEY[0])
                       & (F.col("turn_idx") == UPDATE_KEY[1]),
                       F.lit("user")).otherwise(F.col("role")))
            .withColumn(
                "tool",
                F.when((F.col("conv_id") == UPDATE_KEY[0])
                       & (F.col("turn_idx") == UPDATE_KEY[1]),
                       F.lit(None).cast("string"))
                .otherwise(F.col("tool")))
            .withColumn(
                "ts",
                F.when((F.col("conv_id") == UPDATE_KEY[0])
                       & (F.col("turn_idx") == UPDATE_KEY[1]),
                       F.lit("2026-02-01 00:00:00").cast("timestamp"))
                .otherwise(F.col("ts"))))

        expect_dir = str(env["root"] / "expected")
        build_index(spark, live_expected, expect_dir, n_buckets=4)
        compact(spark, idx_dir, n_buckets=4)

        p1, d1 = fingerprint(spark, idx_dir)
        p2, d2 = fingerprint(spark, expect_dir)
        pd.testing.assert_frame_equal(
            d1.reset_index(drop=True), d2.reset_index(drop=True))
        pd.testing.assert_frame_equal(
            p1.reset_index(drop=True), p2.reset_index(drop=True))

    def test_compacted_index_answers_queries(self, env):
        idx = FTSIndex(env["spark"], env["idx_dir"])
        assert idx.tombstones is None
        hits = topk(idx, "xylophone quantum zebra")
        assert len(hits) == 1
