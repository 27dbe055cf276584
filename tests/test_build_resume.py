"""Checkpoint-resume: kill the build after a subset of bucket groups,
resume from the manifest, and require the final index be byte-identical
to an uninterrupted build (the analogue of TimelineScanJob resuming
from its checkpointed cursor, TimelineScanJob.java:120-123)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from moera_search_spark import manifest as mf
from moera_search_spark.build import build_index
from moera_search_spark.query import FTSIndex


def _index_fingerprint(spark, idx_dir):
    """Logical content of the index, partitioning-independent."""
    postings = (
        spark.read.parquet(os.path.join(idx_dir, "postings"))
        .orderBy("term", "first_doc_id").toPandas()
    )
    docs = (
        spark.read.parquet(os.path.join(idx_dir, "docs"))
        .orderBy("doc_id").toPandas()
    )
    return postings, docs


@pytest.fixture(scope="module")
def two_builds(spark, corpus_df, tmp_path_factory):
    base = tmp_path_factory.mktemp("resume")
    clean_dir = str(base / "clean")
    crash_dir = str(base / "crash")
    build_index(spark, corpus_df, clean_dir, n_buckets=8)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_index(spark, corpus_df, crash_dir, n_buckets=8,
                    buckets_per_job=2, fail_after_groups=2)
    return clean_dir, crash_dir


class TestResume:
    def test_crash_left_partial_manifest(self, two_builds):
        _, crash_dir = two_builds
        done = mf.done_partitions(crash_dir, "staging")
        assert 0 < len(done) < 8
        # stats/postings stages never ran
        assert mf.done_partitions(crash_dir, "postings") == set()

    def test_resume_recomputes_only_pending(self, spark, corpus_df,
                                            two_builds):
        _, crash_dir = two_builds
        done_before = mf.done_partitions(crash_dir, "staging")
        build_index(spark, corpus_df, crash_dir, n_buckets=8,
                    buckets_per_job=2, resume=True)
        m = mf.load_manifest(crash_dir)
        staging = m[m["stage"] == "staging"]
        # previously-done buckets kept attempt 1 (not recomputed)
        for pid in done_before:
            row = staging[staging["partition_id"] == pid]
            assert int(row["attempt"].iloc[0]) == 1

    def test_byte_identical_to_uninterrupted(self, spark, two_builds):
        clean_dir, crash_dir = two_builds
        # (resume happened in the previous test; module-scoped fixtures
        # run in order, but be safe if run standalone)
        if mf.done_partitions(crash_dir, "postings") != {-1}:
            pytest.skip("resume test must run first")
        p1, d1 = _index_fingerprint(spark, clean_dir)
        p2, d2 = _index_fingerprint(spark, crash_dir)
        pd.testing.assert_frame_equal(d1, d2)
        pd.testing.assert_frame_equal(p1, p2)

    def test_resumed_index_answers_queries(self, spark, two_builds,
                                           oracle_index):
        _, crash_dir = two_builds
        idx = FTSIndex(spark, crash_dir)
        got = [(int(r["doc_id"]), float(r["score"])) for r in
               idx.search("spark shuffle partition", k=10).collect()]
        exp = oracle_index.search("spark shuffle partition", k=10)
        assert [d for d, _ in got] == [d for d, _ in exp]

    def test_metrics_populated_for_every_stage(self, two_builds):
        clean_dir, _ = two_builds
        metrics = mf.load_metrics(clean_dir)
        stages = set(metrics["stage"])
        assert {"staging", "stats", "docs", "postings",
                "build"} <= stages

    def test_config_pinned(self, two_builds):
        clean_dir, _ = two_builds
        cfg = mf.load_config(clean_dir)
        assert cfg["mode"] == "english"
        assert len(cfg["boundaries"]) == cfg["n_buckets"]
        assert glob.glob(os.path.join(clean_dir, "staging", "shard=*"))


class TestShardedStaging:
    """Staging dirs are capped at MAX_STAGING_SHARDS with per-bucket
    checkpointing rounded up to whole shards (per_shard > 1 path —
    the layout an over-bucketed 2^18 build uses)."""

    @pytest.fixture(scope="class")
    def sharded_builds(self, spark, corpus_df, tmp_path_factory,
                       request):
        import moera_search_spark.build as b

        base = tmp_path_factory.mktemp("sharded")
        clean_dir = str(base / "clean")
        crash_dir = str(base / "crash")
        # 16 buckets / cap 4 → per_shard = 4, 4 shard dirs
        orig = b.MAX_STAGING_SHARDS
        b.MAX_STAGING_SHARDS = 4
        request.addfinalizer(
            lambda: setattr(b, "MAX_STAGING_SHARDS", orig))
        build_index(spark, corpus_df, clean_dir, n_buckets=16)
        with pytest.raises(RuntimeError, match="simulated crash"):
            # buckets_per_job=3 rounds up to one shard (4 buckets)
            build_index(spark, corpus_df, crash_dir, n_buckets=16,
                        buckets_per_job=3, fail_after_groups=2)
        build_index(spark, corpus_df, crash_dir, n_buckets=16,
                    buckets_per_job=3, resume=True)
        return clean_dir, crash_dir

    def test_dir_count_capped(self, sharded_builds):
        clean_dir, _ = sharded_builds
        shards = glob.glob(os.path.join(clean_dir, "staging", "shard=*"))
        assert len(shards) == 4
        assert not glob.glob(
            os.path.join(clean_dir, "staging", "bucket=*"))

    def test_groups_are_shard_aligned(self, sharded_builds):
        _, crash_dir = sharded_builds
        m = mf.load_manifest(crash_dir)
        staging = m[(m["stage"] == "staging") & (m["status"] == "done")]
        done = sorted(int(p) for p in staging["partition_id"])
        assert done == list(range(16))  # every bucket completed
        # the crashed run finished exactly 2 whole-shard groups before
        # the simulated crash (buckets_per_job=3 → rounded to 4)
        attempts = {int(r["partition_id"]): int(r["attempt"])
                    for _, r in staging.iterrows()}
        assert all(attempts[bkt] == 1 for bkt in range(8))
        assert all(attempts[bkt] >= 1 for bkt in range(8, 16))

    def test_resume_byte_identical(self, spark, sharded_builds):
        clean_dir, crash_dir = sharded_builds
        p1, d1 = _index_fingerprint(spark, clean_dir)
        p2, d2 = _index_fingerprint(spark, crash_dir)
        pd.testing.assert_frame_equal(d1, d2)
        pd.testing.assert_frame_equal(p1, p2)

    def test_bucket_column_physical_and_sorted(self, spark,
                                               sharded_builds):
        clean_dir, _ = sharded_builds
        one = glob.glob(os.path.join(
            clean_dir, "staging", "shard=*", "row_type=doc", "*.parquet"))
        assert one
        pdf = pd.read_parquet(one[0])
        assert "bucket" in pdf.columns
        assert (pdf["bucket"].values[:-1] <= pdf["bucket"].values[1:]).all()
