"""Source-adapter resolution order (io.read_transcripts): explicit
format → session-catalog table → iceberg probe → parquet fallback.
The catalog-table branch is how Iceberg tables registered in a real
session catalog resolve (this sandbox has no Iceberg jars, so the
branch is exercised with a temp view — same ``spark.table`` code
path, VERDICT round 2 item 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from moera_search_spark.io import TRANSCRIPT_COLUMNS, read_transcripts


class TestSourceAdapterResolution:
    def test_catalog_table_branch(self, spark, corpus_df):
        corpus_df.createOrReplaceTempView("transcripts_view")
        got = read_transcripts(spark, "transcripts_view")
        assert sorted(got.columns) == sorted(corpus_df.columns)
        assert got.count() == corpus_df.count()

    def test_explicit_format_overrides_name_heuristic(self, spark,
                                                      corpus_df,
                                                      tmp_path):
        path = str(tmp_path / "t.parquet")
        corpus_df.write.mode("overwrite").parquet(path)
        got = read_transcripts(spark, path, fmt="parquet")
        assert got.count() == corpus_df.count()

    def test_path_falls_back_to_parquet(self, spark, corpus_df,
                                        tmp_path):
        path = str(tmp_path / "plain_dir")
        corpus_df.write.mode("overwrite").parquet(path)
        got = read_transcripts(spark, path)
        assert got.count() == corpus_df.count()

    def test_catalog_branch_feeds_build(self, spark, corpus_df,
                                        tmp_path):
        from moera_search_spark.build import build_index
        from moera_search_spark.query import FTSIndex

        sub = corpus_df.filter(F.col("turn_idx") == 0).limit(30)
        sub.createOrReplaceTempView("transcripts_build_view")
        src = read_transcripts(spark, "transcripts_build_view")
        idx_dir = str(tmp_path / "io_idx")
        res = build_index(spark, src.select(*TRANSCRIPT_COLUMNS),
                          idx_dir, n_buckets=2)
        assert res["n_docs"] == sub.count()
        with FTSIndex(spark, idx_dir) as idx:
            assert idx.n_docs == res["n_docs"]
