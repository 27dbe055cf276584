"""Shared test fixtures: one SparkSession per test session, small corpus."""

from __future__ import annotations

import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("moera-search-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


N_CONVS = 120
SEED = 42


@pytest.fixture(scope="session")
def corpus_pdf():
    from moera_search_spark.fixtures import gen_transcripts_pdf

    return gen_transcripts_pdf(N_CONVS, seed=SEED)


@pytest.fixture(scope="session")
def corpus_df(spark):
    from moera_search_spark.fixtures import transcripts_df

    return transcripts_df(spark, N_CONVS, seed=SEED)


@pytest.fixture(scope="session")
def oracle_index(corpus_pdf):
    from moera_search_spark.oracle import build_oracle

    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rows = [
        {"doc_id": i, "text": r["text"], "role": r["role"],
         "tool": r["tool"], "ts": r["ts"].to_pydatetime()}
        for i, r in pdf.iterrows()
    ]
    return build_oracle(rows)


@pytest.fixture(scope="session")
def built_index(spark, corpus_df, tmp_path_factory):
    from moera_search_spark.build import build_index
    from moera_search_spark.query import FTSIndex

    idx_dir = str(tmp_path_factory.mktemp("idx") / "index")
    shutil.rmtree(idx_dir, ignore_errors=True)
    build_index(spark, corpus_df, idx_dir, n_buckets=8)
    return FTSIndex(spark, idx_dir)
