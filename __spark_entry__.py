"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship path: the full engine (resumable
inverted-index build + block-max BM25 top-k) over the sf0.001
``documents`` table mapped to the transcripts input shape.

``queries()`` / ``oracle_sql()`` expose the operator inventory from
SURVEY.md §2 plus the training-data-pipeline operators (dedup,
similarity, text analysis, multimodal) — each Spark plan paired with
the equivalent DuckDB SQL where SQL-expressible.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _documents_as_transcripts(spark, sf_dir: str):
    """Map the documents table onto the engine's transcripts input
    shape (conv_id, turn_idx, role, text, tool, ts)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("conv-%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over sf0.001 documents (as
    transcripts), then answer a BM25 top-10 query with block-max
    pruning and hydrate the winners."""
    from moera_search_spark.build import build_index
    from moera_search_spark.query import FTSIndex

    transcripts = _documents_as_transcripts(spark, "/root/testdata/sf0.001")
    idx_dir = tempfile.mkdtemp(prefix="fts_entry_")
    build_index(spark, transcripts, idx_dir, n_buckets=4)
    idx = FTSIndex(spark, idx_dir)
    return idx.search("spark join window query", k=10, method="pruned",
                      hydrate=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data ops).  Each callable takes (spark, sf_dir)."""
    from moera_search_spark.operators import merged_queries

    return {name: fn for name, (fn, _sql) in merged_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL ops —
    driver records the weaker rows-only check for those)."""
    from moera_search_spark.operators import merged_queries

    return {name: sql for name, (_fn, sql) in merged_queries().items()
            if sql is not None}
