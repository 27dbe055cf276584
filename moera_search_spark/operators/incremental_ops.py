"""Incremental-maintenance operators with cross-engine oracles.

The driver-checked proof that delta application preserves scoring
semantics (the update-queue / Index.update / Index.delete surface,
reference: scanner/UpdateQueue.java:53-137, index/Index.java:131-224):

* ``incr_insert_topk`` — build the index over the first 400 documents,
  apply the remaining 100 as TWO delta batches, consolidate them with
  ``merge_segments`` (the tiered merge), query.  Insert-only deltas —
  merged or not — leave N/avgdl/df identical to a from-scratch build,
  so DuckDB's BM25 over the full corpus is an exact oracle; the entry
  cross-engine-verifies the whole build → delta → merge → query
  lifecycle.
* ``incr_delete_topk`` — build over all 500, delete the first 25 as a
  delta batch, query.  Documented Lucene-faithful semantics: N/avgdl/dl
  from live docs, df still counting deleted docs (not decremented until
  compaction), deleted docs excluded from results — all expressible in
  ANSI SQL.

Both run the REAL engine (staged build, compressed postings, delta
segments, tombstones) in ``simple`` analyzer mode so tokenization is
reproducible in SQL (same trick as operators/fulltext.py).
"""

from __future__ import annotations

import tempfile

from .fulltext import _TOKS_SQL

QUERY_TERMS = ["spark", "join", "window"]
K = 10
N_DELETE = 25
SPLIT = 400


def _docs_as_transcripts(spark, sf_dir, lo=None, hi=None):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if lo is not None:
        docs = docs.filter(F.col("doc_id") >= lo)
    if hi is not None:
        docs = docs.filter(F.col("doc_id") < hi)
    return docs.select(
        F.format_string("conv-%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def _result(idx, k=K):
    """Top-k as (doc_id parsed back from conv_id, score in micro-units)."""
    from pyspark.sql import functions as F

    hits = idx.search(" ".join(QUERY_TERMS), k=k, hydrate=True)
    return hits.select(
        F.substring("conv_id", 6, 8).cast("long").alias("doc_id"),
        (F.round(F.col("score") * 1e6)).cast("long").alias("score_e6"))


def incr_insert_topk(spark, sf_dir):
    """Delta-insert (two batches), tiered-merge, then query:
    rank/score-identical to a fresh build over the union (insert-only
    deltas change no global statistic retroactively, and the merge is
    pure segment consolidation)."""
    from ..build import build_index
    from ..incremental import apply_updates, merge_segments
    from ..query import FTSIndex

    idx_dir = tempfile.mkdtemp(prefix="incr_ins_") + "/idx"
    build_index(spark, _docs_as_transcripts(spark, sf_dir, hi=SPLIT),
                idx_dir, mode="simple", n_buckets=4)
    mid = SPLIT + (500 - SPLIT) // 2
    apply_updates(spark, idx_dir,
                  upserts=_docs_as_transcripts(spark, sf_dir, lo=SPLIT,
                                               hi=mid),
                  batch_id="insert-tail-a", n_buckets=2)
    apply_updates(spark, idx_dir,
                  upserts=_docs_as_transcripts(spark, sf_dir, lo=mid),
                  batch_id="insert-tail-b", n_buckets=2)
    res = merge_segments(spark, idx_dir)
    assert not res["skipped"] and res["segments_merged"] == 2
    return _result(FTSIndex(spark, idx_dir))


INCR_INSERT_TOPK_SQL = f"""
    WITH toks AS ({_TOKS_SQL}),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ({", ".join(repr(t) for t in QUERY_TERMS)})
           GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(sum(
               ln(1 + (corpus.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf / (tf.tf + 1.2 * (1 - 0.75
                                         + 0.75 * dl.dl / corpus.avgdl))
             ) * 1e6) AS BIGINT) AS score_e6
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), corpus
      GROUP BY tf.doc_id)
    SELECT doc_id, score_e6 FROM scored
    ORDER BY score_e6 DESC, doc_id LIMIT {K}
"""


def incr_delete_topk(spark, sf_dir):
    """Delta-delete then query: N/avgdl drop to the live set, df keeps
    counting deleted docs until compaction (Lucene segment semantics),
    deleted docs never surface."""
    from pyspark.sql import functions as F

    from ..build import build_index
    from ..incremental import apply_updates
    from ..query import FTSIndex

    idx_dir = tempfile.mkdtemp(prefix="incr_del_") + "/idx"
    build_index(spark, _docs_as_transcripts(spark, sf_dir), idx_dir,
                mode="simple", n_buckets=4)
    dels = (spark.range(N_DELETE)
            .select(F.format_string("conv-%08d", F.col("id"))
                    .alias("conv_id"),
                    F.lit(0).cast("int").alias("turn_idx")))
    apply_updates(spark, idx_dir, deletes=dels, batch_id="delete-head")
    return _result(FTSIndex(spark, idx_dir))


INCR_DELETE_TOPK_SQL = f"""
    WITH toks AS ({_TOKS_SQL}),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    live_dl AS (SELECT * FROM dl WHERE doc_id >= {N_DELETE}),
    corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM live_dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ({", ".join(repr(t) for t in QUERY_TERMS)})
           GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(sum(
               ln(1 + (corpus.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf / (tf.tf + 1.2 * (1 - 0.75
                                         + 0.75 * live_dl.dl / corpus.avgdl))
             ) * 1e6) AS BIGINT) AS score_e6
      FROM tf JOIN df USING (term) JOIN live_dl USING (doc_id), corpus
      GROUP BY tf.doc_id)
    SELECT doc_id, score_e6 FROM scored
    ORDER BY score_e6 DESC, doc_id LIMIT {K}
"""


QUERIES = {
    "incr_insert_topk": (incr_insert_topk, INCR_INSERT_TOPK_SQL),
    "incr_delete_topk": (incr_delete_topk, INCR_DELETE_TOPK_SQL),
}
