"""Distributed, checkpoint-resumable inverted-index build.

The Spark restatement of the reference's ingest path (reference:
scanner/updates/TimelineScanJob.java:114-186 pages the feed and
checkpoints a cursor per story; scanner/ingest/PostingIngest.java:77-202
assembles an IndexedDocument and writes it to the index at
index/Index.java:131-143, storing the engine-assigned documentId back):

    read transcripts → bucket by conv_id range → per-bucket staging
    (stable local doc numbering + tokenize/tf, one Arrow pass)
    → global stats (N, avgdl, df) → global doc_id assignment
    → chunked posting-block encoding → postings/docs/stats tables

Scale design decisions (these are the 100-TB story, not test-size
conveniences):

* **Bucketing by conv_id range, not hash** — doc_ids come out dense and
  globally ordered by (conv_id, turn_idx) (the row invariant), each
  bucket is an independently checkpointable unit (manifest row), and a
  resumed build is byte-identical because bucket boundaries are pinned
  in ``_build_config.json``.
* **tf computed map-side** — term frequencies and doc lengths are
  emitted from one Arrow pass over each bucket (no groupBy shuffle for
  tf; dl rides along with every tf row so posting encoding never joins
  back to docs).
* **Head-term skew** — postings are grouped by ``(term, chunk)`` where
  ``chunk = doc_id // chunk_size``: a stopword-like term occupying 30%
  of a 10^12-doc corpus is split across ~10^8 bounded-size groups
  instead of melting one reducer.  Group size ≤ chunk_size rows by
  construction — no AQE skew handling needed, no salting lottery.
* **Deterministic physical layout** — block boundaries are chunk-local,
  so the encoded index is invariant to partitioning/parallelism; the
  same input yields the same bytes at local[8] and local[32] (resume +
  scaling-efficiency comparisons are exact).
* **Partial agg for stats** — df/N/avgdl are plain groupBy aggregates
  (map-side partial combine; Catalyst handles two-phase agg).
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Iterator

import pandas as pd

from . import manifest as mf
from .analyzer import analyze, doc_terms_tf
from .porter import MemoStemmer
from .postings import BLOCK_SIZE, CHUNK_SIZE, K1, B, encode_term_run

STAGING_SCHEMA_DDL = (
    "bucket int, local_idx long, row_type string, conv_id string, "
    "turn_idx int, role string, tool string, ts timestamp, text string, "
    "term string, tf int, dl int"
)

POSTINGS_SCHEMA_DDL = (
    "term string, first_doc_id long, last_doc_id long, n_docs int, "
    "deltas binary, tfs binary, dls binary, max_tfnorm double"
)

DOCS_COLS = ["doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl",
             "text"]


def _bucket_expr(F, boundaries: list[str]):
    """bucket(conv_id) = #{b in boundaries : b <= conv_id} − 1.

    boundaries[0] is "" so every conv_id lands in a bucket.  O(n_buckets)
    JVM-side comparisons per row — fine for thousands of buckets; swap
    for a broadcast range join beyond that.
    """
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= F.col("conv_id"))) - 1


def compute_boundaries(spark, df, n_buckets: int) -> list[str]:
    """Range-bucket boundaries over distinct conv_ids.

    Uses Spark's RangePartitioner sampling (one pass over distinct
    conv_ids) and takes each range partition's min as the boundary.
    Boundaries are persisted in the build config so resumes reuse them.
    """
    from pyspark.sql import functions as F

    if n_buckets <= 1:
        return [""]
    parts = (
        df.select("conv_id").distinct()
        .repartitionByRange(n_buckets, "conv_id")
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").agg(F.min("conv_id").alias("lo"))
        .orderBy("_pid")
        .collect()
    )
    bounds = sorted({r["lo"] for r in parts if r["lo"] is not None})
    if bounds:
        bounds[0] = ""
    else:
        bounds = [""]
    return bounds


def _staging_iter(mode: str):
    """mapInPandas body for the per-bucket staging pass.

    Input is hash-partitioned by bucket and sorted within partitions by
    (bucket, conv_id, turn_idx); per-bucket local_idx counters carry
    across Arrow batches.  Emits one 'doc' row per turn (with dl) and
    one 'tf' row per distinct (doc, term) — tf and dl computed map-side.
    """

    def fn(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[int, int] = {}
        stemmer = MemoStemmer()
        for pdf in pdf_iter:
            n = len(pdf)
            if n == 0:
                continue
            doc_rows = {c: [] for c in ("bucket", "local_idx", "conv_id",
                                        "turn_idx", "role", "tool", "ts",
                                        "text", "dl")}
            tf_rows = {c: [] for c in ("bucket", "local_idx", "term", "tf",
                                       "dl")}
            for bkt, conv, turn, role, tool, ts, text in zip(
                pdf["bucket"].values, pdf["conv_id"].values,
                pdf["turn_idx"].values, pdf["role"].values,
                pdf["tool"].values, pdf["ts"].values, pdf["text"].values,
            ):
                bkt = int(bkt)
                li = counters.get(bkt, 0)
                counters[bkt] = li + 1
                counts = doc_terms_tf(text if isinstance(text, str) else None,
                                      mode=mode, _stemmer=stemmer)
                dl = sum(counts.values())
                doc_rows["bucket"].append(bkt)
                doc_rows["local_idx"].append(li)
                doc_rows["conv_id"].append(conv)
                doc_rows["turn_idx"].append(int(turn))
                doc_rows["role"].append(role)
                doc_rows["tool"].append(tool)
                doc_rows["ts"].append(ts)
                doc_rows["text"].append(text)
                doc_rows["dl"].append(dl)
                for term, tf in counts.items():
                    tf_rows["bucket"].append(bkt)
                    tf_rows["local_idx"].append(li)
                    tf_rows["term"].append(term)
                    tf_rows["tf"].append(tf)
                    tf_rows["dl"].append(dl)
            docs = pd.DataFrame(doc_rows)
            docs["row_type"] = "doc"
            docs["term"] = None
            docs["tf"] = pd.array([None] * len(docs), dtype="Int32")
            tfs = pd.DataFrame(tf_rows)
            tfs["row_type"] = "tf"
            for c in ("conv_id", "role", "tool", "text"):
                tfs[c] = None
            tfs["turn_idx"] = pd.array([None] * len(tfs), dtype="Int32")
            tfs["ts"] = pd.NaT
            cols = ["bucket", "local_idx", "row_type", "conv_id", "turn_idx",
                    "role", "tool", "ts", "text", "term", "tf", "dl"]
            yield pd.concat([docs[cols], tfs[cols]], ignore_index=True)

    return fn


def _encode_iter(avgdl: float, k1: float, b: float, block_size: int):
    """mapInPandas body for posting-block encoding.

    Input sorted within partitions by (term, chunk, doc_id).  The last
    (term, chunk) group of each Arrow batch may continue in the next
    batch, so it is carried over; carry size is bounded by chunk_size.
    """
    import numpy as np

    def encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {c: [] for c in ("term", "first_doc_id", "last_doc_id",
                               "n_docs", "deltas", "tfs", "dls",
                               "max_tfnorm")}
        for (term, _chunk), g in pdf.groupby(["term", "chunk"], sort=False):
            rows = encode_term_run(
                g["doc_id"].values.astype(np.int64),
                g["tf"].values.astype(np.int64),
                g["dl"].values.astype(np.int64),
                avgdl, block_size=block_size, k1=k1, b=b)
            for (f, l, n, d, t, dl_, mx) in rows:
                out["term"].append(term)
                out["first_doc_id"].append(f)
                out["last_doc_id"].append(l)
                out["n_docs"].append(n)
                out["deltas"].append(d)
                out["tfs"].append(t)
                out["dls"].append(dl_)
                out["max_tfnorm"].append(mx)
        return pd.DataFrame(out)

    def fn(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in pdf_iter:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_term = pdf["term"].iat[-1]
            last_chunk = pdf["chunk"].iat[-1]
            tail = (pdf["term"] == last_term) & (pdf["chunk"] == last_chunk)
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield encode_groups(body)
        if carry is not None and len(carry):
            yield encode_groups(carry)

    return fn


def build_index(spark, transcripts, index_dir: str, *, mode: str = "english",
                n_buckets: int = 32, buckets_per_job: int | None = None,
                resume: bool = False, k1: float = K1, b: float = B,
                block_size: int = BLOCK_SIZE, chunk_size: int = CHUNK_SIZE,
                shuffle_partitions: int | None = None,
                fail_after_groups: int | None = None) -> dict:
    """Build (or resume) the full index at ``index_dir``.

    ``fail_after_groups`` aborts after N staging bucket-groups — used
    by resume tests to simulate a mid-build crash (the analogue of
    killing a TimelineScanJob between checkpoints).
    """
    from pyspark.sql import functions as F

    t_start = time.time()
    run_id = uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if shuffle_partitions is None:
        shuffle_partitions = spark.sparkContext.defaultParallelism

    config = mf.load_config(index_dir) if resume else None
    if config is None:
        boundaries = compute_boundaries(spark, transcripts, n_buckets)
        config = {"mode": mode, "n_buckets": len(boundaries), "k1": k1,
                  "b": b, "block_size": block_size, "chunk_size": chunk_size,
                  "boundaries": boundaries}
        mf.save_config(index_dir, config)
    boundaries = config["boundaries"]
    n_buckets = config["n_buckets"]
    mode, k1, b = config["mode"], config["k1"], config["b"]
    block_size, chunk_size = config["block_size"], config["chunk_size"]

    staging_path = os.path.join(index_dir, "staging")
    bucket_col = _bucket_expr(F, boundaries)

    # ---- stage 1: per-bucket staging (docs numbering + tokenize/tf) ----
    done = mf.done_partitions(index_dir, "staging")
    pending = [bkt for bkt in range(n_buckets) if bkt not in done]
    group_size = buckets_per_job or max(1, len(pending))
    groups = [pending[i:i + group_size]
              for i in range(0, len(pending), group_size)]
    for gi, group in enumerate(groups):
        if fail_after_groups is not None and gi >= fail_after_groups:
            raise RuntimeError(
                f"simulated crash after {fail_after_groups} staging groups")
        t0 = time.time()
        mf.mark(index_dir, "staging", group, "running")
        sub = (
            transcripts.withColumn("bucket", bucket_col)
            .filter(F.col("bucket").isin([int(x) for x in group]))
            .repartition(max(len(group), 1), "bucket")
            .sortWithinPartitions("bucket", "conv_id", "turn_idx")
        )
        staged = sub.mapInPandas(_staging_iter(mode), STAGING_SCHEMA_DDL)
        (staged.write.mode("overwrite").partitionBy("bucket")
         .parquet(staging_path))
        counts = (
            spark.read.parquet(staging_path)
            .filter(F.col("bucket").isin([int(x) for x in group]))
            .groupBy("bucket", "row_type").count().collect()
        )
        rows_in = {int(r["bucket"]): int(r["count"]) for r in counts
                   if r["row_type"] == "doc"}
        terms_out = {int(r["bucket"]): int(r["count"]) for r in counts
                     if r["row_type"] == "tf"}
        mf.mark(index_dir, "staging", group, "done", rows_in=rows_in,
                terms_out=terms_out)
        mf.record_metrics(
            index_dir, run_id, "staging",
            [(int(bkt), "seconds", time.time() - t0) for bkt in group]
            + [(int(bkt), "docs", rows_in.get(bkt, 0)) for bkt in group]
            + [(int(bkt), "tf_rows", terms_out.get(bkt, 0)) for bkt in group])

    staging = spark.read.parquet(staging_path)
    doc_rows = staging.filter(F.col("row_type") == "doc")
    tf_rows = staging.filter(F.col("row_type") == "tf")

    # ---- stage 2: global stats (partial+final hash agg) ----
    if -1 not in mf.done_partitions(index_dir, "stats"):
        t0 = time.time()
        stats = doc_rows.agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("total_dl")).collect()[0]
        corpus = spark.createDataFrame(
            [(int(stats["n_docs"]), float(stats["avgdl"] or 0.0),
              int(stats["total_dl"] or 0))],
            "n_docs long, avgdl double, total_dl long")
        corpus.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "corpus_stats"))
        (tf_rows.groupBy("term").agg(F.count("*").alias("df"))
         .repartitionByRange(shuffle_partitions, "term")
         .sortWithinPartitions("term")
         .write.mode("overwrite")
         .parquet(os.path.join(index_dir, "term_stats")))
        mf.mark(index_dir, "stats", [-1], "done")
        mf.record_metrics(index_dir, run_id, "stats",
                          [(-1, "seconds", time.time() - t0),
                           (-1, "n_docs", float(stats["n_docs"]))])

    corpus = spark.read.parquet(
        os.path.join(index_dir, "corpus_stats")).collect()[0]
    avgdl = float(corpus["avgdl"])

    # ---- stage 3: global doc_id assignment (bucket offsets) ----
    if "offsets" not in config:
        counts = {r["bucket"]: r["cnt"] for r in
                  doc_rows.groupBy("bucket")
                  .agg(F.count("*").alias("cnt")).collect()}
        offsets, acc = {}, 0
        for bkt in range(n_buckets):
            offsets[str(bkt)] = acc
            acc += int(counts.get(bkt, 0))
        config["offsets"] = offsets
        mf.save_config(index_dir, config)
    offsets = {int(k): int(v) for k, v in config["offsets"].items()}
    off_map = F.create_map(
        *[x for bkt, off in offsets.items()
          for x in (F.lit(bkt), F.lit(off))])
    doc_id_col = (off_map[F.col("bucket")] + F.col("local_idx")) \
        .alias("doc_id")

    if -1 not in mf.done_partitions(index_dir, "docs"):
        t0 = time.time()
        (doc_rows.select(doc_id_col, "conv_id", "turn_idx", "role", "tool",
                         "ts", "dl", "text")
         .repartitionByRange(shuffle_partitions, "doc_id")
         .sortWithinPartitions("doc_id")
         .write.mode("overwrite").parquet(os.path.join(index_dir, "docs")))
        mf.mark(index_dir, "docs", [-1], "done")
        mf.record_metrics(index_dir, run_id, "docs",
                          [(-1, "seconds", time.time() - t0)])

    # ---- stage 4: posting-block encoding (skew-proof by chunking) ----
    if -1 not in mf.done_partitions(index_dir, "postings"):
        t0 = time.time()
        tf_with_id = tf_rows.select(
            doc_id_col, "term", "tf", "dl"
        ).withColumn("chunk", (F.col("doc_id") / chunk_size)
                     .cast("long"))
        encoded = (
            tf_with_id
            .repartition(shuffle_partitions, "term", "chunk")
            .sortWithinPartitions("term", "chunk", "doc_id")
            .mapInPandas(_encode_iter(avgdl, k1, b, block_size),
                         POSTINGS_SCHEMA_DDL)
        )
        # final layout: range-partitioned + sorted by term so query-time
        # term lookups prune files/row-groups via parquet min-max stats
        (encoded.repartitionByRange(shuffle_partitions, "term",
                                    "first_doc_id")
         .sortWithinPartitions("term", "first_doc_id")
         .write.mode("overwrite")
         .parquet(os.path.join(index_dir, "postings")))
        mf.mark(index_dir, "postings", [-1], "done")
        mf.record_metrics(index_dir, run_id, "postings",
                          [(-1, "seconds", time.time() - t0)])

    total = time.time() - t_start
    n_docs = int(corpus["n_docs"])
    mf.record_metrics(index_dir, run_id, "build",
                      [(-1, "seconds", total),
                       (-1, "docs_per_sec", n_docs / max(total, 1e-9))])
    return {"run_id": run_id, "index_dir": index_dir, "n_docs": n_docs,
            "avgdl": avgdl, "seconds": total}
